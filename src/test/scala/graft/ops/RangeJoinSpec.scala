package graft.ops

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def purchases = Tables.events(spark, sfDir)
    .filter($"event_type" === "purchase").select("user_id", "event_id", "ts")
  private def clicks = Tables.events(spark, sfDir)
    .filter($"event_type" === "click").select("user_id", "ts")

  test("bucketed window join equals the naive inequality join") {
    val fast = RangeJoin.joinWindowBefore(purchases, clicks,
        Seq("user_id"), "ts", "ts", 3600, "click_ts")
      .groupBy("event_id").agg(count("click_ts").as("n"))
      .as[(Long, Long)].collect().toMap
    val p = purchases.as("p"); val c = clicks.as("c")
    val naive = p.join(c,
        $"p.user_id" === $"c.user_id" &&
          $"c.ts" >= $"p.ts" - expr("INTERVAL 1 HOUR") && $"c.ts" < $"p.ts",
        "left")
      .groupBy("event_id").agg(count($"c.ts").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(fast === naive)
    assert(fast.nonEmpty)
  }

  test("window join plans an equi-join, not a per-key nested loop") {
    val plan = RangeJoin.joinWindowBefore(purchases, clicks,
        Seq("user_id"), "ts", "ts", 3600, "click_ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
  }

  test("payload pair join equals the naive inequality join, pair for pair") {
    val clicksTagged = Tables.events(spark, sfDir)
      .filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"))
    val fast = RangeJoin.pairsWindowBefore(purchases, clicksTagged,
        Seq("user_id"), "ts", "ts", 3600, "c_ts", Seq("click_id"))
      .select($"event_id", $"click_id")
      .as[(Long, Long)].collect().sorted.toSeq
    val p = purchases.as("p"); val c = clicksTagged.as("c")
    val naive = p.join(c,
        $"p.user_id" === $"c.user_id" &&
          $"c.ts" >= $"p.ts" - expr("INTERVAL 1 HOUR") && $"c.ts" < $"p.ts")
      .select($"event_id", $"click_id")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(fast === naive)
    assert(fast.nonEmpty)
  }

  test("quantization error is bounded by half a quantization step") {
    val rows = graft.SparkEntry.queries("embed_quantize")(spark, sfDir)
      .as[(Long, Double, Double, Long, Double)].collect()
    assert(rows.length === 500)
    rows.foreach { case (id, qmin, qmax, checksum, err) =>
      val halfStep = (qmax - qmin) / 256.0 / 2.0
      assert(err <= halfStep + 1e-6, s"vec $id err=$err > half step $halfStep")
      assert(checksum >= 0L && checksum <= 255L * 64)
    }
  }

  test("filter pipeline verdicts are consistent and every rule fires") {
    val rows = graft.SparkEntry.queries("docs_filter_pipeline")(spark, "/root/testdata/sf0.01")
      .as[(Long, Boolean, String)].collect()
    assert(rows.forall { case (_, keep, reason) => keep == (reason == "ok") })
    val reasons = rows.map(_._3).toSet
    Seq("ok", "too_short", "repetitive", "low_quality", "lang_mismatch").foreach { r =>
      assert(reasons.contains(r), s"rule '$r' never fired at sf0.01")
    }
  }
}
