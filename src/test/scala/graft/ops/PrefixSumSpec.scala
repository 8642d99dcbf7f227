package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The distributed prefix-sum operator, focused on the fused
  * multi-value form added in r16: N running totals over one
  * (group, order) must equal N chained single-value passes — same
  * values, one range shuffle instead of N.
  */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def frame() = (1 to 1000)
    .map(i => (i % 7, i, (i % 13).toLong, 1L))
    .toDF("g", "ord", "v", "one")

  test("fused runningTotals equals chained runningTotal calls") {
    val df = frame()
    val fused = PrefixSum.runningTotals(df, "g", Seq("ord"),
      Seq("v" -> "cv", "one" -> "rn"))
      .select("g", "ord", "cv", "rn").collect().map(_.toSeq).toSet
    val chained = PrefixSum.runningTotal(
      PrefixSum.runningTotal(df, "g", Seq("ord"), "v", "cv"),
      "g", Seq("ord"), "one", "rn")
      .select("g", "ord", "cv", "rn").collect().map(_.toSeq).toSet
    graft.Caches.clear()
    assert(fused == chained)
    assert(fused.size == 1000)
  }

  test("running totals match the window formulation per group") {
    val df = frame()
    val got = PrefixSum.runningTotals(df, "g", Seq("ord"),
      Seq("v" -> "cv", "one" -> "rn"))
      .select("g", "ord", "cv", "rn").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    graft.Caches.clear()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("ord")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val expect = df.select(col("g"), col("ord"),
        sum("v").over(w).as("cv"), sum("one").over(w).as("rn"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == expect)
  }

  test("global variant indexes every row exactly once") {
    val df = frame()
    val got = PrefixSum.runningTotalGlobal(df, Seq("ord"), "one", "i")
      .select("i").collect().map(_.getLong(0)).toSeq.sorted
    graft.Caches.clear()
    assert(got == (1L to 1000L))
  }
}
