package graft.ops

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join result") {
    val ev = Tables.events(spark, sfDir).select("event_id", "event_type", "value")
    val dim = Tables.events(spark, sfDir).groupBy("event_type")
      .agg(round(avg("value"), 4).as("type_avg"))
    val salted = Skew.saltedJoin(ev, dim, "event_type", col("event_id"), salts = 8)
      .select("event_id", "event_type", "value", "type_avg")
    val plain = ev.join(dim, "event_type")
      .select("event_id", "event_type", "value", "type_avg")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() === ev.count())
  }

  test("salt spreads each hot key across sub-keys") {
    val ev = Tables.events(spark, sfDir)
    val spread = ev
      .withColumn("_salt", pmod(xxhash64(col("event_id")), lit(8)))
      .groupBy("event_type", "_salt").count()
      .groupBy("event_type").agg(countDistinct("_salt").as("n_salts"))
      .as[(String, Long)].collect()
    assert(spread.forall(_._2 === 8), spread.mkString(", "))
  }

  test("salted join stays a shuffled join, not broadcast") {
    val ev = Tables.events(spark, sfDir).select("event_id", "event_type", "value")
    val dim = ev.groupBy("event_type").agg(count(lit(1)).as("c"))
    val plan = Skew.saltedJoin(ev, dim, "event_type", col("event_id"), 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan.linesIterator.take(12).mkString("\n"))
  }
}
