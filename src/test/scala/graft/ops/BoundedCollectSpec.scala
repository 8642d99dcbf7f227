package graft.ops

import graft.SparkSpec
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** graft_bounded_collect: collect_list semantics under the cap, loud
  * refusal past it — the per-key memory guard the ordered-recurrence
  * family (EWMA / Holt / trimmed mean / pattern match) aggregates
  * through instead of an uncapped collect_list.
  */
class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("under the cap it is exactly collect_list (sorted, nulls skipped)") {
    val df = Seq((1L, Some(3.0)), (1L, Some(1.0)), (1L, None),
      (2L, Some(5.0)), (2L, Some(4.0))).toDF("k", "v")
    val got = df.groupBy("k")
      .agg(expr("sort_array(graft_bounded_collect(v, 10))").as("vs"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(got === Map(1L -> Seq(1.0, 3.0), 2L -> Seq(4.0, 5.0)))
  }

  test("struct elements survive the serialize/merge path across partitions") {
    val df = (1L to 100L).map(i => (i % 4, i, i.toDouble))
      .toDF("k", "id", "v").repartition(8)
    val got = df.groupBy("k")
      .agg(expr("sort_array(graft_bounded_collect(struct(id, v), 1000))").as("s"))
      .select(col("k"), expr("transform(s, r -> r.id)").as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    (0L to 3L).foreach { k =>
      assert(got(k) === (1L to 100L).filter(_ % 4 == k), s"key $k")
    }
  }

  test("a hot key past the cap refuses loudly instead of buffering on") {
    val hot = (1L to 50L).map(i => (7L, i.toDouble)).toDF("k", "v")
    val e = intercept[Exception] {
      hot.groupBy("k").agg(expr("graft_bounded_collect(v, 10)")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("hot key")),
      s"expected the cap refusal, got: ${messages(e).mkString(" | ")}")
  }

  test("the recurrence gate queries run through the capped collect") {
    // the events_ewma gate at sf0.001 must still produce rows with the
    // bounded collect in place (cap far above any real user)
    val df = graft.SparkEntry.queries("events_ewma")(spark, "/root/testdata/sf0.001")
    assert(df.count() > 0)
  }
}
