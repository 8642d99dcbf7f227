package graft.ops

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  // the gate data is null-free, so the null-count path would be
  // vacuous there — exercise it on constructed data instead
  test("profiler counts nulls, distincts, and min/max on mixed columns") {
    val df = Seq(
      (Some(1), Some("a"), Some(2.5)),
      (Some(1), None, Some(-1.0)),
      (None, Some("b"), Some(2.5)),
      (Some(3), Some("a"), None))
      .toDF("num", "str", "dbl")
    val rows = Profile.columns(df, numericCols = Seq("num", "dbl"), otherCols = Seq("str"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap
    assert(rows("num") === ((1L, 2L, Some(1.0), Some(3.0))))
    assert(rows("dbl") === ((1L, 2L, Some(-1.0), Some(2.5))))
    assert(rows("str") === ((1L, 2L, None, None)))
  }

  test("profiler is a single stacked row — one aggregate, no per-column scans") {
    val df = Seq((1, "x")).toDF("a", "b")
    val plan = Profile.columns(df, Seq("a"), Seq("b")).queryExecution.optimizedPlan.toString
    // one Aggregate over one LocalRelation/scan; a UNION of per-column
    // profiles would show up as Union
    assert(!plan.contains("Union"), s"profiler degenerated to per-column scans:\n$plan")
  }
}
