package graft.analytics

import graft.SparkSpec
import graft.functions.SortedIntersect
import org.apache.spark.sql.functions._

/** Unit contract of the compiled sorted-merge intersection kernel
  * (`graft_sorted_intersect`) backing the triangle edge-iterator:
  * codegen path (registered SQL function over a DataFrame) must agree
  * with the interpreted eval on members, order, and edge cases.
  */
class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  private def viaSql(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    Seq((a, b)).toDF("a", "b")
      .selectExpr("graft_sorted_intersect(a, b) AS zs")
      .as[Seq[Long]].head()

  private def viaEval(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    import org.apache.spark.sql.GraftSqlBridge.expression
    import org.apache.spark.sql.catalyst.util.ArrayData
    SortedIntersect(expression(lit(null)), expression(lit(null)))
      .intersect(ArrayData.toArrayData(a.toArray), ArrayData.toArrayData(b.toArray))
      .toLongArray().toSeq
  }

  test("members, order, and bounds of the merge intersection") {
    val cases = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L), Seq(3L, 9L)),
      (Seq.empty[Long], Seq(1L, 2L), Seq.empty[Long]),
      (Seq(1L, 2L), Seq.empty[Long], Seq.empty[Long]),
      (Seq(4L, 5L, 6L), Seq(4L, 5L, 6L), Seq(4L, 5L, 6L)),
      (Seq(1L, 2L), Seq(3L, 4L), Seq.empty[Long]),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue),
        Seq(Long.MinValue, Long.MaxValue))
    )
    cases.foreach { case (a, b, want) =>
      assert(viaSql(a, b) === want, s"codegen path on ($a, $b)")
      assert(viaEval(a, b) === want, s"interpreted path on ($a, $b)")
    }
  }

  test("agrees with array_intersect on sorted distinct inputs") {
    val df = (1L to 200L).map { i =>
      val a = (0L to 40L).filter(x => (x * 31 + i) % 7 < 3).map(_ * 3 + i % 5)
      val b = (0L to 40L).filter(x => (x * 17 + i) % 5 < 2).map(_ * 3 + i % 5)
      (a, b)
    }.toDF("a", "b")
    val mismatches = df.selectExpr(
      "graft_sorted_intersect(a, b) AS got",
      "array_sort(array_intersect(a, b)) AS want"
    ).filter(col("got") =!= col("want")).count()
    assert(mismatches === 0L)
  }
}
