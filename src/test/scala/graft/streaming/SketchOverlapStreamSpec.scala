package graft.streaming

import graft.SparkSpec
import graft.ops.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming theta-sketch twin (StreamOps.kmvSketchStream +
  * Sketches.overlapEstimate): per-source sketches maintained across
  * arbitrary batch splits must yield EXACTLY the batch
  * `Sketches.kmvOverlap` pairs — θ, the raw common count, and the
  * rounded estimate — because the k-min fold is order-free and the
  * scalar pair math is the DataFrame gate's twin. State stays ≤ k
  * longs per group.
  */
class SketchOverlapStreamSpec extends SparkSpec {
  import spark.implicits._

  // three sources, >k distinct elements each (the estimator regime),
  // overlapping ranges so intersections are non-trivial
  private def elems(src: String, lo: Int, hi: Int): Seq[(String, String)] =
    (lo to hi).map(i => (src, s"w$i"))

  private val all = elems("a", 1, 200) ++ elems("b", 101, 320) ++
    elems("c", 150, 260)

  test("stream-maintained sketches reproduce the batch overlap pairs exactly") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val q = StreamOps.kmvSketchStream(in.toDF().toDF("group", "elem"))
      .writeStream.format("memory").queryName("sketch_stream")
      .outputMode("update").start()
    try {
      // adversarial split: interleaved, duplicated, out of order
      val (b1, b2) = all.zipWithIndex.partition(_._2 % 3 != 0)
      in.addData(b1.map(_._1) ++ all.take(30)) // duplicates in-batch
      q.processAllAvailable()
      in.addData(b2.map(_._1) ++ all.takeRight(25))
      q.processAllAvailable()
      // newest sketch per group from the update-mode sink
      val sketches = spark.table("sketch_stream")
        .groupBy("group").agg(last("mins").as("mins"))
        .as[(String, Seq[Long])].collect().toMap
      assert(sketches.keySet === Set("a", "b", "c"))
      assert(sketches.values.forall(_.length <= Sketches.DefaultK))
      // batch truth over the SAME elements
      val batch = Sketches.kmvOverlap(
          all.toDF("group", "elem"), "group", "elem")
        .select("group_a", "group_b", "theta", "n_common", "est_overlap")
        .as[(String, String, Long, Long, Double)].collect()
      assert(batch.length === 3)
      batch.foreach { case (a, b, theta, nCommon, est) =>
        val (th2, n2, est2) = Sketches.overlapEstimate(sketches(a), sketches(b))
        assert((th2, n2, est2) === ((theta, nCommon, est)), s"pair ($a,$b)")
      }
      // saturated sketches → the estimator path, not the exact path
      assert(batch.forall(_._3 < 281474976710656L), batch.mkString("|"))
    } finally q.stop()
  }
}
