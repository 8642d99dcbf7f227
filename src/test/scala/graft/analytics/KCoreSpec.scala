package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peel semantics (GraphQueries.peelCore): the property under
  * test is the CASCADE — removing a low-degree node can drop its
  * neighbors under k on the NEXT round, so a chain hanging off a
  * dense core dissolves one link per round while the core survives
  * with its internal degrees intact.
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  // symmetric (type-tagged) edge list from undirected pairs
  private def sym(pairs: Seq[(Long, Long)]): DataFrame =
    (pairs.map { case (u, v) => ("n", u, "n", v) } ++
      pairs.map { case (u, v) => ("n", v, "n", u) })
      .toDF("src_t", "src_id", "dst_t", "dst_id")

  // K4 on {1,2,3,4} (every node degree 3) + tail 4-5-6: node 6 has
  // degree 1, node 5 degree 2 — with k=2 the tail peels one link per
  // round (6 first, then 5) while the clique never drops a node
  private val clique = for {
    a <- 1L to 4L; b <- (a + 1) to 4L
  } yield (a, b)
  private val graph = sym(clique ++ Seq((4L, 5L), (5L, 6L)))

  private def survivors(rounds: Int): Set[Long] =
    GraphQueries.peelCore(graph, k = 2, rounds = rounds)
      .select(col("src_id")).distinct().as[Long].collect().toSet

  test("the peel cascades one chain link per round") {
    assert(survivors(1) === Set(1L, 2L, 3L, 4L, 5L), "round 1 drops only node 6")
    assert(survivors(2) === Set(1L, 2L, 3L, 4L), "round 2 drops node 5 (degree fell to 1)")
    assert(survivors(3) === Set(1L, 2L, 3L, 4L), "the 2-core is stable")
  }

  test("core degrees are the residual in-core degrees") {
    val deg = GraphQueries.peelCore(graph, k = 2, rounds = 3)
      .groupBy("src_id").agg(count(lit(1)).as("d"))
      .as[(Long, Long)].collect().toMap
    assert(deg === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      "clique degrees exclude the peeled tail edge")
  }

  test("a graph below k everywhere peels to empty") {
    val path = sym(Seq((1L, 2L), (2L, 3L)))
    assert(GraphQueries.peelCore(path, k = 3, rounds = 2).count() === 0L)
  }

  // K4 + a 6-link tail: the cascade needs SIX rounds to dissolve, so
  // a 3-round unroll under-peels and over-reports the core
  private val deepTail = sym(clique ++
    Seq((4L, 10L), (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 15L)))

  test("round-4+ cascades change the answer and the fixpoint catches them") {
    val unrolled = GraphQueries.peelCore(deepTail, k = 2, rounds = 3)
      .select(col("src_id")).distinct().as[Long].collect().toSet
    assert(unrolled === Set(1L, 2L, 3L, 4L, 10L, 11L, 12L),
      "3 rounds under-peel the deep tail")
    val fixed = GraphQueries.peelCoreFixpoint(deepTail, k = 2)
      .select(col("src_id")).distinct().as[Long].collect().toSet
    assert(fixed === Set(1L, 2L, 3L, 4L), "the true 2-core is the clique alone")
  }

  test("fixpoint refuses loudly when the cascade outruns the round cap") {
    val e = intercept[IllegalArgumentException] {
      GraphQueries.peelCoreFixpoint(deepTail, k = 2, maxRounds = 3)
    }
    assert(e.getMessage.contains("fixpoint"))
  }

  test("a cascade converging in exactly maxRounds peels converges (identity round is free)") {
    // the 6-link tail dissolves in exactly 6 strict peel rounds; the
    // convergence-detection round must not count against the cap, or
    // the cap would not match the oracle's unroll depth
    val fixed = GraphQueries.peelCoreFixpoint(deepTail, k = 2, maxRounds = 6)
      .select(col("src_id")).distinct().as[Long].collect().toSet
    assert(fixed === Set(1L, 2L, 3L, 4L))
  }

  test("fixpoint equals the unrolled peel once the unroll is deep enough") {
    val a = GraphQueries.peelCoreFixpoint(graph, k = 2)
      .groupBy("src_id").agg(count(lit(1)).as("d")).as[(Long, Long)].collect().toMap
    val b = GraphQueries.peelCore(graph, k = 2, rounds = 3)
      .groupBy("src_id").agg(count(lit(1)).as("d")).as[(Long, Long)].collect().toMap
    assert(a === b)
  }
}
