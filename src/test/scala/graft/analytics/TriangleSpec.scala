package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degree-ordered triangle orientation (GraphQueries.orientByDegree):
  * the scale property under test is that a HUB keeps no forward
  * adjacency — wedges centered on a high-degree node cost
  * in(hub)×out(hub) rows in the wedge join, and orienting by raw id
  * gives a mid-id hub ≈N²/4 of them, while the degree tilt gives 0.
  */
class TriangleSpec extends SparkSpec {
  import spark.implicits._

  // star + chain: hub 50 joined to every other node 1..100, plus
  // chain edges (1,2) and (2,3) closing exactly two triangles
  // {50,1,2} and {50,2,3}. The hub id is MID-RANGE on purpose: under
  // id orientation it would keep 49 backward and 50 forward edges
  // (≈2450 hub-centered wedge rows, none closing); under the degree
  // tilt every hub edge points INTO the hub and the join builds only
  // the two genuine wedges.
  private def hubGraph = (
    (1L to 100L).filter(_ != 50L).map(i => (math.min(i, 50L), math.max(i, 50L))) ++
      Seq((1L, 2L), (2L, 3L))
  ).toDF("u", "v")

  test("hub keeps zero forward edges under the degree tilt") {
    val oriented = GraphQueries.orientByDegree(hubGraph)
    assert(oriented.count() === 101L) // one oriented copy per edge
    assert(oriented.filter(col("a") === 50L).count() === 0L,
      "the max-degree hub must be a sink in the oriented list")
    // leaves of degree 1 all point at the hub
    assert(oriented.filter(col("b") === 50L).count() === 99L)
  }

  test("wedge join builds only the genuine wedges, not hub blowup") {
    val oriented = GraphQueries.orientByDegree(hubGraph).cache()
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a"), col("e1.b"), col("e2.b"))
    // exactly the two wedges 1→2→50 and 3→2→50 — an id orientation
    // of the same graph builds ~2450 hub-centered wedge rows here
    assert(wedges.count() === 2L)
    assert(wedges.as[(Long, Long, Long)].collect().toSet ===
      Set((1L, 2L, 50L), (3L, 2L, 50L)))
    oriented.unpersist()
  }

  test("per-node triangle counts are exact on the star+chain graph") {
    val counts = GraphQueries
      .triangleCorners(GraphQueries.orientByDegree(hubGraph))
      .as[(Long, Long)].collect().toMap
    assert(counts === Map(50L -> 2L, 2L -> 2L, 1L -> 1L, 3L -> 1L))
    graft.Caches.clear()
  }

  test("counts match a brute-force closed-wedge enumeration") {
    // random-ish sparse graph, deterministic seed-free construction
    val edges = (for {
      i <- 1L to 60L
      j <- (i + 1L) to 60L
      if (i * 31L + j * 17L) % 11L == 0L
    } yield (i, j)).toDF("u", "v")
    val got = GraphQueries
      .triangleCorners(GraphQueries.orientByDegree(edges))
      .as[(Long, Long)].collect().toMap
    val es = edges.as[(Long, Long)].collect().toSet
    def has(a: Long, b: Long) = es.contains((math.min(a, b), math.max(a, b)))
    val brute = (for {
      a <- 1L to 60L; b <- (a + 1L) to 60L; c <- (b + 1L) to 60L
      if has(a, b) && has(b, c) && has(a, c)
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    assert(got === brute)
    graft.Caches.clear()
  }
}
