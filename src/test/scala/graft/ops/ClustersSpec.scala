package graft.ops

import graft.SparkSpec
import graft.cdc.MergeTable

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chains merge transitively, labels are component minima") {
    // components: {1,2,3,4} via chain, {10,11}, singleton edges only
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components: long chain converges within iteration bound") {
    val edges = (1L until 15L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(edges).as[(Long, Long)].collect()
    assert(cc.forall(_._2 == 1L), cc.mkString(", "))
  }

  test("large-star/small-star agrees with label propagation on mixed graphs") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain
      (10L, 11L), (11L, 12L), (10L, 12L), // triangle
      (20L, 21L), // pair
      (30L, 30L), // self-loop: still a node, own cluster
      (40L, 41L), (41L, 42L), (40L, 43L), (43L, 44L) // tree
    ).toDF("doc_a", "doc_b")
    val lp = Dedup.connectedComponents(edges).as[(Long, Long)].collect().toMap
    val lss = Dedup.connectedComponentsLSS(edges).as[(Long, Long)].collect().toMap
    assert(lss === lp)
    assert(lss(30L) === 30L)
  }

  test("large-star/small-star converges logarithmically on a deep chain") {
    // a 200-link chain: label propagation needs 200 rounds (its
    // maxIter=20 default would NOT converge); star contraction closes
    // it inside its default budget — the scale property the algorithm
    // buys. Verified against the known answer, not the slow twin.
    val edges = (1L until 200L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val lss = Dedup.connectedComponentsLSS(edges).as[(Long, Long)].collect()
    assert(lss.length === 200)
    assert(lss.forall(_._2 == 1L), lss.filter(_._2 != 1L).take(5).mkString(", "))
  }

  test("large-star/small-star on randomized union-find-checked graphs") {
    val rnd = new scala.util.Random(42)
    val n = 60
    val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // reference answer by sequential union-find
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(id => id -> {
        // component min = min over members sharing the root
        val r = find(id.toInt)
        edges.flatMap(e => Seq(e._1, e._2)).distinct
          .filter(m => find(m.toInt) == r).min
      }).toMap
    val lss = Dedup.connectedComponentsLSS(edges.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
    assert(lss === expect)
  }

  test("vacuum removes orphaned data dirs and keeps the live snapshot") {
    val root = "target/test_tmp/vacuum"
    MergeTable.drop(root)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b")).toDF("id", "v")))
    t.upsert(Seq((2L, "B")).toDF("id", "v")) // COW rewrite orphans the first dir
    val removed = t.vacuum()
    assert(removed === 1)
    assert(t.read().as[(Long, String)].collect().sorted === Seq((1L, "a"), (2L, "B")))
    assert(t.vacuum() === 0) // idempotent
  }
}
