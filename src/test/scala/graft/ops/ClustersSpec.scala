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
