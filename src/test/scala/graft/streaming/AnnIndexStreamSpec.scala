package graft.streaming

import graft.SparkSpec
import graft.cdc.MergeTable
import graft.ops.Similarity
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Streaming ANN index maintenance (AnnIndexStream): embeddings
  * stream into a MergeTable-backed IVF layout under a fixed trained
  * codebook, serving bit-identical top-k to the batch IVF (the one
  * shared cellScores definition), exactly-once per micro-batch, with
  * cell-range-contiguous files the probe's isin filter can prune.
  */
class AnnIndexStreamSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Tables.load(spark, sfDir, "embeddings")

  test("the streamed index serves the same top-k as the batch IVF") {
    val root = "target/test_tables/ann_index_stream"
    MergeTable.drop(root)
    val cents = Similarity.kmeansCentroids(spark, corpus, "embedding", 8)
    val ais = new AnnIndexStream(spark, root, cents)
    // two micro-batches covering the corpus
    ais.processBatch(corpus.filter(col("vec_id") % 2 === 0)
      .select("vec_id", "embedding"), 0L)
    ais.processBatch(corpus.filter(col("vec_id") % 2 === 1)
      .select("vec_id", "embedding"), 1L)

    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val got = ais.topK(queries, k = 5)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Int, Double)].collect().toSeq
    val want = Similarity.ivfTopKWith(spark, queries,
        corpus.select("vec_id", "embedding"), k = 5, cents)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(got === want,
      "streamed-index serving must equal the batch IVF bit-for-bit")
  }

  test("a replayed micro-batch is a no-op (exactly-once index growth)") {
    val root = "target/test_tables/ann_index_replay"
    MergeTable.drop(root)
    val cents = Similarity.kmeansCentroids(spark, corpus, "embedding", 8)
    val ais = new AnnIndexStream(spark, root, cents)
    val b0 = corpus.limit(100).select("vec_id", "embedding")
    ais.processBatch(b0, 0L)
    val n = new MergeTable(spark, ais.indexRoot, Seq("vec_id")).read().count()
    ais.processBatch(b0, 0L) // replay
    assert(new MergeTable(spark, ais.indexRoot, Seq("vec_id")).read().count() === n)
    // a restarted maintainer (fresh handles) also skips the replay
    new AnnIndexStream(spark, root, cents).processBatch(b0, 0L)
    assert(new MergeTable(spark, ais.indexRoot, Seq("vec_id")).read().count() === n)
  }

  test("Z-order maintenance preserves serving exactly (the growth story)") {
    // a long-lived index accumulates per-trigger files; OPTIMIZE
    // ZORDER on `cell` is its maintenance op — it must change the
    // layout, not the answers
    val root = "target/test_tables/ann_index_zorder"
    MergeTable.drop(root)
    val cents = Similarity.kmeansCentroids(spark, corpus, "embedding", 8)
    val ais = new AnnIndexStream(spark, root, cents)
    (0 until 4).foreach { b =>
      ais.processBatch(corpus.filter(col("vec_id") % 4 === b)
        .select("vec_id", "embedding"), b.toLong)
    }
    val queries = corpus.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val before = ais.topK(queries, k = 5).orderBy("query_id", "rank")
      .as[(Long, Long, Int, Double)].collect().toSeq
    new MergeTable(spark, ais.indexRoot, Seq("vec_id")).cluster(Seq("cell"))
    val after = ais.topK(queries, k = 5).orderBy("query_id", "rank")
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(after === before, "clustering must be answer-preserving")
  }

  test("cell-contiguous files let the probe prune the index scan") {
    val root = "target/test_tables/ann_index_prune"
    MergeTable.drop(root)
    val cents = Similarity.kmeansCentroids(spark, corpus, "embedding", 8)
    val ais = new AnnIndexStream(spark, root, cents)
    ais.processBatch(corpus.select("vec_id", "embedding"), 0L)
    val rel = new graft.sources.MergeTableRelation(spark.sqlContext,
      ais.indexRoot, Seq("vec_id"), MergeTable.CopyOnWrite)
    val total = rel.candidateFiles(Array.empty).get.size
    // a one-cell probe must not read the whole index: the range-
    // partitioned, cell-sorted files carry tight cell ranges
    val kept = rel.candidateFiles(
      Array(org.apache.spark.sql.sources.EqualTo("cell", 0))).get.size
    assert(kept < total,
      s"expected footer-stat pruning on cell, kept $kept of $total")
  }
}
