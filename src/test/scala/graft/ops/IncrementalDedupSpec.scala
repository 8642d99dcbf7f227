package graft.ops

import graft.SparkSpec
import graft.cdc.MergeTable
import graft.tables.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Incremental dedup across sequential ingest batches, with the
  * fingerprint index persisted in a bucketed MergeTable between
  * batches — the continuous-pipeline shape behind the
  * `dedup_incremental` gate query. The invariant: streaming batches
  * through the store keeps exactly the same documents as deduping the
  * whole stream at once (clone ids are constructed above original ids
  * so first-arrival == global min).
  */
class IncrementalDedupSpec extends SparkSpec {

  private def clones(d: DataFrame, m: Int, offset: Int): DataFrame =
    d.filter(col("doc_id") % 7 === m)
      .select((col("doc_id") + offset).as("doc_id"), col("text"))

  test("batched dedup through a MergeTable store equals whole-stream dedup") {
    val d = Tables.documents(spark, sfDir).select("doc_id", "text")
    // batch k carries fresh docs (doc_id % 3 == k) plus clones of
    // earlier batches' content at higher ids
    val b0 = d.filter(col("doc_id") % 3 === 0)
    val b1 = d.filter(col("doc_id") % 3 === 1)
      .unionByName(clones(b0, 0, 100000))
    val b2 = d.filter(col("doc_id") % 3 === 2)
      .unionByName(clones(b0, 1, 200000))
      .unionByName(clones(b1, 2, 200000))
      .unionByName(clones(d.filter(col("doc_id") % 3 === 2), 3, 300000))

    val root = Files.createTempDirectory("fp_store").toString
    val store = new MergeTable(spark, root, Seq("fp"), numBuckets = Some(4))
    var keptIds = Set.empty[Long]
    Seq(b0, b1, b2).zipWithIndex.foreach { case (batch, k) =>
      val known =
        if (k == 0) batch.limit(0).select(md5(col("text")).as("fp"))
        else store.read().select("fp")
      val kept = Dedup.incrementalKeepFps(batch, known, "doc_id", "text")
      store.upsert(kept)
      keptIds ++= kept.collect().map(_.getAs[Long]("keep_id"))
    }

    val wholeStream = b0.unionByName(b1).unionByName(b2)
      .groupBy(md5(col("text")).as("fp")).agg(min("doc_id").as("keep_id"))
    val expected = wholeStream.collect().map(_.getAs[Long]("keep_id")).toSet
    assert(keptIds == expected)
    // every clone was dropped, every original survived
    assert(keptIds.forall(_ < 100000))
    assert(store.read().count() == expected.size)
  }
}
