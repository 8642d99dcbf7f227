package graft.cdc

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Parquet-backed lake table with the write semantics the reference
  * gets from Iceberg: create-if-absent, append with schema evolution,
  * MERGE-style upsert, and key-delete — re-expressed for core Spark.
  *
  * Reference semantics being matched:
  *  - append w/ merge-schema: transaction_log_util.py:216-218
  *  - MERGE INTO ... WHEN MATCHED UPDATE SET * / NOT MATCHED INSERT *:
  *    transaction_log_util.py:279-284
  *  - DELETE FROM ... WHERE EXISTS(pk match): transaction_log_util.py:326-327
  *
  * Layout (all paths under `root`):
  * {{{
  *   data/<uuid>/part-*.parquet   immutable data directories
  *   manifests/v<NNNNN>.txt      newline list of live data dir names
  *   _LATEST                     current manifest name (atomic pointer)
  * }}}
  * Commits are atomic: write data dir → write manifest → same-dir
  * rename of the pointer file (atomic on POSIX). Readers resolve the
  * pointer once and only ever see fully-written manifests — the same
  * snapshot-isolation idea Iceberg implements with its metadata tree.
  *
  * Scale notes: `append` is O(batch) — it only writes the new files
  * and a manifest. `upsert`/`delete` are copy-on-write: one shuffled
  * join keyed on the PK rewrites the table (matched rows replaced,
  * unmatched kept). CDC batches are small relative to the table, so
  * the changes side is broadcast when it fits; partition-scoped
  * rewrite (only rewrite files containing matched keys) is the
  * planned merge-on-read/r2 refinement — the manifest layout already
  * supports replacing a subset of data dirs.
  */
final class MergeTable(spark: SparkSession, root: String, val keys: Seq[String]) {
  private val rootPath = Paths.get(root)
  private val dataDir = rootPath.resolve("data")
  private val manifestDir = rootPath.resolve("manifests")
  private val pointer = rootPath.resolve("_LATEST")

  // -- metadata ------------------------------------------------------------

  private def currentManifest(): Option[Path] =
    if (Files.exists(pointer))
      Some(manifestDir.resolve(new String(Files.readAllBytes(pointer)).trim))
    else None

  private def liveDirs(): Seq[String] =
    currentManifest() match {
      case Some(m) if Files.exists(m) =>
        new String(Files.readAllBytes(m)).split("\n").map(_.trim).filter(_.nonEmpty).toSeq
      case _ => Nil
    }

  private def commit(dirs: Seq[String]): Unit = {
    Files.createDirectories(manifestDir)
    val version = currentManifest() match {
      case Some(m) => m.getFileName.toString.stripPrefix("v").stripSuffix(".txt").toLong + 1
      case None => 1L
    }
    val name = f"v$version%05d.txt"
    Files.write(manifestDir.resolve(name), dirs.mkString("\n").getBytes)
    val tmp = rootPath.resolve(s"_LATEST.tmp.${UUID.randomUUID()}")
    Files.write(tmp, name.getBytes)
    Files.move(tmp, pointer, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  private def writeData(df: DataFrame): String = {
    val dir = UUID.randomUUID().toString
    df.write.mode(SaveMode.Overwrite).parquet(dataDir.resolve(dir).toString)
    dir
  }

  def exists: Boolean = Files.exists(pointer)

  /** Snapshot read of the current table state. `mergeSchema` unions
    * the schemas of all live data dirs, so appends that added columns
    * are visible with nulls back-filled — the reference's
    * accept-any-schema behavior.
    */
  def read(): DataFrame = {
    val dirs = liveDirs()
    require(dirs.nonEmpty, s"MergeTable at $root is empty/uninitialized")
    spark.read.option("mergeSchema", "true")
      .parquet(dirs.map(d => dataDir.resolve(d).toString): _*)
  }

  // -- writes --------------------------------------------------------------

  /** Append-only insert with schema evolution: new files only, no
    * rewrite of existing data (O(batch) at any table size).
    */
  def append(df: DataFrame): Unit =
    commit(liveDirs() :+ writeData(df))

  /** MERGE-style upsert: `changes` must already be deduped to one row
    * per key (use [[Precombine.latestByKey]]). Matched keys take the
    * change row, unmatched existing rows are kept, brand-new keys are
    * inserted. Schemas are unioned (allowMissingColumns) so a change
    * batch with added columns evolves the table.
    */
  def upsert(changes: DataFrame): Unit = {
    val result =
      if (!exists) changes
      else {
        val current = read()
        val keep = current.join(
          broadcast(changes.select(keys.map(col): _*)), keys, "left_anti")
        changes.unionByName(keep, allowMissingColumns = true)
      }
    commit(Seq(writeData(result)))
  }

  /** Key-delete: drop all rows whose PK appears in `deleteKeys`. */
  def delete(deleteKeys: DataFrame): Unit = {
    require(exists, s"cannot delete from uninitialized table $root")
    val result = read().join(
      broadcast(deleteKeys.select(keys.map(col): _*).distinct()), keys, "left_anti")
    commit(Seq(writeData(result)))
  }

  /** Apply a full normalized change batch (opclass I/U/D) in
    * reference order — inserts appended, upserts merged, deletes
    * applied (processBatch structure, transaction_log_util.py:86-168).
    * `ordering` are the precombine columns (e.g. ts_ms).
    */
  def applyChanges(batch: DataFrame, ordering: Seq[String], metaCols: Seq[String] = Nil): Unit = {
    val drops = if (metaCols.nonEmpty) metaCols else ordering
    if (!exists) {
      // Fast path for a fresh table: the stepwise semantics (inserts,
      // then upserts replacing matched keys, then deletes) collapse to
      // one aggregation + one anti-join + ONE table write, instead of
      // three full write-read cycles. Upserts outrank inserts for the
      // same key regardless of timestamp — same outcome as the
      // stepwise path, where the upsert merge replaces whatever the
      // insert phase wrote.
      val inserts = batch.filter(col("opclass") === CdcModel.OpInsert)
        .drop("opclass").withColumn("_pri", lit(0))
      val upserts = batch.filter(col("opclass") === CdcModel.OpUpsert)
        .drop("opclass").withColumn("_pri", lit(1))
      val deletes = batch.filter(col("opclass") === CdcModel.OpDelete)
      val latest = Precombine.latestByKey(
        inserts.unionByName(upserts, allowMissingColumns = true),
        keys, "_pri" +: ordering).drop("_pri").drop(drops: _*)
      val result = latest.join(
        deletes.select(keys.map(col): _*).distinct(), keys, "left_anti")
      upsert(result)
      return
    }
    val inserts = batch.filter(col("opclass") === CdcModel.OpInsert).drop("opclass")
    val upserts = batch.filter(col("opclass") === CdcModel.OpUpsert).drop("opclass")
    val deletes = batch.filter(col("opclass") === CdcModel.OpDelete).drop("opclass")
    if (!inserts.isEmpty) append(inserts.drop(drops: _*))
    if (!upserts.isEmpty)
      upsert(Precombine.latestByKey(upserts, keys, ordering).drop(drops: _*))
    if (!deletes.isEmpty)
      delete(deletes.select(keys.map(col): _*))
  }
}

object MergeTable {
  /** Create-if-absent, seeding with `initial` when the table is new —
    * the reference's CREATE TABLE IF NOT EXISTS + first append
    * (transaction_log_util.py:202-218).
    */
  def createIfAbsent(spark: SparkSession, root: String, keys: Seq[String], initial: Option[DataFrame] = None): MergeTable = {
    val t = new MergeTable(spark, root, keys)
    if (!t.exists) initial.foreach(df => t.upsert(df))
    t
  }

  /** Destroy all table state (test helper). */
  def drop(root: String): Unit = {
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).iterator().asScala.foreach(rm)
      Files.deleteIfExists(p)
    }
    rm(Paths.get(root))
  }
}
