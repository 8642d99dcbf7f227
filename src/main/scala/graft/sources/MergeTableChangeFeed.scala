package graft.sources

import graft.cdc.MergeTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.StreamingShim
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming read of a MergeTable's outbound change feed — the
  * `readStream` counterpart of [[MergeTable.changesBetween]], so a
  * downstream consumer can tail the lake table incrementally the way
  * the reference's Iceberg tables feed follow-on jobs.
  *
  * Offsets are committed table versions: each micro-batch covers a
  * version range `(start, end]` and emits that range's NET key-level
  * changes (`_change` = I/U/D, after-image for I/U, before-image for
  * D) plus `_commit_version` = the range's end version. Rate limiting
  * is by version count (`maxVersionsPerBatch`), the natural unit for
  * a table whose commits are CDC batches — one version's changes are
  * one ingest batch, so the cap bounds per-trigger work regardless of
  * row width.
  *
  * The feed is computed reader-side (two-snapshot diff per range), so
  * writers stay O(batch) — MOR commits are not taxed with change-row
  * bookkeeping, the consumer pays for exactly the ranges it pulls.
  *
  * Restart semantics: offsets serialize as version numbers, so a
  * checkpointed query resumes from its committed version; manifests
  * are immutable and never rewritten (vacuum drops only unreferenced
  * data dirs), so any un-vacuumed range stays replayable.
  */
class MergeTableChangeFeedSource(
    spark: SparkSession,
    path: String,
    keys: Seq[String],
    mode: String,
    numBuckets: Option[Int],
    startingVersion: Long,
    maxVersionsPerBatch: Long,
    metadataPath: String,
    updatePreImages: Boolean = false,
    branch: String = MergeTable.MainBranch) extends Source with SupportsTriggerAvailableNow {

  private val table = new MergeTable(spark, path, keys, mode, numBuckets,
    branch = branch)

  // The engine never tells a restarted v1 source its committed offset,
  // so the high-water version persists in the stream's own metadata
  // dir (the FileStreamSource pattern): without it, a restart would
  // re-expose already-committed ranges (offset regression) or skip
  // versions committed while the stream was down.
  private val highWaterFile =
    if (metadataPath.isEmpty) None
    else Some(new org.apache.hadoop.fs.Path(metadataPath, "graft-high-water"))
  private def hadoopFs(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // Tolerant read: an empty/torn/corrupt file (crash mid-write on a
  // filesystem without atomic rename) degrades to "no high water" —
  // the stream re-seeds from startingVersion and the engine's own
  // checkpointed offset still guards against re-processing.
  private def readHighWater(): Option[Long] = highWaterFile.flatMap { p =>
    try {
      val fs = hadoopFs(p)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try new String(org.apache.commons.io.IOUtils.toByteArray(in)).trim.toLongOption
        finally in.close()
      }
    } catch { case _: java.io.IOException => None }
  }

  // Temp-file + rename so a crash mid-write never truncates the
  // previous high water in place (the FileStreamSource pattern).
  private def writeHighWater(v: Long): Unit = highWaterFile.foreach { p =>
    val fs = hadoopFs(p)
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, p.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
  }

  // highest version already advertised to the engine; monotone, seeded
  // from the persisted high-water on restart, synced forward by
  // getBatch, persisted by commit
  private var exposed: Long = math.max(startingVersion, readHighWater().getOrElse(Long.MinValue))

  override val schema: StructType =
    MergeTableChangeFeedSource.feedSchema(spark, path, keys, mode, numBuckets)

  override def getOffset: Option[Offset] = {
    val vs = table.versions()
    if (vs.isEmpty) None
    else Some(LongOffset(advance(vs.last)))
  }

  // always advertise (never None once the table exists): after a
  // checkpoint restart the engine's committed offset may be BELOW
  // our startingVersion (versions committed while the stream was
  // down) — advertising exposed lets the engine schedule the
  // catch-up batch (committed, exposed] instead of skipping it.
  // saturating add: a huge user-supplied cap ("unlimited") must
  // not wrap negative and freeze the stream
  private def advance(ceiling: Long): Long = {
    val reach =
      if (exposed > 0 && maxVersionsPerBatch > Long.MaxValue - exposed) Long.MaxValue
      else exposed + maxVersionsPerBatch
    exposed = math.max(exposed, math.min(ceiling, reach))
    exposed
  }

  // -- Trigger.AvailableNow (SupportsAdmissionControl surface) ------------
  // Without this, the engine's v1 wrapper latches the FIRST
  // rate-limited getOffset answer as the drain target, so a
  // maxVersionsPerBatch cap would end an AvailableNow run after one
  // batch with versions still pending. Latching the CURRENT high
  // water here lets the run pace itself batch by batch up to
  // everything committed at query start — and ignore later commits,
  // which is the AvailableNow contract.

  private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    // a table with no commits at query start latches the STARTING
    // version (not None): commits landing after start are outside the
    // AvailableNow contract, and an unlatched target would let
    // latestOffset chase them — a run that never terminates while
    // writers keep committing
    availableNowTarget = Some(table.versions().lastOption.getOrElse(startingVersion))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val vs = table.versions()
    if (vs.isEmpty) return null
    val ceiling = availableNowTarget.fold(vs.last)(math.min(vs.last, _))
    LongOffset(advance(ceiling))
  }

  override def reportLatestOffset(): OffsetV2 =
    table.versions().lastOption.map(LongOffset(_)).orNull

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(asVersion).getOrElse(startingVersion)
    val to = asVersion(end)
    exposed = math.max(exposed, to)
    if (from >= to) // fresh start aligns on startingVersion: empty batch
      return StreamingShim.asStreaming(
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    val changes = table.changesBetween(from, to, updatePreImages)
      .withColumn("_commit_version", lit(to))
    // align to the declared schema: columns added by later schema
    // evolution read as nulls for ranges that predate them
    val aligned = changes.select(schema.fields.map { f =>
      if (changes.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
    StreamingShim.asStreaming(aligned)
  }

  private def asVersion(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong // checkpointed SerializedOffset
  }

  override def commit(end: Offset): Unit = {
    exposed = math.max(exposed, asVersion(end))
    writeHighWater(exposed)
  }

  override def stop(): Unit = ()
}

object MergeTableChangeFeedSource {

  /** Change-feed schema: snapshot columns (keys first) + `_change`
    * (I/U/D) + `_commit_version`. Fixed at stream start from the
    * current snapshot schema.
    */
  def feedSchema(spark: SparkSession, path: String, keys: Seq[String],
                 mode: String, numBuckets: Option[Int]): StructType = {
    val snap = new MergeTable(spark, path, keys, mode, numBuckets).read().schema
    val keyFields = keys.map(k => snap(k))
    val rest = snap.fields.filterNot(f => keys.contains(f.name)).toSeq
    StructType((keyFields ++ rest) :+
      StructField("_change", StringType) :+ StructField("_commit_version", LongType))
  }

  /** Parse provider options shared by sourceSchema/createSource. */
  private[sources] def fromOptions(spark: SparkSession,
                                   parameters: Map[String, String],
                                   metadataPath: String = ""): MergeTableChangeFeedSource = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("mergetable stream requires option 'path'"))
    val keys = parameters.get("keys").map(_.split(",").map(_.trim).toSeq)
      .getOrElse(throw new IllegalArgumentException(
        "mergetable stream requires option 'keys' (the change feed diffs by primary key)"))
    val mode = parameters.getOrElse("mode", MergeTable.CopyOnWrite)
    val buckets = parameters.get("buckets").map(_.toInt)
    // a WAP audit stream can follow the branch's commits before they
    // publish; the branch must already exist (same guard as the batch
    // source — a typo'd name must not silently stream an empty lineage)
    val branch = parameters.get("branch").map { b =>
      require(b == MergeTable.MainBranch ||
          java.nio.file.Files.exists(
            java.nio.file.Paths.get(path, "branches", b, "_FORK")),
        s"no branch '$b' at $path — create it first")
      b
    }.getOrElse(MergeTable.MainBranch)
    val t = new MergeTable(spark, path, keys, mode, buckets, branch = branch)
    // default: only changes committed after stream creation
    val startingVersion = parameters.get("startingVersion").map(_.toLong)
      .getOrElse(t.versions().lastOption.getOrElse(0L))
    val maxVersions = parameters.get("maxVersionsPerBatch").map(v => math.max(1L, v.toLong))
      .getOrElse(Long.MaxValue / 4)
    // Delta-CDF-shaped feed: updates emit U_pre/U_post row pairs so a
    // streaming consumer can maintain aggregates (retract old, assert
    // new) — see MergeTable.changesBetween
    val preImages = parameters.get("updatePreImages").exists(_.toBoolean)
    new MergeTableChangeFeedSource(spark, path, keys, mode, buckets,
      startingVersion, maxVersions, metadataPath, preImages, branch)
  }
}
