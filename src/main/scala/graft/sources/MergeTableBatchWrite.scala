package graft.sources

import graft.cdc.{CommitConflictException, MergeTable}
import java.nio.file.{Files, Path, Paths}
import java.util.UUID
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder, Expression => V2Expression}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, IntegerType, LongType, ShortType, StringType, StructType}
import org.apache.spark.util.SerializableConfiguration
import scala.collection.mutable

/** The catalog's TRUE DSv2 write path (TableCapability.BATCH_WRITE):
  * executors write parquet files straight into a staging dir under the
  * table's `data/` root — no Row round-trip through an
  * InsertableRelation — and the driver commits the staged leaf dirs
  * with the SAME manifest shapes the V1 writers produce.
  *
  * Why it exists: Spark executes a V1 fallback write from the stored
  * ANALYZED query (`AppendData.storeAnalyzedQuery` — verified against
  * the 4.1.2 planner), so `RequiresDistributionAndOrdering` on a
  * `V1Write` is silently ignored. Only a real v2 write makes the
  * write-side distribution request REAL: a bucketed seed asks the
  * engine to cluster incoming rows by the catalog-served
  * `bucket(n, keys…)` transform (the same seed-42 xxhash64 SPJ reads
  * resolve), a partitioned seed by identity(partition cols) — so each
  * task holds whole buckets/partitions and the demuxed write emits
  * ~one file per leaf dir instead of (tasks × leaves) shards. The
  * request is advisory (`distributionStrictlyRequired = false`):
  * Spark plans a REBALANCE, which AQE coalesces or skew-splits.
  *
  * Served shapes (chosen by the catalog's WriteBuilder): flat-table
  * appends (any mode — COW base entry / MOR delta entry), and the
  * FIRST write of a bucketed or partitioned table (INSERT-into-empty
  * and CTAS — no merge needed). Everything else (appends into
  * populated keyed layouts = scoped merges, CHECK constraints, column
  * mapping) stays on the V1 path, whose read-modify-write semantics a
  * pure file write cannot express.
  *
  * Exactly-one-commit: writer commit messages name every staged file;
  * the driver deletes stragglers from failed/speculative attempts
  * before recording stats, so the manifest never references a file no
  * committed task produced. A lost first-write race (concurrent seed)
  * recovers through the merge path: the staged rows are read back and
  * upserted — the same result the V1 writer would have produced.
  */
class MergeTableBatchWrite(
    path: String,
    meta: MergeTable.Meta,
    writeSchema: StructType,
    overwrite: Boolean = false) extends V2WriteLike {

  private def seedLayout: Boolean =
    meta.numBuckets.isDefined || meta.partitionCols.nonEmpty

  // a partition column's clustering expression: identity for value
  // partitioning, the FunctionCatalog-resolved days(ts)/months(ts)
  // transform for hidden layouts — the seed clusters by the derived
  // granule without the (hidden) column existing in the write plan
  private def partClusterExprs: Array[V2Expression] =
    meta.partitionCols.map(c =>
      GraftGranule.transformOf(meta.derivedPartitions, c): V2Expression).toArray

  override def requiredDistribution(): Distribution =
    if (meta.numBuckets.isDefined && meta.partitionCols.nonEmpty)
      // composed seed: cluster by the full cell id — the partition
      // columns' expressions AND the key-hash bucket, so each task
      // holds whole (partition × bucket) cells
      Distributions.clustered(partClusterExprs :+
        (Expressions.bucket(meta.numBuckets.get, meta.keys: _*): V2Expression))
    else if (meta.numBuckets.isDefined)
      Distributions.clustered(
        Array(Expressions.bucket(meta.numBuckets.get, meta.keys: _*)))
    else if (meta.partitionCols.nonEmpty)
      Distributions.clustered(partClusterExprs)
    else Distributions.unspecified()

  /** A declared table sort (`TBLPROPERTIES('sortBy'='c1,c2')`, plain
    * bucketed layouts) asks the engine to sort each write task by
    * (bucket, sortBy…) — the bucket transform leads so a task holding
    * several buckets still writes each dir as ONE sorted run. The seed
    * then lands PRESORTED and its commit records the `sort` marker
    * (see MergeTable.commitStagedBucketedSeed), giving the scan's
    * `SupportsReportOrdering` claim without a separate `OPTIMIZE …
    * SORT BY` rewrite pass over the data.
    */
  override def requiredOrdering(): Array[SortOrder] =
    if (meta.sortBy.nonEmpty && meta.numBuckets.isDefined &&
        meta.partitionCols.isEmpty)
      (Expressions.sort(
        Expressions.bucket(meta.numBuckets.get, meta.keys: _*),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING) +:
        meta.sortBy.map(c => Expressions.sort(Expressions.column(c),
          org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))).toArray
    else Array.empty

  // advisory: the engine plans a REBALANCE — AQE coalesces tiny
  // buckets into one task and splits a skewed bucket across several
  // (each still writing only that bucket's dir) instead of a rigid
  // one-task-per-bucket shuffle a hot key would bottleneck
  override def distributionStrictlyRequired(): Boolean = false

  override def description(): String =
    s"MergeTableBatchWrite $path ${requiredDistribution()}"

  override def toBatch: BatchWrite = new BatchWrite {
    private def spark = SparkSession.active
    // forWrite: an active spark.graft.wap.branch routes the staged
    // commit onto the branch (forked from the current head on first
    // write) — write-audit-publish for the v2 path too
    private def table = MergeTable.forWrite(spark, path, meta.keys, meta.mode,
      meta.numBuckets, partitionCols = meta.partitionCols)

    // allocated once per write job, on the driver
    private lazy val (stagingRel, stagingAbs) = table.allocateStagingDir()

    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
      val job = Job.getInstance(spark.sessionState.newHadoopConf())
      val layout: GraftWriteLayout =
        if (meta.numBuckets.isDefined && meta.partitionCols.nonEmpty)
          GraftWriteLayout.Composed(meta.numBuckets.get,
            meta.keys.map(k => writeSchema.fieldIndex(k)),
            GraftWriteLayout.partSegments(meta, writeSchema))
        else if (meta.numBuckets.isDefined)
          GraftWriteLayout.Bucketed(meta.numBuckets.get,
            meta.keys.map(k => writeSchema.fieldIndex(k)))
        else if (meta.partitionCols.nonEmpty)
          GraftWriteLayout.Partitioned(
            GraftWriteLayout.partSegments(meta, writeSchema))
        else GraftWriteLayout.Flat
      // the FILE schema appends the derived granule columns (hidden
      // layouts store them with the rows) — prepareWrite must see it
      val owf = new ParquetFileFormat().prepareWrite(spark, job, Map.empty,
        GraftWriteLayout.fileSchema(writeSchema, layout))
      new GraftDataWriterFactory(writeSchema, stagingAbs.toString, layout,
        owf, new SerializableConfiguration(job.getConfiguration),
        spark.sessionState.conf.maxRecordsPerFile)
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val committed = messages.collect { case m: GraftCommitMessage => m }
      val keep = committed.flatMap(_.relFiles).toSet
      purgeStrays(keep)
      // an empty APPEND (or an empty overwrite of a still-empty seed
      // layout) commits nothing
      if (keep.isEmpty && (!overwrite || seedLayout)) {
        deleteRecursively(stagingAbs); return
      }
      if (keep.isEmpty) {
        // an EMPTY overwrite still truncates (SQL semantics: the old
        // contents are replaced by nothing) — stage a schema-bearing
        // empty parquet dir, the same representation a delete-all
        // leaves behind, so the committed base entry stays readable
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], writeSchema)
          .coalesce(1)
          .write.mode("overwrite").parquet(stagingAbs.toString)
      }
      try {
        if (seedLayout && table.exists)
          throw new CommitConflictException(
            s"concurrent first write to $path: another writer seeded the layout")
        if (meta.numBuckets.isDefined && meta.partitionCols.nonEmpty)
          table.commitStagedComposedSeed(stagingRel)
        else if (meta.numBuckets.isDefined) table.commitStagedBucketedSeed(stagingRel)
        else if (meta.partitionCols.nonEmpty) table.commitStagedPartitionedSeed(stagingRel)
        else if (overwrite) table.commitStagedOverwrite(stagingRel)
        else table.commitStagedAppend(stagingRel)
      } catch {
        case _: CommitConflictException if seedLayout && !overwrite =>
          // lost the first-write race: recover through the merge path —
          // the winner's layout invariants (one dir per bucket/
          // partition) now hold, so the staged rows re-enter as a
          // scoped upsert, the same result the V1 writer produces.
          // An OVERWRITE race never recovers this way (replace-all vs
          // upsert are different answers) — it propagates.
          val staged = spark.read.parquet(stagingAbs.toString)
            .select(writeSchema.fieldNames.map(col): _*)
          table.upsert(staged)
          deleteRecursively(stagingAbs)
      }
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      deleteRecursively(stagingAbs)

    private def purgeStrays(keep: Set[String]): Unit =
      StagedFiles.purgeStrays(stagingAbs, keep)
    private def deleteRecursively(p: Path): Unit =
      StagedFiles.deleteRecursively(p)
  }
}

/** Staging-dir hygiene shared by the v2 writes. */
private[sources] object StagedFiles {
  /** Remove files no committed task reported (failed or speculative
    * attempts whose own abort never ran) — the manifest is
    * dir-granular, so a stray file would otherwise be read as data.
    */
  def purgeStrays(stagingAbs: Path, keep: Set[String]): Unit = {
    import scala.jdk.CollectionConverters._
    if (!Files.exists(stagingAbs)) return
    // Files.walk returns a live stream backed by open directory
    // handles — materialize under Using so the driver doesn't leak
    // an fd per v2 commit.
    scala.util.Using.resource(Files.walk(stagingAbs)) { walk =>
      walk.iterator().asScala
        .filter(p => Files.isRegularFile(p))
        .filterNot(p => keep.contains(stagingAbs.relativize(p).toString.replace('\\', '/')))
        .toSeq
    }.foreach(Files.deleteIfExists(_))
  }

  def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (!Files.exists(p)) return
    scala.util.Using.resource(Files.walk(p))(_.iterator().asScala.toSeq)
      .sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_))
  }
}

/** DYNAMIC partition overwrite through the true v2 write
  * (`SupportsDynamicOverwrite` → `OverwritePartitionsDynamic`):
  * executors demux the source rows into staged partition leaves
  * (bucket subdirs too on a composed layout), and the driver commits
  * ONE atomic manifest that replaces exactly the partitions present
  * in the staged data — untouched partitions carry over verbatim,
  * the Hive/Iceberg dynamic-overwrite contract. An empty source
  * replaces nothing (dynamic semantics: only partitions WITH data
  * overwrite — the truncate form is the replace-all surface).
  *
  * The table's PRIMARY-KEY invariant survives by validation, not by
  * luck: a staged key already living in an UNTOUCHED partition would
  * end up duplicated (partition replacement never reaches other
  * partitions), so the commit refuses loudly — rewrite the source to
  * cover the key's current partition, or use MERGE for row-level
  * movement. Spark executes OverwritePartitionsDynamic only as a v2
  * write (no V1 fallback exec exists), which is why this class must
  * exist for the statement to be servable at all.
  */
class MergeTableDynamicOverwrite(
    path: String,
    meta: MergeTable.Meta,
    writeSchema: StructType) extends V2WriteLike {

  override def requiredDistribution(): Distribution =
    Distributions.clustered(
      (meta.partitionCols.map(c =>
        GraftGranule.transformOf(meta.derivedPartitions, c): V2Expression) ++
        meta.numBuckets.map(n =>
          Expressions.bucket(n, meta.keys: _*): V2Expression)).toArray)

  override def requiredOrdering(): Array[SortOrder] = Array.empty
  override def distributionStrictlyRequired(): Boolean = false

  override def description(): String =
    s"MergeTableDynamicOverwrite $path ${requiredDistribution()}"

  override def toBatch: BatchWrite = new BatchWrite {
    private def spark = SparkSession.active
    // forWrite: an active spark.graft.wap.branch routes the staged
    // commit onto the branch (forked from the current head on first
    // write) — write-audit-publish for the v2 path too
    private def table = MergeTable.forWrite(spark, path, meta.keys, meta.mode,
      meta.numBuckets, partitionCols = meta.partitionCols)

    private lazy val (stagingRel, stagingAbs) = table.allocateStagingDir()

    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
      val job = Job.getInstance(spark.sessionState.newHadoopConf())
      val layout: GraftWriteLayout = meta.numBuckets match {
        case Some(n) => GraftWriteLayout.Composed(n,
          meta.keys.map(k => writeSchema.fieldIndex(k)),
          GraftWriteLayout.partSegments(meta, writeSchema))
        case None => GraftWriteLayout.Partitioned(
          GraftWriteLayout.partSegments(meta, writeSchema))
      }
      val owf = new ParquetFileFormat().prepareWrite(spark, job, Map.empty,
        GraftWriteLayout.fileSchema(writeSchema, layout))
      new GraftDataWriterFactory(writeSchema, stagingAbs.toString, layout,
        owf, new SerializableConfiguration(job.getConfiguration),
        spark.sessionState.conf.maxRecordsPerFile)
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val committed = messages.collect { case m: GraftCommitMessage => m }
      val keep = committed.flatMap(_.relFiles).toSet
      StagedFiles.purgeStrays(stagingAbs, keep)
      if (keep.isEmpty) { StagedFiles.deleteRecursively(stagingAbs); return }
      table.commitStagedDynamicOverwrite(stagingRel)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      StagedFiles.deleteRecursively(stagingAbs)
  }
}

/** Scala can't extend the Java `Write` interface's default methods and
  * `RequiresDistributionAndOrdering` in an anonymous class cleanly —
  * a named join point keeps the builder readable.
  */
trait V2WriteLike extends Write with RequiresDistributionAndOrdering

/** Routing of a row to its staged leaf dir ("" = flat). */
sealed trait GraftWriteLayout extends Serializable
object GraftWriteLayout {
  /** One partition-dir level: an identity column of the incoming row,
    * or a HIDDEN (derived) day/month granule computed executor-side
    * from its zone-free source column — rendered by [[GraftGranule]]
    * (byte-identical to the V1 path's driver-side injection) and ALSO
    * stored with the rows (appended string column), because scoped
    * merges and compactions re-derive leaf dirs from the stored value.
    */
  sealed trait PartSeg extends Serializable { def name: String }
  final case class IdentitySeg(ordinal: Int, name: String) extends PartSeg
  final case class DerivedSeg(srcOrdinal: Int, srcType: DataType,
      monthly: Boolean, name: String) extends PartSeg

  case object Flat extends GraftWriteLayout
  final case class Bucketed(n: Int, keyOrdinals: Seq[Int]) extends GraftWriteLayout
  final case class Partitioned(segs: Seq[PartSeg]) extends GraftWriteLayout
  /** Partition dirs nesting per-bucket subdirs — one leaf per
    * (partition tuple × key-hash bucket) cell. */
  final case class Composed(n: Int, keyOrdinals: Seq[Int], segs: Seq[PartSeg])
    extends GraftWriteLayout

  /** Partition column types whose dir-name rendering is exact — the
    * same restriction MergeTable.requirePartitionable enforces.
    */
  def partitionable(dt: DataType): Boolean = dt match {
    case StringType | ByteType | ShortType | IntegerType | LongType | BooleanType => true
    case _ => false
  }

  /** The partition segments of a table's layout against an incoming
    * write schema: derived columns resolve to their SOURCE ordinal
    * (unless the batch already carries the derived column — rewrite
    * sources do), identity columns to their own.
    */
  def partSegments(meta: graft.cdc.MergeTable.Meta,
      schema: StructType): Seq[PartSeg] =
    meta.partitionCols.map { c =>
      meta.derivedPartitions.get(c) match {
        case Some(src) if !schema.fieldNames.contains(c) =>
          val o = schema.fieldIndex(src)
          DerivedSeg(o, schema(o).dataType, c.endsWith("_month"), c)
        case _ => IdentitySeg(schema.fieldIndex(c), c)
      }
    }

  /** Derived segments needing a stored column appended to the file. */
  def derivedOf(layout: GraftWriteLayout): Seq[DerivedSeg] = layout match {
    case Partitioned(segs) => segs.collect { case d: DerivedSeg => d }
    case Composed(_, _, segs) => segs.collect { case d: DerivedSeg => d }
    case _ => Nil
  }

  /** The file schema: incoming rows plus the derived string columns. */
  def fileSchema(schema: StructType, layout: GraftWriteLayout): StructType =
    StructType(schema.fields ++ derivedOf(layout).map(d =>
      org.apache.spark.sql.types.StructField(d.name, StringType, nullable = true)))
}

final case class GraftCommitMessage(relFiles: Seq[String], rows: Long)
  extends WriterCommitMessage

class GraftDataWriterFactory(
    schema: StructType,
    stagingAbs: String,
    layout: GraftWriteLayout,
    owf: OutputWriterFactory,
    conf: SerializableConfiguration,
    maxRecordsPerFile: Long = 0L) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(schema, stagingAbs, layout, owf, conf, partitionId,
      maxRecordsPerFile)
}

/** Executor-side writer: routes each InternalRow to its leaf dir
  * (replaying the write-side seed-42 xxhash64 for buckets, the
  * escaped `_graft_p_<col>=<val>` rendering for partitions) and
  * streams it through Spark's own vectorized-compatible
  * ParquetOutputWriter — full codegen-to-parquet with no Row
  * conversion. One open writer per leaf dir per task; the engine's
  * clustered rebalance keeps that near one.
  */
class GraftDataWriter(
    schema: StructType,
    stagingAbs: String,
    layout: GraftWriteLayout,
    owf: OutputWriterFactory,
    conf: SerializableConfiguration,
    partitionId: Int,
    maxRecordsPerFile: Long = 0L) extends DataWriter[InternalRow] {

  private val ctx = new TaskAttemptContextImpl(conf.value,
    new TaskAttemptID(new TaskID(new JobID("graft", 0), TaskType.MAP, partitionId), 0))
  private val ext = owf.getFileExtension(ctx)
  private val uuid = UUID.randomUUID().toString

  // hidden-partition layouts append the derived granule strings to
  // every stored row (one reused buffer + JoinedRow — no per-row
  // allocation); `owf` was prepared with the matching file schema.
  // Each granule renders ONCE per row into `granules` (write() fills
  // it before routing); the route closure and the stored column both
  // read the same slot.
  private val derivedSegs = GraftWriteLayout.derivedOf(layout)
  private val derivedIdx: Map[GraftWriteLayout.DerivedSeg, Int] =
    derivedSegs.zipWithIndex.toMap
  private val fileSchema = GraftWriteLayout.fileSchema(schema, layout)
  private val granules = new Array[String](derivedSegs.length)
  private val derivedBuf = new Array[Any](derivedSegs.length)
  private val derivedRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(derivedBuf)
  private val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow()

  /** The rendered granule of one derived segment for `row` (null for
    * a null source — the null partition).
    */
  private def granuleOf(d: GraftWriteLayout.DerivedSeg, row: InternalRow): String =
    if (row.isNullAt(d.srcOrdinal)) null
    else GraftGranule.render(d.srcType, row.get(d.srcOrdinal, d.srcType), d.monthly)
  // per leaf dir: the open writer, its record count, and its roll
  // sequence — spark.sql.files.maxRecordsPerFile rolls to a fresh
  // file exactly as Spark's own FileFormatWriter does, so a skewed
  // bucket the rebalance could not split still lands as bounded files
  private final class LeafState(var w: org.apache.spark.sql.execution.datasources.OutputWriter,
      var inFile: Long, var seq: Int)
  private val writers = mutable.LinkedHashMap.empty[String, LeafState]
  private val files = mutable.ArrayBuffer.empty[String]
  private var rows = 0L
  private var closed = false

  // seed-chained xxhash64 over the key columns, null-skipping —
  // byte-identical to MergeTable.bucketExpr (pmod(xxhash64, n))
  private def bucketRoute(n: Int, ords: Seq[Int]): InternalRow => String = {
    val types: Seq[DataType] = ords.map(o => schema(o).dataType)
    row => {
      var h = 42L
      var i = 0
      while (i < ords.length) {
        val v = row.get(ords(i), types(i))
        if (v != null) h = XxHash64Function.hash(v, types(i), h)
        i += 1
      }
      s"${MergeTable.BucketColName}=${((h % n) + n) % n}"
    }
  }

  private def partitionRoute(segs: Seq[GraftWriteLayout.PartSeg]): InternalRow => String =
    row => segs.map { seg =>
      val v: Any = seg match {
        case GraftWriteLayout.IdentitySeg(o, _) =>
          row.get(o, schema(o).dataType)
        // already rendered for THIS row by write() — never re-derive
        case d: GraftWriteLayout.DerivedSeg => granules(derivedIdx(d))
      }
      val rendered =
        if (v == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
        else ExternalCatalogUtils.escapePathName(v.toString)
      s"${MergeTable.PartPrefixName}${seg.name}=$rendered"
    }.mkString("/")

  private val route: InternalRow => String = layout match {
    case GraftWriteLayout.Flat => _ => ""
    case GraftWriteLayout.Bucketed(n, ords) => bucketRoute(n, ords)
    case GraftWriteLayout.Partitioned(segs) => partitionRoute(segs)
    case GraftWriteLayout.Composed(n, keyOrds, segs) =>
      val parts = partitionRoute(segs)
      val bucket = bucketRoute(n, keyOrds)
      row => s"${parts(row)}/${bucket(row)}"
  }

  private def open(sub: String, seq: Int) = {
    val dir = if (sub.isEmpty) Paths.get(stagingAbs) else Paths.get(stagingAbs, sub)
    Files.createDirectories(dir)
    val name = f"part-$partitionId%05d-$uuid-c$seq%03d$ext"
    files += (if (sub.isEmpty) name else s"$sub/$name")
    owf.newInstance(dir.resolve(name).toString, fileSchema, ctx)
  }

  private def writerFor(sub: String): org.apache.spark.sql.execution.datasources.OutputWriter = {
    val st = writers.getOrElseUpdate(sub, new LeafState(open(sub, 0), 0L, 0))
    if (maxRecordsPerFile > 0 && st.inFile >= maxRecordsPerFile) {
      st.w.close()
      st.seq += 1
      st.w = open(sub, st.seq)
      st.inFile = 0L
    }
    st.inFile += 1
    st.w
  }

  override def write(row: InternalRow): Unit = {
    if (derivedSegs.isEmpty) writerFor(route(row)).write(row)
    else {
      // render each granule once; the route reads the same slots, and
      // the stored row carries the derived columns the scoped
      // merge/compaction paths re-derive leaf dirs from
      var i = 0
      while (i < derivedSegs.length) {
        val g = granuleOf(derivedSegs(i), row)
        granules(i) = g
        derivedBuf(i) =
          if (g == null) null
          else org.apache.spark.unsafe.types.UTF8String.fromString(g)
        i += 1
      }
      writerFor(route(row)).write(joined(row, derivedRow))
    }
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    closeAll()
    GraftCommitMessage(files.toSeq, rows)
  }

  override def abort(): Unit = {
    try closeAll() catch { case _: Throwable => () }
    files.foreach(f => Files.deleteIfExists(Paths.get(stagingAbs, f)))
  }

  override def close(): Unit = closeAll()

  private def closeAll(): Unit = if (!closed) {
    closed = true
    writers.values.foreach(_.w.close())
  }
}
