package graft.sources

import java.util.OptionalLong

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{InternalRow, StructFilters}
import org.apache.spark.sql.catalyst.expressions.{And => CatAnd, BoundReference, GenericInternalRow, Predicate => CatPredicate, UnsafeProjection}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.datasources.{FileFormat, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

/** One batch-scan read slice: a byte range of one parquet file (the
  * vectorized reader takes the row groups whose midpoint falls in
  * [start, start+length)). Carries fileSize/modTime so executors
  * build `PartitionedFile`s without re-statting. `masked` is the
  * file's deletion-vector row indexes (SORTED; empty on COW reads) —
  * the mask ships ONLY to the partitions reading its file, the
  * positional-broadcast shape of the V1 dv anti-join.
  */
private[sources] case class GraftFileSlice(path: String, start: Long, length: Long,
    fileSize: Long, modTime: Long, masked: Array[Long] = Array.emptyLongArray)

private[sources] case class GraftFilePartition(files: Seq[GraftFileSlice])
    extends InputPartition

/** A whole hash bucket as one partition, keyed for Spark's
  * storage-partitioned join: `HasPartitionKey` lets the planner align
  * two scans bucket-by-bucket and elide the shuffle entirely.
  */
private[sources] case class GraftBucketPartition(files: Seq[GraftFileSlice], bucket: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

/** One VALUE partition (all files of one `_graft_p_…` leaf), keyed by
  * its typed partition tuple — the identity-transform counterpart of
  * [[GraftBucketPartition]]: two tables partitioned on the same
  * columns join partition-for-partition without a shuffle.
  * Values are stored JVM-serializable (String/Long/Boolean/null) and
  * converted to catalyst form on demand.
  */
private[sources] case class GraftValuePartition(files: Seq[GraftFileSlice],
    values: Seq[Any]) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(values.map {
      case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
      case v => v
    }.toArray)
}

/** DSv2 Batch read path for a MergeTable snapshot (the V1Scan
  * replacement on the eligible fast path — COW, no pending deltas or
  * deletion vectors, no active column mapping):
  *
  *  - files come from the SAME pinned-manifest pruning pipeline the
  *    V1 relation uses (bucket dirs → partition dirs → footer stats →
  *    key blooms), so every pruning tier carries over;
  *  - rows are read by Spark's own vectorized parquet reader
  *    ([[ParquetFileFormat.buildReaderWithPartitionValues]]) straight
  *    into `InternalRow`/`ColumnarBatch` — no Row round-trip like the
  *    V1 `buildScan` RDD, and filter-free scans feed whole-stage
  *    codegen columnar batches directly;
  *  - bucketed tables report [[KeyGroupedPartitioning]] over the
  *    catalog's `bucket` function with one partition per bucket id, so
  *    two co-bucketed mergetables JOIN WITHOUT A SHUFFLE (Spark's
  *    storage-partitioned join) — at 100 TB the fact⋈fact shuffle this
  *    removes is the dominant cost;
  *  - [[SupportsRuntimeFiltering]] lets a dimension filter prune
  *    bucket/partition dirs AT RUNTIME (DSv2 dynamic partition
  *    pruning) through the same `survivingFiles` pipeline.
  *
  * Two filter tiers: `claimed` (partition-column filters the
  * ScanBuilder reported consumed — the filtered metadata-agg pushdown
  * requires zero post-scan filters) are enforced EXACTLY by a
  * compiled row-mode predicate over the read schema (required ∪
  * filter-referenced columns), projecting back down; `advisory` (all
  * translatable filters, including residual data filters the engine
  * re-applies above the scan) drive file skipping and parquet
  * row-group hints only.
  */
private[sources] class MergeTableBatchScan(
    spark: SparkSession,
    relation: MergeTableRelation,
    requiredSchema: StructType,
    claimed: Array[Filter],
    advisory: Array[Filter],
    wantFile: Boolean = false) extends Scan with Batch
    with SupportsReportPartitioning with SupportsRuntimeFiltering
    with SupportsReportStatistics with SupportsReportOrdering {

  private val fullSchema = relation.schema
  // claimed-filter-only columns ride along for exact enforcement
  private val filterRefs: Seq[String] = claimed.flatMap(_.references).distinct
    .filterNot(requiredSchema.fieldNames.contains).toSeq
  // deletion-vector snapshots additionally read the parquet reader's
  // generated row index (the temporary metadata column the vectorized
  // reader fills), which the executor-side mask filter consumes and
  // the output projection drops
  private val dv = relation.isDvSnapshot
  private val readDataSchema = {
    val base = requiredSchema.fields ++ filterRefs.map(fullSchema(_))
    // NULLABLE on purpose: the reader's column check tolerates a
    // missing file column only when nullable — the row-index
    // generator (matched by this exact name) then fills the vector
    if (dv) StructType(base :+ org.apache.spark.sql.types.StructField(
      ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
      org.apache.spark.sql.types.LongType, nullable = true))
    else StructType(base)
  }
  // the whole snapshot's mask, loaded once per scan (size-gated by
  // batchReadableDv before this path is ever chosen)
  private lazy val dvMasks: Map[String, Array[Long]] =
    if (dv) relation.dvMasks else Map.empty
  private def maskOf(p: java.nio.file.Path): Array[Long] =
    if (!dv) Array.emptyLongArray
    else dvMasks.getOrElse(p.toUri.getPath, Array.emptyLongArray)

  // the scan's OUTPUT includes the `_graft_file` lineage column when
  // requested (SupportsMetadataColumns); it is synthesized per file by
  // the reader, never read from parquet
  override def readSchema(): StructType =
    if (!wantFile) requiredSchema
    else StructType(requiredSchema.fields :+
      org.apache.spark.sql.types.StructField(MergeTableV2.FileColumnName,
        org.apache.spark.sql.types.StringType, nullable = false))
  override def toBatch: Batch = this
  override def description(): String = {
    val fstr = if (advisory.isEmpty) "" else s", PushedFilters: [${advisory.mkString(", ")}]"
    s"MergeTableBatchScan ${relation.path}$fstr"
  }
  override def toString: String = description()

  // -- runtime filtering (DSv2 dynamic partition pruning) ------------------

  @volatile private var runtime: Array[Filter] = Array.empty
  private def allFilters: Array[Filter] = advisory ++ runtime

  override def filterAttributes(): Array[NamedReference] = {
    val bucketKeys = if (relation.numBuckets.isDefined) relation.keys else Nil
    (bucketKeys ++ relation.partitionCols).distinct
      // only columns the pruned scan still OUTPUTS: Spark resolves
      // these against the scan relation's (column-pruned) output and
      // throws on a miss — advertising a projected-away partition
      // column would fail ANY join over the table at planning time,
      // not just skip runtime filtering
      .filter(requiredSchema.fieldNames.contains)
      .map(Expressions.column).toArray
  }

  override def filter(filters: Array[Filter]): Unit = { runtime = filters }

  // -- planning -------------------------------------------------------------

  // memoized per filter state: planInputPartitions, outputPartitioning
  // and estimateStatistics all consult the survivor set, and each
  // survivingFiles walk re-lists files and re-parses stats
  @volatile private var survivorsCache: (Array[Filter], Seq[java.nio.file.Path]) = _
  private def survivors: Seq[java.nio.file.Path] = {
    val key = allFilters
    val cached = survivorsCache
    if (cached != null && (cached._1 sameElements key)) cached._2
    else {
      val v = relation.survivingFilesBatch(key).map(_._1).getOrElse(Seq.empty)
      survivorsCache = (key, v)
      v
    }
  }

  private val bucketPat = "_graft_bucket=(\\d+)".r
  private def bucketOf(p: java.nio.file.Path): Option[Int] =
    bucketPat.findFirstMatchIn(p.toString).map(_.group(1).toInt)

  private def whole(p: java.nio.file.Path): GraftFileSlice = {
    val f = p.toFile
    GraftFileSlice(p.toString, 0L, f.length(), f.length(), f.lastModified(), maskOf(p))
  }

  /** The typed partition tuple parsed from a file's `_graft_p_…` path
    * segments — None when any declared column's segment is missing.
    * Types mirror the write gate (string/integral/boolean only);
    * `__HIVE_DEFAULT_PARTITION__` is the null partition.
    */
  private def partitionTuple(p: java.nio.file.Path): Option[Seq[Any]] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    import org.apache.spark.sql.types._
    val path = p.toString
    val vals = relation.partitionCols.map { c =>
      s"_graft_p_${java.util.regex.Pattern.quote(c)}=([^/]+)".r
        .findFirstMatchIn(path).map { m =>
          val raw = ExternalCatalogUtils.unescapePathName(m.group(1))
          if (raw == "__HIVE_DEFAULT_PARTITION__") null
          else fullSchema.find(_.name == c).map(_.dataType) match {
            case Some(ByteType) => raw.toByte
            case Some(ShortType) => raw.toShort
            case Some(IntegerType) => raw.toInt
            case Some(LongType) => raw.toLong
            case Some(BooleanType) => raw.toBoolean
            case _ => raw // string partition columns
          }
        }
    }
    if (vals.exists(_.isEmpty)) None else Some(vals.map(_.orNull))
  }

  /** Split survivors at row-group-friendly byte ranges and bin-pack
    * the slices (Spark's own maxPartitionBytes/openCostInBytes
    * policy) — a handful of giant unbucketed files still fan out
    * across the cluster, and thousands of small ones do not become
    * thousands of tasks.
    */
  private def packed(fs: Seq[java.nio.file.Path]): Array[InputPartition] = {
    val conf = spark.sessionState.conf
    val openCost = conf.filesOpenCostInBytes
    val totalBytes = fs.map(_.toFile.length() + openCost).sum
    val maxSplit = math.max(openCost, math.min(conf.filesMaxPartitionBytes,
      totalBytes / math.max(1, spark.sparkContext.defaultParallelism)))
    val slices = fs.flatMap { p =>
      val f = p.toFile
      val (len, mod) = (f.length(), f.lastModified())
      val m = maskOf(p)
      // a MASKED file ships as ONE whole slice: byte-range splitting
      // would duplicate its mask array into every slice (driver memory
      // and task serialization scale with slices × mask), and masked
      // files are the recently-written minority of a dv snapshot
      if (m.nonEmpty)
        Seq(GraftFileSlice(p.toString, 0L, len, len, mod, m))
      else
        (0L until math.max(len, 1L) by maxSplit).map(off =>
          GraftFileSlice(p.toString, off, math.min(maxSplit, len - off), len, mod))
    }.sortBy(-_.length)
    val parts = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
    val cur = scala.collection.mutable.ArrayBuffer.empty[GraftFileSlice]
    var curBytes = 0L
    def flush(): Unit = if (cur.nonEmpty) {
      parts += GraftFilePartition(cur.toSeq); cur.clear(); curBytes = 0L
    }
    slices.foreach { s =>
      if (curBytes + s.length + openCost > maxSplit) flush()
      cur += s; curBytes += s.length + openCost
    }
    flush()
    parts.toArray
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val fs = survivors
    relation.numBuckets match {
      case Some(n) if fs.forall(p => bucketOf(p).isDefined) =>
        // one keyed partition per bucket id — EVERY id, so two scans of
        // co-bucketed tables report identical partition-key sets and
        // align 1:1; ids a runtime point-lookup filter excludes drop out
        val byBucket = fs.groupBy(p => bucketOf(p).get)
        val allowed = relation.pointBuckets(allFilters)
        (0 until n)
          .filter(b => allowed.forall(_.contains(b.toLong)))
          // path order: a sorted bucket's rolled files (…-c000, -c001)
          // must concatenate in roll order for the reported
          // per-partition ordering to hold
          .map(b => GraftBucketPartition(
            byBucket.getOrElse(b, Seq.empty).sortBy(_.toString).map(whole), b): InputPartition)
          .toArray
      case None if relation.partitionCols.nonEmpty &&
          fs.forall(p => partitionTuple(p).isDefined) =>
        // one keyed partition per partition VALUE tuple (files of one
        // leaf dir), so identity-partitioned tables storage-partition-
        // join on their partition columns
        fs.groupBy(p => partitionTuple(p).get).toSeq
          .sortBy(_._1.map(String.valueOf(_)).mkString("/"))
          .map { case (tuple, files) =>
            GraftValuePartition(files.map(whole), tuple): InputPartition
          }.toArray
      case _ => packed(fs)
    }
  }

  // hidden (derived) partition columns are not in the scan output — a
  // KeyGroupedPartitioning over them could never resolve, so derived
  // layouts report unknown. Read once per scan, not per planner call.
  private lazy val noDerivedPartitions: Boolean =
    graft.cdc.MergeTable.readMeta(relation.path)
      .forall(_.derivedPartitions.isEmpty)

  override def outputPartitioning(): Partitioning = relation.numBuckets match {
    case Some(n) if survivors.forall(p => bucketOf(p).isDefined) =>
      new KeyGroupedPartitioning(
        Array(Expressions.bucket(n, relation.keys: _*)), n)
    case None if relation.partitionCols.nonEmpty && noDerivedPartitions &&
        survivors.forall(p => partitionTuple(p).isDefined) =>
      val parts = survivors.flatMap(partitionTuple).distinct.size
      new KeyGroupedPartitioning(
        relation.partitionCols.map(Expressions.identity).toArray,
        math.max(parts, 1))
    case _ => new UnknownPartitioning(survivors.size)
  }

  /** Per-partition ordering (`SupportsReportOrdering`), reported ONLY
    * when the pinned snapshot is a current `sortBuckets` rewrite on a
    * plain bucketed layout: each scan partition is one bucket whose
    * file(s) were written as a single sorted run, so rows arrive
    * sorted by the recorded columns. Combined with the bucket-keyed
    * [[outputPartitioning]], a join of two co-bucketed sorted tables
    * plans as a sort-merge join with NEITHER a shuffle NOR a sort.
    * Any commit after the sorting rewrite drops the manifest's sort
    * marker, so a stale claim cannot outlive its snapshot; dv-masked
    * reads never carry the marker (the mask's own commit clears it).
    */
  override def outputOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.SortDirection
    if (relation.sortedBy.nonEmpty && relation.numBuckets.isDefined &&
        relation.partitionCols.isEmpty) {
      // only columns the PRUNED scan actually outputs: Spark resolves
      // these against readSchema() and THROWS on a miss (verified in
      // V2ExpressionUtils.toCatalystOrdering — no fallback), so a
      // projection that drops a sort column must shrink the claim.
      // Rows sorted by (a, b) are sorted by the PREFIX (a) — the claim
      // stays truthful up to the first pruned column and stops there.
      relation.sortedBy
        .takeWhile(requiredSchema.fieldNames.contains)
        .map(c => Expressions.sort(Expressions.column(c), SortDirection.ASCENDING))
        .toArray
    } else Array.empty
  }

  override def estimateStatistics(): Statistics = {
    // post-pruning bytes (manifest-scale driver stat walk), scaled by
    // the same compression factor Spark applies to its own parquet
    // relations — so a pruned mergetable side still auto-broadcasts
    val bytes = (survivors.map(p => p.toFile.length()).sum *
      spark.sessionState.conf.fileCompressionFactor).toLong
    // exact row count from footer stats on the unfiltered scan (the
    // same metadata the agg pushdown folds); filtered scans keep it
    // unknown — a post-filter row estimate would be a guess — and dv
    // snapshots too (the mask removes an unknowable-without-join
    // number of the footer-counted rows)
    val rows =
      if (allFilters.isEmpty && !dv)
        relation.aggregatable.map(ms => ms.map(_.rows).sum)
      else None
    // ANALYZE-computed column stats (ndv/nulls/lengths) ride along for
    // CBO join reordering and selectivity under spark.sql.cbo.enabled —
    // served only on the unfiltered scan (post-filter per-column stats
    // would be guesses, same rule as numRows)
    val colStats: java.util.Map[org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
      val m = new java.util.HashMap[org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
      if (allFilters.isEmpty && !dv) {
        relation.tableColumnStats.foreach { case (c, s) =>
          if (fullSchema.fieldNames.contains(c))
            m.put(Expressions.column(c),
              new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
                override def distinctCount(): OptionalLong = OptionalLong.of(s.ndv)
                override def nullCount(): OptionalLong = OptionalLong.of(s.nullCount)
                override def avgLen(): OptionalLong = OptionalLong.of(s.avgLen)
                override def maxLen(): OptionalLong = OptionalLong.of(s.maxLen)
              })
        }
      }
      m
    }
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(math.max(bytes, 1L))
      override def numRows(): OptionalLong =
        rows.map(OptionalLong.of).getOrElse(OptionalLong.empty())
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = colStats
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fmt = new ParquetFileFormat()
    // columnar unless a CLAIMED filter needs the row-mode exactness
    // predicate (residual data filters are re-applied by the engine
    // above the scan, so they never force row mode), or a SURVIVING
    // file carries a dv mask. Spark refuses mixed row/columnar
    // partitions in one scan, so the choice is global — but it is
    // judged on the post-pruning survivor set, not the snapshot: a dv
    // read whose filters pruned away every masked file (or a
    // dv-table scan right after compaction cleared the masks) keeps
    // full vectorized batches.
    val anyMaskSurvives = dv && survivors.exists(p => maskOf(p).nonEmpty)
    // the lineage column appends per row, so `_graft_file` queries run
    // row-mode — a diagnostic shape, not the hot path
    val columnar = claimed.isEmpty && !anyMaskSurvives && !wantFile &&
      fmt.supportBatch(spark, requiredSchema)
    // columnar reads never need the row-index column (no mask to
    // apply), so they read exactly the required schema
    val schemaToRead = if (columnar) requiredSchema else readDataSchema
    val readFunc = fmt.buildReaderWithPartitionValues(
      sparkSession = spark,
      dataSchema = fullSchema,
      partitionSchema = StructType(Nil),
      requiredSchema = schemaToRead,
      filters = advisory.toSeq, // parquet row-group/page skipping (best-effort)
      options = Map(FileFormat.OPTION_RETURNING_BATCH -> columnar.toString),
      hadoopConf = spark.sessionState.newHadoopConfWithOptions(Map.empty))
    // the generated row index is the LAST read column when dv masks
    // apply in row mode; -1 disables mask filtering
    val rowIdxOrdinal = if (dv && !columnar) readDataSchema.length - 1 else -1
    new GraftReaderFactory(readFunc, columnar, claimed,
      schemaToRead, requiredSchema.length, rowIdxOrdinal, wantFile)
  }
}

private[sources] object MergeTableBatchScan {
  /** Driver-side check that every claimed filter can be re-evaluated
    * row-level on the executors — a filter without a row form must
    * take the V1 path (which enforces via the inner DataFrame).
    */
  def rowFormExists(filters: Array[Filter], schema: StructType): Boolean = {
    def toRef(name: String) = schema.fields.zipWithIndex.collectFirst {
      case (f, i) if f.name == name => BoundReference(i, f.dataType, f.nullable)
    }
    filters.forall(f => StructFilters.filterToExpression(f, toRef).isDefined)
  }
}

/** Executor-side reader: replays the driver-built parquet read
  * function per file, applies the file's deletion-vector mask (a
  * binary search of the slice-shipped sorted positions against the
  * reader-generated row index), enforces claimed filters exactly with
  * a compiled catalyst predicate, and projects filter-only and
  * row-index columns back out. Columnar batches pass through
  * untouched (filter-free COW scans).
  */
private[sources] class GraftReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    columnar: Boolean,
    filters: Array[Filter],
    readSchema: StructType,
    outputLen: Int,
    rowIdxOrdinal: Int = -1,
    wantFile: Boolean = false) extends PartitionReaderFactory {

  private def filesOf(p: InputPartition): Seq[GraftFileSlice] = p match {
    case GraftFilePartition(fs) => fs
    case GraftBucketPartition(fs, _) => fs
    case GraftValuePartition(fs, _) => fs
    case other => throw new IllegalStateException(s"unexpected partition $other")
  }

  private def partitionedFile(f: GraftFileSlice): PartitionedFile =
    PartitionedFile(InternalRow.empty, SparkPath.fromPathString(f.path),
      f.start, f.length, Array.empty, f.modTime, f.fileSize, Map.empty)

  override def supportColumnarReads(partition: InputPartition): Boolean = columnar

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val pred = if (filters.isEmpty) None else {
      def toRef(name: String) =
        readSchema.fields.zipWithIndex.collectFirst {
          case (f, i) if f.name == name => BoundReference(i, f.dataType, f.nullable)
        }
      val exprs = filters.toSeq.map(f =>
        StructFilters.filterToExpression(f, toRef).getOrElse(
          throw new IllegalStateException(
            s"claimed filter $f has no row-level form — ScanBuilder bug")))
      val pr = CatPredicate.create(exprs.reduce(CatAnd(_, _)))
      pr.initialize(0)
      Some(pr)
    }
    val dataRefs = readSchema.fields.take(outputLen).zipWithIndex
      .map { case (f, i) =>
        BoundReference(i, f.dataType, f.nullable): org.apache.spark.sql.catalyst.expressions.Expression
      }.toSeq
    val out = filesOf(p).iterator.flatMap { f =>
      var rows = readFunc(partitionedFile(f))
      if (rowIdxOrdinal >= 0 && f.masked.nonEmpty)
        rows = rows.filter(r =>
          java.util.Arrays.binarySearch(f.masked, r.getLong(rowIdxOrdinal)) < 0)
      pred.foreach(pr => rows = rows.filter(pr.eval))
      if (wantFile) {
        // per-file projection: the lineage column is a CONSTANT for
        // every row of this slice — a literal in the projection, no
        // per-row string work
        val proj = UnsafeProjection.create(dataRefs :+
          org.apache.spark.sql.catalyst.expressions.Literal(
            org.apache.spark.unsafe.types.UTF8String.fromString(f.path),
            org.apache.spark.sql.types.StringType))
        rows.map(proj)
      } else if (outputLen == readSchema.length) rows
      else {
        val proj = UnsafeProjection.create(dataRefs)
        rows.map(proj)
      }
    }
    iteratorReader(out)
  }

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] = {
    require(columnar, "columnar read requested on a row-mode scan")
    // the vectorized parquet reader yields ColumnarBatch through the
    // InternalRow-typed iterator when returning_batch is set — the
    // same cast Spark's own FileSourceScanExec relies on
    val it = filesOf(p).iterator.flatMap(f =>
      readFunc(partitionedFile(f)).asInstanceOf[Iterator[ColumnarBatch]])
    iteratorReader(it)
  }

  private def iteratorReader[T](it: Iterator[T]): PartitionReader[T] =
    new PartitionReader[T] {
      private var current: T = _
      override def next(): Boolean =
        if (it.hasNext) { current = it.next(); true } else false
      override def get(): T = current
      override def close(): Unit = ()
    }
}
