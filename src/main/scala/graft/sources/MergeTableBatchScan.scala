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

/** The extra partition an UNBUCKETED, UNPARTITIONED MOR scan plans to
  * carry the reconciled delta winners (bucketed scans route winners
  * into their bucket's keyed partition; value-partitioned scans into
  * their partition tuple's keyed split — both preserving SPJ
  * alignment). Holds no files — the reader emits the broadcast winner
  * rows.
  */
private[sources] case object GraftMorWinnersPartition extends InputPartition

/** The broadcast delta layer of a Batch-MOR scan: the reconciled
  * latest-per-key delta rows (already projected to the scan's read
  * schema; tombstones excluded) tagged with their hash-bucket id (-1
  * when unbucketed), plus the EXACT key identities every delta
  * mentions — a base row whose key is in `superseded` lost to a newer
  * delta row (or tombstone) and is dropped executor-side. On a
  * value-partitioned layout (`pvRouted`), `winnerTuples(i)` is winner
  * i's TRUE partition tuple — derived from the row exactly like the
  * write side routes it — so each winner rides its tuple's keyed
  * split and the scan keeps its storage-partition-join claim between
  * compactions.
  */
private[sources] case class GraftMorLayer(winners: Array[(Int, InternalRow)],
    superseded: Set[AnyRef],
    winnerTuples: Array[Seq[Any]] = Array.empty,
    pvRouted: Boolean = false)

/** Exact key identity for the Batch-MOR supersede set, shared by the
  * driver (building from collected delta rows) and executors (probing
  * with base-scan rows): the boxed catalyst value for single-column
  * keys, an element-wise Seq for composites. Identity semantics match
  * the V1 reconcile's groupBy: null groups with null (a sentinel, not
  * SQL null), and -0.0 normalizes to 0.0 / NaNs canonicalize like
  * Spark's grouping keys.
  */
private[sources] object MorKeys {
  case object NullKey

  def keyOf(r: InternalRow, ordinals: Array[Int],
      types: Array[org.apache.spark.sql.types.DataType]): AnyRef = {
    def v(i: Int): AnyRef =
      if (r.isNullAt(ordinals(i))) NullKey
      else r.get(ordinals(i), types(i)) match {
        // grouping-key normalization (SPARK-26021): boxed Float/Double
        // equals() distinguishes -0.0 from 0.0; Spark's groupBy does not
        case f: java.lang.Float if f.floatValue() == 0.0f => Float.box(0.0f)
        case d: java.lang.Double if d.doubleValue() == 0.0d => Double.box(0.0d)
        case other => other.asInstanceOf[AnyRef]
      }
    if (ordinals.length == 1) v(0)
    else Seq.tabulate(ordinals.length)(v)
  }

  /** The write-side bucket id of a row's key tuple — seed-chained
    * null-skipping xxhash64, byte-identical to `MergeTable.bucketExpr`
    * and [[GraftBucketBound.produceResult]].
    */
  def bucketOf(r: InternalRow, n: Int, ordinals: Array[Int],
      types: Array[org.apache.spark.sql.types.DataType]): Int = {
    var h = 42L
    var i = 0
    while (i < ordinals.length) {
      if (!r.isNullAt(ordinals(i)))
        h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(r.get(ordinals(i), types(i)), types(i), h)
      i += 1
    }
    (((h % n) + n) % n).toInt
  }
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
  // MOR snapshots (mutually exclusive with dv) reconcile the
  // broadcast delta layer by KEY, so the key columns ride along like
  // filterRefs and the output projection drops them
  private val mor = relation.isMorSnapshot
  private val keyRefs: Seq[String] =
    if (!mor) Nil
    // keys are stored under their original names; the ride-along
    // columns must join the read schema under their LOGICAL names
    // (identity when no mapping is active)
    else relation.keys.map(relation.logicalName).filterNot(k =>
      requiredSchema.fieldNames.contains(k) || filterRefs.contains(k))
  private val readDataSchema = {
    val base = requiredSchema.fields ++ (filterRefs ++ keyRefs).map(fullSchema(_))
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
  // every file-facing consumer (pruning, stats, blooms, bucket math,
  // parquet row-group hints) speaks PHYSICAL names; the engine-facing
  // filters above stay logical
  private def physFilters: Array[Filter] =
    allFilters.map(relation.toPhysicalFilter)

  override def filterAttributes(): Array[NamedReference] = {
    val bucketKeys = if (relation.numBuckets.isDefined) relation.keys else Nil
    (bucketKeys ++ relation.partitionCols).distinct
      .map(relation.logicalName) // engine-facing: the scan output's names
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
  @volatile private var survivorsCache: (Array[Filter], (Seq[java.nio.file.Path], Int)) = _
  private def survivorsWithTotal: (Seq[java.nio.file.Path], Int) = {
    val key = allFilters
    val cached = survivorsCache
    if (cached != null && (cached._1 sameElements key)) cached._2
    else {
      val v = relation.survivingFilesBatch(physFilters).getOrElse((Seq.empty, 0))
      survivorsCache = (key, v)
      v
    }
  }
  private def survivors: Seq[java.nio.file.Path] = survivorsWithTotal._1

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
  /** The declared type of one partition column as the SCAN OUTPUT
    * sees it — partition columns are stored under physical names
    * (dirs never rename), the schema is logical, so the lookup maps
    * through the relation's column mapping (identity when none).
    * None for derived (hidden) columns, whose tuple value is always
    * the granule STRING.
    */
  private def partitionColType(c: String): Option[org.apache.spark.sql.types.DataType] =
    fullSchema.find(_.name == relation.logicalName(c)).map(_.dataType)

  private def partitionTuple(p: java.nio.file.Path): Option[Seq[Any]] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    import org.apache.spark.sql.types._
    val path = p.toString
    val vals = relation.partitionCols.map { c =>
      s"_graft_p_${java.util.regex.Pattern.quote(c)}=([^/]+)".r
        .findFirstMatchIn(path).map { m =>
          val raw = ExternalCatalogUtils.unescapePathName(m.group(1))
          if (raw == "__HIVE_DEFAULT_PARTITION__") null
          else partitionColType(c) match {
            case Some(ByteType) => raw.toByte
            case Some(ShortType) => raw.toShort
            case Some(IntegerType) => raw.toInt
            case Some(LongType) => raw.toLong
            case Some(BooleanType) => raw.toBoolean
            case _ => raw // string and derived (granule) partition columns
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
        val allowed = relation.pointBuckets(physFilters)
        (0 until n)
          .filter(b => allowed.forall(_.contains(b.toLong)))
          // path order: a sorted bucket's rolled files (…-c000, -c001)
          // must concatenate in roll order for the reported
          // per-partition ordering to hold
          .map(b => GraftBucketPartition(
            byBucket.getOrElse(b, Seq.empty).sortBy(_.toString).map(whole), b): InputPartition)
          .toArray
      case None if relation.partitionCols.nonEmpty &&
          fs.forall(p => partitionTuple(p).isDefined) &&
          (!mor || morWinnerTuples.isDefined) =>
        // one keyed partition per partition VALUE tuple (files of one
        // leaf dir), so identity-partitioned tables storage-partition-
        // join on their partition columns. MOR snapshots join in (r14):
        // each broadcast delta winner rides its TRUE partition tuple's
        // keyed split — a winner whose partition value has no base dir
        // gets a file-less split of its own, so the reported key set
        // covers every emitted row and SPJ holds between compactions.
        val byTuple = fs.groupBy(p => partitionTuple(p).get)
        (byTuple.keys.toSeq ++ morWinnerTuples.getOrElse(Nil)).distinct
          .sortBy(_.map(String.valueOf(_)).mkString("/"))
          .map { tuple =>
            GraftValuePartition(
              byTuple.getOrElse(tuple, Seq.empty).map(whole), tuple): InputPartition
          }.toArray
      case _ =>
        val base = packed(fs)
        // the reconciled delta winners of an unbucketed MOR scan need a
        // home even when every base file was pruned away
        if (mor) base :+ (GraftMorWinnersPartition: InputPartition) else base
    }
  }

  // hidden (derived) partition columns are dir-layout artifacts, not
  // scan output — their KeyGroupedPartitioning expression is the
  // TRANSFORM over the (visible) SOURCE column instead: days(ts) /
  // months(ts), resolved against the catalog's FunctionCatalog
  // exactly like the bucket transform, so two day-partitioned tables
  // storage-partition-join on the timestamp. Read once per scan, not
  // per planner call.
  private lazy val derivedPartitionsMap: Map[String, String] =
    graft.cdc.MergeTable.readMeta(relation.path)
      .map(_.derivedPartitions).getOrElse(Map.empty)

  /** The partition-key expression of one declared partition column:
    * identity for value partitioning; the granule transform over the
    * source column for hidden day/month partitioning (the partition
    * VALUE stays the granule string the dir carries — byte-identical
    * to what [[GraftGranuleBound]] produces from the source). ONE
    * dispatch rule shared with the write paths' distributions.
    */
  private def partitionExpr(c: String): org.apache.spark.sql.connector.expressions.Transform =
    GraftGranule.transformOf(
      // transform args resolve against the scan output: logical names
      derivedPartitionsMap.map { case (d, src) => d -> relation.logicalName(src) },
      relation.logicalName(c))

  override def outputPartitioning(): Partitioning = relation.numBuckets match {
    case Some(n) if survivors.forall(p => bucketOf(p).isDefined) =>
      // reported expressions resolve against the scan OUTPUT — under
      // an active column mapping that means LOGICAL names
      new KeyGroupedPartitioning(
        Array(Expressions.bucket(n, relation.keys.map(relation.logicalName): _*)), n)
    case None if relation.partitionCols.nonEmpty &&
        survivors.forall(p => partitionTuple(p).isDefined) &&
        (!mor || morWinnerTuples.isDefined) =>
      // partition count = base-file tuples ∪ delta-winner tuples —
      // must equal planInputPartitions' split count exactly
      val parts = (survivors.flatMap(partitionTuple) ++
        morWinnerTuples.getOrElse(Nil)).distinct.size
      new KeyGroupedPartitioning(
        relation.partitionCols.map(partitionExpr).toArray,
        math.max(parts, 1))
    case _ =>
      new UnknownPartitioning(survivors.size + (if (mor) 1 else 0))
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
    // composed (partition × bucket) sorted tables: each CELL is one
    // sorted run, but a bucket's scan partition CONCATENATES its cells
    // across partition values — the claim is truthful exactly when
    // pruning left at most ONE cell (partition leaf) per surviving
    // bucket, the day-filtered join shape. Later runtime filters only
    // remove files, so a made claim cannot become false.
    lazy val onePerBucket = {
      val leafPat = "((?:_graft_p_[^/]+/)+)".r
      def leafOf(p: java.nio.file.Path): String =
        leafPat.findFirstMatchIn(p.toString).map(_.group(1)).getOrElse("")
      survivors.forall(p => bucketOf(p).isDefined) &&
        survivors.groupBy(bucketOf).values
          .forall(fs => fs.map(leafOf).distinct.size <= 1)
    }
    if (relation.sortedBy.nonEmpty && relation.numBuckets.isDefined && !mor &&
        (relation.partitionCols.isEmpty || onePerBucket)) {
      // only columns the PRUNED scan actually outputs: Spark resolves
      // these against readSchema() and THROWS on a miss (verified in
      // V2ExpressionUtils.toCatalystOrdering — no fallback), so a
      // projection that drops a sort column must shrink the claim.
      // Rows sorted by (a, b) are sorted by the PREFIX (a) — the claim
      // stays truthful up to the first pruned column and stops there.
      // sort markers record PHYSICAL names; the claim speaks logical.
      relation.sortedBy.map(relation.logicalName)
        .takeWhile(requiredSchema.fieldNames.contains)
        .map(c => Expressions.sort(Expressions.column(c), SortDirection.ASCENDING))
        .toArray
    } else Array.empty
  }

  override def estimateStatistics(): Statistics = {
    // post-pruning bytes (manifest-scale driver stat walk), scaled by
    // the same compression factor Spark applies to its own parquet
    // relations — so a pruned mergetable side still auto-broadcasts;
    // MOR adds its delta bytes (reconciliation only replaces/removes
    // base rows, so base + delta stays a safe upper bound)
    val bytes = ((survivors.map(p => p.toFile.length()).sum +
      (if (mor) relation.morDeltaBytes else 0L)) *
      spark.sessionState.conf.fileCompressionFactor).toLong
    // exact row count from footer stats: advisory (and runtime)
    // filters prune whole FILES but never change a surviving file's
    // output, so the survivors' footer rows are the scan's EXACT
    // output count even on filtered reads — the child cardinality
    // CBO's FilterEstimation needs. Claimed filters DO change the
    // output (enforced row-level), and dv/MOR snapshots change the
    // visible row set by an unknowable-without-join amount — unknown.
    val rows =
      if (claimed.isEmpty && !dv && !mor)
        relation.fileRows.flatMap { m =>
          val per = survivors.map(m.get)
          if (per.forall(_.isDefined)) Some(per.flatten.sum) else None
        }
      else None
    // ANALYZE-computed column stats (ndv/nulls/lengths + histogram)
    // ride along for CBO join reordering and selectivity under
    // spark.sql.cbo.enabled — served only while the scan still reads
    // EVERY file: once pruning drops files, whole-table nullCount/ndv
    // would contradict the post-pruning numRows (nullCount > rowCount
    // feeds FilterEstimation garbage), so a pruned scan keeps its
    // exact row count and drops the per-column claims
    val colStats: java.util.Map[org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
      val m = new java.util.HashMap[org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
      if (claimed.isEmpty && !dv && !mor &&
          survivorsWithTotal._1.size == survivorsWithTotal._2) {
        relation.tableColumnStats.foreach { case (c, s) =>
          if (fullSchema.fieldNames.contains(c)) {
            // the ANALYZE-computed equi-height histogram rides along —
            // Spark's transformV2Stats maps it into the catalyst
            // ColumnStat, where FilterEstimation's selectivity math
            // (the skew signal) consumes it under spark.sql.cbo.enabled
            val hist: java.util.Optional[org.apache.spark.sql.connector.read.colstats.Histogram] =
              s.hist match {
                case Some(h) => java.util.Optional.of(
                  new org.apache.spark.sql.connector.read.colstats.Histogram {
                    override def height(): Double = h.height
                    override def bins(): Array[org.apache.spark.sql.connector.read.colstats.HistogramBin] =
                      h.bins.map { b =>
                        new org.apache.spark.sql.connector.read.colstats.HistogramBin {
                          override def lo(): Double = b.lo
                          override def hi(): Double = b.hi
                          override def ndv(): Long = b.ndv
                        }
                      }.toArray
                  })
                case None => java.util.Optional.empty()
              }
            // exact numeric bounds, re-typed to the column (CBO's value
            // interval wants the attribute's own type, not a double)
            def typed(v: Double): Object = {
              import org.apache.spark.sql.types._
              fullSchema(c).dataType match {
                case ByteType => Byte.box(v.toByte)
                case ShortType => Short.box(v.toShort)
                case IntegerType => Int.box(v.toInt)
                case LongType => Long.box(v.toLong)
                case FloatType => Float.box(v.toFloat)
                case DoubleType => Double.box(v)
                case _ => null
              }
            }
            def bound(v: Option[Double]): java.util.Optional[Object] =
              v.map(typed).filter(_ != null)
                .map(java.util.Optional.of[Object])
                .getOrElse(java.util.Optional.empty[Object]())
            m.put(Expressions.column(c),
              new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
                override def distinctCount(): OptionalLong = OptionalLong.of(s.ndv)
                override def min(): java.util.Optional[Object] = bound(s.min)
                override def max(): java.util.Optional[Object] = bound(s.max)
                override def nullCount(): OptionalLong = OptionalLong.of(s.nullCount)
                override def avgLen(): OptionalLong = OptionalLong.of(s.avgLen)
                override def maxLen(): OptionalLong = OptionalLong.of(s.maxLen)
                override def histogram(): java.util.Optional[
                    org.apache.spark.sql.connector.read.colstats.Histogram] = hist
              })
          }
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

  /** The broadcast delta layer of a MOR scan, built ONCE per scan at
    * reader-factory time: the reconciled latest-per-key delta rows
    * projected to the read schema (missing columns backfilled as
    * typed nulls — the read-side half of schema evolution, same rule
    * as the base files' null fill), split into winners (non-tombstone
    * rows, tagged with their write-side bucket id) and the exact
    * superseded-key set. Driver-resident and size-gated by
    * `batchReadableMor` via delta footer stats before this path is
    * ever chosen.
    */
  private lazy val morLayer: Option[(org.apache.spark.broadcast.Broadcast[GraftMorLayer],
      Array[Int], Array[org.apache.spark.sql.types.DataType])] =
    if (!mor) None
    else {
      import org.apache.spark.sql.functions.{col, date_format, lit, to_date}
      import org.apache.spark.sql.types.StringType
      val latest = relation.morDeltaLatest
      val tombCol = "_graft_mor_tomb"
      // value-partitioned layouts route each winner into its partition
      // tuple's keyed split (pvRouted): derive the TRUE partition value
      // per delta row, exactly like the write side routes rows —
      // identity column value as its declared type; the granule string
      // for hidden day/month layouts (reuse the already-derived column
      // when the delta files carry it). A failed derivation falls back
      // to the unrouted (packed) shape rather than failing the read.
      // identity tuple values must round-trip the same JVM types the
      // file-path parse produces — anything else (a date-typed
      // partition col, should the write gate ever admit one) would
      // mis-align winner tuples against file tuples, so it refuses
      // routing instead. Types resolve LOGICAL-side like the file
      // parse itself (partitionColType) — renamed partition columns
      // keep their declared type, never fall to the string branch.
      val pvTypesOk = relation.partitionCols.forall { c =>
        derivedPartitionsMap.contains(c) ||
          partitionColType(c).exists {
            case org.apache.spark.sql.types.ByteType |
                 org.apache.spark.sql.types.ShortType |
                 org.apache.spark.sql.types.IntegerType |
                 org.apache.spark.sql.types.LongType |
                 org.apache.spark.sql.types.BooleanType | StringType => true
            case _ => false
          }
      }
      val pvRouted = relation.numBuckets.isEmpty &&
        relation.partitionCols.nonEmpty && pvTypesOk
      val tupleTypes: Seq[org.apache.spark.sql.types.DataType] =
        relation.partitionCols.map { c =>
          if (derivedPartitionsMap.contains(c)) StringType
          else partitionColType(c).getOrElse(StringType)
        }
      // every branch below is total by construction (column-presence
      // checks, typed nulls) — there is no failure mode to fall back
      // from: a delete-only delta layer carries neither the derived
      // nor the source column, and its rows are all tombstones (never
      // winners), so a typed null keeps the projection resolvable.
      // Delta files speak PHYSICAL names.
      val tupleCols: Seq[org.apache.spark.sql.Column] =
        if (!pvRouted) Nil
        else {
          val cols = latest.columns.toSeq
          relation.partitionCols.zipWithIndex.map { case (c, i) =>
            val e = derivedPartitionsMap.get(c) match {
              case Some(_) if cols.contains(c) => col(c).cast(StringType)
              case Some(src) if !cols.contains(src) => lit(null).cast(StringType)
              // the ONE shared derivation rule (write-side withDerived
              // calls the same helper — the two can never diverge)
              case Some(src) => graft.cdc.MergeTable.derivedColumn(c, col(src))
              case None => // identity: c IS the stored (physical) name
                if (cols.contains(c)) col(c).cast(tupleTypes(i))
                else lit(null).cast(tupleTypes(i))
            }
            e.as(s"_graft_pt_$i")
          }
        }
      val selected = latest.select(
        ((readDataSchema.fields.map { f =>
          // cast even present columns: a delta-only union can resolve a
          // column narrower than the full snapshot schema (unionByName
          // coercion), and the collected rows must lay out EXACTLY as
          // readDataSchema declares. Delta files speak PHYSICAL names
          // (column mapping) — look up physical, surface logical.
          val pn = relation.physicalName(f.name)
          if (latest.columns.contains(pn)) col(pn).cast(f.dataType).as(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        } :+ col(graft.cdc.MergeTable.TombstoneColName)
          .cast(org.apache.spark.sql.types.BooleanType).as(tombCol))
          ++ tupleCols).toIndexedSeq: _*)
      // one bounded collect (≤ broadcastKeyLimit rows by the gate);
      // rows are copied — toRdd iterators reuse row buffers
      val collected = selected.queryExecution.toRdd.map(_.copy()).collect()
      // keys are stored under their ORIGINAL names — resolve through
      // the mapping (identity when none) like every other key site
      val keyOrdinals = relation.keys.map { k =>
        val ln = relation.logicalName(k)
        val i = readDataSchema.fields.indexWhere(_.name.equalsIgnoreCase(ln))
        require(i >= 0, s"MOR key column $k missing from the read schema")
        i
      }.toArray
      val keyTypes = keyOrdinals.map(readDataSchema.fields(_).dataType)
      val tombOrd = readDataSchema.length
      // JVM-comparable tuple values matching partitionTuple's file parse
      def tupleOf(r: InternalRow): Seq[Any] =
        relation.partitionCols.indices.map { i =>
          val ord = tombOrd + 1 + i
          if (r.isNullAt(ord)) null
          else r.get(ord, tupleTypes(i)) match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case v => v
          }
        }
      val strip = UnsafeProjection.create(
        readDataSchema.fields.zipWithIndex.map { case (f, i) =>
          BoundReference(i, f.dataType, f.nullable)
            : org.apache.spark.sql.catalyst.expressions.Expression
        }.toIndexedSeq)
      val winnerRows = collected.filter(r => !r.getBoolean(tombOrd))
      val winners = winnerRows.map { r =>
        val row = strip(r).copy(): InternalRow
        val bucket = relation.numBuckets
          .map(n => MorKeys.bucketOf(row, n, keyOrdinals, keyTypes))
          .getOrElse(-1)
        (bucket, row)
      }
      val winnerTuples: Array[Seq[Any]] =
        if (pvRouted) winnerRows.map(tupleOf) else Array.empty
      // EVERY delta key supersedes its base row — tombstoned keys too
      val superseded: Set[AnyRef] =
        collected.iterator.map(MorKeys.keyOf(_, keyOrdinals, keyTypes)).toSet
      Some((spark.sparkContext.broadcast(
        GraftMorLayer(winners, superseded, winnerTuples, pvRouted)),
        keyOrdinals, keyTypes))
    }

  /** The distinct partition tuples of the reconciled delta winners —
    * defined exactly when this MOR scan can route winners into keyed
    * value partitions (unbucketed pv layout, derivation succeeded).
    */
  private def morWinnerTuples: Option[Seq[Seq[Any]]] =
    morLayer.collect { case (bc, _, _) if bc.value.pvRouted =>
      bc.value.winnerTuples.toSeq.distinct }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fmt = new ParquetFileFormat()
    // columnar unless a CLAIMED filter needs the row-mode exactness
    // predicate (residual data filters are re-applied by the engine
    // above the scan, so they never force row mode) or a SURVIVING
    // file carries a dv mask. Spark refuses mixed row/columnar
    // partitions in one scan, so the choice is global — but it is
    // judged on the post-pruning survivor set, not the snapshot: a dv
    // read whose filters pruned away every masked file (or a dv-table
    // scan right after compaction cleared the masks) keeps full
    // vectorized batches. MOR snapshots stay columnar too (r14): the
    // superseded-key probe runs per ColumnarBatch (zero-copy
    // passthrough for hit-free batches, survivor compaction
    // otherwise; winners emit as built batches) — provided every read
    // column is a vector-copyable type (nested types take row mode).
    val anyMaskSurvives = dv && survivors.exists(p => maskOf(p).nonEmpty)
    // the lineage column appends per row, so `_graft_file` queries run
    // row-mode — a diagnostic shape, not the hot path
    val columnar = claimed.isEmpty && !anyMaskSurvives && !wantFile &&
      (if (mor) MorColumnar.allSupported(readDataSchema) &&
        fmt.supportBatch(spark, readDataSchema)
       else fmt.supportBatch(spark, requiredSchema))
    // columnar reads never need the row-index column (no mask to
    // apply), so they read exactly the required schema — except
    // columnar MOR, whose supersede probe needs the ride-along key
    // columns and prunes them back out batch-side.
    // PHYSICAL twins under an active column mapping: the files, their
    // footers, and the parquet reader all speak physical names; the
    // positions and types are identical, so the emitted rows line up
    // positionally under the scan's logical output schema with no
    // projection at all (the row-index temp column is unmapped and
    // keeps its reserved name).
    def physical(st: StructType): StructType =
      StructType(st.fields.map(f => f.copy(name = relation.physicalName(f.name))))
    val schemaToRead = physical(if (columnar && !mor) requiredSchema else readDataSchema)
    val readFunc = fmt.buildReaderWithPartitionValues(
      sparkSession = spark,
      dataSchema = physical(fullSchema),
      partitionSchema = StructType(Nil),
      requiredSchema = schemaToRead,
      // parquet row-group/page skipping (best-effort), physical-named
      filters = advisory.toSeq.map(relation.toPhysicalFilter),
      options = Map(FileFormat.OPTION_RETURNING_BATCH -> columnar.toString),
      hadoopConf = spark.sessionState.newHadoopConfWithOptions(Map.empty))
    // the generated row index is the LAST read column when dv masks
    // apply in row mode; -1 disables mask filtering
    val rowIdxOrdinal = if (dv && !columnar) readDataSchema.length - 1 else -1
    val (morBc, morOrds, morTypes) = morLayer match {
      case Some((bc, ords, types)) => (Some(bc), ords, types)
      case None => (None, Array.empty[Int],
        Array.empty[org.apache.spark.sql.types.DataType])
    }
    new GraftReaderFactory(readFunc, columnar,
      claimed.map(relation.toPhysicalFilter), // binds against physical names
      schemaToRead, requiredSchema.length, rowIdxOrdinal, wantFile,
      morBc, morOrds, morTypes)
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
    wantFile: Boolean = false,
    morLayer: Option[org.apache.spark.broadcast.Broadcast[GraftMorLayer]] = None,
    morKeyOrdinals: Array[Int] = Array.empty,
    morKeyTypes: Array[org.apache.spark.sql.types.DataType] = Array.empty)
    extends PartitionReaderFactory {

  private def filesOf(p: InputPartition): Seq[GraftFileSlice] = p match {
    case GraftFilePartition(fs) => fs
    case GraftBucketPartition(fs, _) => fs
    case GraftValuePartition(fs, _) => fs
    case GraftMorWinnersPartition => Seq.empty
    case other => throw new IllegalStateException(s"unexpected partition $other")
  }

  /** The broadcast delta winners THIS partition must emit: its
    * bucket's on a bucket-keyed scan, its partition tuple's on a
    * pv-keyed scan (both preserve SPJ alignment), all of them on the
    * dedicated winners partition of an unkeyed scan.
    */
  private def winnersOf(p: InputPartition): Iterator[InternalRow] =
    morLayer match {
      case Some(bc) => p match {
        case GraftBucketPartition(_, b) =>
          bc.value.winners.iterator.filter(_._1 == b).map(_._2)
        case GraftValuePartition(_, values) if bc.value.pvRouted =>
          val l = bc.value
          l.winners.iterator.zipWithIndex.collect {
            case ((_, r), i) if l.winnerTuples(i) == values => r
          }
        case GraftMorWinnersPartition =>
          bc.value.winners.iterator.map(_._2)
        case _ => Iterator.empty
      }
      case None => Iterator.empty
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
    // exact supersede set: a base row whose key any delta mentions
    // lost to that (newer) delta row — the keyed twin of the dv mask
    val superseded = morLayer.map(_.value.superseded)
    val base = filesOf(p).iterator.flatMap { f =>
      var rows = readFunc(partitionedFile(f))
      if (rowIdxOrdinal >= 0 && f.masked.nonEmpty)
        rows = rows.filter(r =>
          java.util.Arrays.binarySearch(f.masked, r.getLong(rowIdxOrdinal)) < 0)
      superseded.foreach { sup =>
        rows = rows.filter(r =>
          !sup.contains(MorKeys.keyOf(r, morKeyOrdinals, morKeyTypes)))
      }
      if (wantFile) {
        // per-file projection (wantFile never co-occurs with MOR: the
        // table does not advertise `_graft_file` on delta-bearing
        // snapshots): the lineage column is a CONSTANT for every row
        // of this slice — a literal in the projection, no per-row
        // string work. The claimed predicate runs BEFORE this
        // projection (it binds against readSchema ordinals).
        pred.foreach(pr => rows = rows.filter(pr.eval))
        val proj = UnsafeProjection.create(dataRefs :+
          org.apache.spark.sql.catalyst.expressions.Literal(
            org.apache.spark.unsafe.types.UTF8String.fromString(f.path),
            org.apache.spark.sql.types.StringType))
        rows.map(proj)
      } else rows
    }
    // delta winners join the stream AFTER the per-file stages (no
    // mask, no supersede — they ARE the latest) but BEFORE the claimed
    // predicate and output projection, which apply to every row
    val all = if (morLayer.isEmpty) base else base ++ winnersOf(p)
    val out =
      if (wantFile) all // predicate + projection already applied per file
      else {
        var rows = all
        pred.foreach(pr => rows = rows.filter(pr.eval))
        if (outputLen == readSchema.length) rows
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
    val base = filesOf(p).iterator.flatMap(f =>
      readFunc(partitionedFile(f)).asInstanceOf[Iterator[ColumnarBatch]])
    val it = morLayer match {
      case None => base
      case Some(bc) =>
        // per-batch supersede probe + batch-side key-column pruning,
        // then this partition's delta winners as built batches
        val outTypes = readSchema.fields.take(outputLen).map(_.dataType)
        val sup = bc.value.superseded
        base.map(b => MorColumnar.filterBatch(b, sup, morKeyOrdinals,
          morKeyTypes, outTypes)) ++
          MorColumnar.rowBatches(winnersOf(p), outTypes)
    }
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
