package graft.sources

import graft.cdc.MergeTable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, Filter, PrunedFilteredScan, RelationProvider, StreamSinkProvider, StreamSourceProvider, TableScan}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** Spark data source for MergeTable snapshots:
  * `spark.read.format("mergetable").option("path", root).load()`.
  *
  * Reads resolve the table's atomic manifest pointer once, so a load
  * is a consistent snapshot even while writers commit. Column pruning
  * and filter pushdown are forwarded to the underlying parquet scan
  * (the relation re-applies requested columns/filters on the inner
  * DataFrame, so `PushedFilters` still reach the files). MOR tables
  * reconcile deltas on read exactly like [[MergeTable.read]].
  *
  * The same format name also serves `spark.readStream` — a streaming
  * tail of the table's change feed (see
  * [[MergeTableChangeFeedSource]]): options `path`, `keys` (required),
  * `startingVersion` (default: current latest — new changes only),
  * `maxVersionsPerBatch` (rate limit per micro-batch).
  */
class MergeTableSource extends RelationProvider with DataSourceRegister
    with StreamSourceProvider with StreamSinkProvider {
  override def shortName(): String = "mergetable"

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink =
    MergeTableSink.fromOptions(parameters)

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), MergeTableChangeFeedSource.fromOptions(sqlContext.sparkSession, parameters).schema)

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source =
    MergeTableChangeFeedSource.fromOptions(sqlContext.sparkSession, parameters, metadataPath)

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("mergetable source requires option 'path'"))
    // Delta's CDF batch-read surface: rows changed between two
    // versions with their _change op (and U_pre/U_post pre-images on
    // request) instead of the snapshot
    if (parameters.get("readChangeFeed").exists(_.equalsIgnoreCase("true"))) {
      // timestamp bounds (Delta CDF parity): startingTimestamp = feed
      // INCLUDES the first commit at-or-after it (exclusive start =
      // that version - 1), so a commit landing exactly at the bound is
      // in the feed; every commit at-or-after already passed → empty
      // feed from the latest version. endingTimestamp = feed ends at
      // the latest commit at-or-before it.
      val startV = parameters.get("startingVersion").map(_.toLong)
        .orElse(parameters.get("startingTimestamp").map { ts =>
          val micros = MergeTable.parseTimestampMicros(ts)
          MergeTable.versionAtOrAfterTimestamp(path, micros).map(_ - 1)
            .getOrElse(MergeTable.versionAtTimestamp(path, Long.MaxValue)
              .getOrElse(0L))
        }).getOrElse(0L)
      val endV = parameters.get("endingVersion").map(_.toLong)
        .orElse(parameters.get("endingTimestamp").map { ts =>
          MergeTable.versionAtTimestamp(path,
            MergeTable.parseTimestampMicros(ts)).getOrElse(
            throw new IllegalArgumentException(
              s"mergetable at $path has no commit at or before endingTimestamp=$ts"))
        })
      return new ChangeFeedRelation(sqlContext, path, startV, endV,
        parameters.get("updatePreImages").exists(_.equalsIgnoreCase("true")))
    }
    // the table self-describes via _META.json (written on first
    // commit); explicit options override, absent options fall back to
    // the recorded configuration — NOT to a guessed default, which
    // would silently hand DML/MOR-reconciliation the wrong key
    val meta = MergeTable.readMeta(path)
    val keys = parameters.get("keys").map(_.split(",").map(_.trim).toSeq)
      .orElse(meta.map(_.keys))
    val mode = parameters.get("mode")
      .orElse(meta.map(_.mode)).getOrElse(MergeTable.CopyOnWrite)
    // MOR reads reconcile deltas BY KEY — a guessed key silently
    // collapses rows on the wrong column, so it must be known
    if (mode == MergeTable.MergeOnRead && keys.isEmpty)
      throw new IllegalArgumentException(
        "mergetable source requires option 'keys' when mode=merge-on-read")
    val buckets = parameters.get("buckets").map(_.toInt)
      .orElse(meta.flatMap(_.numBuckets))
    // time travel parity with the catalog's VERSION AS OF / TIMESTAMP
    // AS OF: a timestamp resolves to the latest commit at or before it
    val version = parameters.get("versionAsOf").map(_.toLong)
      .orElse(parameters.get("timestampAsOf").map { ts =>
        val micros = MergeTable.parseTimestampMicros(ts)
        MergeTable.versionAtTimestamp(path, micros).getOrElse(
          throw new IllegalArgumentException(
            s"mergetable at $path has no commit at or before timestampAsOf=$ts"))
      })
    // catalog-created-empty tables record their schema in _META.json;
    // threading it through makes the pre-first-insert read return an
    // empty frame instead of failing schema resolution
    val declared = meta.flatMap(_.schemaJson)
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j).asInstanceOf[StructType])
    new MergeTableRelation(sqlContext, path,
      keys.getOrElse(throw new IllegalArgumentException(
        s"mergetable at $path has no _META.json and no 'keys' option — the key " +
          "columns drive DML and MOR reconciliation and must not be guessed")),
      mode, buckets, version, declared,
      meta.map(_.partitionCols).getOrElse(Nil),
      branch = parameters.get("branch").map { b =>
        require(b == MergeTable.MainBranch ||
            java.nio.file.Files.exists(
              java.nio.file.Paths.get(path, "branches", b, "_FORK")),
          s"no branch '$b' at $path — create it first (createBranch / " +
            "ALTER TABLE ... CREATE BRANCH)")
        b
      }.getOrElse(MergeTable.MainBranch))
  }
}

class MergeTableRelation(
    override val sqlContext: SQLContext,
    val path: String,
    val keys: Seq[String],
    val mode: String,
    val numBuckets: Option[Int] = None,
    val version: Option[Long] = None,
    val declaredSchema: Option[StructType] = None,
    val partitionCols: Seq[String] = Nil,
    val branch: String = MergeTable.MainBranch) extends BaseRelation with PrunedFilteredScan {

  private def spark: SparkSession = sqlContext.sparkSession

  private lazy val table = new MergeTable(spark, path, keys, mode, numBuckets,
    partitionCols = partitionCols, branch = branch)

  // resolve the manifest pointer ONCE per relation: schema, every
  // buildScan, and stats pruning all read the same committed snapshot
  // even while writers commit (or vacuum) concurrently; `version` pins
  // a time-travel read (which skips the stats-pruning fast path)
  private lazy val pinned: (Seq[(String, String)], Seq[String]) =
    if (version.isEmpty && table.exists) table.currentEntriesWithSort()
    else (Nil, Nil)
  private lazy val pinnedEntries: Seq[(String, String)] = pinned._1

  /** ANALYZE-computed per-column statistics (ndv/nulls/lengths), for
    * the batch scan's `columnStats()` — absent until `ANALYZE TABLE …
    * COMPUTE STATISTICS` runs; like every engine's ANALYZE they are
    * estimates that survive later writes.
    */
  private[sources] lazy val tableColumnStats: Map[String, MergeTable.ColumnStats] =
    if (version.isEmpty) table.tableStats().map(_.cols).getOrElse(Map.empty)
    else Map.empty

  /** The pinned snapshot's within-bucket sort columns (empty unless
    * the CURRENT manifest is a `sortBuckets` rewrite) — read from the
    * same manifest resolution as [[pinnedEntries]], so the batch
    * scan's ordering report can never outlive the snapshot it
    * describes.
    */
  private[sources] def sortedBy: Seq[String] = pinned._2

  private lazy val renameMap: Map[String, String] =
    MergeTable.readMeta(path).map(_.renames).getOrElse(Map.empty)

  /** Column mapping, both directions: data files keep PHYSICAL names
    * forever; the visible schema is LOGICAL. */
  private[sources] def physicalName(c: String): String = renameMap.getOrElse(c, c)
  private lazy val phys2log: Map[String, String] =
    renameMap.collect { case (l, p) if l != p => p -> l }
  private[sources] def logicalName(p: String): String = phys2log.getOrElse(p, p)

  /** logical → physical translation of a pushed filter tree (column
    * mapping: file bytes, footer stats, blooms, and partition dir
    * names are all keyed PHYSICAL — a filter must speak their
    * language before it prunes or re-checks anything). Identity when
    * no mapping is active.
    */
  private[sources] def toPhysicalFilter(f: Filter): Filter = {
    if (renameMap.forall { case (l, p) => l == p }) return f
    import org.apache.spark.sql.sources._
    def n(a: String) = physicalName(a)
    f match {
      case EqualTo(a, v) => EqualTo(n(a), v)
      case EqualNullSafe(a, v) => EqualNullSafe(n(a), v)
      case GreaterThan(a, v) => GreaterThan(n(a), v)
      case GreaterThanOrEqual(a, v) => GreaterThanOrEqual(n(a), v)
      case LessThan(a, v) => LessThan(n(a), v)
      case LessThanOrEqual(a, v) => LessThanOrEqual(n(a), v)
      case In(a, vs) => In(n(a), vs)
      case IsNull(a) => IsNull(n(a))
      case IsNotNull(a) => IsNotNull(n(a))
      case StringStartsWith(a, v) => StringStartsWith(n(a), v)
      case StringEndsWith(a, v) => StringEndsWith(n(a), v)
      case StringContains(a, v) => StringContains(n(a), v)
      case And(l, r) => And(toPhysicalFilter(l), toPhysicalFilter(r))
      case Or(l, r) => Or(toPhysicalFilter(l), toPhysicalFilter(r))
      case Not(c) => Not(toPhysicalFilter(c))
      case other => other
    }
  }

  private lazy val snapshot = {
    // readVersion already applies drops-skip + renames for time
    // travel; the pinned-entry path is raw physical and surfaces here
    val base =
      // a table can also be EMPTIED: a delete that drained the last
      // rows (or a metadata-only partition drop of every dir) leaves
      // a committed manifest with zero data entries — a legal state
      // that must read as an empty frame, not a scan failure
      // (time-travel relations skip entry pinning entirely — their
      // empty pinnedEntries are not an emptied table)
      if ((!table.exists ||
          (version.isEmpty && pinnedEntries.forall(_._1 == "ing"))) &&
          declaredSchema.isDefined)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], declaredSchema.get)
      else version.map(table.readVersion).getOrElse {
        val phys = table.readFrom(pinnedEntries)
        // metadata-dropped columns (recorded by PHYSICAL name) are
        // hidden from CURRENT-snapshot reads (time-travel keeps
        // history — Iceberg's drop contract), then the column mapping
        // renames physical → logical
        // derived (hidden) partition columns are layout artifacts
        // stored with the rows — hidden from every read, like drops
        val meta0 = MergeTable.readMeta(path)
        val dropped = (meta0.map(_.droppedColumns).getOrElse(Nil) ++
          meta0.map(_.derivedPartitions.keys.toSeq).getOrElse(Nil))
          .filter(phys.columns.contains)
        val undropped = if (dropped.isEmpty) phys else phys.drop(dropped: _*)
        renameMap.foldLeft(undropped) { case (df, (logical, physical)) =>
          if (physical != logical && df.columns.contains(physical))
            df.withColumnRenamed(physical, logical)
          else df
        }
      }
    // columns DECLARED (CREATE TABLE schema, ALTER TABLE ADD COLUMNS)
    // but absent from every data file read as typed nulls — the
    // read-side half of schema evolution (declared names are LOGICAL,
    // so this runs after the rename); the write side backfills via
    // unionByName the first time data carries them
    declaredSchema match {
      case Some(decl) if table.exists =>
        decl.fields.filterNot(f => base.columns.contains(f.name))
          .foldLeft(base)((df, f) =>
            df.withColumn(f.name, org.apache.spark.sql.functions.lit(null).cast(f.dataType)))
      case _ => base
    }
  }

  override lazy val schema: StructType = snapshot.schema

  /** Real snapshot size instead of `BaseRelation`'s "assume infinite"
    * default, scaled by the same compression factor Spark applies to
    * its own parquet relations — so a small mergetable dimension
    * AUTO-broadcasts in joins exactly like a plain parquet dim would,
    * instead of forcing a shuffle at any threshold. Upper bound for
    * MOR/dv snapshots (reconciliation only replaces/removes rows).
    */
  override def sizeInBytes: Long = {
    if (!table.exists) 0L
    else {
      val es = version.map(table.entriesAtVersion).getOrElse(pinnedEntries)
      val bytes = table.snapshotBytes(es)
      if (bytes <= 0L) super.sizeInBytes
      else (bytes * spark.sessionState.conf.fileCompressionFactor).toLong
    }
  }

  // the snapshot's files + per-file column ranges when the layout
  // permits file skipping (COW, no pending deltas)
  private lazy val statFiles = table.prunableFiles(pinnedEntries)

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val base = prunedSnapshot(filters).getOrElse(snapshot)
    val filtered = filters.foldLeft(base) { (df, f) =>
      translate(f).map(df.filter).getOrElse(df)
    }
    val pruned =
      if (requiredColumns.isEmpty) filtered
      else filtered.select(requiredColumns.head, requiredColumns.tail: _*)
    pruned.rdd
  }

  /** [[buildScan]] plus a trailing `_graft_file` lineage column — the
    * metadata-column fallback for batch-readable snapshots forced
    * onto the V1 path (a claimed filter without a row form): here the
    * snapshot IS a direct parquet read, so `input_file_name()` names
    * each row's real file.
    */
  private[sources] def buildScanWithFile(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val base = prunedSnapshot(filters).getOrElse(snapshot)
    val filtered = filters.foldLeft(base) { (df, f) =>
      translate(f).map(df.filter).getOrElse(df)
    }
    val withFile = filtered.withColumn(MergeTableV2.FileColumnName,
      org.apache.spark.sql.functions.input_file_name())
    withFile.select((requiredColumns :+ MergeTableV2.FileColumnName)
      .map(org.apache.spark.sql.functions.col).toIndexedSeq: _*).rdd
  }

  // commit dirs of the pinned snapshot whose bloom index exists and
  // covers all their files (absent unless the table was written with
  // graft.mergetable.bloomIndex=true); O(dirs) marker checks only —
  // bloom bytes stay on executors and are probed distributed
  private lazy val bloomCoveredDirs = table.bloomCoveredDirs(pinnedEntries)

  /** Stats+bloom-pruned scan: keep only files whose footer min/max
    * ranges can match every pushed filter (Iceberg-manifest-style
    * file skipping), then — for a full-key point lookup — only files
    * whose key bloom might contain the looked-up tuple (the Delta
    * bloom-index role: min/max ranges prune nothing on an unclustered
    * key domain, blooms do). None = no pruning possible or nothing
    * pruned; the fixed snapshot schema backfills columns missing from
    * older files.
    */
  private def prunedSnapshot(filters: Array[Filter]): Option[org.apache.spark.sql.DataFrame] = {
    // under an active column mapping the raw file scan would read the
    // logical schema against physically-named files (and file stats
    // are keyed by physical names) — take the plain snapshot path
    if (filters.isEmpty || version.isDefined || renameMap.nonEmpty) return None
    survivingFiles(filters).flatMap { case (kept, total) =>
      if (kept.size == total) None
      else if (kept.isEmpty)
        Some(spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema))
      else Some(spark.read.schema(schema).parquet(kept.map(_.toString): _*))
    }
  }

  private[sources] def survivingFiles(
      filters: Array[Filter]): Option[(Seq[java.nio.file.Path], Int)] =
    statFiles.map(pruneFiles(_, filters))

  /** [[survivingFiles]] for the DSv2 Batch path, which may also serve
    * deletion-vector snapshots (it applies the positional mask itself
    * above the raw file scan, so file-level pruning stays safe — a
    * mask only removes rows). COW snapshots prune identically to the
    * V1 pipeline; dv snapshots seed from the dv-aware file listing.
    */
  private[sources] def survivingFilesBatch(
      filters: Array[Filter]): Option[(Seq[java.nio.file.Path], Int)] =
    statFiles.orElse(statFilesDv).orElse(statFilesMor).map(pruneFiles(_, filters))

  private lazy val statFilesDv =
    if (pinnedEntries.exists(_._1 == "dv")) table.prunableFilesDv(pinnedEntries)
    else None

  private lazy val statFilesMor =
    if (pinnedEntries.exists(_._1 == "delta")) table.prunableFilesMor(pinnedEntries)
    else None

  /** Exact per-file footer row counts of the pinned snapshot's base
    * files — the Batch scan's post-pruning numRows source.
    */
  private[sources] lazy val fileRows: Option[Map[java.nio.file.Path, Long]] =
    if (version.isEmpty && table.exists) table.fileRowsByPath(pinnedEntries)
    else None

  /** Hidden-partitioning pruning bridge: user predicates on a derived
    * partition's SOURCE column (the timestamp) translate to
    * CONSERVATIVE day-string predicates on the derived dir column —
    * strict bounds relax to inclusive at day granularity, and day
    * strings compare correctly lexicographically — so `WHERE ts >= X`
    * prunes day dirs without the user ever naming the hidden column.
    * Day computation honors the session time zone, matching the
    * write-side `to_date` injection.
    */
  // pinned once per relation like renameMap — not re-read per scan
  private lazy val derivedPartitionsMap: Map[String, String] =
    MergeTable.readMeta(path).map(_.derivedPartitions).getOrElse(Map.empty)

  private def derivedDayFilters(filters: Array[Filter]): Array[Filter] = {
    val derived = derivedPartitionsMap
    if (derived.isEmpty) return Array.empty
    val bySrc: Map[String, String] = derived.map(_.swap)
    // (granule string, value exactly at the granule boundary) — a
    // boundary value lets strict upper bounds tighten: `ts < day-D
    // 00:00` reaches nothing ON day D (retention-cutoff shape); same
    // for `_month` granules at first-of-month midnight
    def granuleOf(derivedCol: String, v: Any): Option[(String, Boolean)] =
      PartitionDirFilter.granuleOf(derivedCol, v)
    import org.apache.spark.sql.sources._
    filters.flatMap {
      case EqualTo(a, v) if bySrc.contains(a) =>
        granuleOf(bySrc(a), v).map { case (d, _) => EqualTo(bySrc(a), d) }
      case GreaterThan(a, v) if bySrc.contains(a) =>
        granuleOf(bySrc(a), v).map { case (d, _) => GreaterThanOrEqual(bySrc(a), d) }
      case GreaterThanOrEqual(a, v) if bySrc.contains(a) =>
        granuleOf(bySrc(a), v).map { case (d, _) => GreaterThanOrEqual(bySrc(a), d) }
      case LessThan(a, v) if bySrc.contains(a) =>
        granuleOf(bySrc(a), v).map { case (d, boundary) =>
          if (boundary) LessThan(bySrc(a), d) else LessThanOrEqual(bySrc(a), d) }
      case LessThanOrEqual(a, v) if bySrc.contains(a) =>
        granuleOf(bySrc(a), v).map { case (d, _) => LessThanOrEqual(bySrc(a), d) }
      case In(a, vs) if bySrc.contains(a) =>
        val days = vs.toSeq.map(granuleOf(bySrc(a), _))
        if (days.forall(_.isDefined))
          Some(In(bySrc(a), days.flatten.map(_._1).distinct.toArray))
        else None
      case _ => None
    }
  }

  private def pruneFiles(
      allFiles: Seq[(java.nio.file.Path, Map[String, (String, String, String)])],
      rawFilters: Array[Filter]): (Seq[java.nio.file.Path], Int) = {
    val files = allFiles
    val filters = rawFilters ++ derivedDayFilters(rawFilters)
      // cheapest cut first: on a hash-bucketed layout a point lookup
      // can only live in the buckets its key tuple hashes into — all
      // other bucket DIRECTORIES drop before stats or blooms are
      // consulted (at 100 TB: 1 bucket of n, no file listing beyond it)
      val bucketKept = pointBuckets(filters) match {
        case Some(bs) =>
          val pat = "_graft_bucket=(\\d+)".r
          files.filter { case (p, _) =>
            pat.findFirstMatchIn(p.toString) match {
              case Some(m) => bs.contains(m.group(1).toLong)
              case None => true // non-bucketed path: keep
            }
          }
        case None => files
      }
      // value-partition pruning: a file's partition values are IN its
      // path (`_graft_p_<col>=<val>` segments) — drop every file whose
      // partition provably cannot satisfy the pushed filters, before
      // stats are consulted (the data-lake date-partition prune)
      val partKept =
        if (partitionCols.isEmpty) bucketKept
        else bucketKept.filter { case (p, _) =>
          filters.forall(f => partitionMayMatch(p.toString, f))
        }
      val statKept = partKept.filter { case (_, st) =>
        st.isEmpty || filters.forall(f => graft.cdc.FileStats.mayMatch(st, f))
      }
      val bloomKept = pointHashes(filters) match {
        case Some(hashes) if bloomCoveredDirs.nonEmpty =>
          // one distributed probe of the index shards: the driver gets
          // back only names the blooms cannot rule out (plus files in
          // uncovered dirs, which have no blooms and are always kept)
          val survivors = table.bloomSurvivors(bloomCoveredDirs, hashes)
          val coveredRoots = bloomCoveredDirs.map(table.dirPath)
          statKept.filter { case (p, _) =>
            !coveredRoots.exists(p.startsWith) || survivors.contains(p)
          }
        case _ => statKept
      }
      (bloomKept.map(_._1), files.size)
    }

  /** Conservative partition-dir filter evaluation: parse the
    * `_graft_p_<col>=<val>` segments Spark wrote into the file path
    * (unescaped), evaluate the pushed filter against them, and keep
    * the file unless the partition PROVABLY cannot match. The null
    * partition (`__HIVE_DEFAULT_PARTITION__`) fails every comparison
    * (SQL null semantics) but survives IsNull; anything unparseable
    * or untranslated keeps the file.
    */
  private def partitionMayMatch(path: String, f: Filter): Boolean =
    PartitionDirFilter.mayMatch(path, partitionCols, f)

  /** Bucket ids a full-key point lookup can touch on a hash-bucketed
    * layout: the WRITE side's bucket expression —
    * `pmod(xxhash64(key cols), n)`, seed 42 like `functions.xxhash64`
    * — replayed on the filter literals, so the mapping is identical
    * by construction. None = not bucketed or not a point lookup.
    */
  private[sources] def pointBuckets(filters: Array[Filter]): Option[Set[Long]] =
    numBuckets.flatMap { n =>
      import org.apache.spark.sql.sources.{EqualTo, In}
      import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
      def dt(k: String) = schema(k).dataType
      def bucketOf(tuple: Seq[(Any, org.apache.spark.sql.types.DataType)]): Long = {
        val h = new XxHash64(tuple.map { case (v, d) => Literal.create(v, d) })
          .eval(null).asInstanceOf[Long]
        ((h % n) + n) % n // pmod
      }
      val eq = filters.collect {
        case EqualTo(a, v) if keys.contains(a) && v != null => a -> v
      }.toMap
      if (keys.forall(eq.contains))
        Some(Set(bucketOf(keys.map(k => (eq(k), dt(k))))))
      else if (keys.size == 1)
        filters.collectFirst {
          case In(a, vs) if a == keys.head && vs.nonEmpty && !vs.contains(null) =>
            vs.map(v => bucketOf(Seq((v, dt(a))))).toSet
        }
      else None
    }

  /** Hashes a bloom must contain for a file to matter: the key tuple
    * when every key column is pinned by a top-level EqualTo, or each
    * listed value of a single-key In. None = not a point lookup.
    */
  private def pointHashes(filters: Array[Filter]): Option[Seq[Long]] = {
    import org.apache.spark.sql.sources.{EqualTo, In}
    if (!graft.cdc.FileBlooms.indexable(schema, keys)) return None
    def dt(k: String) = schema(k).dataType
    val eq = filters.collect {
      case EqualTo(a, v) if keys.contains(a) && v != null => a -> v
    }.toMap
    if (keys.forall(eq.contains))
      Some(Seq(graft.cdc.FileBlooms.hashOf(
        keys.map(k => (eq(k), dt(k))))))
    else if (keys.size == 1)
      filters.collectFirst {
        case In(a, vs) if a == keys.head && vs.nonEmpty && !vs.contains(null) =>
          vs.toSeq.map(v => graft.cdc.FileBlooms.hashOf(Seq((v, dt(a)))))
      }
    else None
  }

  /** Per-file footer metadata when the pinned snapshot can answer
    * aggregates from manifests alone (no MOR deltas / dv masks, every
    * file accounted for), grouped per entry dir (partition segments
    * intact) — what (partition-FILTERED) metadata aggregation
    * consumes. `Some(Nil)` for an uninitialized table: zero files
    * aggregate to count 0 / min-max null. Stats are PHYSICAL-keyed
    * like the files themselves; an active column mapping does NOT
    * disqualify a table (r14) — the aggregation planner translates
    * each logical column through [[physicalName]]/[[toPhysicalFilter]]
    * before consulting them, so renamed tables keep the O(manifest)
    * count/min/max path.
    */
  private[sources] def aggregatableByDir
      : Option[Seq[(String, Seq[graft.cdc.FileStats.FileMeta])]] =
    if (!table.exists) Some(Nil)
    else table.aggregatableFilesByDir(
      version.map(table.entriesAtVersion).getOrElse(pinnedEntries))

  /** Files a scan with these filters would open (test/audit hook). */
  private[graft] def candidateFiles(filters: Array[Filter]): Option[Seq[String]] =
    survivingFiles(filters).map(_._1.map(_.toString))

  /** Whether the DSv2 Batch fast path can serve this snapshot: a
    * plain-parquet COW layout (no pending deltas / deletion vectors —
    * [[statFiles]] is the same gate file-skipping uses) at the
    * current version. An ACTIVE COLUMN MAPPING rides along (r13): the
    * scan reads by PHYSICAL name (same positions/types — rows line up
    * positionally under the logical output schema) and translates
    * every filter physical-side, so renamed tables keep vectorized
    * reads, pruning, and SPJ. The one mapping shape that must refuse
    * is a dropped physical name COLLIDING with a live column's
    * physical name (the raw reader would read the dropped column's
    * stale bytes) — impossible by construction (re-adds get fresh
    * physical names), checked anyway. Everything else falls back to
    * the V1 relation read.
    */
  /** Whether an active column mapping is SAFE for the raw physical
    * reader: every live logical column needs its OWN physical column —
    * a re-ADD of a renamed-away name gives two logicals the same
    * physical (the new column would read the old column's stale
    * bytes), and a dropped physical colliding with a live one is the
    * same trap. Unsafe shapes refuse back to the V1 read, which
    * resolves through the mapping instead. Shared by the COW, dv, and
    * MOR batch gates (r14 — dv masks are positional and the MOR layer
    * translates names, so mapping alone no longer evicts them).
    */
  private[sources] def mappingSafe: Boolean = {
    val phys = schema.fieldNames.map(physicalName)
    phys.distinct.length == phys.length &&
      MergeTable.readMeta(path).forall(
        _.droppedColumns.forall(d => !phys.contains(d)))
  }

  private[sources] def batchReadable: Boolean =
    version.isEmpty && table.exists && statFiles.isDefined && mappingSafe

  /** Whether the Batch fast path can serve this DELETION-VECTOR
    * snapshot: the same gates as [[batchReadable]] minus the
    * no-dv requirement, plus a bounded mask — the scan ships each
    * file's masked row indexes inside its input partition (the
    * broadcast-mask shape of the V1 anti-join, made positional), so
    * the driver-resident mask must stay under the same
    * `broadcastKeyLimit` the key-set broadcast uses. MOR deltas still
    * refuse (row visibility needs per-key reconciliation); masks
    * without recorded stats refuse (size unknowable without a read).
    */
  private[sources] def batchReadableDv: Boolean =
    version.isEmpty && table.exists && mappingSafe &&
      statFiles.isEmpty && statFilesDv.isDefined &&
      table.dvMaskRows(pinnedEntries).exists { n =>
        val limit = sqlContext.sparkSession.conf
          .getOption("graft.mergetable.broadcastKeyLimit")
          .map(_.toLong).getOrElse(4000000L)
        n <= limit
      }

  /** The pinned snapshot's positional mask, per normalized base-file
    * path (sorted row indexes) — what the Batch scan attaches to each
    * file slice. Empty for COW snapshots.
    */
  private[sources] def dvMasks: Map[String, Array[Long]] =
    table.dvMaskByFile(pinnedEntries)

  private[sources] def isDvSnapshot: Boolean =
    pinnedEntries.exists(_._1 == "dv")

  private[sources] def isMorSnapshot: Boolean =
    pinnedEntries.exists(_._1 == "delta")

  /** Whether the Batch fast path can serve this MOR (delta-bearing)
    * snapshot: the same gates as [[batchReadable]] minus the no-delta
    * requirement, plus a BOUNDED delta layer — the scan reconciles by
    * broadcasting the reconciled delta rows and their key set above
    * the vectorized base scan (latest-by-key wins, the keyed twin of
    * the dv positional mask), so the driver-resident layer must stay
    * under the same `broadcastKeyLimit` the dv mask uses (footer-stat
    * row counts; any delta file without stats refuses — size
    * unknowable without a read). Key types are restricted to the ones
    * whose catalyst values compare exactly in a JVM hash set (the
    * supersede check is EXACT key equality, never a hash that could
    * collide a live base row away).
    */
  private[sources] def batchReadableMor: Boolean =
    version.isEmpty && table.exists && mappingSafe &&
      statFiles.isEmpty && statFilesDv.isEmpty && statFilesMor.isDefined &&
      morKeyTypesOk &&
      table.morDeltaRows(pinnedEntries).exists { n =>
        val limit = sqlContext.sparkSession.conf
          .getOption("graft.mergetable.broadcastKeyLimit")
          .map(_.toLong).getOrElse(4000000L)
        n <= limit
      }

  /** Key columns usable for the Batch-MOR exact supersede set: fixed-
    * width primitives and strings, whose catalyst representations
    * (boxed primitives, UTF8String) define value-equality
    * equals/hashCode. Anything else (binary, decimal, nested) falls
    * back to the V1 reconciling read.
    */
  private def morKeyTypesOk: Boolean = {
    import org.apache.spark.sql.types._
    keys.forall { k =>
      schema.fields.find(_.name.equalsIgnoreCase(logicalName(k))).map(_.dataType).exists {
        case ByteType | ShortType | IntegerType | LongType | BooleanType |
             FloatType | DoubleType | StringType | DateType |
             TimestampType | TimestampNTZType => true
        case _ => false
      }
    }
  }

  /** The reconciled delta layer for the Batch-MOR scan (see
    * [[MergeTable.morDeltaLatest]]): latest row per key across the
    * pinned snapshot's deltas, tombstone flag preserved.
    */
  private[sources] def morDeltaLatest: org.apache.spark.sql.DataFrame =
    table.morDeltaLatest(pinnedEntries)

  private[sources] def morDeltaBytes: Long = table.morDeltaBytes(pinnedEntries)

  // translate DSv1 filters back to Column predicates so they reach the
  // parquet scan of the inner DataFrame; untranslated filters are
  // still applied by Spark above this relation (DSv1) or must be
  // handed back to the engine by the catalog ScanBuilder (DSv2)
  private[sources] def translate(f: Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(a, v) => Some(col(a) === v)
      case GreaterThan(a, v) => Some(col(a) > v)
      case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
      case LessThan(a, v) => Some(col(a) < v)
      case LessThanOrEqual(a, v) => Some(col(a) <= v)
      case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
      case IsNull(a) => Some(col(a).isNull)
      case IsNotNull(a) => Some(col(a).isNotNull)
      case And(l, r) => for (lc <- translate(l); rc <- translate(r)) yield lc && rc
      case Or(l, r) => for (lc <- translate(l); rc <- translate(r)) yield lc || rc
      case Not(c) => translate(c).map(!_)
      case _ => None
    }
  }
}

/** Batch change-feed relation (Delta CDF's
  * `readChangeFeed`/`startingVersion`/`endingVersion` surface):
  * the rows changed between two committed versions with their
  * `_change` op column, optionally exploded into `U_pre`/`U_post`
  * pre-image pairs. `endingVersion` defaults to the current version;
  * `startingVersion` 0 replays from the empty table (everything I).
  */
class ChangeFeedRelation(
    override val sqlContext: SQLContext,
    val path: String,
    val startingVersion: Long,
    val endingVersion: Option[Long],
    val updatePreImages: Boolean) extends BaseRelation with TableScan {

  private lazy val feed = {
    val t = MergeTable.open(sqlContext.sparkSession, path)
    val to = endingVersion.getOrElse(t.versions().max)
    // per-version replay (each key's latest change), NOT endpoint
    // netting — a row inserted then deleted inside the window must
    // surface as D, matching Delta CDF and the streaming source
    t.changeFeed(startingVersion, to, updatePreImages)
  }

  override lazy val schema: StructType = feed.schema
  override def buildScan(): RDD[Row] = feed.rdd
}

/** EXACT dir-granularity evaluation of a pushed filter against the
  * `_graft_p_<col>=<val>` segments of a partition dir path. Every row
  * of a dir shares its partition tuple, so a partition-only predicate
  * is uniformly TRUE (`Some(true)`), uniformly not-TRUE
  * (`Some(false)` — SQL FALSE or NULL, either way the dir contributes
  * no rows), or NOT decidable at dir granularity (`None` —
  * unparseable value, non-partition column, or an unsupported shape
  * like NOT, whose null semantics the atom-level NULL→false mapping
  * would invert). The conservative keep-unless-provably-impossible
  * twin used for scan pruning is the relation's `partitionMayMatch`;
  * this strict form is what metadata-only AGGREGATION needs, where an
  * over-kept dir would produce a wrong answer, not a slow one.
  */
private[sources] object PartitionFilters {
  import org.apache.spark.sql.sources._

  def exact(path: String, partitionCols: Seq[String], f: Filter): Option[Boolean] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    def valueOf(c: String): Option[Option[String]] = // outer None = not in path
      s"_graft_p_${java.util.regex.Pattern.quote(c)}=([^/]+)".r
        .findFirstMatchIn(path).map { m =>
          val raw = ExternalCatalogUtils.unescapePathName(m.group(1))
          if (raw == "__HIVE_DEFAULT_PARTITION__") None else Some(raw)
        }
    def cmp(s: String, v: Any): Option[Int] = v match {
      case null => None
      case n: Number =>
        try Some(BigDecimal(s).compare(BigDecimal(n.toString)))
        catch { case _: NumberFormatException => None }
      case b: Boolean => Some(s.toLowerCase.compareTo(b.toString))
      // UTF-8 byte order (graft.cdc.FileStats.utf8Cmp), matching how
      // Spark/parquet order strings — UTF-16 compareTo flips range
      // decisions for supplementary-plane partition values, and this
      // EXACT path answers metadata-only aggregates, where a flipped
      // decision is a silently wrong answer, not a slow one
      case other => Some(graft.cdc.FileStats.utf8Cmp(s, String.valueOf(other)))
    }
    def evalCmp(a: String, v: Any, ok: Int => Boolean): Option[Boolean] =
      if (!partitionCols.contains(a)) None
      else valueOf(a) match {
        case None => None
        case Some(None) => Some(false) // null partition: predicate is NULL
        case Some(Some(s)) => cmp(s, v).map(ok)
      }
    def eval(f: Filter): Option[Boolean] = f match {
      case EqualTo(a, v) => evalCmp(a, v, _ == 0)
      case EqualNullSafe(a, v) =>
        if (!partitionCols.contains(a)) None
        else valueOf(a) match {
          case None => None
          case Some(None) => Some(v == null)
          case Some(Some(s)) => if (v == null) Some(false) else cmp(s, v).map(_ == 0)
        }
      case In(a, vs) =>
        if (!partitionCols.contains(a)) None
        else valueOf(a) match {
          case None => None
          case Some(None) => Some(false)
          case Some(Some(s)) =>
            val cs = vs.toSeq.map(v => cmp(s, v))
            if (cs.exists(_.isEmpty)) None else Some(cs.exists(_.contains(0)))
        }
      case GreaterThan(a, v) => evalCmp(a, v, _ > 0)
      case GreaterThanOrEqual(a, v) => evalCmp(a, v, _ >= 0)
      case LessThan(a, v) => evalCmp(a, v, _ < 0)
      case LessThanOrEqual(a, v) => evalCmp(a, v, _ <= 0)
      case IsNull(a) =>
        if (!partitionCols.contains(a)) None else valueOf(a).map(_.isEmpty)
      case IsNotNull(a) =>
        if (!partitionCols.contains(a)) None else valueOf(a).map(_.nonEmpty)
      // three-valued AND/OR: a decided FALSE/TRUE side can decide the
      // whole node even when the other side is indeterminate
      case And(l, r) => (eval(l), eval(r)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(l, r) => (eval(l), eval(r)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case _ => None
    }
    eval(f)
  }
}

/** Conservative partition-dir filter evaluation over the
  * `_graft_p_<col>=<val>` segments Spark wrote into a file/dir path —
  * shared by the relation's scan pruning and the DML layer's
  * metadata-only partition deletes. Every row in a dir shares its
  * partition values, so for a predicate referencing ONLY partition
  * columns "may match" IS "all rows match" — the property the
  * metadata-only delete rests on. The null partition
  * (`__HIVE_DEFAULT_PARTITION__`) fails every comparison (SQL null
  * semantics) but survives IsNull; anything unparseable or
  * untranslated keeps the dir.
  */
private[sources] object PartitionDirFilter {
  /** The granule string a timestamp/date value renders to for a
    * derived partition column, plus whether the value sits EXACTLY on
    * the granule boundary (midnight for `_day`, first-of-month
    * midnight for `_month`). The transform is carried by the derived
    * column's name suffix, fixed at CREATE. ZONE-FREE on purpose:
    * derived partitioning admits only TIMESTAMP_NTZ/DATE sources
    * (zoned timestamps would make the stored day depend on the
    * WRITER's session time zone and the pruned day on the READER's —
    * silently wrong scans and dir drops), so only zone-free filter
    * value types translate; anything else refuses, and the scan/drop
    * falls back to exact evaluation.
    */
  def granuleOf(derivedCol: String, v: Any): Option[(String, Boolean)] = {
    val monthly = derivedCol.endsWith("_month")
    def of(d: java.time.LocalDate, atMidnight: Boolean): (String, Boolean) =
      if (monthly)
        (f"${d.getYear}%04d-${d.getMonthValue}%02d",
          atMidnight && d.getDayOfMonth == 1)
      else (d.toString, atMidnight)
    v match {
      case t: java.time.LocalDateTime =>
        Some(of(t.toLocalDate, t.toLocalTime == java.time.LocalTime.MIDNIGHT))
      case d: java.sql.Date => Some(of(d.toLocalDate, true))
      case d: java.time.LocalDate => Some(of(d, true))
      case _ => None
    }
  }

  /** Conservative dir-filter evaluation for SCAN PRUNING: keep the
    * dir unless the predicate PROVABLY fails — i.e. the three-valued
    * [[PartitionFilters.exact]] did not decide false. One evaluator
    * serves pruning, metadata-only aggregates, and drops, so a fix
    * (null guards, EqualNullSafe, numeric parsing) lands everywhere.
    */
  def mayMatch(path: String, partitionCols: Seq[String],
               f: org.apache.spark.sql.sources.Filter): Boolean =
    !PartitionFilters.exact(path, partitionCols, f).contains(false)

  /** STRICT twin for metadata-only partition DROPS — the predicate
    * must PROVABLY hold for every row of the dir: exact == true.
    * Every uncertainty (unknown shape, unparseable or NULL value,
    * column absent) resolves to keep — the polarity where a wrong
    * answer deletes data a wrong keep merely leaves for the row-level
    * fallback.
    */
  def mustMatch(path: String, partitionCols: Seq[String],
                f: org.apache.spark.sql.sources.Filter): Boolean =
    PartitionFilters.exact(path, partitionCols, f).contains(true)
}
