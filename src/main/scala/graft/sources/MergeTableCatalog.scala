package graft.sources

import graft.cdc.MergeTable
import java.nio.file.{Files, Paths}
import java.util
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform, Expression => V2Expression}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsDynamicOverwrite, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** Catalog plugin exposing MergeTables as first-class SQL
  * identifiers — the surface the reference gets from Iceberg's
  * `glue_catalog.db.table` (spark.sql.catalog.* registration in
  * aws-emr-serverless/iceberg/kafka-iceberg-streaming-emrserverless-v2.py):
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.sources.MergeTableCatalog
  *   spark.sql.catalog.graft.root = /path/to/warehouse
  *
  *   SELECT * FROM graft.db.t                      -- snapshot read
  *   SELECT * FROM graft.db.t VERSION AS OF 3      -- time travel
  *   SELECT * FROM graft.db.t TIMESTAMP AS OF ...  -- commit-time travel
  *   INSERT INTO graft.db.t SELECT ...             -- append
  *   MERGE INTO graft.db.t USING s ON ...          -- via ResolveMergeTableDml
  *   DELETE FROM graft.db.t WHERE ...              -- via ResolveMergeTableDml
  *   CREATE / DROP TABLE graft.db.t
  * }}}
  *
  * Layout: `<root>/<namespace>/<table>`, one MergeTable per directory,
  * self-described by its `_META.json` (keys/mode/buckets, plus the
  * declared schema for tables created empty). Reads and writes go
  * through the DSv2 V1 fallbacks onto the existing relation — the
  * same snapshot-consistent scan (with pushdown) and transactional
  * commits as the `mergetable` format, so every layout (COW, MOR,
  * bucketed) behaves identically under catalog identifiers.
  */
class MergeTableCatalog extends TableCatalog with SupportsNamespaces
    with FunctionCatalog {

  private var catalogName: String = "graft"
  private var root: String = "target/graft_warehouse"

  // FunctionCatalog: serves the `bucket` transform the Batch scans
  // report in their KeyGroupedPartitioning — Spark resolves it here
  // (Identifier with an EMPTY namespace) when judging whether two
  // scans are co-partitioned for a storage-partitioned join
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty)
      Array("bucket", "days", "months").map(Identifier.of(namespace, _))
    else Array.empty

  override def loadFunction(ident: Identifier): functions.UnboundFunction =
    if (ident.namespace().nonEmpty) throw new NoSuchFunctionException(ident)
    else ident.name() match {
      case "bucket" => GraftBucketUnbound
      case "days" => GraftDaysUnbound
      case "months" => GraftMonthsUnbound
      case _ => throw new NoSuchFunctionException(ident)
    }

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(root)
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  // Files.list returns a stream backed by an open directory FD —
  // always close it (a long-lived session serving catalog queries
  // would otherwise leak one FD per listing)
  private def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  private def tablePath(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(s"$root/", "/", "")

  /** Resolve `db.t` parts to this catalog's table root (maintenance SQL). */
  private[sources] def pathForIdent(parts: Seq[String]): String =
    parts.mkString(s"$root/", "/", "")

  // -- tables ---------------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = Paths.get(namespace.mkString(s"$root/", "/", ""))
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace)
    listDir(dir)
      .filter(p => Files.exists(p.resolve("_META.json")))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    MergeTable.readMeta(tablePath(ident)).isDefined

  override def loadTable(ident: Identifier): Table =
    if (tableExists(ident)) loadVersioned(ident, None)
    else metadataTableFor(ident).getOrElse(loadVersioned(ident, None))

  /** Iceberg-style inspection tables: `SELECT * FROM graft.db.t.files
    * / .history / .refs` resolves here when `db.t` is a MergeTable
    * and no REAL table shadows the suffix (a genuine table named
    * `files` under `db.t` wins — checked first). Driver-computed
    * manifest/ref facts, read-only, always the CURRENT state at scan
    * time.
    */
  private def metadataTableFor(ident: Identifier): Option[Table] =
    if (ident.namespace().length >= 2 &&
        MergeTableMetadataTable.Kinds.contains(ident.name().toLowerCase)) {
      val ns = ident.namespace()
      val parent = Identifier.of(ns.dropRight(1), ns.last)
      MergeTable.readMeta(tablePath(parent)).map { _ =>
        new MergeTableMetadataTable(ident, tablePath(parent),
          ident.name().toLowerCase)
      }
    } else None

  /** `VERSION AS OF <v>` — a numeric string is a committed manifest
    * number; anything else names a REF (Iceberg parity): a tag reads
    * its pinned version, a branch reads the branch head.
    */
  override def loadTable(ident: Identifier, version: String): Table =
    if (version.matches("\\d+")) loadVersioned(ident, Some(version.toLong))
    else {
      val path = tablePath(ident)
      val meta = MergeTable.readMeta(path).getOrElse(throw new NoSuchTableException(ident))
      new MergeTableV2(ident, path, meta, None, ref = Some(version))
    }

  /** `TIMESTAMP AS OF <ts>` — resolved to the last version whose
    * manifest was committed at or before the timestamp (micros).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val at = MergeTable.versionAtTimestamp(tablePath(ident), timestamp)
      .getOrElse(throw new NoSuchTableException(ident))
    loadVersioned(ident, Some(at))
  }

  private def loadVersioned(ident: Identifier, version: Option[Long]): Table = {
    val path = tablePath(ident)
    val meta = MergeTable.readMeta(path).getOrElse(throw new NoSuchTableException(ident))
    new MergeTableV2(ident, path, meta, version)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    // PARTITIONED BY (c1, c2): identity transforms declare the
    // value-partitioned layout. PARTITIONED BY (days(ts)) declares
    // HIDDEN day partitioning (Iceberg's days transform): the layout
    // column <ts>_day is DERIVED from the source at write time,
    // hidden from the schema and every read, yet drives dir pruning,
    // SHOW PARTITIONS, and partition-scoped maintenance. Any other
    // transform (bucket(), months() ...) is rejected loudly rather
    // than silently ignored.
    val resolved: Seq[(String, Option[String])] = partitions.toSeq.map { t =>
      require(t.references.length == 1,
        s"mergetable PARTITIONED BY supports single-column transforms, got $t")
      val src = t.references.head.fieldNames.mkString(".")
      t.name match {
        case "identity" => (src, None)
        case "days" => (s"${src}_day", Some(src))
        case "months" => (s"${src}_month", Some(src))
        case other => throw new IllegalArgumentException(
          s"mergetable supports identity, days() and months() PARTITIONED BY " +
            s"columns, got $other($src) (use the 'buckets' property for hash bucketing)")
      }
    }
    val partitionCols = resolved.map(_._1)
    val derived: Map[String, String] =
      resolved.collect { case (c, Some(src)) => c -> src }.toMap
    resolved.foreach {
      case (c, None) => require(schema.fieldNames.contains(c),
        s"partition column '$c' is not in the schema")
      case (c, Some(src)) =>
        require(schema.fieldNames.contains(src),
          s"days($src) partition source column is not in the schema")
        require(!schema.fieldNames.contains(c),
          s"derived partition column '$c' collides with a declared column")
        val dt = schema(src).dataType
        // ZONED timestamps are refused on purpose: the stored granule
        // would depend on the WRITER's session time zone and the
        // pruned granule on the READER's — silently wrong scans and
        // retention drops. Declare the intended zone by storing
        // TIMESTAMP_NTZ (the reference's event-time type) or DATE.
        require(dt == org.apache.spark.sql.types.TimestampNTZType ||
            dt == org.apache.spark.sql.types.DateType,
          s"derived partitioning on $src requires a TIMESTAMP_NTZ or DATE " +
            s"source column, got $dt (zoned timestamps make the stored " +
            "granule session-dependent)")
    }
    val props = properties.asScala
    val keys = props.get("keys").map(_.split(",").map(_.trim).toSeq)
      .getOrElse(throw new IllegalArgumentException(
        "CREATE TABLE requires TBLPROPERTIES('keys'='pk1[,pk2…]')"))
    keys.foreach(k => require(schema.fieldNames.contains(k),
      s"primary key column '$k' is not in the schema"))
    // PARTITIONED BY + TBLPROPERTIES('buckets') COMPOSE: rows land in
    // (partition × key-hash bucket) cells — the Iceberg
    // `PARTITIONED BY (date, bucket(n, id))` shape. dv mode is the
    // one write mode partitioning (composed or not) refuses.
    require(partitionCols.isEmpty || props.get("buckets").isEmpty ||
      props.getOrElse("mode", MergeTable.CopyOnWrite) != MergeTable.DeletionVectors,
      "partitioned × bucketed composes with copy-on-write or merge-on-read only")
    // declared write-side sort (Hive's bucketed-sorted-table shape):
    // v2 seed writes request (bucket, sortBy…) ordering and record the
    // scan-consumable sort marker — plain bucketed layouts only, the
    // same rule as OPTIMIZE … SORT BY
    val sortBy = props.get("sortBy").map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Nil)
    if (sortBy.nonEmpty) {
      require(props.contains("buckets") && partitionCols.isEmpty,
        "TBLPROPERTIES('sortBy') requires a plain hash-bucketed layout " +
          "('buckets' set, no PARTITIONED BY)")
      sortBy.foreach(c => require(schema.fieldNames.contains(c),
        s"sortBy column '$c' is not in the schema"))
    }
    val meta = MergeTable.Meta(
      keys,
      props.getOrElse("mode", MergeTable.CopyOnWrite),
      props.get("buckets").map(_.toInt),
      Some(schema.json),
      partitionCols = partitionCols,
      sortBy = sortBy,
      derivedPartitions = derived)
    MergeTable.writeMeta(tablePath(ident), meta)
    new MergeTableV2(ident, tablePath(ident), meta, None)
  }

  override def dropTable(ident: Identifier): Boolean =
    if (!tableExists(ident)) false
    else { MergeTable.drop(tablePath(ident)); true }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE is not supported; schema evolves automatically on write")

  override def renameTable(old: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE is not supported")

  // -- namespaces (directories under root) ----------------------------------

  override def listNamespaces(): Array[Array[String]] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) Array.empty
    else listDir(r).filter(Files.isDirectory(_))
      .map(p => Array(p.getFileName.toString)).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    Files.isDirectory(Paths.get(namespace.mkString(s"$root/", "/", "")))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    Files.createDirectories(Paths.get(namespace.mkString(s"$root/", "/", "")))

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = Paths.get(namespace.mkString(s"$root/", "/", ""))
    if (!Files.isDirectory(p)) false
    else if (!cascade && listDir(p).nonEmpty)
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} is not empty")
    else { MergeTable.drop(p.toString); true }
  }
}

/** DSv2 table over a MergeTable root: reads through the existing
  * snapshot-consistent relation (V1Scan keeps column/filter pushdown),
  * appends through the table's transactional commit (V1Write).
  */
class MergeTableV2(ident: Identifier, path: String, meta: MergeTable.Meta,
                   version: Option[Long],
                   ref: Option[String] = None) extends Table with SupportsRead
    with SupportsWrite with SupportsMetadataColumns with TruncatableTable {

  /** Table root on disk — consulted by the skew-salting optimizer
    * rule for the persisted ANALYZE histograms.
    */
  private[graft] def tablePath: String = path

  /** Table meta (keys/buckets/partitioning) — consulted by the
    * skew-salting rule's storage-partitioned-join guard, which must
    * decline to salt a join the engine would plan shuffle-free.
    */
  private[graft] def tableMeta: MergeTable.Meta = meta

  /** `TRUNCATE TABLE graft.db.t` — one empty-entry metadata commit
    * (history preserved, vacuum reclaims). Routes to the WAP branch
    * like every other write; refused on time-travel/ref pins.
    */
  override def truncateTable(): Boolean = {
    require(version.isEmpty && ref.isEmpty,
      "cannot TRUNCATE a time-travel or ref-pinned snapshot")
    val t = MergeTable.wapBranch(spark).filter(refTable.branchExists)
      .map(refTable.forBranch).getOrElse(refTable)
    t.truncate()
    true
  }

  /** `_graft_file` (Iceberg's `_file` / Delta's
    * `_metadata.file_path`): the data file each row was read from —
    * the row-lineage handle for targeted rewrites ("which files hold
    * this user's rows"), skew forensics, and compaction audits.
    * Served on the snapshots whose scan reads raw parquet (the
    * Batch-path shapes: plain COW and deletion-vector snapshots,
    * where the mask drops rows but survivors keep their file); MOR
    * reconciliation and column-mapped reads synthesize rows across
    * files, so those snapshots don't advertise it — compact first.
    */
  override def metadataColumns(): Array[MetadataColumn] =
    if (pinnedRelation.batchReadable || pinnedRelation.batchReadableDv)
      Array(MergeTableV2.FileMetadataColumn)
    else Array.empty

  private def spark: SparkSession = SparkSession.active

  // ref/branch resolution, decided once per loaded Table:
  //  - an explicit `VERSION AS OF '<ref>'` string names a TAG (reads
  //    the tagged main-lineage version) or a BRANCH (reads the branch
  //    head) — anything else refuses loudly;
  //  - otherwise an active WAP session conf (spark.graft.wap.branch)
  //    routes reads to that branch IF the table has it, main when it
  //    doesn't (Iceberg's spark.wap.branch read rule).
  private lazy val refTable = new MergeTable(spark, path, meta.keys,
    meta.mode, meta.numBuckets, partitionCols = meta.partitionCols)

  private lazy val (resolvedVersion: Option[Long], readBranch: String) = ref match {
    case Some(r) =>
      if (refTable.tagExists(r)) (Some(refTable.tagVersion(r)), MergeTable.MainBranch)
      else if (refTable.branchExists(r)) (None, r)
      else throw new IllegalArgumentException(
        s"VERSION AS OF '$r' on ${name()}: no such tag or branch " +
          s"(tags: ${refTable.tags().mkString(", ")}; " +
          s"branches: ${refTable.branches().mkString(", ")})")
    case None => version match {
      // explicit numeric time travel always addresses the MAIN
      // lineage — branch version numbering continues the fork's, so
      // routing it to a WAP branch would serve fork-gapped history
      case Some(v) => (Some(v), MergeTable.MainBranch)
      case None =>
        (None,
          MergeTable.wapBranch(spark).filter(refTable.branchExists)
            .getOrElse(MergeTable.MainBranch))
    }
  }

  // ONE relation per loaded table: schema resolution and every scan
  // of this Table instance read the same pinned snapshot, even while
  // writers commit between analysis and execution
  private lazy val pinnedRelation: MergeTableRelation =
    new MergeTableRelation(spark.sqlContext, path, meta.keys, meta.mode,
      meta.numBuckets, resolvedVersion,
      meta.schemaJson.map(j =>
        org.apache.spark.sql.types.DataType.fromJson(j).asInstanceOf[StructType]),
      meta.partitionCols, branch = readBranch)

  override def name(): String = (ident.namespace() :+ ident.name()).mkString(".")

  /** Target handle for MERGE INTO / DELETE FROM resolution. DML under
    * an active WAP branch lands on the branch (created from the
    * current head on first write).
    */
  private[sources] def dmlTarget: DmlTarget = {
    require(version.isEmpty && ref.isEmpty,
      "cannot run DML against a time-travel or ref-pinned snapshot " +
        "(set spark.graft.wap.branch to write to a branch)")
    DmlTarget(path, meta.keys, meta.mode, meta.numBuckets)
  }

  override lazy val schema: StructType = pinnedRelation.schema

  /** Whether THIS table instance's writes ride the true DSv2
    * BatchWrite (executor-side file writes + an honored
    * RequiresDistributionAndOrdering) — decided once per loaded
    * Table: Spark demands the declared capability and the built
    * Write agree, so the same decision drives [[capabilities]] and
    * the WriteBuilder. Served shapes: flat appends (any mode) and
    * the FIRST write of a bucketed/partitioned layout; populated
    * keyed layouts (scoped merges), CHECK constraints, column
    * mapping, and time travel stay on the V1 InsertableRelation.
    * A seed-eligibility race (someone seeds after analysis) is
    * handled by the BatchWrite's conflict-recovery upsert.
    */
  private lazy val partTypesOk: Boolean = meta.partitionCols.forall { c =>
    meta.derivedPartitions.get(c) match {
      // hidden layouts: the write derives the granule from the SOURCE
      // column, which must be zone-free (the layout's CREATE gate)
      case Some(src) => schema.fields.find(_.name.equalsIgnoreCase(src))
        .exists(f => f.dataType == org.apache.spark.sql.types.TimestampNTZType ||
          f.dataType == org.apache.spark.sql.types.DateType)
      case None => schema.fields.find(_.name.equalsIgnoreCase(c))
        .exists(f => GraftWriteLayout.partitionable(f.dataType))
    }
  }

  private lazy val metaPlainOk: Boolean =
    meta.constraints.isEmpty && meta.droppedColumns.isEmpty &&
      meta.renames.forall { case (l, p) => l == p }

  private lazy val v2WriteEligible: Boolean = {
    // judged from the meta snapshot this Table instance was LOADED
    // with (same freshness as everything else it serves) — re-reading
    // _META here would tax every read-path capabilities() call; the
    // one extra I/O kept is the manifest existence probe seed
    // layouts need
    val layoutSeedOk =
      (meta.numBuckets.isEmpty && meta.partitionCols.isEmpty) || {
        // under WAP the write lands on the branch — judge seed
        // emptiness there (a not-yet-created WAP branch forks at the
        // current head, so main's state IS its state)
        val t = MergeTable.wapBranch(spark).filter(refTable.branchExists)
          .map(refTable.forBranch).getOrElse(refTable)
        !t.exists
      }
    // hidden partitioning rides the v2 path too (r13): the executor-
    // side demux derives the granule itself (GraftWriteLayout
    // DerivedSeg) and stores it with the rows, exactly like the V1
    // driver-side injection
    version.isEmpty && ref.isEmpty && layoutSeedOk && partTypesOk &&
      metaPlainOk
  }

  /** DYNAMIC partition overwrite (`INSERT OVERWRITE` under
    * `spark.sql.sources.partitionOverwriteMode=dynamic`) is a PURE
    * partition-replacement — servable by a staged v2 write on any
    * partitioned snapshot, POPULATED included (unlike appends, which
    * need the scoped merge): the staged leaves replace exactly the
    * partitions present in the source. Same file-write exclusions as
    * the append path (constraints/mapping/time travel).
    */
  private lazy val dynamicOverwriteEligible: Boolean =
    version.isEmpty && ref.isEmpty && meta.partitionCols.nonEmpty &&
      partTypesOk && metaPlainOk

  /** Declared so `ResolveInsertInto` can tell a partitioned table
    * from a flat one (the dynamic-overwrite decision keys off it);
    * composed layouts also declare their bucket transform, the
    * Iceberg `PARTITIONED BY (date, bucket(n, id))` rendering.
    */
  override def partitioning(): Array[Transform] =
    if (meta.partitionCols.isEmpty) Array.empty
    // hidden partitions declare the TRANSFORM on their (resolvable)
    // source column — the hidden layout column isn't in the schema;
    // ONE dispatch rule (GraftGranule.transformOf) shared with the
    // scan's reported partitioning and the write distributions
    else (meta.partitionCols.map(c =>
      GraftGranule.transformOf(meta.derivedPartitions, c): Transform) ++
      meta.numBuckets.map(n =>
        org.apache.spark.sql.connector.expressions.Expressions
          .bucket(n, meta.keys: _*): Transform)).toArray

  override def capabilities(): util.Set[TableCapability] = {
    val caps =
      if (v2WriteEligible)
        util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
          TableCapability.TRUNCATE)
      else
        util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE)
    if (dynamicOverwriteEligible) {
      // appends on a POPULATED layout still build a V1Write (the
      // scoped merge) — declaring BATCH_WRITE alongside is what lets
      // OverwritePartitionsDynamic pass the capability check, and the
      // planner picks the exec from the BUILT Write's type, so the
      // two paths coexist
      caps.add(TableCapability.BATCH_WRITE)
      caps.add(TableCapability.OVERWRITE_DYNAMIC)
    }
    caps
  }

  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    m.put("keys", meta.keys.mkString(","))
    m.put("mode", meta.mode)
    meta.numBuckets.foreach(b => m.put("buckets", b.toString))
    if (meta.sortBy.nonEmpty) m.put("sortBy", meta.sortBy.mkString(","))
    m
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
        with SupportsPushDownAggregates {
      private var required: StructType = schema
      // CLAIMED filters (consumed by the scan, absent from the plan):
      // partition-column filters only — the filtered metadata-agg
      // pushdown requires zero post-scan filters, and the scan
      // re-checks them row-level so the claim stays exact
      private var pushed: Array[Filter] = Array.empty
      // every translatable filter, claimed or not — drives file/dir/
      // stats/bloom pruning and parquet row-group skipping
      private var advisory: Array[Filter] = Array.empty
      // COMPLETE aggregate pushdown answered from commit metadata: the
      // (schema, single result row) pair when the whole aggregation
      // folds out of per-file footer stats — count(*) / count(col)
      // from exact row + null counts, min/max from file ranges. The
      // Delta/Iceberg "SELECT count(*) never touches data" path: at
      // 100 TB the difference between O(manifest) and a full scan.
      private var aggResult: Option[(StructType, Row)] = None
      // `_graft_file` requested (SupportsMetadataColumns): stripped
      // from the data schema here, re-attached by the scan per file
      private var wantFile: Boolean = false

      override def pruneColumns(requiredSchema: StructType): Unit = {
        wantFile = requiredSchema.fieldNames.contains(MergeTableV2.FileColumnName)
        required =
          if (!wantFile) requiredSchema
          else StructType(requiredSchema.fields
            .filterNot(_.name == MergeTableV2.FileColumnName))
      }
      // Translatable filters drive pruning (advisory); but only
      // PARTITION-column filters are CLAIMED as consumed. Data filters
      // return to the engine as residuals on purpose: the Filter node
      // above the scan is what dynamic partition pruning keys its
      // selectivity check on (a dim whose predicate vanished into the
      // scan never triggers DPP on the fact side), and it is the
      // correctness backstop while the scan's own application is
      // best-effort file skipping. Untranslatable filters were never
      // claimed — claiming one would silently drop the predicate.
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        val (ok, rejected) = filters.partition(f => pinnedRelation.translate(f).isDefined)
        advisory = ok
        // partition dirs are physical-named; translate each reference
        // so filters on a RENAMED partition column still claim
        val (part, data) = ok.partition(f => f.references.nonEmpty &&
          f.references.forall(r => meta.partitionCols.exists(
            _.equalsIgnoreCase(pinnedRelation.physicalName(r)))))
        pushed = part
        rejected ++ data
      }
      override def pushedFilters(): Array[Filter] = pushed

      // Spark calls supportCompletePushDown then pushAggregation with
      // the same Aggregation; planning re-lists files and re-parses
      // every stats JSON, so memoize per instance (a different
      // instance just replans — never stale, only slower)
      private var plannedFor: Aggregation = null
      private var plannedResult: Option[(StructType, Row)] = None
      private def planCached(agg: Aggregation): Option[(StructType, Row)] = {
        if (!(plannedFor eq agg)) { plannedResult = planAggregation(agg); plannedFor = agg }
        plannedResult
      }

      override def supportCompletePushDown(agg: Aggregation): Boolean =
        planCached(agg).isDefined

      override def pushAggregation(agg: Aggregation): Boolean = {
        aggResult = planCached(agg)
        aggResult.isDefined
      }

      /** The aggregation's output schema and final row iff EVERY
        * aggregate folds exactly from file metadata; None falls back
        * to a real scan. All-or-nothing: a partial answer would be
        * wrong, not slow. Rejects pushed filters (metadata can't
        * apply residual predicates), grouping, distinct counts, and
        * any column whose type/stats don't guarantee exactness.
        */
      private def planAggregation(agg: Aggregation): Option[(StructType, Row)] = {
        import org.apache.spark.sql.types._
        if (agg.groupByExpressions.nonEmpty) return None
        val byDir = pinnedRelation.aggregatableByDir.getOrElse(return None)
        // partition-ONLY filters evaluate EXACTLY at dir granularity
        // (every row of a dir shares its partition tuple), so a
        // filtered aggregate still folds from footer stats — the dirs
        // the predicate selects contribute, the rest don't, and
        // `SELECT count(*) … WHERE date = …` stays metadata-only at
        // any table size. A filter any dir cannot decide exactly
        // rejects the whole pushdown (all-or-nothing, as ever).
        val metas: Seq[graft.cdc.FileStats.FileMeta] =
          if (pushed.isEmpty) byDir.flatMap(_._2)
          else if (meta.partitionCols.isEmpty) return None
          else {
            val kept = byDir.map { case (d, ms) =>
              // dirs speak physical names — translate the filter first
              val vs = pushed.toSeq.map(f =>
                PartitionFilters.exact(d, meta.partitionCols,
                  pinnedRelation.toPhysicalFilter(f)))
              if (vs.exists(_.contains(false))) Some(Seq.empty)
              else if (vs.forall(_.contains(true))) Some(ms)
              else None
            }
            if (kept.exists(_.isEmpty)) return None
            kept.flatten.flatten
          }

        def colName(e: V2Expression): Option[String] = e match {
          case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames.head)
          case _ => None
        }
        // exact non-null count: absent-from-file columns read as null
        // (schema evolution backfill) and count 0; present columns
        // need a recorded null count in every file. Only footer-
        // tracked top-level primitives qualify: nested (struct/array/
        // map) columns never enter FileMeta.present (FileStats records
        // path-length-1 chunks only), so "absent" would misread a
        // populated nested column as count 0
        def countCol(n: String): Option[Long] = {
          val dt = schema.fields.find(_.name == n).map(_.dataType).getOrElse(return None)
          dt match {
            case _: StructType | _: ArrayType | _: MapType => return None
            case _ =>
          }
          // footer stats key PHYSICAL names (column mapping)
          val pn = pinnedRelation.physicalName(n)
          val per = metas.map { m =>
            if (!m.present(pn)) Some(0L) else m.nulls.get(pn).map(m.rows - _)
          }
          if (per.exists(_.isEmpty)) None else Some(per.flatten.sum)
        }
        // min/max folded over file ranges; a file contributes nothing
        // when the column is absent or provably all-null, and rejects
        // the pushdown when its stats can't prove either. Types are
        // restricted to those whose footer order matches Spark's
        // (integral, float/double without NaN, UTF-8 strings).
        def rangeCol(e: V2Expression, isMin: Boolean): Option[(DataType, Any)] = {
          val n = colName(e).getOrElse(return None)
          val dt = schema.fields.find(_.name == n).map(_.dataType).getOrElse(return None)
          val wantTag = dt match {
            case ByteType | ShortType | IntegerType | LongType => "i"
            case FloatType | DoubleType => "f"
            case StringType => "s"
            case _ => return None
          }
          val pn = pinnedRelation.physicalName(n) // stats are physical-keyed
          val per = metas.map { m =>
            if (!m.present(pn)) Some(None) // no rows with this column
            else m.cols.get(pn) match {
              case Some((mn, mx, t)) if t == wantTag => Some(Some(if (isMin) mn else mx))
              case Some(_) => None // tag/type drift: give up
              case None =>
                // no range but provably all-null → contributes nothing
                if (m.nulls.get(pn).contains(m.rows)) Some(None) else None
            }
          }
          if (per.exists(_.isEmpty)) return None
          val bounds = per.flatten.flatten
          if (bounds.isEmpty) return Some((dt, null))
          val best = wantTag match {
            case "i" =>
              val vs = bounds.map(_.toLong); if (isMin) vs.min else vs.max
            case "f" =>
              val vs = bounds.map(_.toDouble)
              if (vs.exists(_.isNaN)) return None // parquet NaN stats are unreliable
              if (isMin) vs.min else vs.max
            case _ => bounds.reduce((a, b) =>
              if (graft.cdc.FileStats.utf8Cmp(a, b) <= 0 == isMin) a else b)
          }
          val ext: Any = dt match {
            case ByteType => best.toString.toLong.toByte
            case ShortType => best.toString.toLong.toShort
            case IntegerType => best.toString.toLong.toInt
            case LongType => best.toString.toLong
            case FloatType => best.toString.toFloat
            case DoubleType => best.toString.toDouble
            case _ => best.toString
          }
          Some((dt, ext))
        }

        def planOne(f: AggregateFunc): Option[(DataType, Any)] = f match {
          case _: CountStar => Some((LongType, metas.map(_.rows).sum))
          case c: Count if !c.isDistinct =>
            colName(c.column).flatMap(countCol).map((LongType, _))
          case m: Min => rangeCol(m.column, isMin = true)
          case m: Max => rangeCol(m.column, isMin = false)
          case _ => None
        }

        val planned = agg.aggregateExpressions.toSeq.map(planOne)
        if (planned.exists(_.isEmpty)) None
        else {
          val fields = planned.flatten.zipWithIndex.map { case ((dt, _), i) =>
            StructField(s"pushed_agg_$i", dt, nullable = true)
          }
          Some((StructType(fields), Row.fromSeq(planned.flatten.map(_._2))))
        }
      }

      override def build(): Scan = aggResult match {
        case Some((aggSchema, row)) => new MergeTableMetadataAggScan(aggSchema, row)
        // DSv2 Batch fast path: COW plain-parquet snapshots read
        // through Spark's vectorized parquet reader with bucket-keyed
        // partitions (storage-partitioned joins) and runtime filtering
        // — pushed-filter columns must resolve top-level or the exact
        // row-mode re-check cannot bind them. Deletion-vector
        // snapshots (bounded mask) ride the same path with the mask
        // applied positionally above the raw read, and MOR snapshots
        // (bounded delta layer) with latest-by-key reconciliation
        // against a broadcast delta key set — the hottest CDC tables
        // live in dv/MOR between compactions, so they keep file
        // pruning, SPJ partitioning, and runtime filtering too.
        case None if (pinnedRelation.batchReadable || pinnedRelation.batchReadableDv ||
            pinnedRelation.batchReadableMor) &&
            pushed.flatMap(_.references).forall(r =>
              pinnedRelation.schema.fieldNames.contains(r)) &&
            MergeTableBatchScan.rowFormExists(pushed, pinnedRelation.schema) =>
          new MergeTableBatchScan(spark, pinnedRelation, required, pushed, advisory,
            wantFile)
        case None => new V1Scan {
          override def readSchema(): StructType =
            if (!wantFile) required
            else StructType(required.fields :+ org.apache.spark.sql.types
              .StructField(MergeTableV2.FileColumnName,
                org.apache.spark.sql.types.StringType, nullable = false))
          override def toV1TableScan[T <: BaseRelation with TableScan](
              context: SQLContext): T = {
            val rel = pinnedRelation
            val cols = required.fieldNames
            val out = readSchema()
            // advisory (not just claimed) filters reach the relation
            // so file skipping still sees residual data filters; the
            // relation applies them exactly, Spark re-applies above —
            // idempotent predicates, no correctness interaction
            val fs = advisory
            new BaseRelation with TableScan {
              override def sqlContext: SQLContext = context
              override def schema: StructType = out
              override def buildScan(): org.apache.spark.rdd.RDD[Row] =
                // wantFile only reaches V1 when a claimed filter lost
                // its row form AFTER metadataColumns() advertised on a
                // batch-readable snapshot — the relation's direct
                // parquet scan still knows each row's file
                if (wantFile) rel.buildScanWithFile(cols, fs)
                else rel.buildScan(cols, fs)
            }.asInstanceOf[T]
          }
        }
      }
    }

  /** Write planning: the TRUE DSv2 BatchWrite
    * (sources/MergeTableBatchWrite) serves the shapes a pure
    * executor-side file write can express — flat-table appends and
    * the FIRST write of a bucketed/partitioned table (INSERT-into-
    * empty, CTAS) — making `RequiresDistributionAndOrdering` REAL:
    * a bucketed seed asks the engine to cluster rows by the
    * catalog-served `bucket(n, keys…)` transform, a partitioned seed
    * by identity(partition cols). (On a `V1Write` the request is
    * silently ignored — Spark executes the V1 fallback from the
    * stored ANALYZED query, bypassing the prepared rebalance.)
    * Everything a file write cannot express falls back to V1:
    * appends into POPULATED keyed layouts (scoped merges), CHECK
    * constraints (enforced on the batch before any file lands),
    * column mapping (files carry physical names), and time travel
    * (refused either way).
    */
  /** INSERT OVERWRITE (the truncate-then-append form) rides the same
    * v2 write: the staged base REPLACES every data entry in one
    * commit — the full-refresh pattern for flat snapshot tables.
    * Partition-filtered overwrite is not offered (no SupportsOverwrite
    * — Spark refuses it at analysis); keyed layouts, constraints, and
    * column mapping refuse loudly rather than silently degrade to a
    * different answer.
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate with SupportsDynamicOverwrite {
      private var truncateFirst = false
      private var dynamicOverwrite = false
      override def truncate(): WriteBuilder = { truncateFirst = true; this }
      override def overwriteDynamicPartitions(): WriteBuilder = {
        require(dynamicOverwriteEligible,
          s"dynamic partition overwrite on ${name()} requires a partitioned, " +
            "constraint-free, unmapped table (no time travel)")
        dynamicOverwrite = true; this
      }
      override def build(): Write =
        if (dynamicOverwrite)
          new MergeTableDynamicOverwrite(path, meta, info.schema())
        else if (v2WriteEligible)
          new MergeTableBatchWrite(path, meta, info.schema(),
            overwrite = truncateFirst)
        else {
          require(!truncateFirst,
            s"INSERT OVERWRITE on ${name()} is not supported for populated " +
              "keyed layouts, CHECK-constrained, or column-mapped tables; " +
              "use MERGE INTO / DELETE FROM for row-level replacement")
          v1Write
        }
    }

  private def v1Write: V1Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit = {
          require(version.isEmpty && ref.isEmpty,
            "cannot write to a time-travel or ref-pinned snapshot")
          require(!overwrite, "INSERT OVERWRITE is not supported; use MERGE INTO")
          // forWrite routes onto the WAP branch (forking it from the
          // current head on first use) when spark.graft.wap.branch is
          // set — the Iceberg write-audit-publish shape
          val t = MergeTable.forWrite(data.sparkSession, path, meta.keys,
            meta.mode, meta.numBuckets,
            partitionCols = meta.partitionCols)
          t.append(data)
        }
      }
  }
}

/** The metadata-answered aggregate scan: one driver-known row, zero
  * data files opened. A NAMED class (with toString = description) so
  * the executed plan renders `MergeTableMetadataAggScan …` — the
  * plan-identity contract AggregatePushdownSpec asserts; an anonymous
  * V1Scan prints its default `Class$$anon$N@hash` and the marker never
  * appears even when the pushdown works.
  */
object MergeTableV2 {
  /** The one definition of the file-lineage metadata column name. */
  val FileColumnName = "_graft_file"

  private[sources] object FileMetadataColumn extends MetadataColumn {
    override def name: String = FileColumnName
    override def dataType: org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.StringType
    override def isNullable: Boolean = false
    override def comment: String =
      "absolute path of the data file this row was read from"
  }
}

/** Inspection tables (Iceberg's `db.t.files` / `.history` / `.refs`
  * metadata-table surface):
  *
  *  - `files`:   one row per live data FILE of the current snapshot —
  *               (content, file_path, size_bytes, commit_dir), the
  *               audit surface for layout/compaction health;
  *  - `history`: the commit log — (version, committed_at,
  *               base_entries, delta_entries), same facts as
  *               DESCRIBE HISTORY but queryable/joinable as a table;
  *  - `refs`:    branches and tags with their head/pinned versions.
  *
  * Read-only; rows are computed driver-side from the manifest at
  * buildScan time (metadata scale — the same class of driver work as
  * any table format's planning), so a metadata query never opens data
  * files. Honors the WAP branch conf the way snapshot reads do:
  * `spark.graft.wap.branch` routes `files`/`history` to that branch's
  * lineage when the table has it.
  */
private[sources] class MergeTableMetadataTable(ident: Identifier, path: String,
    kind: String) extends Table with SupportsRead {
  import org.apache.spark.sql.types._

  override def name(): String = (ident.namespace() :+ ident.name()).mkString(".")
  override def schema(): StructType = MergeTableMetadataTable.schemaOf(kind)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def partitioning(): Array[Transform] = Array.empty
  override def properties(): util.Map[String, String] =
    Map("kind" -> s"metadata:$kind").asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = schema()
        override def description(): String = s"MergeTableMetadataTable($kind) $path"
        override def toString: String = description()
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = MergeTableMetadataTable.schemaOf(kind)
            override def buildScan(): org.apache.spark.rdd.RDD[Row] =
              context.sparkSession.sparkContext.parallelize(
                MergeTableMetadataTable.rows(context.sparkSession, path, kind), 1)
          }.asInstanceOf[T]
      }
    }
}

private[sources] object MergeTableMetadataTable {
  import org.apache.spark.sql.types._

  val Kinds: Set[String] = Set("files", "history", "refs", "manifests", "stats")

  def schemaOf(kind: String): StructType = kind match {
    case "files" => StructType(Seq(
      StructField("content", StringType),
      StructField("file_path", StringType),
      StructField("size_bytes", LongType),
      StructField("commit_dir", StringType)))
    // the commit-log HEALTH surface for the incremental/two-level
    // machinery: is the log actually staying O(delta)? how deep are
    // the chains, how big the checkpoints, how much re-referencing?
    case "manifests" => StructType(Seq(
      StructField("version", LongType),
      StructField("kind", StringType), // full | delta | segments
      StructField("chain_depth", IntegerType),
      StructField("bytes", LongType),
      StructField("entries", IntegerType),
      StructField("segment_refs", IntegerType)))
    // the ANALYZE surface: what the CBO, the skew-salting rule, and
    // incremental folds are actually working from — per column, with
    // the sketch-register presence that decides whether the NEXT
    // ANALYZE can fold incrementally
    case "stats" => StructType(Seq(
      StructField("column", StringType),
      StructField("ndv", LongType),
      StructField("null_count", LongType),
      StructField("avg_len", LongType),
      StructField("max_len", LongType),
      StructField("min", DoubleType),
      StructField("max", DoubleType),
      StructField("hist_bins", IntegerType),
      StructField("heavy_bins", IntegerType),
      StructField("has_ndv_sketch", BooleanType),
      StructField("has_quantile_sketch", BooleanType),
      StructField("stats_version", LongType),
      StructField("table_rows", LongType)))
    case "history" => StructType(Seq(
      StructField("version", LongType),
      StructField("committed_at", TimestampType),
      StructField("base_entries", IntegerType),
      StructField("delta_entries", IntegerType),
      StructField("operation", StringType)))
    case "refs" => StructType(Seq(
      StructField("name", StringType),
      StructField("type", StringType),
      StructField("version", LongType)))
  }

  def rows(spark: SparkSession, path: String, kind: String): Seq[Row] = {
    val base = MergeTable.open(spark, path)
    val t = MergeTable.wapBranch(spark).filter(base.branchExists)
      .map(base.forBranch).getOrElse(base)
    kind match {
      case "files" =>
        t.currentEntries().flatMap { case (tag, d) =>
          val dir = t.dirPath(d)
          if (!Files.isDirectory(dir)) Nil
          else {
            val s = Files.walk(dir)
            try s.iterator().asScala.toSeq
              .filter(p => Files.isRegularFile(p) &&
                !p.getFileName.toString.startsWith("_") &&
                !p.getFileName.toString.startsWith("."))
              .map(p => Row(tag, s"data/$d/${dir.relativize(p)}",
                Files.size(p), d))
            finally s.close()
          }
        }
      case "history" =>
        t.history().map { case (v, ms, b, d, op) =>
          Row(v, new java.sql.Timestamp(ms), b, d, op)
        }
      case "manifests" =>
        t.versions().map { v =>
          val m = t.manifestFile(v)
          val raw = MergeTable.parseManifestLines(m)
          val mkind = raw.headOption match {
            case Some(("@delta", _)) => "delta"
            case Some(("@segments", _)) => "segments"
            case _ => "full"
          }
          val meta = Set("txn", "sort", "op")
          Row(v, mkind, MergeTable.chainDepthOf(m), Files.size(m),
            MergeTable.resolveManifestIn(m).count(e => !meta.contains(e._1)),
            raw.count(_._1 == "s"))
        }
      case "stats" =>
        t.tableStats().toSeq.flatMap { st =>
          st.cols.toSeq.sortBy(_._1).map { case (c, cs) =>
            Row(c, cs.ndv, cs.nullCount, cs.avgLen, cs.maxLen,
              cs.min.map(Double.box).orNull, cs.max.map(Double.box).orNull,
              cs.hist.map(_.bins.length).getOrElse(0),
              cs.hist.map(_.bins.count(b => b.lo == b.hi)).getOrElse(0),
              cs.hllB64.isDefined, cs.kllB64.isDefined,
              st.version, st.rows)
          }
        }
      case "refs" =>
        val main = Row("main", "branch", base.versions().lastOption.getOrElse(0L))
        val branches = base.branches().sorted.map { b =>
          Row(b, "branch", base.forBranch(b).versions().lastOption.getOrElse(0L))
        }
        val tags = base.tags().map(tg => Row(tg, "tag", base.tagVersion(tg)))
        main +: (branches ++ tags)
    }
  }
}

private[sources] class MergeTableMetadataAggScan(
    aggSchema: StructType, row: Row) extends V1Scan {
  override def readSchema(): StructType = aggSchema
  override def description(): String =
    s"MergeTableMetadataAggScan ${aggSchema.fieldNames.mkString(", ")}"
  override def toString: String = description()
  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = aggSchema
      override def buildScan(): org.apache.spark.rdd.RDD[Row] =
        context.sparkSession.sparkContext.parallelize(Seq(row), 1)
    }.asInstanceOf[T]
}
