package graft.sources

import graft.SparkSpec
import graft.cdc.MergeTable
import org.apache.spark.sql.DataFrame

/** Metadata-only aggregate pushdown through the catalog: count(*) /
  * count(col) / min / max over a prunable snapshot fold out of the
  * per-file footer stats recorded at commit time — the plan carries NO
  * aggregate node and the data files are never opened (proved below by
  * deleting one). Anything the metadata cannot answer EXACTLY (pending
  * deltas or masks, residual filters, grouping, distinct, unknown
  * stats) falls back to the real scan, never to an approximation.
  */
class AggregatePushdownSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(db: String): Unit =
    MergeTable.drop(s"target/graft_warehouse/$db")

  private def hasAgg(df: DataFrame): Boolean = {
    val p = df.queryExecution.executedPlan.toString
    p.contains("HashAggregate") || p.contains("SortAggregate") ||
      p.contains("ObjectHashAggregate")
  }

  private def isMetadataScan(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("MergeTableMetadataAggScan")

  test("count/min/max fold from metadata with no aggregate in the plan") {
    fresh("aggdb1")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.aggdb1")
    spark.sql("""CREATE TABLE graft.aggdb1.t (id BIGINT, v STRING, x DOUBLE)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("""INSERT INTO graft.aggdb1.t VALUES
                 (1, 'alpha', 1.5), (2, NULL, -2.25), (3, 'zed', 0.0)""")
    spark.sql("INSERT INTO graft.aggdb1.t VALUES (4, 'beta', 7.75), (5, NULL, 3.5)")

    val q = spark.sql(
      """SELECT count(*) AS c, count(v) AS cv, min(id) AS mn, max(id) AS mx,
                min(v) AS vmn, max(v) AS vmx, min(x) AS xmn, max(x) AS xmx
         FROM graft.aggdb1.t""")
    assert(!hasAgg(q), s"expected pushed aggregation, got:\n${q.queryExecution.executedPlan}")
    assert(isMetadataScan(q))
    val r = q.head()
    assert(r.getLong(0) === 5L)
    assert(r.getLong(1) === 3L)
    assert(r.getLong(2) === 1L && r.getLong(3) === 5L)
    assert(r.getString(4) === "alpha" && r.getString(5) === "zed")
    assert(r.getDouble(6) === -2.25 && r.getDouble(7) === 7.75)
  }

  test("the pushed plan carries no file scan and reads no records") {
    fresh("aggdb2")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.aggdb2")
    spark.sql("""CREATE TABLE graft.aggdb2.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.aggdb2.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val q = spark.sql("SELECT count(*) AS c, max(id) AS mx FROM graft.aggdb2.t")
    val plan = q.queryExecution.executedPlan.toString
    assert(isMetadataScan(q))
    assert(!plan.contains("FileScan"), s"data scan survived pushdown:\n$plan")
    // the executed tasks read zero input records — the answer came
    // from commit metadata, not the data files
    var recordsRead = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        recordsRead += te.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(q.as[(Long, Long)].head() === ((3L, 3L)))
      Thread.sleep(500) // listener bus drains asynchronously
      assert(recordsRead === 0L)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("residual filters, grouping, and distinct fall back to a real scan") {
    fresh("aggdb3")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.aggdb3")
    spark.sql("""CREATE TABLE graft.aggdb3.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.aggdb3.t VALUES (1, 'a'), (2, 'a'), (3, 'b')")

    val filtered = spark.sql("SELECT count(*) AS c FROM graft.aggdb3.t WHERE id > 1")
    assert(hasAgg(filtered) && !isMetadataScan(filtered))
    assert(filtered.as[Long].head() === 2L)

    val grouped = spark.sql(
      "SELECT v, count(*) AS c FROM graft.aggdb3.t GROUP BY v ORDER BY v")
    assert(hasAgg(grouped) && !isMetadataScan(grouped))
    assert(grouped.as[(String, Long)].collect().toSeq === Seq(("a", 2L), ("b", 1L)))

    val distinct = spark.sql("SELECT count(DISTINCT v) AS c FROM graft.aggdb3.t")
    assert(hasAgg(distinct) && !isMetadataScan(distinct))
    assert(distinct.as[Long].head() === 2L)

    // sum isn't derivable from min/max/count metadata
    val sum = spark.sql("SELECT sum(id) AS s FROM graft.aggdb3.t")
    assert(hasAgg(sum) && !isMetadataScan(sum))
    assert(sum.as[Long].head() === 6L)
  }

  test("renamed tables keep the metadata-only path (physical-keyed stats, r14)") {
    fresh("aggdb9")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.aggdb9")
    spark.sql("""CREATE TABLE graft.aggdb9.t (id BIGINT, v STRING, day STRING)
                 TBLPROPERTIES('keys'='id') PARTITIONED BY (day)""")
    spark.sql("""INSERT INTO graft.aggdb9.t VALUES
                 (1, 'alpha', 'd1'), (2, NULL, 'd1'), (3, 'zed', 'd2')""")
    // rename a DATA column and the PARTITION column: footer stats and
    // dir names stay physical; the planner must translate
    spark.sql("ALTER TABLE graft.aggdb9.t RENAME COLUMN v TO label")
    spark.sql("ALTER TABLE graft.aggdb9.t RENAME COLUMN day TO event_day")
    var recordsRead = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        recordsRead += te.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val q = spark.sql(
        """SELECT count(*) AS c, count(label) AS cl, min(label) AS mn,
                  max(label) AS mx, max(id) AS mxid
           FROM graft.aggdb9.t""")
      assert(isMetadataScan(q),
        s"renamed table lost the metadata agg path:\n${q.queryExecution.executedPlan}")
      val r = q.head()
      assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
      assert(r.getString(2) === "alpha" && r.getString(3) === "zed")
      assert(r.getLong(4) === 3L)
      // filtered on the RENAMED partition column — still metadata-only
      val f = spark.sql(
        "SELECT count(*) AS c FROM graft.aggdb9.t WHERE event_day = 'd1'")
      assert(isMetadataScan(f),
        s"renamed partition filter lost the path:\n${f.queryExecution.executedPlan}")
      assert(f.head().getLong(0) === 2L)
      Thread.sleep(500) // listener bus drains asynchronously
      assert(recordsRead === 0L, "metadata aggregation must open zero data files")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("MOR snapshots with pending deltas are not metadata-aggregatable") {
    fresh("aggdb4")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.aggdb4")
    spark.sql("""CREATE TABLE graft.aggdb4.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.aggdb4.t VALUES (1, 'a'), (2, 'b')")
    // delta commit: an upsert of an EXISTING key — file rows double-count
    // the key, so metadata totals would be wrong and must not be used
    val t = MergeTable.open(spark, "target/graft_warehouse/aggdb4/t")
    t.upsert(Seq((2L, "B"), (3L, "c")).toDF("id", "v"))
    val q = spark.sql("SELECT count(*) AS c FROM graft.aggdb4.t")
    assert(hasAgg(q) && !isMetadataScan(q))
    assert(q.as[Long].head() === 3L)
    // compaction folds the deltas and restores the metadata path
    t.compact()
    val q2 = spark.sql("SELECT count(*) AS c FROM graft.aggdb4.t")
    assert(isMetadataScan(q2))
    assert(q2.as[Long].head() === 3L)
  }

  test("all-null and late-added columns aggregate exactly") {
    fresh("aggdb5")
    val root = "target/graft_warehouse/aggdb5/t"
    val seed = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "v")
    MergeTable.createIfAbsent(spark, root, Seq("id"), initial = Some(seed))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.aggdb5")
    val q = spark.sql(
      "SELECT count(v) AS cv, min(v) AS mn, max(v) AS mx FROM graft.aggdb5.t")
    assert(isMetadataScan(q))
    val r = q.head()
    assert(r.getLong(0) === 0L && r.isNullAt(1) && r.isNullAt(2))

    // schema evolution: files written BEFORE the column existed count
    // as all-null for it — the pushed count must match the real scan
    // (append, not upsert: the old file must SURVIVE without column w)
    val t = MergeTable.open(spark, root)
    t.append(Seq((3L, "w3", "c3")).toDF("id", "v", "w"))
    val q2 = spark.sql(
      "SELECT count(*) AS c, count(w) AS cw, min(w) AS mn FROM graft.aggdb5.t")
    assert(isMetadataScan(q2))
    assert(q2.head() === org.apache.spark.sql.Row(3L, 1L, "c3"))
  }

  test("partition-only filters stay metadata-only; anything else falls back") {
    fresh("aggdb7")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.aggdb7")
    spark.sql("""CREATE TABLE graft.aggdb7.t (id BIGINT, grp STRING, v DOUBLE)
                 PARTITIONED BY (grp) TBLPROPERTIES('keys'='id')""")
    spark.sql("""INSERT INTO graft.aggdb7.t VALUES
                 (1, 'red', 1.0), (2, 'red', 2.5), (3, 'blue', -1.0),
                 (4, 'green', 9.0), (5, NULL, 4.0)""")

    val eq = spark.sql(
      """SELECT count(*) AS c, min(v) AS mn, max(id) AS mx
         FROM graft.aggdb7.t WHERE grp = 'red'""")
    assert(isMetadataScan(eq), eq.queryExecution.executedPlan.toString)
    assert(eq.head() === org.apache.spark.sql.Row(2L, 1.0, 2L))

    val in = spark.sql(
      "SELECT count(*) AS c FROM graft.aggdb7.t WHERE grp IN ('red', 'blue')")
    assert(isMetadataScan(in))
    assert(in.as[Long].head() === 3L)

    // range predicates on the partition value decide exactly too
    val rng = spark.sql(
      "SELECT count(*) AS c FROM graft.aggdb7.t WHERE grp >= 'green'")
    assert(isMetadataScan(rng))
    assert(rng.as[Long].head() === 3L) // green + 2×red; null partition excluded

    // the null partition: IS NULL selects exactly it, = excludes it
    val isNull = spark.sql(
      "SELECT count(*) AS c, max(v) AS mx FROM graft.aggdb7.t WHERE grp IS NULL")
    assert(isMetadataScan(isNull))
    assert(isNull.head() === org.apache.spark.sql.Row(1L, 4.0))

    // no partition matches: an exact empty fold, not a fallback
    val none = spark.sql(
      "SELECT count(*) AS c, max(v) AS mx FROM graft.aggdb7.t WHERE grp = 'absent'")
    assert(isMetadataScan(none))
    assert(none.head() === org.apache.spark.sql.Row(0L, null))

    // non-partition filters and mixed conjunctions take the real scan
    val vq = spark.sql("SELECT count(*) AS c FROM graft.aggdb7.t WHERE v > 0")
    assert(hasAgg(vq) && !isMetadataScan(vq))
    assert(vq.as[Long].head() === 4L)
    val mixed = spark.sql(
      "SELECT count(*) AS c FROM graft.aggdb7.t WHERE grp = 'red' AND v > 1")
    assert(hasAgg(mixed) && !isMetadataScan(mixed))
    assert(mixed.as[Long].head() === 1L)
  }

  test("partitioned MOR: pending deltas block the filtered metadata path too") {
    fresh("aggdb8")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.aggdb8")
    spark.sql("""CREATE TABLE graft.aggdb8.t (id BIGINT, grp STRING)
                 PARTITIONED BY (grp)
                 TBLPROPERTIES('keys'='id', 'mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.aggdb8.t VALUES (1, 'a'), (2, 'b')")
    val t = MergeTable.open(spark, "target/graft_warehouse/aggdb8/t")
    t.upsert(Seq((2L, "b"), (3L, "a")).toDF("id", "grp")) // pending delta
    val q = spark.sql("SELECT count(*) AS c FROM graft.aggdb8.t WHERE grp = 'a'")
    assert(hasAgg(q) && !isMetadataScan(q))
    assert(q.as[Long].head() === 2L)
    t.compact() // folds deltas into partition dirs; metadata path returns
    val q2 = spark.sql("SELECT count(*) AS c FROM graft.aggdb8.t WHERE grp = 'a'")
    assert(isMetadataScan(q2))
    assert(q2.as[Long].head() === 2L)
  }

  test("time-travel snapshots aggregate from their own version's metadata") {
    fresh("aggdb6")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.aggdb6")
    spark.sql("""CREATE TABLE graft.aggdb6.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.aggdb6.t VALUES (1, 'a'), (2, 'b')") // v1
    spark.sql("INSERT INTO graft.aggdb6.t VALUES (3, 'c')") // v2
    val q = spark.sql(
      "SELECT count(*) AS c, max(id) AS mx FROM graft.aggdb6.t VERSION AS OF 1")
    assert(isMetadataScan(q))
    assert(q.as[(Long, Long)].head() === ((2L, 2L)))
    val now = spark.sql("SELECT count(*) AS c FROM graft.aggdb6.t")
    assert(isMetadataScan(now))
    assert(now.as[Long].head() === 3L)
  }

  test("supplementary-plane partition values range-compare in UTF-8 order") {
    fresh("aggdb10")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.aggdb10")
    spark.sql("""CREATE TABLE graft.aggdb10.t (id BIGINT, grp STRING, v DOUBLE)
                 PARTITIONED BY (grp) TBLPROPERTIES('keys'='id')""")
    // U+FF01 (fullwidth !) is a single UTF-16 code unit 0xFF01 but
    // UTF-8 EF BC 81; U+1F600 (emoji) is a surrogate pair starting
    // 0xD83D but UTF-8 F0 9F 98 80. So UTF-16 code-unit order says
    // emoji < fullwidth while Spark/parquet's UTF-8 byte order says
    // fullwidth < emoji — a range predicate decided in UTF-16 order
    // answers WRONG through the exact metadata path, and wrongly
    // prunes through the scan path.
    val fw = "\uff01"
    val emoji = "\ud83d\ude00"
    spark.sql("INSERT INTO graft.aggdb10.t VALUES " +
      s"(1, 'a', 1.0), (2, '$fw', 2.0), (3, '$emoji', 3.0), (4, '$emoji', 4.0)")
    assert(spark.sql(s"SELECT '$emoji' > '$fw'").head().getBoolean(0),
      "precondition: Spark itself orders these by UTF-8 bytes")

    val gt = spark.sql(
      s"SELECT count(*) AS c FROM graft.aggdb10.t WHERE grp > '$fw'")
    assert(isMetadataScan(gt), gt.queryExecution.executedPlan.toString)
    assert(gt.as[Long].head() === 2L) // the two emoji rows

    val le = spark.sql(
      s"SELECT count(*) AS c, max(v) AS mx FROM graft.aggdb10.t WHERE grp <= '$fw'")
    assert(isMetadataScan(le))
    assert(le.head() === org.apache.spark.sql.Row(2L, 2.0)) // 'a' + fullwidth

    // the conservative scan-pruning twin must keep the emoji dir too
    val rows = spark.sql(
      s"SELECT id FROM graft.aggdb10.t WHERE grp > '$fw' ORDER BY id")
    assert(rows.as[Long].collect().toSeq === Seq(3L, 4L))
  }
}
