package graft.sources

import graft.SparkSpec
import graft.cdc.MergeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Bucketed-SORTED tables (`OPTIMIZE … SORT BY` / `sortBuckets`): the
  * sorting rewrite records a `sort` marker on its own commit, the DSv2
  * batch scan reports per-partition ordering while the marker is
  * current, and a join of two co-bucketed sorted tables plans as a
  * sort-merge join with NEITHER a shuffle NOR a sort — the two
  * dominant costs of a 100 TB fact⋈fact join. Any later write drops
  * the marker, so the ordering claim can never outlive its snapshot.
  * (A falsely-claimed order would make the merge join silently wrong,
  * so the exact-result assertions below are the semantic proof, not
  * just the plan shape.)
  */
class SortedBucketSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(db: String): Unit = {
    MergeTable.drop(s"target/graft_warehouse/$db")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$db")
  }

  private val noBroadcast = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

  test("co-bucketed SORTED tables merge-join with zero shuffles AND zero sorts") {
    fresh("sb1")
    for (t <- Seq("facts", "dims")) {
      spark.sql(s"""CREATE TABLE graft.sb1.$t (id BIGINT, v STRING)
                    TBLPROPERTIES('keys'='id', 'buckets'='4')""")
    }
    val n = 400
    (1 to n).map(i => (i.toLong, s"f$i")).toDF("id", "v")
      .createOrReplaceTempView("sb1_f")
    (1 to n).map(i => (i.toLong, s"d$i")).toDF("id", "v")
      .createOrReplaceTempView("sb1_d")
    spark.sql("INSERT INTO graft.sb1.facts SELECT * FROM sb1_f")
    spark.sql("INSERT INTO graft.sb1.dims SELECT * FROM sb1_d")

    def join() = spark.sql(
      """SELECT f.id, f.v AS fv, d.v AS dv
        |FROM graft.sb1.facts f JOIN graft.sb1.dims d ON f.id = d.id""".stripMargin)

    withSQLConf(noBroadcast: _*) {
      // baseline: SPJ removes the shuffles but the merge join still sorts
      val (sh0, so0) = planCounts(join())
      assert(sh0 === 0)
      assert(so0 > 0, "expected the unsorted baseline to sort before merging")

      assert(spark.sql("OPTIMIZE graft.sb1.facts SORT BY (id)").head().getLong(0) === 4L)
      assert(spark.sql("OPTIMIZE graft.sb1.dims SORT BY (id)").head().getLong(0) === 4L)

      val j = join()
      val (sh1, so1) = planCounts(j)
      assert(sh1 === 0,
        s"sorted join shuffled:\n${j.queryExecution.executedPlan}")
      assert(so1 === 0,
        s"sorted join re-sorted:\n${j.queryExecution.executedPlan}")
      // exact results — a falsely-reported order would corrupt these
      assert(j.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet ===
        (1 to n).map(i => (i.toLong, s"f$i", s"d$i")).toSet)
    }
  }

  test("a projection that prunes the sort column still plans (prefix ordering claim)") {
    fresh("sb3")
    spark.sql("""CREATE TABLE graft.sb3.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'buckets'='2')""")
    (1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .createOrReplaceTempView("sb3_src")
    spark.sql("INSERT INTO graft.sb3.t SELECT * FROM sb3_src")
    spark.sql("OPTIMIZE graft.sb3.t SORT BY (id)")
    // Spark resolves the reported ordering against the PRUNED scan
    // output and throws on a miss — the claim must shrink to the
    // prefix of sort columns the projection keeps (here: none)
    assert(spark.sql("SELECT v FROM graft.sb3.t").collect().length === 50)
    // and a projection keeping the sort column keeps the claim
    assert(spark.sql("SELECT id FROM graft.sb3.t").collect().length === 50)
  }

  test("a write after the sorting rewrite invalidates the ordering claim") {
    fresh("sb2")
    spark.sql("""CREATE TABLE graft.sb2.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'buckets'='2')""")
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .createOrReplaceTempView("sb2_src")
    spark.sql("INSERT INTO graft.sb2.t SELECT * FROM sb2_src")
    spark.sql("OPTIMIZE graft.sb2.t SORT BY (id)")
    val t = MergeTable.open(spark, "target/graft_warehouse/sb2/t")
    assert(t.currentSortedBy() === Seq("id"))

    spark.sql("INSERT INTO graft.sb2.t VALUES (101, 'x')")
    assert(t.currentSortedBy() === Nil)
    withSQLConf(noBroadcast: _*) {
      val j = spark.sql(
        """SELECT a.id FROM graft.sb2.t a JOIN graft.sb2.t b ON a.id = b.id""")
      val (sh, so) = planCounts(j)
      assert(sh === 0)
      assert(so > 0, "stale sort marker: the scan still reported ordering")
      assert(j.count() === 101)
    }
  }

  test("sortBuckets folds pending MOR deltas and the next delta drops the marker") {
    val root = "target/test_tmp/sorted_mor"
    MergeTable.drop(root)
    val t = new MergeTable(spark, root, Seq("id"),
      mode = MergeTable.MergeOnRead, numBuckets = Some(2))
    t.upsert((1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    t.upsert(Seq((7L, "V7"), (51L, "v51")).toDF("id", "v")) // pending delta
    assert(t.sortBuckets(Seq("id")) === 2)
    assert(t.currentSortedBy() === Seq("id"))
    val got = t.read().select("id", "v").as[(Long, String)].collect().toMap
    assert(got(7L) === "V7" && got(51L) === "v51" && got.size === 51)
    t.upsert(Seq((52L, "v52")).toDF("id", "v"))
    assert(t.currentSortedBy() === Nil)
  }

  test("a declared sortBy property lands the v2 seed presorted — no rewrite pass") {
    fresh("sb4")
    for (t <- Seq("facts", "dims")) {
      spark.sql(s"""CREATE TABLE graft.sb4.$t (id BIGINT, v STRING)
                    TBLPROPERTIES('keys'='id', 'buckets'='4', 'sortBy'='id')""")
    }
    val n = 300
    (1 to n).map(i => (i.toLong, s"f$i")).toDF("id", "v")
      .createOrReplaceTempView("sb4_f")
    (1 to n).map(i => (i.toLong, s"d$i")).toDF("id", "v")
      .createOrReplaceTempView("sb4_d")
    spark.sql("INSERT INTO graft.sb4.facts SELECT * FROM sb4_f")
    spark.sql("INSERT INTO graft.sb4.dims SELECT * FROM sb4_d")
    // the seed commit itself carries the marker — no OPTIMIZE ran
    for (t <- Seq("facts", "dims")) {
      assert(MergeTable.open(spark, s"target/graft_warehouse/sb4/$t")
        .currentSortedBy() === Seq("id"))
    }
    withSQLConf(noBroadcast: _*) {
      val j = spark.sql(
        """SELECT f.id, f.v AS fv, d.v AS dv
          |FROM graft.sb4.facts f JOIN graft.sb4.dims d ON f.id = d.id""".stripMargin)
      val (sh, so) = planCounts(j)
      assert(sh === 0, s"shuffled:\n${j.queryExecution.executedPlan}")
      assert(so === 0, s"re-sorted:\n${j.queryExecution.executedPlan}")
      assert(j.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet ===
        (1 to n).map(i => (i.toLong, s"f$i", s"d$i")).toSet)
    }

    // sortBy without a bucketed layout refuses at CREATE
    val e = intercept[Exception](
      spark.sql("""CREATE TABLE graft.sb4.bad (id BIGINT, v STRING)
                   TBLPROPERTIES('keys'='id', 'sortBy'='id')"""))
    assert(e.getMessage.contains("hash-bucketed"), e.getMessage)

    // the property round-trips through the catalog's reported set,
    // and renaming/dropping a declared (non-key) sort column refuses
    assert(spark.sql("SHOW TBLPROPERTIES graft.sb4.facts").collect()
      .exists(r => r.getString(0) == "sortBy" && r.getString(1) == "id"))
    spark.sql("""CREATE TABLE graft.sb4.byv (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'buckets'='2', 'sortBy'='v')""")
    assert(intercept[Exception](
      spark.sql("ALTER TABLE graft.sb4.byv RENAME COLUMN v TO w"))
      .getMessage.contains("sortBy"))
    assert(intercept[Exception](
      spark.sql("ALTER TABLE graft.sb4.byv DROP COLUMN (v)"))
      .getMessage.contains("sortBy"))
  }

  test("a maxRecordsPerFile roll keeps the seed marker (one writer = one sorted run)") {
    fresh("sb5")
    spark.sql("""CREATE TABLE graft.sb5.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id', 'buckets'='2', 'sortBy'='id')""")
    (1 to 200).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .createOrReplaceTempView("sb5_src")
    withSQLConf("spark.sql.files.maxRecordsPerFile" -> "40") {
      spark.sql("INSERT INTO graft.sb5.t SELECT * FROM sb5_src")
    }
    val t = MergeTable.open(spark, "target/graft_warehouse/sb5/t")
    // each bucket rolled to ~3 files from ONE writer — still one
    // sorted run in roll order, so the marker holds and reads are right
    assert(t.currentSortedBy() === Seq("id"))
    assert(spark.table("graft.sb5.t").count() === 200)
    withSQLConf(noBroadcast: _*) {
      val j = spark.sql(
        "SELECT a.id FROM graft.sb5.t a JOIN graft.sb5.t b ON a.id = b.id")
      val (sh, so) = planCounts(j)
      assert(sh === 0 && so === 0,
        s"rolled sorted seed lost its claim:\n${j.queryExecution.executedPlan}")
      assert(j.count() === 200)
    }
  }

  test("sortBuckets refuses unbucketed layouts") {
    val root = "target/test_tmp/sorted_refuse"
    MergeTable.drop(root)
    val flat = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    assert(intercept[IllegalArgumentException](
      flat.sortBuckets(Seq("id"))).getMessage.contains("hash-bucketed"))
  }

  test("COMPOSED sorted cells: one-partition joins skip sorts; full scans claim nothing (r13)") {
    fresh("sb9")
    for (t <- Seq("a", "b")) {
      spark.sql(s"""CREATE TABLE graft.sb9.$t (id BIGINT, day STRING, v BIGINT)
                    TBLPROPERTIES('keys'='id', 'buckets'='4') PARTITIONED BY (day)""")
      (1 to 400).map(i => (i.toLong, s"d${i % 3}", i.toLong)).toDF("id", "day", "v")
        .createOrReplaceTempView(s"sb9_$t")
      spark.sql(s"INSERT INTO graft.sb9.$t SELECT * FROM sb9_$t")
      // per-cell sorted rewrite (3 partitions × up to 4 buckets)
      assert(spark.sql(s"OPTIMIZE graft.sb9.$t SORT BY (id)").head().getLong(0) >= 3L)
    }
    def join(where: String) = spark.sql(
      s"""SELECT a.id, a.v, b.v FROM graft.sb9.a a JOIN graft.sb9.b b
          ON a.id = b.id WHERE $where""")
    withSQLConf(noBroadcast: _*) {
      // pruned to ONE partition: every surviving bucket is one sorted
      // cell — the merge join skips BOTH the shuffle and the sorts
      val one = join("a.day = 'd1' AND b.day = 'd1'")
      val (sh1, so1) = planCounts(one)
      assert(sh1 === 0, s"one-partition composed join shuffled:\n${one.queryExecution.executedPlan}")
      assert(so1 === 0, s"one-partition composed join re-sorted:\n${one.queryExecution.executedPlan}")
      assert(one.count() === 134L) // ids ≡ 1 (mod 3): 1, 4, …, 400 → 134
      // FULL scan: a bucket concatenates 3 cells — the ordering claim
      // must NOT be made, and the join sorts (correctness over claims)
      val full = join("true")
      val (sh2, so2) = planCounts(full)
      assert(sh2 === 0, "composed SPJ itself must still hold")
      assert(so2 > 0, "a multi-cell bucket must not claim a sorted scan")
      assert(full.count() === 400L)
    }
  }
}
