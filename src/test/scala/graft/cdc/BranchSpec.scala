package graft.cdc

import graft.SparkSpec

/** Branches & tags (Iceberg refs): forked manifest lineages with
  * shared data dirs, write-audit-publish via fast-forward, tag-pinned
  * retention, and the `spark.graft.wap.branch` session conf.
  */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String): (String, MergeTable) = {
    val root = s"target/test_tmp/branch_$name"
    MergeTable.drop(root)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b")).toDF("id", "v")))
    (root, t)
  }

  private def rows(t: MergeTable): Seq[(Long, String)] =
    t.read().select("id", "v").as[(Long, String)].collect().sorted.toSeq

  test("branch writes are isolated from main; fast-forward publishes per-commit history") {
    val (_, t) = freshTable("wap")
    t.upsert(Seq((3L, "c")).toDF("id", "v")) // main v2
    assert(t.createBranch("audit") === 2L)

    val b = t.forBranch("audit")
    b.upsert(Seq((2L, "B2")).toDF("id", "v")) // branch v3
    b.upsert(Seq((4L, "d")).toDF("id", "v"))  // branch v4
    assert(rows(b) === Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")))
    // main untouched by the branch's commits
    assert(rows(t) === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(t.versions() === Seq(1L, 2L))

    assert(t.fastForward("audit") === 4L)
    assert(rows(t) === Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")))
    // history-preserving: main carries the branch's INDIVIDUAL commits,
    // so the change feed replays them at commit granularity
    assert(t.versions() === Seq(1L, 2L, 3L, 4L))
    val feed = t.changesBetween(2L, 4L).select("id", "v", "_change")
      .as[(Long, String, String)].collect().sortBy(r => (r._1, r._3))
    assert(feed.toSeq === Seq((2L, "B2", "U"), (4L, "d", "I")))

    // idempotent: publishing again is a no-op at the same head
    assert(t.fastForward("audit") === 4L)
  }

  test("fast-forward refuses when main advanced past the fork") {
    val (_, t) = freshTable("diverge")
    t.createBranch("audit")
    t.forBranch("audit").upsert(Seq((3L, "c")).toDF("id", "v"))
    t.upsert(Seq((9L, "z")).toDF("id", "v")) // main diverges
    val e = intercept[CommitConflictException](t.fastForward("audit"))
    assert(e.getMessage.contains("diverged"))
  }

  test("writing to a never-created branch refuses loudly") {
    val (root, t) = freshTable("guard")
    val ghost = new MergeTable(spark, root, Seq("id"), branch = "nope")
    val e = intercept[IllegalArgumentException](
      ghost.upsert(Seq((3L, "c")).toDF("id", "v")))
    assert(e.getMessage.contains("never created"))
    assert(intercept[IllegalArgumentException](
      t.forBranch("nope")).getMessage.contains("no branch"))
  }

  test("tags pin versions through expireSnapshots and vacuum") {
    val (root, t) = freshTable("tags")
    assert(t.createTag("release") === 1L)
    t.upsert(Seq((1L, "A")).toDF("id", "v")) // v2 rewrites the base dir
    t.upsert(Seq((2L, "B")).toDF("id", "v")) // v3
    assert(t.expireSnapshots(1) === 1)       // v2 expired, v1 kept (tagged)
    assert(t.versions() === Seq(1L, 3L))
    assert(t.vacuum() >= 1)                   // v2's orphan dir reclaimed
    // the tagged snapshot still reads in full after expire + vacuum
    assert(t.readVersion(t.tagVersion("release"))
      .select("id", "v").as[(Long, String)].collect().sorted.toSeq ===
      Seq((1L, "a"), (2L, "b")))
    assert(t.tags() === Seq("release"))
    t.dropTag("release")
    assert(t.tags() === Nil)
  }

  test("vacuum keeps branch-head data dirs live; dropBranch releases them") {
    val (root, t) = freshTable("vac")
    t.createBranch("dev")
    val b = t.forBranch("dev")
    b.upsert(Seq((1L, "A")).toDF("id", "v")) // branch head = new COW dir
    assert(t.vacuum() === 0)                 // both lineages' heads live
    assert(rows(b) === Seq((1L, "A"), (2L, "b")))
    assert(t.branches() === Seq("dev"))
    t.dropBranch("dev")
    assert(t.branches() === Nil)
    assert(t.vacuum() === 1)                 // the branch's dir reclaimed
    assert(rows(t) === Seq((1L, "a"), (2L, "b")))
  }

  test("SQL surface: CREATE/SHOW/DROP BRANCH and TAG, FAST FORWARD, VERSION AS OF ref") {
    MergeTable.drop("target/graft_warehouse/br1")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.br1")
    spark.sql("""CREATE TABLE graft.br1.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.br1.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE graft.br1.t CREATE TAG seed")
    assert(spark.sql("ALTER TABLE graft.br1.t CREATE BRANCH audit")
      .head().getLong(0) === 1L)

    // write on the branch via the WAP conf, then inspect both sides
    spark.conf.set(MergeTable.WapBranchConf, "audit")
    try {
      spark.sql("INSERT INTO graft.br1.t VALUES (3, 'c')")
      assert(spark.table("graft.br1.t").count() === 3) // WAP reads the branch
    } finally spark.conf.unset(MergeTable.WapBranchConf)
    assert(spark.table("graft.br1.t").count() === 2)   // main untouched

    // explicit ref reads without the conf
    assert(spark.sql("SELECT * FROM graft.br1.t VERSION AS OF 'audit'").count() === 3)
    assert(spark.sql("SELECT * FROM graft.br1.t VERSION AS OF 'seed'").count() === 2)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft.br1.t VERSION AS OF 'ghost'").collect())
    assert(e.getMessage.contains("no such tag or branch"))

    val shown = spark.sql("SHOW BRANCHES graft.br1.t").collect()
    assert(shown.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("audit", 2L, 1L)))
    assert(spark.sql("SHOW TAGS graft.br1.t").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("seed", 1L)))

    val detail = spark.sql("DESCRIBE DETAIL graft.br1.t").head()
    val byName = spark.sql("DESCRIBE DETAIL graft.br1.t").columns.zipWithIndex.toMap
    assert(detail.getString(byName("branches")) === "audit")
    assert(detail.getString(byName("tags")) === "seed=v1")

    assert(spark.sql("ALTER TABLE graft.br1.t FAST FORWARD audit")
      .head().getLong(0) === 2L)
    assert(spark.table("graft.br1.t").count() === 3)

    spark.sql("ALTER TABLE graft.br1.t DROP BRANCH audit")
    spark.sql("ALTER TABLE graft.br1.t DROP TAG seed")
    assert(spark.sql("SHOW BRANCHES graft.br1.t").count() === 0)
    assert(spark.sql("SHOW TAGS graft.br1.t").count() === 0)
  }

  test("WAP MERGE + DELETE land on the auto-created branch; fast-forward publishes") {
    MergeTable.drop("target/graft_warehouse/br2")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.br2")
    spark.sql("""CREATE TABLE graft.br2.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.br2.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")

    Seq((2L, "B"), (4L, "d")).toDF("id", "v").createOrReplaceTempView("br2_src")
    spark.conf.set(MergeTable.WapBranchConf, "audit")
    try {
      // first WAP write forks the branch from the current head
      spark.sql("""MERGE INTO graft.br2.t t USING br2_src s ON t.id = s.id
                   WHEN MATCHED THEN UPDATE SET *
                   WHEN NOT MATCHED THEN INSERT *""")
      spark.sql("DELETE FROM graft.br2.t WHERE v = 'a'")
      assert(spark.table("graft.br2.t").as[(Long, String)].collect().sorted.toSeq ===
        Seq((2L, "B"), (3L, "c"), (4L, "d")))
    } finally spark.conf.unset(MergeTable.WapBranchConf)
    // audit did not touch main
    assert(spark.table("graft.br2.t").as[(Long, String)].collect().sorted.toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    spark.sql("ALTER TABLE graft.br2.t FAST FORWARD audit")
    assert(spark.table("graft.br2.t").as[(Long, String)].collect().sorted.toSeq ===
      Seq((2L, "B"), (3L, "c"), (4L, "d")))
  }

  test("the streaming change feed follows a branch's commits before they publish") {
    import org.apache.spark.sql.streaming.Trigger
    val (root, t) = freshTable("feed")
    t.createBranch("audit")
    val b = t.forBranch("audit")
    b.upsert(Seq((2L, "B"), (3L, "c")).toDF("id", "v")) // branch v2: U(2), I(3)
    t.upsert(Seq((9L, "z")).toDF("id", "v"))            // main v2 (diverges — not in the feed)

    val stream = spark.readStream.format("mergetable")
      .option("path", root).option("keys", "id")
      .option("branch", "audit")
      .option("startingVersion", "1")
      .load()
    val q = stream.writeStream.format("memory")
      .queryName("branch_feed").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val got = spark.table("branch_feed")
      .select("id", "v", "_change").as[(Long, String, String)].collect().toSet
    assert(got === Set((2L, "B", "U"), (3L, "c", "I")))

    // a typo'd branch name refuses instead of streaming an empty lineage
    val e = intercept[Exception](spark.readStream.format("mergetable")
      .option("path", root).option("keys", "id").option("branch", "nope").load())
    assert(e.getMessage.contains("no branch"))
  }

  test("fast-forward resumes after a crash mid-publish") {
    val (root, t) = freshTable("resume")
    t.createBranch("audit")
    val b = t.forBranch("audit")
    b.upsert(Seq((3L, "c")).toDF("id", "v")) // branch v2
    b.upsert(Seq((4L, "d")).toDF("id", "v")) // branch v3
    // simulate a publish that crashed after copying ONLY v2: link the
    // branch manifest into main by hand (byte-identical prefix)
    val src = java.nio.file.Paths.get(root, "branches", "audit", "manifests", "v00002.txt")
    val dst = java.nio.file.Paths.get(root, "manifests", "v00002.txt")
    java.nio.file.Files.createLink(dst, src)
    // resume: already-present identical versions are accepted, the
    // remainder publishes, and the result is the full branch state
    assert(t.fastForward("audit") === 3L)
    assert(rows(t) === Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    assert(t.versions() === Seq(1L, 2L, 3L))
  }

  test("wap.branch=main is a no-op route and all-digit ref names refuse") {
    MergeTable.drop("target/graft_warehouse/br3")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.br3")
    spark.sql("""CREATE TABLE graft.br3.t (id BIGINT, v STRING)
                 TBLPROPERTIES('keys'='id')""")
    // 'main' names the unforked lineage: the natural way to say "no
    // WAP routing" — writes land on main instead of crashing on an
    // unforkable branch name
    spark.conf.set(MergeTable.WapBranchConf, "main")
    try spark.sql("INSERT INTO graft.br3.t VALUES (1, 'a')")
    finally spark.conf.unset(MergeTable.WapBranchConf)
    assert(spark.table("graft.br3.t").count() === 1)
    val t = MergeTable.open(spark, "target/graft_warehouse/br3/t")
    assert(t.branches() === Nil)

    // VERSION AS OF '<digits>' always resolves numerically, so an
    // all-digit ref could be created but never read by name — refused
    assert(intercept[IllegalArgumentException](
      t.createTag("7")).getMessage.contains("invalid tag name"))
    assert(intercept[IllegalArgumentException](
      t.createBranch("2024")).getMessage.contains("invalid branch name"))
  }

  test("branch of an empty table starts the lineage at the first branch commit") {
    val root = "target/test_tmp/branch_empty"
    MergeTable.drop(root)
    val t = new MergeTable(spark, root, Seq("id"))
    assert(t.createBranch("dev") === 0L)
    val b = t.forBranch("dev")
    b.upsert(Seq((1L, "a")).toDF("id", "v"))
    assert(rows(b) === Seq((1L, "a")))
    assert(!t.exists) // main still empty
    assert(t.fastForward("dev") === 1L)
    assert(rows(t) === Seq((1L, "a")))
  }
}
