package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, In, IsNotNull}

/** Value-partitioned layout: rows live in per-value partition dirs
  * (`_graft_p_<col>=<val>`), upsert/delete rewrite only the touched
  * partitions — including the OLD home of a row whose partition value
  * changed — and reads prune whole partition directories from pushed
  * filters.
  */
class PartitionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val root = s"target/test_tmp/pv_$name"
    MergeTable.drop(root)
    root
  }

  private def lastManifest(root: String): Seq[String] =
    latestManifestLines(root)

  private val seedRows = Seq(
    (1L, "red", 10L), (2L, "red", 20L), (3L, "blue", 30L), (4L, "green", 40L))

  private def seeded(name: String): (String, MergeTable) = {
    val root = fresh(name)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(seedRows.toDF("id", "grp", "v")),
      partitionCols = Seq("grp"))
    (root, t)
  }

  test("seed writes one pv entry per partition value") {
    val (root, t) = seeded("seed")
    val m = lastManifest(root)
    assert(m.forall(_.startsWith("pv:")), m.mkString("|"))
    assert(m.count(_.contains("_graft_p_grp=red")) === 1)
    assert(m.count(_.contains("_graft_p_grp=blue")) === 1)
    assert(m.count(_.contains("_graft_p_grp=green")) === 1)
    assert(t.read().as[(Long, String, Long)].collect().sorted === seedRows.sorted)
  }

  test("upsert rewrites only the touched partitions") {
    val (root, t) = seeded("scoped")
    val before = lastManifest(root)
    t.upsert(Seq((2L, "red", 25L), (5L, "red", 50L)).toDF("id", "grp", "v"))
    val after = lastManifest(root)
    // blue and green keep their directories verbatim; red moved
    Seq("blue", "green").foreach { g =>
      val entry = before.find(_.contains(s"_graft_p_grp=$g")).get
      assert(after.contains(entry), s"$g was rewritten: $after")
    }
    assert(!after.contains(before.find(_.contains("_graft_p_grp=red")).get))
    assert(t.read().as[(Long, String, Long)].collect().sorted ===
      Seq((1L, "red", 10L), (2L, "red", 25L), (3L, "blue", 30L),
        (4L, "green", 40L), (5L, "red", 50L)))
  }

  test("a key changing partition value leaves its old home") {
    val (root, t) = seeded("move")
    t.upsert(Seq((3L, "red", 35L)).toDF("id", "grp", "v")) // blue -> red
    val after = lastManifest(root)
    // blue emptied entirely: its only row moved out
    assert(!after.exists(_.contains("_graft_p_grp=blue")), after.mkString("|"))
    val got = t.read().as[(Long, String, Long)].collect().sorted
    assert(got === Seq((1L, "red", 10L), (2L, "red", 20L),
      (3L, "red", 35L), (4L, "green", 40L)))
  }

  test("delete rewrites only the holding partitions") {
    val (root, t) = seeded("delete")
    val before = lastManifest(root)
    t.delete(Seq(3L, 99L).toDF("id")) // blue holder + absent key
    val after = lastManifest(root)
    Seq("red", "green").foreach { g =>
      assert(after.contains(before.find(_.contains(s"_graft_p_grp=$g")).get))
    }
    assert(!after.exists(_.contains("_graft_p_grp=blue")))
    assert(t.read().count() === 3)
    // a delete matching nothing commits nothing
    val vs = t.versions()
    t.delete(Seq(123L).toDF("id"))
    assert(t.versions() === vs)
  }

  test("matches the flat COW result over a mixed sequence") {
    val rows = (0L until 120L).map(i => (i, s"g${i % 5}", i * 2))
    def drive(partitions: Seq[String], name: String): Seq[(Long, String, Long)] = {
      val root = fresh(name)
      val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
        initial = Some(rows.toDF("id", "grp", "v")), partitionCols = partitions)
      // updates, inserts, and partition MOVES (grp recomputed mod 3)
      t.upsert((40L until 80L).map(i => (i, s"g${i % 3}", i * 3)).toDF("id", "grp", "v"))
      t.delete((0L until 120L by 7).toDF("id"))
      t.append(Seq((500L, "g9", 1L)).toDF("id", "grp", "v"))
      t.read().as[(Long, String, Long)].collect().sorted.toSeq
    }
    assert(drive(Seq("grp"), "mix_pv") === drive(Nil, "mix_flat"))
  }

  test("partition values with special characters round-trip") {
    val root = fresh("escape")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a b/c:d", 1L), (2L, "plain", 2L))
        .toDF("id", "grp", "v")),
      partitionCols = Seq("grp"))
    t.upsert(Seq((1L, "a b/c:d", 11L)).toDF("id", "grp", "v"))
    assert(t.read().as[(Long, String, Long)].collect().sorted ===
      Seq((1L, "a b/c:d", 11L), (2L, "plain", 2L)))
  }

  test("point reads prune to the matching partition directories") {
    val (root, _) = seeded("prune")
    val rel = new graft.sources.MergeTableRelation(spark.sqlContext, root,
      Seq("id"), MergeTable.CopyOnWrite, partitionCols = Seq("grp"))
    val all = rel.candidateFiles(Array.empty).get
    assert(all.size >= 3)
    val eq = rel.candidateFiles(Array(EqualTo("grp", "red"))).get
    assert(eq.nonEmpty && eq.forall(_.contains("_graft_p_grp=red")), eq)
    val in = rel.candidateFiles(Array(In("grp", Array[Any]("red", "blue")))).get
    assert(in.forall(f => f.contains("=red") || f.contains("=blue")) && in.size < all.size)
    // non-partition filters leave the partition set alone (stats may
    // still prune, so compare against the partition dirs only)
    val nonPart = rel.candidateFiles(Array(IsNotNull("id"))).get
    assert(nonPart.size === all.size)
    // range compare is NUMERIC for numeric literals even though the
    // dir segment is a string
    val root2 = fresh("prune_num")
    MergeTable.createIfAbsent(spark, root2, Seq("id"),
      initial = Some(Seq((1L, 2L, "x"), (2L, 10L, "y")).toDF("id", "bucketed_day", "v")),
      partitionCols = Seq("bucketed_day"))
    val rel2 = new graft.sources.MergeTableRelation(spark.sqlContext, root2,
      Seq("id"), MergeTable.CopyOnWrite, partitionCols = Seq("bucketed_day"))
    val gt = rel2.candidateFiles(Array(GreaterThan("bucketed_day", 9L))).get
    assert(gt.nonEmpty && gt.forall(_.contains("_graft_p_bucketed_day=10")), gt)
    // and the pruned read answers correctly
    val df = spark.read.format("mergetable").option("path", root).load()
    assert(df.filter(col("grp") === "red").count() === 2)
  }

  test("illegal layouts and types are rejected loudly") {
    val floatCol = intercept[IllegalArgumentException] {
      MergeTable.createIfAbsent(spark, fresh("badtype"), Seq("id"),
        initial = Some(Seq((1L, 1.5, "x")).toDF("id", "score", "v")),
        partitionCols = Seq("score"))
    }
    assert(floatCol.getMessage.contains("partition column"))
    // buckets × partitions COMPOSE since r12 (ComposedLayoutSpec);
    // what still refuses is composing either with deletion vectors
    val both = intercept[IllegalArgumentException] {
      new MergeTable(spark, fresh("badboth"), Seq("id"),
        MergeTable.DeletionVectors, numBuckets = Some(4),
        partitionCols = Seq("grp"))
    }
    assert(both.getMessage.contains("copy-on-write or merge-on-read"))
    val dv = intercept[IllegalArgumentException] {
      new MergeTable(spark, fresh("baddv"), Seq("id"),
        MergeTable.DeletionVectors, partitionCols = Seq("grp"))
    }
    assert(dv.getMessage.contains("copy-on-write or merge-on-read"))
  }

  test("self-describing: open() restores the partition layout") {
    val (root, t) = seeded("reopen")
    val t2 = MergeTable.open(spark, root)
    assert(t2.partitionCols === Seq("grp"))
    t2.upsert(Seq((9L, "blue", 90L)).toDF("id", "grp", "v"))
    assert(lastManifest(root).forall(_.startsWith("pv:")))
    assert(t.read().count() === 5)
  }

  test("renaming a partition column keeps the scoped merge correct") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft.db.pv_ren")
    spark.sql("""CREATE TABLE graft.db.pv_ren (id BIGINT, grp STRING, v BIGINT)
                 PARTITIONED BY (grp) TBLPROPERTIES('keys'='id')""")
    spark.sql("INSERT INTO graft.db.pv_ren VALUES (1,'red',10), (2,'blue',20)")
    spark.sql("ALTER TABLE graft.db.pv_ren RENAME COLUMN grp TO color")
    // reads speak the new name; writes through it translate back to
    // the physical partition column, so the merge stays scoped
    assert(spark.table("graft.db.pv_ren").columns.toSeq === Seq("id", "color", "v"))
    spark.sql("INSERT INTO graft.db.pv_ren VALUES (3,'red',30)")
    assert(spark.table("graft.db.pv_ren").orderBy("id")
      .as[(Long, String, Long)].collect().toSeq ===
      Seq((1L, "red", 10L), (2L, "blue", 20L), (3L, "red", 30L)))
    // the layout is still partition-dir based under the OLD physical name
    val root = spark.sql("DESCRIBE DETAIL graft.db.pv_ren").head().getString(0)
    val manifest = latestManifestLines(root).mkString("\n")
    assert(manifest.linesIterator.forall(_.startsWith("pv:")), manifest)
    assert(manifest.contains("_graft_p_grp="))
    // predicate reads on the new name stay correct (partition-dir
    // pruning degrades conservatively under an active mapping)
    assert(spark.table("graft.db.pv_ren").filter(col("color") === "red").count() === 2)
  }

  test("randomized partitioned histories: feed equals per-version diffs") {
    // the changeFeed reference: public netted diffs per consecutive
    // version, collapsed to each key's newest change
    def expected(t: MergeTable, from: Long, to: Long): Set[(Long, String, Long, String)] = {
      import org.apache.spark.sql.functions.{lit, max}
      val vs = t.versions().filter(v => v > from && v <= to)
      val steps = (from +: vs.init).zip(vs).map { case (lo, hi) =>
        t.changesBetween(lo, hi).withColumn("_v", lit(hi))
      }
      val all = steps.reduce(_.unionByName(_, allowMissingColumns = true))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
      all.withColumn("_m", max(col("_v")).over(w))
        .filter(col("_v") === col("_m")).drop("_v", "_m")
        .as[(Long, String, Long, String)].collect().toSet
    }
    val rnd = new scala.util.Random(71405L)
    val root = fresh("feed_fuzz")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some((0L until 12L).map(i => (i, s"g${i % 3}", i)).toDF("id", "grp", "v")),
      partitionCols = Seq("grp"))
    for (step <- 0 until 8) {
      if (rnd.nextInt(3) == 2)
        t.delete(Seq.fill(1 + rnd.nextInt(2))(rnd.nextLong(14L)).distinct.toDF("id"))
      else {
        val ks = Seq.fill(1 + rnd.nextInt(3))(rnd.nextLong(14L)).distinct
        // random grp -> constant partition moves
        t.upsert(ks.map(k => (k, s"g${rnd.nextInt(4)}", k * 10 + step)).toDF("id", "grp", "v"))
      }
    }
    val top = t.versions().max
    val from = rnd.nextInt(top.toInt).toLong
    assert(t.changeFeed(from, top).select("id", "grp", "v", "_change")
      .as[(Long, String, Long, String)].collect().toSet ===
      expected(t, from, top), s"window ($from, $top]")
  }

  test("time travel and change feed see through partitioned commits") {
    val (root, t) = seeded("travel")
    val v1 = t.versions().max
    t.upsert(Seq((3L, "red", 35L)).toDF("id", "grp", "v")) // partition move
    t.delete(Seq(1L).toDF("id"))
    val top = t.versions().max
    assert(t.readVersion(v1).as[(Long, String, Long)].collect().sorted ===
      seedRows.sorted)
    val feed = t.changeFeed(v1, top)
      .select("id", "grp", "v", "_change")
      .as[(Long, String, Long, String)].collect().toSet
    assert(feed === Set((3L, "red", 35L, "U"), (1L, "red", 10L, "D")))
  }

  test("SHOW PARTITIONS and partition-scoped OPTIMIZE WHERE") {
    MergeTable.drop("target/graft_warehouse/pvsql")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.pvsql")
    spark.sql("""CREATE TABLE graft.pvsql.t (id BIGINT, grp STRING, v DOUBLE)
                 PARTITIONED BY (grp) TBLPROPERTIES('keys'='id')""")
    // seed FRAGMENTED through the API upsert: the DSv2 INSERT path now
    // clusters by partition (one file per leaf), so the fragmentation
    // OPTIMIZE exists to fix must be produced below the engine request —
    // an 8-way-parallel upsert fragments each leaf into up to 8 files
    MergeTable.open(spark, "target/graft_warehouse/pvsql/t").upsert(
      (0L until 64L).map(i => (i, if (i % 2 == 0) "red" else "blue", i * 1.0))
        .toDF("id", "grp", "v").repartition(8))

    val parts = spark.sql("SHOW PARTITIONS graft.pvsql.t")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(parts.map(_._1).toSeq === Seq("grp=blue", "grp=red"))
    assert(parts.forall(_._3 === 32L)) // exact rows from footer stats
    val redFiles0 = parts.find(_._1 == "grp=red").get._2
    val blueFiles0 = parts.find(_._1 == "grp=blue").get._2
    assert(redFiles0 > 1 && blueFiles0 > 1)

    try {
      spark.conf.set("graft.mergetable.targetFileBytes",
        (512L * 1024 * 1024).toString)
      // scoped: red coalesces to one file, blue keeps its fragments
      spark.sql("OPTIMIZE graft.pvsql.t WHERE grp = 'red'")
      val mid = spark.sql("SHOW PARTITIONS graft.pvsql.t")
        .as[(String, Long, Long, Long)].collect()
      assert(mid.find(_._1 === "grp=red").get._2 === 1L)
      assert(mid.find(_._1 === "grp=blue").get._2 === blueFiles0)
      assert(mid.forall(_._3 === 32L))
      // unscoped packs the rest
      spark.sql("OPTIMIZE graft.pvsql.t")
      val fin = spark.sql("SHOW PARTITIONS graft.pvsql.t")
        .as[(String, Long, Long, Long)].collect()
      assert(fin.forall(_._2 === 1L) && fin.forall(_._3 === 32L))
      assert(spark.table("graft.pvsql.t").count() === 64L)

      // non-partition columns and non-equality shapes error loudly
      val bad = intercept[Exception] {
        spark.sql("OPTIMIZE graft.pvsql.t WHERE v = '1'")
      }
      assert(bad.getMessage.contains("partition columns only"))
      val shape = intercept[Exception] {
        spark.sql("OPTIMIZE graft.pvsql.t WHERE grp > 'a'")
      }
      assert(shape.getMessage.contains("conjunctions of partition equalities"))

      // SHOW PARTITIONS is a statement Spark ALSO parses — for a
      // non-graft catalog it must delegate (Spark's table-not-found),
      // never hit the mergetable command
      val delegated = intercept[Exception] {
        spark.sql("SHOW PARTITIONS spark_catalog.nodb.missing")
      }
      assert(!delegated.getMessage.contains("mergetable catalog"),
        delegated.getMessage)
    } finally spark.conf.unset("graft.mergetable.targetFileBytes")
  }

  test("SQL: OPTIMIZE WHERE ... ZORDER BY clusters only selected partitions") {
    MergeTable.drop("target/graft_warehouse/pvz")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.pvz")
    spark.sql("""CREATE TABLE graft.pvz.t (id BIGINT, grp STRING, v BIGINT)
                 PARTITIONED BY (grp) TBLPROPERTIES('keys'='id')""")
    // fragmented seed through the API (the DSv2 INSERT now clusters
    // by partition — see the SHOW PARTITIONS case above)
    val root = "target/graft_warehouse/pvz/t"
    MergeTable.open(spark, root).upsert(
      (0L until 2000L).map(i =>
          (i, if (i % 2 == 0) "red" else "blue", (i * 2654435761L) % 100000L))
        .toDF("id", "grp", "v").repartition(8))
    val t = MergeTable.open(spark, root)
    val blueBefore = t.currentEntries().filter(_._2.contains("_graft_p_grp=blue"))

    spark.sql("OPTIMIZE graft.pvz.t WHERE grp = 'red' ZORDER BY (v)")

    val entries = t.currentEntries()
    assert(entries.filter(_._2.contains("_graft_p_grp=blue")) === blueBefore,
      "unselected partition must keep its directory")
    // the clustered partition's files carry tight v ranges
    val files = t.prunableFiles(entries).get
    val red = files.filter(_._1.toString.contains("_graft_p_grp=red"))
    assert(red.size > 1)
    val hit = red.count { case (_, st) =>
      FileStats.mayMatch(st, org.apache.spark.sql.sources.EqualTo("v", 54321L)) }
    assert(hit <= 1, s"expected a pinned point lookup after ZORDER, got $hit/${red.size}")
    assert(spark.table("graft.pvz.t").count() === 2000L)
    spark.sql("DROP TABLE graft.pvz.t")
  }

  // ---- MOR × value partitions --------------------------------------------
  // the high-rate CDC lake layout: per-date partition dirs, O(batch)
  // flat delta commits, compaction rewrites only dirty partitions

  private def seededMor(name: String): (String, MergeTable) = {
    val root = fresh(name)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(seedRows.toDF("id", "grp", "v")),
      mode = MergeTable.MergeOnRead, partitionCols = Seq("grp"))
    (root, t)
  }

  test("MOR: upserts append O(batch) deltas; reads reconcile over partitions") {
    val (root, t) = seededMor("mor")
    val before = lastManifest(root)
    assert(before.forall(_.startsWith("pv:")), before.mkString("|"))
    t.upsert(Seq((2L, "red", 25L), (5L, "blue", 50L)).toDF("id", "grp", "v"))
    val after = lastManifest(root)
    // every partition dir survives verbatim; one flat delta appended
    before.foreach(e => assert(after.contains(e), s"$e rewritten: $after"))
    assert(after.count(_.startsWith("delta:")) === 1)
    assert(t.read().as[(Long, String, Long)].collect().sorted ===
      Seq((1L, "red", 10L), (2L, "red", 25L), (3L, "blue", 30L),
        (4L, "green", 40L), (5L, "blue", 50L)))
  }

  test("MOR: compaction folds deltas into ONLY the dirty partitions") {
    val (root, t) = seededMor("morcompact")
    val before = lastManifest(root)
    t.upsert(Seq((2L, "red", 25L)).toDF("id", "grp", "v"))
    t.compact()
    val after = lastManifest(root)
    assert(!after.exists(_.startsWith("delta:")), after.mkString("|"))
    // blue and green keep their directories verbatim; red rewritten
    Seq("blue", "green").foreach { g =>
      assert(after.contains(before.find(_.contains(s"_graft_p_grp=$g")).get),
        s"$g was rewritten: $after")
    }
    assert(!after.contains(before.find(_.contains("_graft_p_grp=red")).get))
    assert(t.read().as[(Long, String, Long)].collect().sorted ===
      Seq((1L, "red", 10L), (2L, "red", 25L), (3L, "blue", 30L), (4L, "green", 40L)))
  }

  test("MOR: a partition move dirties the old AND new homes at compaction") {
    val (root, t) = seededMor("mormove")
    val before = lastManifest(root)
    t.upsert(Seq((3L, "red", 35L)).toDF("id", "grp", "v")) // blue -> red
    // pre-compaction read already shows the move (key reconciliation)
    assert(t.read().filter(col("id") === 3L).as[(Long, String, Long)].head() ===
      ((3L, "red", 35L)))
    t.compact()
    val after = lastManifest(root)
    assert(!after.exists(_.contains("_graft_p_grp=blue")), after.mkString("|"))
    assert(after.contains(before.find(_.contains("_graft_p_grp=green")).get))
    assert(t.read().as[(Long, String, Long)].collect().sorted ===
      Seq((1L, "red", 10L), (2L, "red", 20L), (3L, "red", 35L), (4L, "green", 40L)))
  }

  test("MOR: tombstones drop keys; compaction touches holding partitions only") {
    val (root, t) = seededMor("mordelete")
    val before = lastManifest(root)
    t.delete(Seq(3L, 99L).toDF("id")) // blue holder + absent key
    assert(t.read().count() === 3)
    t.compact()
    val after = lastManifest(root)
    assert(!after.exists(_.contains("_graft_p_grp=blue")))
    Seq("red", "green").foreach { g =>
      assert(after.contains(before.find(_.contains(s"_graft_p_grp=$g")).get))
    }
    // tombstones matching NOTHING shed at compaction with zero rewrites
    t.delete(Seq(777L).toDF("id"))
    t.compact()
    val fin = lastManifest(root)
    assert(!fin.exists(_.startsWith("delta:")))
    after.filter(_.startsWith("pv:")).foreach(e => assert(fin.contains(e)))
  }

  test("MOR: delta-bearing snapshots scan fully; compaction restores pruning") {
    val (root, t) = seededMor("morprune")
    assert(t.prunableFiles(t.entriesAtVersion(t.versions().max)).isDefined)
    t.upsert(Seq((2L, "red", 25L)).toDF("id", "grp", "v"))
    assert(t.prunableFiles(t.entriesAtVersion(t.versions().max)).isEmpty)
    t.compact()
    assert(t.prunableFiles(t.entriesAtVersion(t.versions().max)).isDefined)
  }

  test("MOR matches the partitioned-COW result over a mixed sequence") {
    val rows = (0L until 120L).map(i => (i, s"g${i % 5}", i * 2))
    def drive(mode: String, name: String): Seq[(Long, String, Long)] = {
      val root = fresh(name)
      val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
        initial = Some(rows.toDF("id", "grp", "v")),
        mode = mode, partitionCols = Seq("grp"))
      t.upsert((40L until 80L).map(i => (i, s"g${i % 3}", i * 3)).toDF("id", "grp", "v"))
      if (mode == MergeTable.MergeOnRead) t.compact() // mid-sequence fold
      t.delete((0L until 120L by 7).toDF("id"))
      t.append(Seq((500L, "g9", 1L)).toDF("id", "grp", "v"))
      t.read().as[(Long, String, Long)].collect().sorted.toSeq
    }
    assert(drive(MergeTable.MergeOnRead, "morseq") ===
      drive(MergeTable.CopyOnWrite, "cowseq"))
  }

  test("MOR: time travel and change feed see through delta and compaction commits") {
    val (root, t) = seededMor("mortravel")
    val v1 = t.versions().max
    t.upsert(Seq((3L, "red", 35L)).toDF("id", "grp", "v"))
    t.delete(Seq(1L).toDF("id"))
    t.compact()
    val top = t.versions().max
    assert(t.readVersion(v1).as[(Long, String, Long)].collect().sorted ===
      seedRows.sorted)
    val feed = t.changeFeed(v1, top)
      .select("id", "grp", "v", "_change")
      .as[(Long, String, Long, String)].collect().toSet
    assert(feed === Set((3L, "red", 35L, "U"), (1L, "red", 10L, "D")))
  }
}
