package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit, max}

/** Per-version batch change feed (`MergeTable.changeFeed`): each key
  * reports its LATEST change in the window — and on MOR tables the
  * per-version diffs take the key-restricted fast path (delta-append
  * commits semi-join both snapshots on the batch's key set before
  * diffing), which must be invisible in the results.
  */
class ChangeFeedReplaySpec extends SparkSpec {
  import spark.implicits._

  private def freshMor(name: String): MergeTable = {
    val root = s"target/test_tmp/cfr_$name"
    MergeTable.drop(root)
    MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")),
      mode = MergeTable.MergeOnRead)
  }

  // the unrestricted reference computation: public netted diffs per
  // consecutive version, collapsed to each key's newest change
  private def expected(t: MergeTable, from: Long, to: Long,
      pre: Boolean = false): Set[(Long, String, String)] = {
    val vs = t.versions().filter(v => v > from && v <= to)
    val steps = (from +: vs.init).zip(vs).map { case (lo, hi) =>
      t.changesBetween(lo, hi, pre).withColumn("_v", lit(hi))
    }
    val all = steps.reduce(_.unionByName(_, allowMissingColumns = true))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
    all.withColumn("_m", max(col("_v")).over(w))
      .filter(col("_v") === col("_m")).drop("_v", "_m")
      .as[(Long, String, String)].collect().toSet
  }

  test("MOR per-version feed (key-restricted path) equals the unrestricted diff") {
    val t = freshMor("mor")
    t.upsert(Seq((2L, "B"), (4L, "d")).toDF("id", "v")) // delta commit
    t.delete(Seq(1L).toDF("id"))                        // tombstone delta
    t.upsert(Seq((4L, "D2")).toDF("id", "v"))           // delta on a delta key
    val top = t.versions().max
    val got = t.changeFeed(0, top).as[(Long, String, String)].collect().toSet
    assert(got === expected(t, 0, top))
    // replay semantics, not netting: id 1 surfaces as D with its last
    // image, id 4 (insert v2 then update v4) as U with the v4 image
    assert(got === Set((1L, "a", "D"), (2L, "B", "U"), (3L, "c", "I"), (4L, "D2", "U")))
  }

  test("bounded window and pre-images through the restricted path") {
    val t = freshMor("pre")
    t.upsert(Seq((2L, "B"), (4L, "d")).toDF("id", "v"))
    t.upsert(Seq((4L, "D2")).toDF("id", "v"))
    val top = t.versions().max
    // window (1, top]: only the two delta commits' changes
    val got = t.changeFeed(1, top, updatePreImages = true)
      .as[(Long, String, String)].collect().toSet
    assert(got === expected(t, 1, top, pre = true))
    assert(got === Set((2L, "b", "U_pre"), (2L, "B", "U_post"),
      (4L, "d", "U_pre"), (4L, "D2", "U_post")))
  }

  test("grouped run: insert-then-delete nets to D, no-op tail keeps the earlier change") {
    val t = freshMor("grouped")
    t.upsert(Seq((4L, "new"), (2L, "B")).toDF("id", "v")) // v2: I(4), U(2)
    t.upsert(Seq((4L, "NEW2")).toDF("id", "v"))           // v3: U(4)
    t.delete(Seq(4L).toDF("id"))                          // v4: D(4)
    t.upsert(Seq((2L, "B")).toDF("id", "v"))              // v5: no-op for 2
    val top = t.versions().max
    val got = t.changeFeed(0, top).as[(Long, String, String)].collect().toSet
    assert(got === expected(t, 0, top))
    // id 4: inserted, updated, deleted inside ONE run -> D with the
    // last pre-delete image; id 2's no-op tail must NOT erase its U
    assert(got === Set((1L, "a", "I"), (2L, "B", "U"), (3L, "c", "I"), (4L, "NEW2", "D")))
  }

  test("runs split by a compaction still agree with per-version diffs") {
    val root = "target/test_tmp/cfr_split"
    MergeTable.drop(root)
    val t = new MergeTable(spark, root, Seq("id"), MergeTable.MergeOnRead, maxDeltas = 100)
    t.upsert(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.upsert(Seq((1L, "A1")).toDF("id", "v"))
    t.delete(Seq(2L).toDF("id"))
    t.compact() // non-delta commit splits the run
    t.upsert(Seq((1L, "A2"), (3L, "c")).toDF("id", "v"))
    t.upsert(Seq((3L, "C")).toDF("id", "v"))
    val top = t.versions().max
    val got = t.changeFeed(0, top).as[(Long, String, String)].collect().toSet
    assert(got === expected(t, 0, top))
    assert(got === Set((1L, "A2", "U"), (2L, "b", "D"), (3L, "C", "U")))
  }

  test("grouped run emits pre-image pairs identical to per-version diffs") {
    val t = freshMor("grouped_pre")
    t.upsert(Seq((2L, "B1")).toDF("id", "v"))
    t.upsert(Seq((2L, "B2"), (4L, "d")).toDF("id", "v"))
    t.delete(Seq(1L).toDF("id"))
    val top = t.versions().max
    val got = t.changeFeed(1, top, updatePreImages = true)
      .as[(Long, String, String)].collect().toSet
    assert(got === expected(t, 1, top, pre = true))
    // id 2 updated twice in the run: the pair reflects the LAST hop
    assert(got === Set((1L, "a", "D"), (2L, "B1", "U_pre"), (2L, "B2", "U_post"),
      (4L, "d", "I")))
  }

  test("a run introducing a new column falls back to per-version steps") {
    val t = freshMor("evolve")
    t.upsert(Seq((2L, "B")).toDF("id", "v"))
    t.upsert(Seq((3L, "c2", 7L)).toDF("id", "v", "extra")) // schema drift mid-run
    val top = t.versions().max
    val got = t.changeFeed(0, top)
      .select("id", "v", "_change").as[(Long, String, String)].collect().toSet
    assert(got === expected(t, 0, top).map { case (i, v, c) => (i, v, c) })
  }

  test("randomized MOR histories: grouped feed equals per-version diffs") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 0 until 4) {
      val root = s"target/test_tmp/cfr_fuzz_$trial"
      MergeTable.drop(root)
      val t = new MergeTable(spark, root, Seq("id"), MergeTable.MergeOnRead,
        maxDeltas = 100)
      t.upsert((0L until 12L).map(i => (i, s"s$i")).toDF("id", "v"))
      for (step <- 0 until 9) {
        rnd.nextInt(4) match {
          case 0 | 1 => // upsert 1-4 keys, sometimes with unchanged values
            val ks = Seq.fill(1 + rnd.nextInt(4))(rnd.nextLong(16L)).distinct
            t.upsert(ks.map { k =>
              (k, if (rnd.nextBoolean()) s"s$k" else s"t${trial}_${step}_$k")
            }.toDF("id", "v"))
          case 2 => // delete 1-3 keys (possibly absent ones)
            t.delete(Seq.fill(1 + rnd.nextInt(3))(rnd.nextLong(18L)).distinct.toDF("id"))
          case 3 => t.compact() // split the run with a non-delta commit
        }
      }
      val top = t.versions().max
      val from = rnd.nextInt(top.toInt).toLong
      assert(t.changeFeed(from, top).as[(Long, String, String)].collect().toSet ===
        expected(t, from, top), s"trial $trial window ($from, $top]")
      assert(t.changeFeed(from, top, updatePreImages = true)
        .as[(Long, String, String)].collect().toSet ===
        expected(t, from, top, pre = true), s"trial $trial pre window ($from, $top]")
    }
  }

  test("partitioned-MOR delta runs fold through the grouped path") {
    // a partitioned-MOR upsert/delete appends ONE flat delta entry and
    // leaves every pv dir in place — nothing removed, all-delta adds —
    // so consecutive commits classify as one additive run and take
    // changeRun, not O(versions) per-step diffs. This pins the grouped
    // fold to the per-version oracle on a pv-MOR history that includes
    // a partition MOVE and a tombstone.
    def expected4(t: MergeTable, from: Long, to: Long,
        pre: Boolean = false): Set[(Long, String, Long, String)] = {
      val vs = t.versions().filter(v => v > from && v <= to)
      val steps = (from +: vs.init).zip(vs).map { case (lo, hi) =>
        t.changesBetween(lo, hi, pre).withColumn("_v", lit(hi))
      }
      val all = steps.reduce(_.unionByName(_, allowMissingColumns = true))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
      all.withColumn("_m", max(col("_v")).over(w))
        .filter(col("_v") === col("_m")).drop("_v", "_m")
        .as[(Long, String, Long, String)].collect().toSet
    }
    val root = "target/test_tmp/cfr_pvmor"
    MergeTable.drop(root)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "red", 10L), (2L, "red", 20L), (3L, "blue", 30L))
        .toDF("id", "grp", "v")),
      mode = MergeTable.MergeOnRead, partitionCols = Seq("grp"))
    t.upsert(Seq((2L, "red", 25L), (4L, "green", 40L)).toDF("id", "grp", "v"))
    t.upsert(Seq((3L, "red", 35L)).toDF("id", "grp", "v")) // partition move
    t.delete(Seq(1L).toDF("id"))                           // tombstone delta
    val top = t.versions().max
    val got = t.changeFeed(0, top).as[(Long, String, Long, String)].collect().toSet
    assert(got === expected4(t, 0, top))
    assert(got === Set((1L, "red", 10L, "D"), (2L, "red", 25L, "U"),
      (3L, "red", 35L, "U"), (4L, "green", 40L, "I")))
    // pre-image pairs through the grouped partitioned run
    assert(t.changeFeed(0, top, updatePreImages = true)
      .as[(Long, String, Long, String)].collect().toSet ===
      expected4(t, 0, top, pre = true))
    // compaction (rewrites dirty pv dirs) splits the run; the mixed
    // window still agrees with the per-version oracle
    t.compact()
    t.upsert(Seq((5L, "blue", 50L)).toDF("id", "grp", "v"))
    val top2 = t.versions().max
    assert(t.changeFeed(0, top2).as[(Long, String, Long, String)].collect().toSet ===
      expected4(t, 0, top2))
  }

  test("deletion-vector histories replay correctly (restricted dv path)") {
    val root = "target/test_tmp/cfr_dv"
    MergeTable.drop(root)
    val t = new MergeTable(spark, root, Seq("id"),
      MergeTable.DeletionVectors, maxDeltas = 100)
    t.upsert(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    t.upsert(Seq((2L, "B"), (4L, "d")).toDF("id", "v")) // mask + append
    t.delete(Seq(1L).toDF("id"))                        // pure mask commit
    t.upsert(Seq((4L, "D2")).toDF("id", "v"))
    val top = t.versions().max
    val got = t.changeFeed(0, top).as[(Long, String, String)].collect().toSet
    assert(got === expected(t, 0, top))
    assert(got === Set((1L, "a", "D"), (2L, "B", "U"), (3L, "c", "I"), (4L, "D2", "U")))
    // pre-images through dv commits
    val pre = t.changeFeed(1, top, updatePreImages = true)
      .as[(Long, String, String)].collect().toSet
    assert(pre === expected(t, 1, top, pre = true))
  }

  test("dv run: delete-then-reinsert and append-then-delete fold correctly") {
    val root = "target/test_tmp/cfr_dv_run2"
    MergeTable.drop(root)
    val t = new MergeTable(spark, root, Seq("id"),
      MergeTable.DeletionVectors, maxDeltas = 100)
    t.upsert(Seq((1L, "a"), (2L, "b")).toDF("id", "v")) // v1
    t.delete(Seq(1L).toDF("id"))                        // v2: D(1)
    t.upsert(Seq((1L, "a2")).toDF("id", "v"))           // v3: reinsert (mask-less append)
    t.upsert(Seq((9L, "z")).toDF("id", "v"))            // v4: I(9)
    t.delete(Seq(9L).toDF("id"))                        // v5: masks the row v4 APPENDED
    val top = t.versions().max
    val got = t.changeFeed(1, top).as[(Long, String, String)].collect().toSet
    assert(got === expected(t, 1, top))
    // id 1: deleted then re-inserted inside the window -> I with the
    // new image; id 9: appended then masked -> D with its last image
    assert(got === Set((1L, "a2", "I"), (9L, "z", "D")))
    val pre = t.changeFeed(1, top, updatePreImages = true)
      .as[(Long, String, String)].collect().toSet
    assert(pre === expected(t, 1, top, pre = true))
  }

  test("randomized dv histories: feed equals per-version diffs") {
    val rnd = new scala.util.Random(51408L)
    for (trial <- 0 until 3) {
      val root = s"target/test_tmp/cfr_dv_fuzz_$trial"
      MergeTable.drop(root)
      // last trial runs the bucketed-dv layout: masks address files
      // inside per-bucket dirs, and the grouped dv fold must attribute
      // them identically
      val t = new MergeTable(spark, root, Seq("id"),
        MergeTable.DeletionVectors,
        numBuckets = if (trial == 2) Some(4) else None, maxDeltas = 100)
      t.upsert((0L until 10L).map(i => (i, s"s$i")).toDF("id", "v"))
      for (step <- 0 until 7) {
        rnd.nextInt(4) match {
          case 0 | 1 =>
            val ks = Seq.fill(1 + rnd.nextInt(3))(rnd.nextLong(14L)).distinct
            t.upsert(ks.map { k =>
              (k, if (rnd.nextBoolean()) s"s$k" else s"t${trial}_${step}_$k")
            }.toDF("id", "v"))
          case 2 =>
            t.delete(Seq.fill(1 + rnd.nextInt(3))(rnd.nextLong(16L)).distinct.toDF("id"))
          case 3 => t.compact()
        }
      }
      val top = t.versions().max
      val from = rnd.nextInt(top.toInt).toLong
      assert(t.changeFeed(from, top).as[(Long, String, String)].collect().toSet ===
        expected(t, from, top), s"dv trial $trial window ($from, $top]")
    }
  }

  test("COW commits fall back to the unrestricted diff and stay correct") {
    val root = "target/test_tmp/cfr_cow"
    MergeTable.drop(root)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b")).toDF("id", "v")))
    t.upsert(Seq((2L, "B"), (3L, "c")).toDF("id", "v")) // base rewrite
    t.delete(Seq(1L).toDF("id"))
    val got = t.changeFeed(0, t.versions().max).as[(Long, String, String)].collect().toSet
    assert(got === Set((1L, "a", "D"), (2L, "B", "U"), (3L, "c", "I")))
  }
}
