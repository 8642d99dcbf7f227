package graft.cdc

import graft.SparkSpec

/** Conflict-validated rebase commits: concurrent writers whose
  * commits provably compose (disjoint bucket/partition scopes, pure
  * appends, key-disjoint additions) both succeed — the loser
  * re-anchors its already-written entries on the winner's manifest
  * and retries only the metadata CAS, instead of re-running its full
  * read-modify-write (Iceberg's conflict validation + rebase /
  * fast-append behavior). Genuinely conflicting pairs still raise
  * [[CommitConflictException]] and converge under [[MergeTable.withRetry]].
  *
  * Interleavings are DETERMINISTIC: the `onBeforeCommit` hook fires a
  * one-shot concurrent winner inside the loser's read→CAS window.
  */
class ConcurrentCommitSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val root = s"target/test_tmp/cc_$name"
    MergeTable.drop(root)
    root
  }

  private def versions(root: String): Seq[Long] =
    MergeTable.open(spark, root).versions()

  /** Count immutable data dirs ever written (orphans included) — a
    * re-run of a lost writer's data write would add one.
    */
  private def dataDirCount(root: String): Int =
    Option(new java.io.File(s"$root/data").list()).map(_.length).getOrElse(0)

  /** Arrange for `winner` to commit inside `loser`'s conflict window
    * (between its manifest read and its CAS), exactly once.
    */
  private def interleave(loser: MergeTable)(winner: => Unit): Unit = {
    var fired = false
    loser.onBeforeCommit = () => {
      if (!fired) { fired = true; winner }
    }
  }

  // -- hash buckets: scope disjointness implies key disjointness ----------

  test("bucketed COW: disjoint-bucket writers both commit via rebase") {
    val root = fresh("bkt_disjoint")
    // ids 0..63: with 8 buckets the two batches below hash into
    // different buckets (verified by the final read)
    val seed = (0L until 64L).map(i => (i, "seed")).toDF("id", "v")
    val t1 = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(seed), numBuckets = Some(8))
    val t2 = MergeTable.open(spark, root)
    // find two ids in different buckets deterministically (the same
    // pmod(xxhash64) the table's bucketExpr uses)
    import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
    val byBucket = spark.range(0, 64)
      .select($"id", pmod(xxhash64($"id"), lit(8)).as("b"))
      .as[(Long, Long)].collect().groupBy(_._2)
    val bucketIds = byBucket.toSeq.sortBy(_._1).take(2).map(_._2.head._1)
    val (idA, idB) = (bucketIds(0), bucketIds(1))
    val dirsBefore = dataDirCount(root)
    interleave(t2) { t1.upsert(Seq((idA, "from_t1")).toDF("id", "v")) }
    // no withRetry: success proves the rebase path, not a re-run
    t2.upsert(Seq((idB, "from_t2")).toDF("id", "v"))
    val m = t2.read().as[(Long, String)].collect().toMap
    assert(m(idA) === "from_t1")
    assert(m(idB) === "from_t2")
    assert(m.size === 64)
    assert(versions(root) === Seq(1L, 2L, 3L))
    // each upsert wrote exactly one data dir — the loser did NOT
    // re-run its rewrite
    assert(dataDirCount(root) === dirsBefore + 2)
  }

  test("bucketed COW: same-bucket writers conflict, withRetry converges") {
    val root = fresh("bkt_overlap")
    val seed = (0L until 16L).map(i => (i, "seed")).toDF("id", "v")
    val t1 = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(seed), numBuckets = Some(4))
    val t2 = MergeTable.open(spark, root)
    val id = 5L // same key => same bucket by definition
    interleave(t2) { t1.upsert(Seq((id, "from_t1")).toDF("id", "v")) }
    intercept[CommitConflictException] {
      t2.upsert(Seq((id, "from_t2")).toDF("id", "v"))
    }
    // the standard retry loop then serializes after the winner
    interleave(t2) { t1.upsert(Seq((id, "retry_t1")).toDF("id", "v")) }
    t2.withRetry() { t2.upsert(Seq((id, "retry_t2")).toDF("id", "v")) }
    assert(t2.read().as[(Long, String)].collect().toMap.apply(id) === "retry_t2")
  }

  // -- value partitions: rebase + added-keys validation --------------------

  test("partitioned COW: disjoint-partition writers both commit via rebase") {
    val root = fresh("pv_disjoint")
    val seed = Seq((1L, "red", 10L), (2L, "blue", 20L), (3L, "green", 30L))
      .toDF("id", "grp", "v")
    val t1 = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(seed), partitionCols = Seq("grp"))
    val t2 = MergeTable.open(spark, root)
    val dirsBefore = dataDirCount(root)
    interleave(t2) { t1.upsert(Seq((1L, "red", 11L)).toDF("id", "grp", "v")) }
    t2.upsert(Seq((2L, "blue", 21L)).toDF("id", "grp", "v"))
    val rows = t2.read().as[(Long, String, Long)].collect().sortBy(_._1)
    assert(rows === Seq((1L, "red", 11L), (2L, "blue", 21L), (3L, "green", 30L)))
    assert(versions(root) === Seq(1L, 2L, 3L))
    assert(dataDirCount(root) === dirsBefore + 2, "loser re-ran its rewrite")
  }

  test("partitioned COW: same key to DIFFERENT partitions is detected") {
    // scope disjointness is NOT enough here: id=9 concurrently lands
    // in 'red' (winner) and 'blue' (loser); a blind rebase would keep
    // both homes. The added-keys validation must refuse, and the
    // withRetry re-run must evict the winner's copy (partition move).
    val root = fresh("pv_key_move")
    val seed = Seq((1L, "red", 10L), (2L, "blue", 20L)).toDF("id", "grp", "v")
    val t1 = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(seed), partitionCols = Seq("grp"))
    val t2 = MergeTable.open(spark, root)
    interleave(t2) { t1.upsert(Seq((9L, "red", 91L)).toDF("id", "grp", "v")) }
    intercept[CommitConflictException] {
      t2.upsert(Seq((9L, "blue", 92L)).toDF("id", "grp", "v"))
    }
    interleave(t2) { t1.upsert(Seq((9L, "red", 93L)).toDF("id", "grp", "v")) }
    t2.withRetry() { t2.upsert(Seq((9L, "blue", 94L)).toDF("id", "grp", "v")) }
    val nine = t2.read().filter($"id" === 9L)
      .as[(Long, String, Long)].collect().toSeq
    assert(nine === Seq((9L, "blue", 94L)), s"duplicate homes: $nine")
  }

  test("partitioned COW: disjoint-key disjoint-partition delete rebases") {
    val root = fresh("pv_delete")
    val seed = Seq((1L, "red", 10L), (2L, "blue", 20L), (3L, "green", 30L))
      .toDF("id", "grp", "v")
    val t1 = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(seed), partitionCols = Seq("grp"))
    val t2 = MergeTable.open(spark, root)
    interleave(t2) { t1.upsert(Seq((1L, "red", 11L)).toDF("id", "grp", "v")) }
    t2.delete(Seq(2L).toDF("id"))
    val rows = t2.read().as[(Long, String, Long)].collect().sortBy(_._1)
    assert(rows === Seq((1L, "red", 11L), (3L, "green", 30L)))
    assert(versions(root) === Seq(1L, 2L, 3L))
  }

  // -- MOR: appends always compose while the winner only appended ----------

  test("MOR: concurrent delta appends both commit; later writer wins per key") {
    val root = fresh("mor_appends")
    val seed = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val t1 = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(seed), mode = MergeTable.MergeOnRead)
    val t2 = MergeTable.open(spark, root)
    val dirsBefore = dataDirCount(root)
    // same key from both writers: the rebased loser lands AFTER the
    // winner in manifest order, so per-key reconciliation picks it —
    // exactly the serialization "loser committed second"
    interleave(t2) { t1.upsert(Seq((1L, "from_t1")).toDF("id", "v")) }
    t2.upsert(Seq((1L, "from_t2"), (3L, "new")).toDF("id", "v"))
    val m = t2.read().as[(Long, String)].collect().toMap
    assert(m === Map(1L -> "from_t2", 2L -> "b", 3L -> "new"))
    assert(versions(root) === Seq(1L, 2L, 3L))
    assert(dataDirCount(root) === dirsBefore + 2, "loser re-ran its delta write")
  }

  test("MOR: append racing a compaction conflicts (dirs it read were folded)") {
    val root = fresh("mor_compact")
    val t1 = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")), mode = MergeTable.MergeOnRead)
    t1.upsert(Seq((2L, "b")).toDF("id", "v")) // pending delta to fold
    val t2 = MergeTable.open(spark, root)
    interleave(t2) { t1.compact() }
    intercept[CommitConflictException] {
      t2.upsert(Seq((3L, "c")).toDF("id", "v"))
    }
    t2.withRetry() { t2.upsert(Seq((3L, "c")).toDF("id", "v")) }
    assert(t2.read().as[(Long, String)].collect().toMap ===
      Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("MOR: a rebased append carrying a NEW column still evolves the schema") {
    val root = fresh("mor_evolve")
    val t1 = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")), mode = MergeTable.MergeOnRead)
    val t2 = MergeTable.open(spark, root)
    interleave(t2) { t1.upsert(Seq((2L, "b")).toDF("id", "v")) }
    // t2's delta introduces column `extra`; it rebases over t1's commit
    t2.upsert(Seq((3L, "c", "x")).toDF("id", "v", "extra"))
    val rows = t2.read().select("id", "v", "extra")
      .as[(Long, String, Option[String])].collect().sortBy(_._1)
    assert(rows === Seq((1L, "a", None), (2L, "b", None), (3L, "c", Some("x"))))
    // and the evolved history still replays through the change feed
    val feed = t2.changeFeed(0L, t2.versions().last)
    assert(feed.count() === 3)
  }

  // -- deletion vectors: appends rebase only when key-disjoint -------------

  test("dv: key-disjoint concurrent upserts both commit via rebase") {
    val root = fresh("dv_disjoint")
    val seed = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val t1 = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(seed), mode = MergeTable.DeletionVectors)
    val t2 = MergeTable.open(spark, root)
    interleave(t2) { t1.upsert(Seq((1L, "A")).toDF("id", "v")) }
    t2.upsert(Seq((3L, "c")).toDF("id", "v"))
    assert(t2.read().as[(Long, String)].collect().toMap ===
      Map(1L -> "A", 2L -> "b", 3L -> "c"))
    assert(versions(root) === Seq(1L, 2L, 3L))
  }

  test("dv: same-key concurrent upserts conflict (reads don't reconcile)") {
    val root = fresh("dv_overlap")
    val seed = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val t1 = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(seed), mode = MergeTable.DeletionVectors)
    val t2 = MergeTable.open(spark, root)
    interleave(t2) { t1.upsert(Seq((1L, "from_t1")).toDF("id", "v")) }
    intercept[CommitConflictException] {
      t2.upsert(Seq((1L, "from_t2")).toDF("id", "v"))
    }
    interleave(t2) { t1.upsert(Seq((1L, "retry_t1")).toDF("id", "v")) }
    t2.withRetry() { t2.upsert(Seq((1L, "retry_t2")).toDF("id", "v")) }
    val ones = t2.read().filter($"id" === 1L).as[(Long, String)].collect().toSeq
    assert(ones === Seq((1L, "retry_t2")), s"duplicate live rows: $ones")
  }

  test("dv: a winner landing inside the mask window is never silently dropped") {
    // the lost-update shape the base-version pin exists for: the
    // winner commits BETWEEN the mutator's entry-snapshot capture and
    // writeMask's internal manifest re-read; the re-read advances the
    // instance readVersion, and a commit CASed at readVersion+1 would
    // SUCCEED on the stale base, erasing the winner's entries
    val root = fresh("dv_mask_window")
    val seed = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val t1 = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(seed), mode = MergeTable.DeletionVectors)
    val t2 = MergeTable.open(spark, root)
    var fired = false
    t2.onBeforeMask = () => {
      if (!fired) { fired = true; t1.upsert(Seq((9L, "winner")).toDF("id", "v")) }
    }
    t2.upsert(Seq((3L, "c")).toDF("id", "v"))
    assert(t2.read().as[(Long, String)].collect().toMap ===
      Map(1L -> "a", 2L -> "b", 3L -> "c", 9L -> "winner"),
      "the winner's commit was dropped by a stale-base CAS")
  }

  test("dv: concurrent delete vs upsert of the same key conflicts") {
    // the delete's mask addresses the key's OLD position; the winner
    // appended a NEW live row for it that the mask cannot cover — a
    // blind rebase would lose the delete
    val root = fresh("dv_del_vs_up")
    val seed = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val t1 = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(seed), mode = MergeTable.DeletionVectors)
    val t2 = MergeTable.open(spark, root)
    interleave(t2) { t1.upsert(Seq((1L, "resurrected")).toDF("id", "v")) }
    intercept[CommitConflictException] { t2.delete(Seq(1L).toDF("id")) }
    t2.withRetry() { t2.delete(Seq(1L).toDF("id")) }
    assert(t2.read().as[(Long, String)].collect().toMap === Map(2L -> "b"))
  }
}
