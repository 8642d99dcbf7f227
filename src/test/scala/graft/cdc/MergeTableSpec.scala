package graft.cdc

import graft.SparkSpec

class MergeTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(name: String): String = {
    val root = s"target/test_tmp/$name"
    MergeTable.drop(root)
    root
  }

  test("createIfAbsent seeds initial state; read returns snapshot") {
    val t = MergeTable.createIfAbsent(spark, freshRoot("seed"), Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b")).toDF("id", "v")))
    assert(t.read().as[(Long, String)].collect().sorted === Seq((1L, "a"), (2L, "b")))
  }

  test("upsert updates matched keys and inserts new ones") {
    val t = MergeTable.createIfAbsent(spark, freshRoot("upsert"), Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b")).toDF("id", "v")))
    t.upsert(Seq((2L, "B"), (3L, "c")).toDF("id", "v"))
    assert(t.read().as[(Long, String)].collect().sorted === Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("delete removes only the given keys") {
    val t = MergeTable.createIfAbsent(spark, freshRoot("delete"), Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")))
    t.delete(Seq(2L).toDF("id"))
    assert(t.read().as[(Long, String)].collect().sorted === Seq((1L, "a"), (3L, "c")))
  }

  test("COW upsert/delete above the broadcast key limit fall back to a shuffle join") {
    spark.conf.set("graft.mergetable.broadcastKeyLimit", "2")
    try {
      val t = MergeTable.createIfAbsent(spark, freshRoot("bigbatch"), Seq("id"),
        initial = Some(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")))
      // 3 changed keys > limit 2 → un-broadcast path; results must match
      t.upsert(Seq((2L, "B"), (3L, "C"), (5L, "e")).toDF("id", "v"))
      assert(t.read().as[(Long, String)].collect().sorted ===
        Seq((1L, "a"), (2L, "B"), (3L, "C"), (4L, "d"), (5L, "e")))
      t.delete(Seq(1L, 3L, 5L).toDF("id"))
      assert(t.read().as[(Long, String)].collect().sorted ===
        Seq((2L, "B"), (4L, "d")))
      // bucketed COW takes the same guarded path
      val tb = MergeTable.createIfAbsent(spark, freshRoot("bigbatch_bkt"), Seq("id"),
        initial = Some(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")),
        numBuckets = Some(4))
      tb.upsert(Seq((2L, "B"), (3L, "C"), (5L, "e")).toDF("id", "v"))
      assert(tb.read().as[(Long, String)].collect().sorted ===
        Seq((1L, "a"), (2L, "B"), (3L, "C"), (4L, "d"), (5L, "e")))
    } finally spark.conf.unset("graft.mergetable.broadcastKeyLimit")
  }

  test("append evolves schema; old rows read with null backfill") {
    val t = MergeTable.createIfAbsent(spark, freshRoot("evolve"), Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    t.append(Seq((2L, "b", 9.5)).toDF("id", "v", "extra"))
    val rows = t.read().select("id", "v", "extra").as[(Long, String, Option[Double])].collect().sortBy(_._1)
    assert(rows === Seq((1L, "a", None), (2L, "b", Some(9.5))))
  }

  test("upsert with evolved change schema carries new column") {
    val t = MergeTable.createIfAbsent(spark, freshRoot("evolve_upsert"), Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b")).toDF("id", "v")))
    t.upsert(Seq((2L, "B", 1.5)).toDF("id", "v", "extra"))
    val rows = t.read().select("id", "v", "extra").as[(Long, String, Option[Double])].collect().sortBy(_._1)
    assert(rows === Seq((1L, "a", None), (2L, "B", Some(1.5))))
  }

  test("multi-column primary keys") {
    val t = MergeTable.createIfAbsent(spark, freshRoot("multikey"), Seq("db", "id"),
      initial = Some(Seq(("x", 1L, "a"), ("y", 1L, "b")).toDF("db", "id", "v")))
    t.upsert(Seq(("x", 1L, "A")).toDF("db", "id", "v"))
    val rows = t.read().as[(String, Long, String)].collect().sorted
    assert(rows === Seq(("x", 1L, "A"), ("y", 1L, "b")))
  }

  test("versions are atomic: commits advance the pointer") {
    val root = freshRoot("versions")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    t.append(Seq((2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))
    assert(t.read().count() === 3)
    val manifests = new java.io.File(s"$root/manifests").list().sorted
    assert(manifests.length === 3)
  }

  test("concurrent commit raises instead of silently losing an update") {
    val root = freshRoot("occ")
    val t = new MergeTable(spark, root, Seq("id"))
    t.upsert(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val t2 = new MergeTable(spark, root, Seq("id"))
    t2.append(Seq((3L, "c")).toDF("id", "v")) // v2 by another writer
    // this instance believes it last read v1 (the CAS window: its
    // entries were read before t2's commit landed); committing on
    // that stale base must raise, not drop t2's row
    t.forceReadVersion(1L)
    val e = intercept[java.util.ConcurrentModificationException] {
      t.commitProbe(Seq("base" -> "stale-snapshot"))
    }
    assert(e.getMessage.contains("concurrent commit"))
    // a retry re-reads (v2) and lands cleanly as v3 with ALL rows
    t.append(Seq((4L, "d")).toDF("id", "v"))
    assert(t.read().count() === 4)
  }

  test("withRetry: racing writers all land under the commit-retry loop") {
    val root = freshRoot("occ_retry")
    MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((0L, "seed")).toDF("id", "v")))
    // 4 threads × 3 appends of disjoint keys, each through withRetry:
    // every CAS loser re-reads and retries, so no row may vanish
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val futures = (1 to 4).map { w =>
      Future {
        val t = new MergeTable(spark, root, Seq("id"))
        (1 to 3).foreach { i =>
          val key = (w * 100 + i).toLong
          t.withRetry(maxAttempts = 20) {
            t.append(Seq((key, s"w$w-$i")).toDF("id", "v"))
          }
        }
      }
    }
    Await.result(Future.sequence(futures), 120.seconds)
    val t = new MergeTable(spark, root, Seq("id"))
    assert(t.read().count() === 13, "a concurrent commit lost an update")
    assert(t.versions().size === 13)
  }

  test("withRetry: racing writers on a value-partitioned table converge") {
    // the partition-scoped merge reads the snapshot twice (holder
    // scan + affected rewrite) before committing — the widest
    // read-modify-write window of any layout, so the CAS must cover
    // it: every loser re-reads and re-merges, no row may vanish and
    // untouched partitions must survive every interleaving
    val root = freshRoot("occ_partitioned")
    MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((0L, "keep", 0L)).toDF("id", "grp", "v")),
      partitionCols = Seq("grp"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val futures = (1 to 3).map { w =>
      Future {
        val t = MergeTable.open(spark, root)
        (1 to 2).foreach { i =>
          val key = (w * 100 + i).toLong
          t.withRetry(maxAttempts = 30) {
            t.upsert(Seq((key, s"g$w", key)).toDF("id", "grp", "v"))
          }
        }
      }
    }
    Await.result(Future.sequence(futures), 180.seconds)
    val t = MergeTable.open(spark, root)
    assert(t.read().count() === 7, "a concurrent partitioned commit lost an update")
    // the seed partition was never touched by any writer
    assert(t.read().filter(org.apache.spark.sql.functions.col("grp") === "keep")
      .count() === 1)
  }

  test("withRetry does NOT retry an unrelated ConcurrentModificationException") {
    val root = freshRoot("occ_scope")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((0L, "seed")).toDF("id", "v")))
    var calls = 0
    intercept[java.util.ConcurrentModificationException] {
      t.withRetry(maxAttempts = 5) {
        calls += 1
        // a collection-iteration CME from user code, NOT a commit CAS
        throw new java.util.ConcurrentModificationException("not a commit conflict")
      }
    }
    assert(calls === 1, "an unrelated CME must surface, not re-run the mutation")
  }

  test("a writer crashing before its pointer update cannot wedge the table") {
    val root = freshRoot("occ_crash")
    val t = new MergeTable(spark, root, Seq("id"))
    t.upsert(Seq((1L, "a")).toDF("id", "v"))
    val t2 = new MergeTable(spark, root, Seq("id"))
    t2.append(Seq((2L, "b")).toDF("id", "v")) // commits v2 ...
    // ... but "crashes" before its convenience-pointer update landed
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/_LATEST"), "v00001.txt".getBytes)
    // manifest existence is the commit point: readers see v2, and the
    // next writer commits v3 — no permanent conflict loop
    val t3 = new MergeTable(spark, root, Seq("id"))
    assert(t3.read().count() === 2)
    t3.append(Seq((3L, "c")).toDF("id", "v"))
    assert(t3.read().count() === 3)
    assert(t3.versions() === Seq(1L, 2L, 3L))
  }

  test("applyChanges replay converges: no duplicate keys from re-applied batches") {
    val root = freshRoot("applyreplay")
    val t = new MergeTable(spark, root, Seq("id"))
    t.applyChanges(Seq(("I", 1L, "a", 100L), ("I", 2L, "b", 100L))
      .toDF("opclass", "id", "v", "ts_ms"), ordering = Seq("ts_ms"))
    // batch 2 re-inserts an existing key (crawler re-emit), updates,
    // and deletes a missing key
    val batch2 = Seq(("I", 1L, "a-re", 200L), ("U", 2L, "B", 200L), ("D", 3L, "x", 200L))
      .toDF("opclass", "id", "v", "ts_ms")
    t.applyChanges(batch2, ordering = Seq("ts_ms"))
    val once = t.read().select("id", "v").as[(Long, String)].collect().sorted
    assert(once === Seq((1L, "a-re"), (2L, "B")), "re-insert must replace, not duplicate")
    // foreachBatch is at-least-once: the same batch replayed after a
    // crash must land the identical state
    t.applyChanges(batch2, ordering = Seq("ts_ms"))
    val twice = t.read().select("id", "v").as[(Long, String)].collect().sorted
    assert(twice === once)
  }

  test("compact on an idle single-base COW table is a no-op") {
    val root = freshRoot("compactidle")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    val before = t.versions()
    t.compact() // nothing pending: must not rewrite the snapshot
    assert(t.versions() === before)
    t.append(Seq((2L, "b")).toDF("id", "v")) // second base → compactable
    t.compact()
    assert(t.versions().size === before.size + 2)
    assert(t.read().count() === 2)
  }

  test("applyChanges folds I/U/D with precombine ordering") {
    val root = freshRoot("applychanges")
    val t = new MergeTable(spark, root, Seq("id"))
    val batch = Seq(
      ("I", 1L, "ins-1", 100L),
      ("I", 2L, "ins-2", 100L),
      ("U", 1L, "upd-1-old", 150L),
      ("U", 1L, "upd-1-new", 200L), // later ts wins
      ("D", 2L, "del-2", 300L),
    ).toDF("opclass", "id", "v", "ts_ms")
    t.applyChanges(batch, ordering = Seq("ts_ms"))
    val rows = t.read().select("id", "v").as[(Long, String)].collect().sorted
    assert(rows === Seq((1L, "upd-1-new")))
  }
}
