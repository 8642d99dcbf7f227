package graft.cdc

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** The incremental commit log: append/upsert commits write `@delta`
  * diff manifests (O(changed entries), the Delta-log shape — a 100 TB
  * table's small append must not rewrite a ~1M-line file list every
  * trigger), every `manifestCheckpointInterval`th chain link is a full
  * checkpoint bounding the read-side chain walk, and every snapshot
  * consumer — reads, time travel, restore, expiry, vacuum, branches,
  * fast-forward — sees the MATERIALIZED view.
  */
class IncrementalManifestSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val root = s"target/test_tmp/incman_$name"
    MergeTable.drop(root)
    root
  }

  private def rawLines(root: String, v: Long): Seq[String] =
    new String(Files.readAllBytes(
      Paths.get(f"$root/manifests/v$v%05d.txt"))).linesIterator.toSeq

  test("appends write O(delta) manifests, not O(table) rewrites") {
    val root = fresh("delta_shape")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some((0L until 64L).map(i => (i, s"v$i")).toDF("id", "v")),
      numBuckets = Some(8))
    t.append(Seq((100L, "x")).toDF("id", "v"))
    // v1 seeded 8 bucket entries; the append lands in ONE bucket —
    // the raw body must be the 2-line diff (that bucket's rewrite),
    // never an 8-line full rewrite, and it must resolve to the full list
    val raw = rawLines(root, 2L)
    assert(raw.head.startsWith("@delta:1"), raw.mkString("|"))
    assert(raw.count(_.startsWith("+")) === 1, raw.mkString("|"))
    assert(raw.count(_.startsWith("-")) <= 1, raw.mkString("|"))
    val resolved = latestManifestLines(root).filterNot(_.startsWith("op:"))
    assert(resolved.length === 8, resolved.mkString("|"))
    assert(t.read().count() === 65)
  }

  test("bucketed upsert delta carries one removal + one addition") {
    val root = fresh("delta_upsert")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some((0L until 64L).map(i => (i, s"v$i")).toDF("id", "v")),
      numBuckets = Some(8))
    t.upsert(Seq((5L, "V5")).toDF("id", "v"))
    val raw = rawLines(root, 2L)
    assert(raw.head.startsWith("@delta:1"), raw.mkString("|"))
    // one bucket rewritten: its old entry removed, the rewrite added
    assert(raw.count(_.startsWith("-b")) === 1, raw.mkString("|"))
    assert(raw.count(_.startsWith("+b")) === 1, raw.mkString("|"))
    assert(t.read().as[(Long, String)].collect().toMap.apply(5L) === "V5")
  }

  test("checkpoint interval bounds the chain: every Nth manifest is full") {
    val root = fresh("ckpt")
    withSQLConf("graft.mergetable.manifestCheckpointInterval" -> "4") {
      val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
        initial = Some(Seq((0L, "seed")).toDF("id", "v")))
      (1L to 9L).foreach(i => t.append(Seq((i, s"v$i")).toDF("id", "v")))
      // v1 full (no base), then deltas until depth hits the interval:
      // chain depth resets at v5 and v9 (depth-4 caps under interval 4)
      val deltaVs = (1L to 10L).filter(v => rawLines(root, v).head.startsWith("@delta:"))
      val fullVs = (1L to 10L).filterNot(deltaVs.contains)
      assert(fullVs.contains(1L))
      assert(deltaVs.nonEmpty)
      assert(fullVs.size >= 2, s"full=$fullVs delta=$deltaVs")
      // every version stays readable through its chain
      (1L to 10L).foreach { v =>
        assert(t.readVersion(v).count() === v, s"version $v")
      }
      assert(t.read().count() === 10)
    }
  }

  test("expiry materializes a retained delta whose chain base expires") {
    val root = fresh("expire")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((0L, "seed")).toDF("id", "v")))
    (1L to 5L).foreach(i => t.append(Seq((i, s"v$i")).toDF("id", "v")))
    // head (v6) is a delta on v5, itself a delta on … back to full v1
    assert(rawLines(root, 6L).head.startsWith("@delta:"))
    val mtimeBefore = Files.getLastModifiedTime(Paths.get(f"$root/manifests/v${6L}%05d.txt"))
    // KEEP 1 keeps the user's contract: exactly 5 expire, and the
    // retained head — a delta whose whole chain just left — is
    // MATERIALIZED in place so the snapshot stays readable
    val expired = t.expireSnapshots(keepLast = 1)
    assert(expired === 5, s"expired $expired")
    assert(!rawLines(root, 6L).head.startsWith("@delta:"))
    // the materialized manifest keeps its commit mtime — timestampAsOf
    // must keep resolving the same instant
    assert(Files.getLastModifiedTime(
      Paths.get(f"$root/manifests/v${6L}%05d.txt")) === mtimeBefore)
    assert(t.read().count() === 6)
    assert(t.readVersion(6L).count() === 6)
  }

  test("branch seeds materialize a delta fork; publish round-trips") {
    val root = fresh("branch")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    t.append(Seq((2L, "b")).toDF("id", "v")) // v2: delta on v1
    assert(rawLines(root, 2L).head.startsWith("@delta:"))
    t.createBranch("wip")
    // the fork seed crossed lineage dirs — it must be FULL (its chain
    // lives in main's dir) and resolve to the same content
    val seed = new String(Files.readAllBytes(
      Paths.get(s"$root/branches/wip/manifests/v00002.txt"))).linesIterator.toSeq
    assert(!seed.head.startsWith("@delta:"), seed.mkString("|"))
    assert(seed.filterNot(_.startsWith("op:")).sorted ===
      latestManifestLines(root).sorted)
    val b = t.forBranch("wip")
    b.append(Seq((3L, "c")).toDF("id", "v")) // branch v3: delta on the seed
    assert(new String(Files.readAllBytes(
      Paths.get(s"$root/branches/wip/manifests/v00003.txt")))
      .linesIterator.next().startsWith("@delta:"))
    assert(t.fastForward("wip") === 3L)
    assert(t.read().as[(Long, String)].collect().sorted ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // published delta resolves against MAIN's lineage
    assert(manifestLinesOf(root, "v00003.txt").exists(_.contains("3")) ||
      t.readVersion(3L).count() === 3)
  }

  test("fast-forward over an expired fork base materializes the published delta") {
    val root = fresh("ff_expired")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    withSQLConf("graft.mergetable.manifestCheckpointInterval" -> "1") {
      t.append(Seq((2L, "b")).toDF("id", "v")) // v2 full
    }
    t.createBranch("wip")
    val b = t.forBranch("wip")
    b.append(Seq((3L, "c")).toDF("id", "v")) // branch v3: delta on v2
    // main expires everything but its head BEFORE the publish; the
    // branch delta's base (v2) survives only because it IS the head …
    // so force the harder case: advance main is forbidden (divergence),
    // instead expire by hand-removing nothing — simulate the missing
    // base by deleting v2 after tagging is not allowed; instead verify
    // the materialize path directly: remove main's v2 manifest copy
    // while keeping the branch intact is exactly the expired-fork shape
    t.expireSnapshots(keepLast = 1) // keeps v2 (head) — no-op here
    Files.delete(Paths.get(f"$root/manifests/v${2L}%05d.txt"))
    // v2 gone in main: publish must materialize v2's content from the
    // branch chain … but fastForward replays (fork+1 .. head] = {3};
    // v3 is a delta on v2 which main no longer has → materialized
    val head = t.fastForward("wip")
    assert(head === 3L)
    val published = new String(Files.readAllBytes(
      Paths.get(f"$root/manifests/v${3L}%05d.txt"))).linesIterator.toSeq
    assert(!published.head.startsWith("@delta:"), published.mkString("|"))
    assert(t.readVersion(3L).count() === 3)
  }

  test("sort marker rides a delta commit verbatim and is dropped by the next") {
    val root = fresh("sort")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some((0L until 32L).map(i => (i, i * 10L)).toDF("id", "v")),
      numBuckets = Some(4))
    t.sortBuckets(Seq("v"))
    assert(t.currentSortedBy() === Seq("v"))
    t.append(Seq((100L, 1L)).toDF("id", "v")) // delta commit
    assert(rawLines(root, 3L).head.startsWith("@delta:") ||
      !rawLines(root, 3L).exists(_.startsWith("sort:")))
    assert(t.currentSortedBy() === Nil) // any write invalidates the sort
    assert(t.read().count() === 33)
  }

  test("restore, time travel and the change feed read through delta chains") {
    val root = fresh("travel")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    t.upsert(Seq((1L, "A"), (2L, "b")).toDF("id", "v")) // v2 delta
    t.append(Seq((3L, "c")).toDF("id", "v")) // v3 delta
    assert(t.readVersion(1L).count() === 1)
    assert(t.readVersion(2L).count() === 2)
    val feed = t.changesBetween(1L, 3L).select("id", "_change")
      .as[(Long, String)].collect().toMap
    assert(feed === Map(1L -> "U", 2L -> "I", 3L -> "I"))
    t.restore(1L) // v4 — not diff-shaped vs v3 (drops entries): any encoding must round-trip
    assert(t.read().as[(Long, String)].collect() === Seq((1L, "a")))
    assert(t.readVersion(3L).count() === 3) // history intact
  }

  test("vacuum sees through delta manifests: removed entries' dirs reclaim") {
    val root = fresh("vacuum")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some((0L until 16L).map(i => (i, s"v$i")).toDF("id", "v")),
      mode = MergeTable.MergeOnRead)
    t.upsert(Seq((1L, "X")).toDF("id", "v")) // v2: MOR delta append → @delta manifest
    assert(rawLines(root, 2L).head.startsWith("@delta:"))
    t.compact() // v3: full rewrite resolved THROUGH the delta chain
    val reclaimed = t.vacuum()
    assert(reclaimed >= 1, s"reclaimed $reclaimed")
    assert(t.read().count() === 16)
    assert(t.read().as[(Long, String)].collect().toMap.apply(1L) === "X")
  }
}
