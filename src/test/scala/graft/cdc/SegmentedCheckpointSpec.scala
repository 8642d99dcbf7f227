package graft.cdc

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Two-level manifest checkpoints (r13): the incremental log made
  * COMMITS O(delta) bytes, but every checkpoint-interval chain root
  * still rewrote O(table files) lines — at ~1M files the residual
  * metadata bottleneck. A checkpoint is now a manifest LIST
  * (`@segments:1` + `s:<file>` refs to immutable content-addressed
  * segment files + inline `e:` tails): unchanged entry runs
  * re-reference the previous checkpoint's segments, so checkpoint
  * cost is O(list + changed segments) — sublinear in entry count.
  */
class SegmentedCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val root = s"target/test_tmp/segck_$name"
    MergeTable.drop(root)
    root
  }

  private def rawLines(root: String, v: Long): Seq[String] =
    new String(Files.readAllBytes(
      Paths.get(f"$root/manifests/v$v%05d.txt"))).linesIterator.toSeq

  private def segFiles(root: String): Set[String] =
    Option(Paths.get(s"$root/manifests/segs").toFile.list())
      .getOrElse(Array.empty[String]).filter(_.endsWith(".seg")).toSet

  test("a large checkpoint writes a segment list, resolves identically, and stays readable") {
    val root = fresh("shape")
    withSQLConf("graft.mergetable.manifestSegmentSize" -> "4",
        "graft.mergetable.manifestCheckpointInterval" -> "3") {
      val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
        initial = Some((0L until 256L).map(i => (i, s"v$i")).toDF("id", "v")),
        numBuckets = Some(32))
      // the 32-entry seed is itself big enough to checkpoint two-level
      val v1 = rawLines(root, 1L)
      assert(v1.head.startsWith("@segments:"), v1.take(3).mkString("|"))
      assert(v1.exists(_.startsWith("s:")), v1.mkString("|"))
      // resolved view = the full entry list, exactly like a full manifest
      val resolved = latestManifestLines(root)
      assert(resolved.count(_.startsWith("b")) === 32, resolved.mkString("|"))
      assert(t.read().count() === 256)
      // deltas chain on top of the segmented checkpoint unchanged
      t.append(Seq((1000L, "x")).toDF("id", "v"))
      assert(rawLines(root, 2L).head.startsWith("@delta:1"))
      assert(t.read().count() === 257)
      (1L to 2L).foreach(v => assert(t.readVersion(v).count() === 256 + v - 1))
    }
  }

  test("the next checkpoint re-references unchanged segments — cost sublinear in entries") {
    val root = fresh("reuse")
    withSQLConf("graft.mergetable.manifestSegmentSize" -> "4",
        "graft.mergetable.manifestCheckpointInterval" -> "3") {
      val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
        initial = Some((0L until 256L).map(i => (i, s"v$i")).toDF("id", "v")),
        numBuckets = Some(32))
      val v1Segs = rawLines(root, 1L).filter(_.startsWith("s:")).toSet
      val segsAfterSeed = segFiles(root)
      // two deltas, then the interval forces v4 to checkpoint
      t.upsert(Seq((5L, "V5")).toDF("id", "v"))
      t.upsert(Seq((6L, "V6")).toDF("id", "v"))
      t.upsert(Seq((7L, "V7")).toDF("id", "v"))
      val v4 = rawLines(root, 4L)
      assert(v4.head.startsWith("@segments:"), v4.take(3).mkString("|"))
      val v4Segs = v4.filter(_.startsWith("s:"))
      val reused = v4Segs.count(v1Segs.contains)
      // 3 upserts touch ≤3 of 32 buckets → ≤3 of 8 seed segments break;
      // the rest MUST be re-referenced, not rewritten
      assert(reused >= v4Segs.size / 2,
        s"reused=$reused of ${v4Segs.size} (seed had ${v1Segs.size})")
      val newSegs = segFiles(root) -- segsAfterSeed
      assert(newSegs.size <= 6,
        s"checkpoint must write only CHANGED segments, wrote ${newSegs.size}")
      // the sublinearity pin: checkpoint manifest bytes << full body
      val fullBytes = MergeTable.manifestLines(
        Paths.get(s"$root/manifests/v00004.txt")).mkString("\n").length
      val ckptBytes = Files.size(Paths.get(s"$root/manifests/v00004.txt"))
      assert(ckptBytes * 2 < fullBytes,
        s"checkpoint $ckptBytes B vs full $fullBytes B")
      // and the data is exactly right
      val m = t.read().as[(Long, String)].collect().toMap
      assert(m(5L) === "V5" && m(6L) === "V6" && m(7L) === "V7" && m(8L) === "v8")
      assert(m.size === 256)
    }
  }

  test("branch seed and fast-forward materialize segmented checkpoints across lineages") {
    val root = fresh("branch")
    withSQLConf("graft.mergetable.manifestSegmentSize" -> "4") {
      val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
        initial = Some((0L until 128L).map(i => (i, s"v$i")).toDF("id", "v")),
        numBuckets = Some(16))
      assert(rawLines(root, 1L).head.startsWith("@segments:"))
      t.createBranch("audit")
      // the fork copy must NOT carry `s:` refs into the branch dir
      val seed = new String(Files.readAllBytes(
        Paths.get(s"$root/branches/audit/manifests/v00001.txt"))).linesIterator.toSeq
      assert(!seed.head.startsWith("@segments:") && !seed.exists(_.startsWith("s:")),
        seed.take(3).mkString("|"))
      val b = t.forBranch("audit")
      b.append((1000L until 1200L).map(i => (i, s"b$i")).toDF("id", "v"))
      assert(b.read().count() === 328)
      // branch checkpoints write their OWN segs dir; publish round-trips
      t.fastForward("audit")
      assert(t.read().count() === 328)
    }
  }

  test("checkpoint reuse refreshes segment mtimes — vacuum's grace window covers reuse") {
    // The r13-advice race: a reused segment's only referencing manifest
    // can be expired mid-checkpoint, and an old mtime would let an
    // age-gated vacuum delete it BEFORE this checkpoint's CAS links it.
    // The writer therefore touches every segment it re-references (and
    // every content-dedup hit), pulling it inside the grace window.
    val root = fresh("touch")
    withSQLConf("graft.mergetable.manifestSegmentSize" -> "4",
        "graft.mergetable.manifestCheckpointInterval" -> "3") {
      val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
        initial = Some((0L until 256L).map(i => (i, s"v$i")).toDF("id", "v")),
        numBuckets = Some(32))
      val segsDir = Paths.get(s"$root/manifests/segs")
      val ancient = java.nio.file.attribute.FileTime.fromMillis(1000L)
      segFiles(root).foreach(n => Files.setLastModifiedTime(segsDir.resolve(n), ancient))
      val t0 = System.currentTimeMillis()
      (1 to 3).foreach(i => t.upsert(Seq((i.toLong, s"u$i")).toDF("id", "v")))
      val v1Segs = rawLines(root, 1L).filter(_.startsWith("s:"))
        .map(_.stripPrefix("s:")).toSet
      val reused = rawLines(root, 4L).filter(_.startsWith("s:"))
        .map(_.stripPrefix("s:")).filter(v1Segs.contains)
      assert(reused.nonEmpty, "checkpoint re-referenced no seed segments")
      reused.foreach { n =>
        val mt = Files.getLastModifiedTime(segsDir.resolve(n)).toMillis
        assert(mt >= t0, s"reused segment $n kept its stale mtime ($mt < $t0)")
      }
    }
  }

  test("vacuum GCs only unreferenced segments; expiry keeps readable checkpoints") {
    val root = fresh("gc")
    withSQLConf("graft.mergetable.manifestSegmentSize" -> "4",
        "graft.mergetable.manifestCheckpointInterval" -> "2",
        // grace 0: this test's segments are seconds old, and it wants
        // to exercise the deletion path (production keeps the window —
        // a fresh unreferenced segment may be an in-flight checkpoint's)
        "graft.mergetable.vacuumSegGraceMs" -> "0") {
      val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
        initial = Some((0L until 256L).map(i => (i, s"v$i")).toDF("id", "v")),
        numBuckets = Some(32))
      (1 to 6).foreach(i => t.upsert(Seq((i.toLong, s"u$i")).toDF("id", "v")))
      val before = segFiles(root)
      assert(before.nonEmpty)
      // expire everything but the newest 2 snapshots, then vacuum
      t.expireSnapshots(2)
      t.vacuum()
      val after = segFiles(root)
      assert(after.subsetOf(before))
      // every segment the REMAINING manifests reference must survive…
      val referenced = Option(Paths.get(s"$root/manifests").toFile.list()).get
        .filter(_.matches("v\\d+\\.txt"))
        .flatMap(n => rawLines(root, n.stripPrefix("v").stripSuffix(".txt").toLong)
          .filter(_.startsWith("s:")).map(_.stripPrefix("s:"))).toSet
      assert(referenced.subsetOf(after), s"missing: ${referenced -- after}")
      // …and the table stays exactly right
      val m = t.read().as[(Long, String)].collect().toMap
      assert(m.size === 256 && m(3L) === "u3" && m(100L) === "v100")
    }
  }
}
