package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Randomized concurrent-writer fuzz over every table layout: real
  * threads race upserts/deletes through `withRetry`, exercising the
  * rebase paths (disjoint-scope composition) AND the conflict paths
  * (overlapping scopes, key moves, compactions) in arbitrary
  * interleavings. Deterministic per-thread seeds; invariants hold for
  * EVERY legal serialization, so no interleaving can flake:
  *
  *  1. the final snapshot has unique keys;
  *  2. every surviving value was actually written by some op (or the
  *     seed) FOR THAT KEY — no cross-key smearing, no resurrection of
  *     data no writer produced;
  *  3. versions are contiguous 1..N (the CAS never skips or burns a
  *     slot, rebases included);
  *  4. the per-version change feed replayed over the whole history
  *     folds to the final snapshot — rebased manifests stay
  *     feed-consistent (each key's latest non-delete change IS its
  *     final row, and keys whose latest change is D are absent).
  */
class ConcurrentFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val Threads = 3
  private val OpsPerThread = 4
  private val KeySpace = 30L
  private val Grps = Seq("red", "blue", "green")

  private def fresh(name: String): String = {
    val root = s"target/test_tmp/fz_$name"
    MergeTable.drop(root)
    root
  }

  private case class WriteOp(thread: Int, op: Int, isDelete: Boolean,
      rows: Seq[(Long, String, String)]) // (id, grp, v)

  /** Deterministic op schedule: value strings are unique per
    * (thread, op, key) so invariant 2 can attribute every surviving
    * row to the op that wrote it.
    */
  private def schedule(layoutSeed: Int): Seq[Seq[WriteOp]] =
    (0 until Threads).map { t =>
      val rnd = new scala.util.Random(1000 * layoutSeed + t)
      (0 until OpsPerThread).map { o =>
        val isDelete = rnd.nextInt(4) == 0 // 25% deletes
        val nKeys = 1 + rnd.nextInt(5)
        val ks = Seq.fill(nKeys)(rnd.nextLong(KeySpace)).distinct
        WriteOp(t, o, isDelete,
          ks.map(k => (k, Grps(rnd.nextInt(Grps.size)), s"t${t}_o${o}_k$k")))
      }
    }

  private def runFuzz(name: String, layoutSeed: Int,
      mk: (String, org.apache.spark.sql.DataFrame) => MergeTable): Unit = {
    val root = fresh(name)
    val seed = (0L until 20L).map(k => (k, Grps((k % 3).toInt), s"seed_k$k"))
      .toDF("id", "grp", "v")
    mk(root, seed)
    val plan = schedule(layoutSeed)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = plan.zipWithIndex.map { case (ops, _) =>
      new Thread(() => {
        try {
          val t = MergeTable.open(spark, root)
          ops.foreach { op =>
            val df = op.rows.toDF("id", "grp", "v")
            t.withRetry(maxAttempts = 60) {
              if (op.isDelete) t.delete(df.select("id")) else t.upsert(df)
            }
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(300000))
    // a silently-expired join would let a straggler writer keep
    // committing while the invariants read the table — the snapshot
    // and the feed would then see DIFFERENT versions and the mismatch
    // would masquerade as an engine bug (it did, once)
    assert(threads.forall(!_.isAlive), s"$name: writer still running after join timeout")
    assert(errors.isEmpty, s"writer failed: ${Option(errors.peek()).map(_.toString)}")

    val t = MergeTable.open(spark, root)
    val snap = t.read().select("id", "grp", "v").as[(Long, String, String)]
      .collect().toSeq

    // 1: unique keys
    assert(snap.map(_._1).distinct.size === snap.size,
      s"duplicate keys in $name: ${snap.sortBy(_._1)}")

    // 2: every value attributable to the seed or an op on that key
    val legal: Map[Long, Set[(String, String)]] =
      (plan.flatten.filterNot(_.isDelete).flatMap(_.rows) ++
        (0L until 20L).map(k => (k, Grps((k % 3).toInt), s"seed_k$k")))
        .groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(r => (r._2, r._3)).toSet }
    snap.foreach { case (k, g, v) =>
      assert(legal.getOrElse(k, Set.empty).contains((g, v)),
        s"$name: key $k carries unwritten row ($g, $v)")
    }

    // 3: contiguous versions
    val vs = t.versions()
    assert(vs === (1L to vs.size.toLong), s"$name versions not contiguous: $vs")

    // 4: change-feed replay folds to the snapshot
    val feed = t.changeFeed(0L, vs.last)
      .select("id", "grp", "v", "_change").as[(Long, String, String, String)]
      .collect().toSeq
    val latest = feed.groupBy(_._1) // feed already emits latest-per-key
    latest.foreach { case (_, rows) =>
      assert(rows.size === 1, s"$name: feed emitted ${rows.size} rows for a key")
    }
    val live = feed.filter(_._4 != "D").map(r => (r._1, r._2, r._3)).sortBy(_._1)
    assert(live === snap.sortBy(_._1),
      s"$name: feed fold != snapshot\nfeed=$live\nsnap=${snap.sortBy(_._1)}")
    feed.filter(_._4 == "D").foreach { case (k, _, _, _) =>
      assert(!snap.exists(_._1 == k), s"$name: deleted key $k still live")
    }
  }

  test("fuzz: COW flat") {
    runFuzz("cow", 1, (root, seed) =>
      MergeTable.createIfAbsent(spark, root, Seq("id"), initial = Some(seed)))
  }

  test("fuzz: COW bucketed") {
    runFuzz("bucketed", 2, (root, seed) =>
      MergeTable.createIfAbsent(spark, root, Seq("id"), initial = Some(seed),
        numBuckets = Some(4)))
  }

  test("fuzz: merge-on-read") {
    runFuzz("mor", 3, (root, seed) =>
      MergeTable.createIfAbsent(spark, root, Seq("id"), initial = Some(seed),
        mode = MergeTable.MergeOnRead))
  }

  test("fuzz: deletion vectors") {
    runFuzz("dv", 4, (root, seed) =>
      MergeTable.createIfAbsent(spark, root, Seq("id"), initial = Some(seed),
        mode = MergeTable.DeletionVectors))
  }

  test("fuzz: value-partitioned (with cross-partition key moves)") {
    runFuzz("pv", 5, (root, seed) =>
      MergeTable.createIfAbsent(spark, root, Seq("id"), initial = Some(seed),
        partitionCols = Seq("grp")))
  }

  test("fuzz: composed partitioned × bucketed (cell-scoped rebases)") {
    runFuzz("pb", 6, (root, seed) =>
      MergeTable.createIfAbsent(spark, root, Seq("id"), initial = Some(seed),
        numBuckets = Some(4), partitionCols = Seq("grp")))
  }

  test("fuzz: composed MOR (flat deltas over cells)") {
    runFuzz("pb_mor", 7, (root, seed) =>
      MergeTable.createIfAbsent(spark, root, Seq("id"), initial = Some(seed),
        mode = MergeTable.MergeOnRead, numBuckets = Some(4),
        partitionCols = Seq("grp")))
  }
}
