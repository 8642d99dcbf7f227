package graft.cdc

import graft.SparkSpec
import scala.util.Random

/** Model-based randomized testing: a MergeTable driven by a random
  * operation sequence must stay equal to a trivial in-memory model —
  * across COW/MOR × flat/bucketed, with compaction and restores
  * interleaved — and every recorded version must replay its model
  * through time travel. Fixed seeds keep failures reproducible.
  */
class MergeTableModelSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String, mode: String, buckets: Option[Int], seed: Long): Unit = {
    val rnd = new Random(seed)
    val root = s"target/test_tables/model_$name"
    MergeTable.drop(root)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, 100L), (2L, 200L)).toDF("id", "v")),
      mode = mode, numBuckets = buckets)
    var model = Map(1L -> 100L, 2L -> 200L)
    // version → model state right after that version committed (an op
    // like MOR upsert may auto-compact and commit twice; recording
    // versions().max after the op stays correct either way)
    var snapshots = Map[Long, Map[Long, Long]]()
    def record(): Unit = snapshots += (t.versions().max -> model)
    def check(): Unit = {
      val actual = t.read().as[(Long, Long)].collect().toMap
      assert(actual === model, s"$name diverged from the model")
    }
    record()
    for (step <- 1 to 30) {
      rnd.nextInt(6) match {
        case 0 | 1 =>
          val ks = (1 to rnd.nextInt(5) + 1).map(_ => rnd.nextInt(20).toLong).distinct
          val rows = ks.map(k => (k, rnd.nextInt(1000).toLong))
          t.upsert(rows.toDF("id", "v"))
          model ++= rows
        case 2 =>
          // random keys, some absent; never empty the table (an empty
          // snapshot is a separate edge covered by MergeTableSpec)
          val ks = (1 to rnd.nextInt(4) + 1).map(_ => rnd.nextInt(25).toLong)
            .distinct.filterNot(_ == model.keys.min)
          t.delete(ks.map(Tuple1(_)).toDF("id"))
          model --= ks
        case 3 =>
          val fresh = (1 to rnd.nextInt(3) + 1)
            .map(i => (1000L + step * 10 + i, rnd.nextInt(1000).toLong))
          t.append(fresh.toDF("id", "v"))
          model ++= fresh
        case 4 =>
          t.compact()
        case 5 =>
          val vs = snapshots.keys.toSeq.sorted
          val v = vs(rnd.nextInt(vs.size))
          t.restore(v)
          model = snapshots(v)
      }
      record()
      if (step % 5 == 0) check()
    }
    check()
    // time travel must replay every sampled recorded state exactly
    rnd.shuffle(snapshots.toSeq).take(4).foreach { case (v, m) =>
      assert(t.readVersion(v).as[(Long, Long)].collect().toMap === m,
        s"$name: time travel to version $v diverged")
    }
  }

  test("COW table equals the model under random ops") {
    run("cow", MergeTable.CopyOnWrite, None, 11L)
  }
  test("MOR table equals the model under random ops") {
    run("mor", MergeTable.MergeOnRead, None, 22L)
  }
  test("bucketed COW table equals the model under random ops") {
    run("cow_b", MergeTable.CopyOnWrite, Some(4), 33L)
  }
  test("bucketed MOR table equals the model under random ops") {
    run("mor_b", MergeTable.MergeOnRead, Some(4), 44L)
  }
  test("deletion-vector table equals the model under random ops") {
    // append stays duplicate-free here (the model only appends fresh
    // keys), matching dv append's plain-INSERT semantics (same as COW)
    run("dv", MergeTable.DeletionVectors, None, 55L)
  }
  test("bucketed deletion-vector table equals the model under random ops") {
    run("dv_b", MergeTable.DeletionVectors, Some(4), 66L)
  }
}
