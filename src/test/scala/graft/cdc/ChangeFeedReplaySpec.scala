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
