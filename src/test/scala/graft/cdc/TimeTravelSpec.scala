package graft.cdc

import graft.SparkSpec

class TimeTravelSpec extends SparkSpec {
  import spark.implicits._

  test("readVersion: every committed snapshot stays readable") {
    val root = "target/test_tmp/timetravel"
    MergeTable.drop(root)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b")).toDF("id", "v")))
    t.upsert(Seq((2L, "B"), (3L, "c")).toDF("id", "v"))
    t.delete(Seq(1L).toDF("id"))

    assert(t.versions() === Seq(1L, 2L, 3L))
    assert(t.readVersion(1).as[(Long, String)].collect().sorted ===
      Seq((1L, "a"), (2L, "b")))
    assert(t.readVersion(2).as[(Long, String)].collect().sorted ===
      Seq((1L, "a"), (2L, "B"), (3L, "c")))
    assert(t.readVersion(3).as[(Long, String)].collect().sorted ===
      Seq((2L, "B"), (3L, "c")))
  }

  test("changesBetween reports updates that set a column to NULL") {
    val root = "target/test_tmp/changefeed_null"
    MergeTable.drop(root)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, Option("alice"))).toDF("id", "v")))
    t.upsert(Seq((1L, Option.empty[String])).toDF("id", "v"))
    val changes = t.changesBetween(1, t.versions().max)
      .select("id", "v", "_change").as[(Long, Option[String], String)].collect()
    // the NULL-ing update must appear, with the NULL as the after-image
    assert(changes === Seq((1L, None, "U")), changes.mkString(", "))
  }

  test("expireSnapshots trims the travel horizon but not the current state") {
    val root = "target/test_tmp/expire"
    MergeTable.drop(root)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    t.upsert(Seq((2L, "b")).toDF("id", "v"))
    t.upsert(Seq((3L, "c")).toDF("id", "v"))
    t.upsert(Seq((4L, "d")).toDF("id", "v"))

    assert(t.expireSnapshots(keepLast = 2) === 2) // v1, v2 expired
    assert(t.versions() === Seq(3L, 4L))
    // current reads and surviving time travel are unaffected
    assert(t.read().count() === 4)
    assert(t.readVersion(3).count() === 3)
    // the expired version is gone, with the standard error
    val e = intercept[IllegalArgumentException](t.readVersion(1).count())
    assert(e.getMessage.contains("no version"))
    // version numbering keeps growing past the expired range
    t.upsert(Seq((5L, "e")).toDF("id", "v"))
    assert(t.versions() === Seq(3L, 4L, 5L))
    assert(t.expireSnapshots(keepLast = 10) === 0) // nothing to expire
  }

  test("changesBetween with updatePreImages emits U_pre/U_post row pairs") {
    val root = "target/test_tmp/changefeed_pre"
    MergeTable.drop(root)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b"), (4L, "same")).toDF("id", "v")))
    t.upsert(Seq((2L, "B"), (3L, "c"), (4L, "same")).toDF("id", "v"))
    t.delete(Seq(1L).toDF("id"))

    val changes = t.changesBetween(1, t.versions().max, updatePreImages = true)
      .select("id", "v", "_change").as[(Long, String, String)].collect()
      .sortBy(r => (r._1, r._3))
    assert(changes === Seq(
      (1L, "a", "D"),       // deleted, before-image
      (2L, "B", "U_post"),  // assertion: the NEW value
      (2L, "b", "U_pre"),   // retraction: the OLD value
      (3L, "c", "I")))      // inserted; key 4 unchanged -> absent
  }

  test("changesBetween emits I/U/D change feed with row images") {
    val root = "target/test_tmp/changefeed"
    MergeTable.drop(root)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b"), (4L, "same")).toDF("id", "v")))
    t.upsert(Seq((2L, "B"), (3L, "c"), (4L, "same")).toDF("id", "v"))
    t.delete(Seq(1L).toDF("id"))

    val changes = t.changesBetween(1, t.versions().max)
      .select("id", "v", "_change").as[(Long, String, String)].collect().sortBy(_._1)
    assert(changes === Seq(
      (1L, "a", "D"),   // deleted, before-image
      (2L, "B", "U"),   // updated, after-image
      (3L, "c", "I")))  // inserted; key 4 unchanged -> absent
  }
}
