package graft.cdc

import graft.SparkSpec
import graft.sources.MergeTableRelation
import org.apache.spark.sql.sources.EqualTo

/** Composed (value-partitioned × hash-bucketed) layout: rows live in
  * `_graft_p_<col>=<v>/_graft_bucket=<i>` cells ("pb" manifest
  * entries), the scoped merge rewrites only touched cells (the holder
  * scan first cut by the key hash to the batch's buckets), reads
  * prune on BOTH dimensions, MOR compaction folds only dirty cells,
  * and OPTIMIZE bin-packs per cell.
  */
class ComposedLayoutSpec extends SparkSpec {
  import spark.implicits._

  private val N = 4 // buckets

  private def fresh(name: String): String = {
    val root = s"target/test_tmp/pb_$name"
    MergeTable.drop(root)
    root
  }

  private def lastManifest(root: String): Seq[String] =
    latestManifestLines(root)

  // ids 1..8 spread over several buckets; two partition values
  private val seedRows = (1L to 8L).map(i =>
    (i, if (i <= 4) "red" else "blue", i * 10L))

  private def seeded(name: String, mode: String = MergeTable.CopyOnWrite)
      : (String, MergeTable) = {
    val root = fresh(name)
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(seedRows.toDF("id", "grp", "v")),
      mode = mode, numBuckets = Some(N), partitionCols = Seq("grp"))
    (root, t)
  }

  test("seed writes one pb entry per (partition × bucket) cell") {
    val (root, t) = seeded("seed")
    val m = lastManifest(root)
    assert(m.forall(_.startsWith("pb:")), m.mkString("|"))
    // every entry carries BOTH a partition segment and a bucket segment
    assert(m.forall(e => e.contains("_graft_p_grp=") && e.contains("_graft_bucket=")),
      m.mkString("|"))
    assert(t.read().as[(Long, String, Long)].collect().sorted === seedRows.sorted)
  }

  test("upsert rewrites only the touched cells") {
    val (root, t) = seeded("scoped")
    val before = lastManifest(root)
    t.upsert(Seq((2L, "red", 25L)).toDF("id", "grp", "v"))
    val after = lastManifest(root)
    def cellOf(entry: String): String = entry.split("/", 2)(1)
    val touched = after.filterNot(before.contains).map(cellOf).toSet
    // exactly the (red, bucket(2)) cell was rewritten: one new entry,
    // in partition red, all other entries carried over verbatim
    assert(touched.size === 1, after.mkString("|"))
    assert(touched.head.contains("_graft_p_grp=red"), touched)
    val carried = before.filter(after.contains)
    assert(carried.size === before.size - 1,
      s"more than one cell rewritten:\n${before.mkString("|")}\n${after.mkString("|")}")
    assert(t.read().as[(Long, String, Long)].collect().sorted ===
      seedRows.map { case (i, g, v) => if (i == 2L) (i, g, 25L) else (i, g, v) }.sorted)
  }

  test("a key changing partition value leaves its old cell") {
    val (_, t) = seeded("move")
    t.upsert(Seq((3L, "blue", 35L)).toDF("id", "grp", "v")) // red -> blue
    val got = t.read().as[(Long, String, Long)].collect().sorted
    assert(got === seedRows.map {
      case (3L, _, _) => (3L, "blue", 35L)
      case r => r
    }.sorted)
    // the old home really is gone: a second upsert back converges too
    t.upsert(Seq((3L, "red", 36L)).toDF("id", "grp", "v"))
    assert(t.read().filter($"id" === 3L).as[(Long, String, Long)].collect()
      .toSeq === Seq((3L, "red", 36L)))
  }

  test("delete rewrites only the holding cells; absent keys no-op") {
    val (root, t) = seeded("delete")
    val before = lastManifest(root)
    t.delete(Seq(3L, 99L).toDF("id"))
    val after = lastManifest(root)
    assert(after.filterNot(before.contains).size <= 1, after.mkString("|"))
    assert(t.read().as[(Long, String, Long)].collect().sorted ===
      seedRows.filterNot(_._1 == 3L).sorted)
    // a delete matching nothing commits nothing
    val v = lastManifest(root)
    t.delete(Seq(999L).toDF("id"))
    assert(lastManifest(root) === v)
  }

  test("reads prune on BOTH dimensions: partition dirs and key buckets") {
    val (root, _) = seeded("prune")
    val rel = new MergeTableRelation(spark.sqlContext, root, Seq("id"),
      MergeTable.CopyOnWrite, Some(N), partitionCols = Seq("grp"))
    val all = rel.candidateFiles(Array.empty).get
    // partition filter: only red-dir files survive
    val red = rel.candidateFiles(Array(EqualTo("grp", "red"))).get
    assert(red.nonEmpty && red.forall(_.contains("_graft_p_grp=red")), red)
    assert(red.size < all.size)
    // full-key point lookup: only ONE bucket's files survive (across
    // however many partitions), before any stats are consulted
    val point = rel.candidateFiles(Array(EqualTo("id", 2L))).get
    val buckets = point.flatMap(
      "_graft_bucket=(\\d+)".r.findFirstMatchIn(_)).map(_.group(1)).toSet
    assert(buckets.size === 1, point)
    // composed: point lookup + partition filter prunes to ≤1 file
    val cell = rel.candidateFiles(
      Array(EqualTo("id", 2L), EqualTo("grp", "red"))).get
    assert(cell.forall(f => f.contains("_graft_p_grp=red") &&
      f.contains(s"_graft_bucket=${buckets.head}")), cell)
    assert(cell.size <= point.size && cell.size <= red.size)
  }

  test("MOR: flat deltas, compaction folds only the dirty cells") {
    val (root, t) = seeded("mor", mode = MergeTable.MergeOnRead)
    val base = lastManifest(root)
    assert(base.forall(_.startsWith("pb:")))
    t.upsert(Seq((2L, "red", 25L), (9L, "blue", 90L)).toDF("id", "grp", "v"))
    val withDelta = lastManifest(root)
    assert(withDelta.exists(_.startsWith("delta:")), withDelta.mkString("|"))
    // reconciled read BEFORE compaction
    val want = (seedRows.map { case (i, g, v) =>
      if (i == 2L) (i, g, 25L) else (i, g, v) } :+ (9L, "blue", 90L)).sorted
    assert(t.read().as[(Long, String, Long)].collect().sorted === want)
    t.compact()
    val after = lastManifest(root)
    assert(!after.exists(_.startsWith("delta:")), after.mkString("|"))
    assert(after.forall(_.startsWith("pb:")))
    // untouched cells carried verbatim through the compaction
    val carried = base.filter(after.contains)
    assert(carried.nonEmpty, s"every cell rewritten:\n${base.mkString("|")}\n${after.mkString("|")}")
    assert(t.read().as[(Long, String, Long)].collect().sorted === want)
    // MOR delete via tombstone delta then compaction
    t.delete(Seq(9L).toDF("id"))
    t.compact()
    assert(t.read().as[(Long, String, Long)].collect().sorted ===
      want.filterNot(_._1 == 9L))
  }

  test("summaries: partitions fold their bucket cells; buckets fold across partitions") {
    val (_, t) = seeded("summary")
    val parts = t.partitionSummary()
    assert(parts.map(_._1).toSet === Set("grp=red", "grp=blue"))
    // exact footer-stat row counts: 4 rows per partition value
    assert(parts.forall(_._3.contains(4L)), parts.toString)
    val buckets = t.bucketSummary()
    assert(buckets.forall(_._1.startsWith("bucket=")), buckets.toString)
    assert(buckets.flatMap(_._3).sum === 8L, buckets.toString)
  }

  test("OPTIMIZE bin-packs per cell, leaving siblings verbatim") {
    val root = fresh("optimize")
    val t = new MergeTable(spark, root, Seq("id"), numBuckets = Some(N),
      partitionCols = Seq("grp"))
    // fragment ONE cell with repeated single-row upserts of new keys
    // that hash into it; the composed COW merge rewrites the cell as
    // one dir each time, so fragmentation comes from tiny FILES in
    // one dir after a multi-row rewrite with forced parallelism
    t.upsert(seedRows.toDF("id", "grp", "v").repartition(8))
    val before = lastManifest(root)
    val nBefore = before.size
    val filesBefore = t.partitionSummary().map(_._2).sum
    t.optimizeFiles(targetBytes = 128L * 1024 * 1024)
    val filesAfter = t.partitionSummary().map(_._2).sum
    assert(filesAfter <= filesBefore)
    // one file per surviving cell at this size
    assert(filesAfter === lastManifest(root).size.toLong)
    assert(t.read().as[(Long, String, Long)].collect().sorted === seedRows.sorted)
    assert(nBefore > 0)
  }

  test("composed refuses deletion-vector mode and non-composed layouts fail fast") {
    val err = intercept[IllegalArgumentException] {
      new MergeTable(spark, fresh("dv_refuse"), Seq("id"),
        mode = MergeTable.DeletionVectors, numBuckets = Some(N),
        partitionCols = Seq("grp"))
    }
    assert(err.getMessage.contains("copy-on-write or merge-on-read"))
    // opening a plain bucketed table as composed errors before writing
    val root = fresh("mislayout")
    MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(seedRows.toDF("id", "grp", "v")), numBuckets = Some(N))
    val wrong = new MergeTable(spark, root, Seq("id"), numBuckets = Some(N),
      partitionCols = Seq("grp"))
    val e2 = intercept[IllegalArgumentException] {
      wrong.upsert(Seq((1L, "red", 1L)).toDF("id", "grp", "v"))
    }
    assert(e2.getMessage.contains("non-composed"), e2.getMessage)
  }

  test("change feed sees composed commits as I/U/D") {
    val (_, t) = seeded("feed")
    t.upsert(Seq((2L, "red", 25L), (9L, "blue", 90L)).toDF("id", "grp", "v"))
    t.delete(Seq(1L).toDF("id"))
    val changes = t.changesBetween(1L, 3L)
      .select("id", "_change").as[(Long, String)].collect().toMap
    assert(changes === Map(2L -> "U", 9L -> "I", 1L -> "D"))
  }
}
