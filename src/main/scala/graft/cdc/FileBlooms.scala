package graft.cdc

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file bloom-filter index over the table's key tuple — the role
  * of Iceberg/Delta parquet bloom indexes: a PRIMARY-KEY point lookup
  * consults the blooms and opens only the files that might hold the
  * key, where min/max ranges prune nothing because every file spans
  * most of an unclustered key domain (the difference between 1 file
  * and all of them for `WHERE id = ?` on 100 TB).
  *
  * Index key: `xxhash64(concat_ws('', keyCols cast string))`,
  * computed by the ENGINE on the write side (one distributed
  * aggregation per commit, Spark's own `BloomFilterAggregate` — the
  * runtime-filter machinery) and matched at read time with the same
  * Catalyst expressions, so the two sides can never drift. Only
  * integral/string key columns are indexed — their string rendering
  * is total and stable; other types silently skip the index
  * (advisory semantics: no bloom → file kept).
  *
  * The index itself is DISTRIBUTED end to end (the r3 design held
  * every bloom on the driver — a million-file snapshot at up to 1 MiB
  * per bloom would OOM it): the write side streams
  * `(_dir, _f, _bloom)` rows straight from the grouped aggregation
  * into a sharded parquet dataset under `blooms/<dir>/` (Iceberg's
  * puffin/manifest-shard shape), and the read side never
  * deserializes a bloom on the driver at all — membership is probed
  * executor-side with [[BloomFilterMightContain]] (the runtime-filter
  * predicate) and only the SURVIVING FILE NAMES come back, a set
  * bounded by the point lookup's selectivity.
  */
object FileBlooms {

  private val Sep = ""
  // size every bloom for the largest file in the batch, bounded: at
  // ~1% fpp a cap of 2^23 bits (1 MiB) covers ~875k rows per file
  private val MaxBits = 1L << 23
  private val BitsPerItem = 10L
  // bloom rows per parquet shard of the index; a million-file commit
  // becomes ~4k shards of ~256 MiB instead of one driver-held blob
  private val FilesPerShard = 256L

  private[graft] def indexable(schema: StructType, keys: Seq[String]): Boolean =
    keys.nonEmpty && keys.forall(k => schema.fields.find(_.name == k).exists(f =>
      f.dataType match {
        case ByteType | ShortType | IntegerType | LongType | StringType => true
        case _ => false
      }))

  /** Build and persist the bloom index for every parquet file under
    * `dataDir/dir`, entirely on executors: per-file count to size the
    * filters, one grouped bloom aggregation, parquet write of
    * `(_dir, _f, _bloom)` shards to `root/blooms/<dir>/`. The
    * `_SUCCESS` marker doubles as the COVERAGE marker: its presence
    * means every file of the commit dir has a bloom row, so a read
    * may treat "not returned by the probe" as "definitely absent".
    */
  def buildIndex(spark: SparkSession, root: Path, dataDir: Path, dir: String,
      keys: Seq[String]): Unit = {
    val dataRoot = dataDir.resolve(dir)
    val df = spark.read.parquet(dataRoot.toString)
    if (!indexable(df.schema, keys)) return
    val keyStr = concat_ws(Sep, keys.map(c => col(c).cast("string")): _*)
    val base = df.select(col("_metadata.file_path").as("_path"),
      xxhash64(keyStr).as("_h"))
    val sized = base.groupBy("_path").count()
      .agg(max("count"), count(lit(1))).head()
    if (sized.isNullAt(0)) return // no rows, nothing to index
    val (maxRows, numFiles) = (sized.getLong(0), sized.getLong(1))
    val bits = math.min(MaxBits, math.max(64L, maxRows * BitsPerItem))
    val agg = GraftSqlBridge.column(
      new BloomFilterAggregate(GraftSqlBridge.expression(col("_h")),
        Literal(maxRows), Literal(bits)).toAggregateExpression())
    val shards = math.max(1L, (numFiles + FilesPerShard - 1) / FilesPerShard).toInt
    base.groupBy("_path").agg(agg.as("_bloom"))
      // file_path is absolute; the dir-relative name is what survives
      // compaction-independent addressing (computed executor-side)
      .select(lit(dir).as("_dir"),
        substring_index(col("_path"), s"/$dir/", -1).as("_f"),
        col("_bloom"))
      .repartition(shards)
      .write.mode("overwrite").parquet(indexPath(root, dir).toString)
  }

  /** Whether `dir`'s bloom index exists AND covers the whole commit
    * (the parquet `_SUCCESS` marker of a completed [[buildIndex]]).
    */
  def covered(root: Path, dir: String): Boolean =
    Files.exists(indexPath(root, dir).resolve("_SUCCESS"))

  /** Names of the files under the given (covered) dirs whose blooms
    * might contain ANY of `hashes`, as `(dir, relativeName)` pairs.
    * The probe is a distributed scan-and-filter of the index shards —
    * bloom bytes never reach the driver, only the surviving names do
    * (bounded by the lookup's selectivity plus the ~1% fpp).
    */
  def mightContain(spark: SparkSession, root: Path, dirs: Seq[String],
      hashes: Seq[Long]): Seq[(String, String)] = {
    if (dirs.isEmpty || hashes.isEmpty) return Seq.empty
    val idx = spark.read.parquet(dirs.map(d => indexPath(root, d).toString): _*)
    // `might_contain` demands a CONSTANT bloom (it serves runtime
    // filters), so the per-row probe deserializes each file's bloom
    // executor-side — one deserialization per FILE, not per data row,
    // and only the surviving (dir, name) pairs travel to the driver
    val hs = hashes.toArray
    import idx.sparkSession.implicits._
    idx.select("_dir", "_f", "_bloom").as[(String, String, Array[Byte])]
      .mapPartitions(_.collect { case (d, f, bytes)
        if mightContainAny(bytes, hs) => (d, f) })
      .collect().toSeq
  }

  private def mightContainAny(bloomBytes: Array[Byte], hashes: Array[Long]): Boolean = {
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))
    hashes.exists(bf.mightContainLong)
  }

  /** The read-side twin of the write-side hash: the same Catalyst
    * cast/concat/xxhash64 evaluated on literal key values.
    */
  def hashOf(values: Seq[(Any, DataType)]): Long = {
    val rendered = values.map { case (v, dt) =>
      dt match {
        case StringType => String.valueOf(v)
        case _ => Literal.create(v, dt).eval() match {
          case null => ""
          case x => x.toString
        }
      }
    }.mkString(Sep)
    new XxHash64(Seq(Literal(UTF8String.fromString(rendered), StringType)))
      .eval(null).asInstanceOf[Long]
  }

  private def indexPath(root: Path, dir: String): Path =
    root.resolve("blooms").resolve(flatName(dir))

  private[graft] def flatName(dir: String): String =
    dir.replace('/', '_').replace('=', '_')
}
