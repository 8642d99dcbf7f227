package graft.cdc

import java.io.ByteArrayInputStream
import java.nio.file.{Files, Path}
import java.util.Base64

import org.apache.spark.sql.{GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Per-file bloom-filter index over the table's key tuple — the role
  * of Iceberg/Delta parquet bloom indexes: a PRIMARY-KEY point lookup
  * consults the blooms and opens only the files that might hold the
  * key, where min/max ranges prune nothing because every file spans
  * most of an unclustered key domain (the difference between 1 file
  * and all of them for `WHERE id = ?` on 100 TB).
  *
  * Index key: `xxhash64(concat_ws('', keyCols cast string))`,
  * computed by the ENGINE on the write side (one distributed
  * aggregation per commit, Spark's own `BloomFilterAggregate` — the
  * runtime-filter machinery) and replayed driver-side on literal
  * values at read time with the same Catalyst expressions, so the two
  * sides can never drift. Only integral/string key columns are
  * indexed — their string rendering is total and stable; other types
  * silently skip the index (advisory semantics: no bloom → file kept).
  */
object FileBlooms {

  private val Sep = ""
  // size every bloom for the largest file in the batch, bounded: at
  // ~1% fpp a cap of 2^23 bits (1 MiB) covers ~875k rows per file
  private val MaxBits = 1L << 23
  private val BitsPerItem = 10L

  private[graft] def indexable(schema: StructType, keys: Seq[String]): Boolean =
    keys.nonEmpty && keys.forall(k => schema.fields.find(_.name == k).exists(f =>
      f.dataType match {
        case ByteType | ShortType | IntegerType | LongType | StringType => true
        case _ => false
      }))

  /** Collect per-file blooms for every parquet file under
    * `dataDir/dir`. Two single-column passes: a per-file count to
    * size the filters, then one grouped bloom aggregation. Returns
    * file paths RELATIVE to the dir, like [[FileStats]].
    */
  def collect(spark: SparkSession, dataDir: Path, dir: String,
      keys: Seq[String]): Map[String, Array[Byte]] = {
    val root = dataDir.resolve(dir)
    val df = spark.read.parquet(root.toString)
    if (!indexable(df.schema, keys)) return Map.empty
    val keyStr = concat_ws(Sep, keys.map(c => col(c).cast("string")): _*)
    val base = df.select(col("_metadata.file_path").as("_f"),
      xxhash64(keyStr).as("_h"))
    val maxRowsRow = base.groupBy("_f").count().agg(max("count")).head()
    if (maxRowsRow.isNullAt(0)) return Map.empty // no rows, nothing to index
    val maxRows = maxRowsRow.getLong(0)
    val bits = math.min(MaxBits, math.max(64L, maxRows * BitsPerItem))
    val agg = GraftSqlBridge.column(
      new BloomFilterAggregate(GraftSqlBridge.expression(col("_h")),
        Literal(maxRows), Literal(bits)).toAggregateExpression())
    val rootUri = root.toUri.toString.stripSuffix("/")
    base.groupBy("_f").agg(agg.as("_bloom")).collect().map { r =>
      val abs = r.getString(0)
      val rel = abs.stripPrefix(rootUri).stripPrefix("file:")
        .dropWhile(_ == '/')
      // file_path is absolute; recover the dir-relative name by suffix
      val name = {
        val i = abs.indexOf(dir)
        if (i >= 0) abs.substring(i + dir.length + 1) else rel
      }
      name -> r.getAs[Array[Byte]](1)
    }.toMap
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

  // -- persistence (blooms/<dir>.json beside the manifests) -----------------

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def write(root: Path, dir: String, blooms: Map[String, Array[Byte]]): Unit = {
    if (blooms.isEmpty) return
    val node = mapper.createObjectNode()
    blooms.foreach { case (f, b) =>
      node.put(f, Base64.getEncoder.encodeToString(b))
    }
    val bloomDir = root.resolve("blooms")
    Files.createDirectories(bloomDir)
    Files.write(bloomDir.resolve(flatName(dir)), mapper.writeValueAsBytes(node))
  }

  def read(root: Path, dir: String): Map[String, BloomFilter] = {
    val p = root.resolve("blooms").resolve(flatName(dir))
    if (!Files.exists(p)) Map.empty
    else try {
      import scala.jdk.CollectionConverters._
      mapper.readTree(Files.readAllBytes(p)).fields().asScala.map { e =>
        e.getKey -> BloomFilter.readFrom(
          new ByteArrayInputStream(Base64.getDecoder.decode(e.getValue.asText)))
      }.toMap
    } catch { case _: Throwable => Map.empty } // advisory
  }

  private def flatName(dir: String): String =
    dir.replace('/', '_').replace('=', '_') + ".json"
}
