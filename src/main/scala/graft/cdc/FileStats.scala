package graft.cdc

import java.nio.file.{Files, Path, Paths}
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import scala.jdk.CollectionConverters._

/** Per-file column min/max statistics for MergeTable data — the role
  * Iceberg's manifest-level stats play: a selective read consults the
  * stats index and opens only the files whose range can match, so scan
  * cost follows the PREDICATE's selectivity instead of the table size
  * (the difference between touching 3 files and 30,000 at 100 TB).
  *
  * Stats are read once from parquet footers at commit time (the
  * writer just produced the files; footers are O(files), not O(rows))
  * and persisted as `stats/<dir>.json` beside the manifests. Readers
  * treat stats as advisory: a file without stats is always kept, so
  * pre-stats commits and exotic column types degrade to a full scan,
  * never to a wrong answer.
  */
object FileStats {

  /** (min, max, type-tag) per top-level column, per file (relative
    * path). Only types with a total order both engines agree on are
    * recorded: integral, floating, and UTF-8 string.
    */
  type Stats = Map[String, Map[String, (String, String, String)]]

  /** Everything the footer pass learns about one file: its exact row
    * count, the top-level primitive columns physically present (a
    * schema-evolved file may lack late-added columns — reads backfill
    * them as nulls, so "absent" aggregates as all-null), per-column
    * null counts (only columns where every chunk recorded one), and
    * the min/max ranges of [[Stats]]. Rows + nulls power
    * metadata-only COUNT pushdown; ranges power both pruning and
    * metadata-only MIN/MAX.
    */
  final case class FileMeta(
      rows: Long,
      present: Set[String],
      nulls: Map[String, Long],
      cols: Map[String, (String, String, String)])

  type Full = Map[String, FileMeta]

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Collect footer stats for every parquet file under `dataDir/dir`
    * (recursive — bucketed layouts nest `bucket=i/` subdirs).
    */
  def collect(dataDir: Path, dir: String): Full = {
    val root = dataDir.resolve(dir)
    val conf = new Configuration()
    listParquet(root).flatMap { f =>
      try {
        val reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.toUri), conf))
        try {
          val blocks = reader.getFooter.getBlocks.asScala
          val rows = blocks.map(_.getRowCount).sum
          val topChunks = blocks.flatMap(_.getColumns.asScala)
            .filter(_.getPath.size() == 1) // top-level columns only
            .groupBy(_.getPath.toDotString)
          // null counts are independent of min/max presence: an
          // all-null column has no range but an exact null count
          val nulls = topChunks.flatMap { case (name, chunks) =>
            val stats = chunks.map(_.getStatistics)
            if (stats.exists(s => s == null || !s.isNumNullsSet)) None
            else Some(name -> stats.map(_.getNumNulls).sum)
          }
          val perCol = topChunks
            .flatMap { case (name, chunks) =>
              val stats = chunks.map(_.getStatistics)
              if (stats.exists(s => s == null || !s.hasNonNullValue)) None
              else {
                val tag = typeTag(chunks.head.getPrimitiveType)
                tag.map { t =>
                  val typed = stats.map(s => (s.genericGetMin, s.genericGetMax))
                  val mins = typed.map(v => render(v._1)).toSeq
                  val maxs = typed.map(v => render(v._2)).toSeq
                  name -> ((reduceMin(mins, t), reduceMax(maxs, t), t))
                }
              }
            }
          Some(root.relativize(f).toString ->
            FileMeta(rows, topChunks.keySet.toSet, nulls, perCol))
        } finally reader.close()
      } catch { case _: Throwable => None } // advisory: skip unreadable footers
    }.toMap
  }

  private def listParquet(p: Path): Seq[Path] =
    if (!Files.isDirectory(p)) Nil
    else {
      val s = Files.walk(p)
      try s.iterator().asScala.filter(_.toString.endsWith(".parquet")).toList
      finally s.close()
    }

  /** Parquet files under a directory, recursive (shared with readers). */
  def listParquetFiles(p: Path): Seq[Path] = listParquet(p)

  /** Tag from the parquet schema, not the stat value: a BINARY column
    * is only "s" when annotated as a UTF-8 string — raw binary min/max
    * would round-trip lossily through a string render, so those
    * columns are left stats-less (kept on every read).
    */
  private def typeTag(prim: org.apache.parquet.schema.PrimitiveType): Option[String] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    prim.getPrimitiveTypeName match {
      case INT32 | INT64 => Some("i")
      case FLOAT | DOUBLE => Some("f")
      case BINARY
        if prim.getLogicalTypeAnnotation.isInstanceOf[
          org.apache.parquet.schema.LogicalTypeAnnotation.StringLogicalTypeAnnotation] => Some("s")
      case _ => None
    }
  }

  private def render(v: Any): String = v match {
    case b: Binary => b.toStringUsingUTF8
    case other => other.toString
  }

  /** Unsigned lexicographic UTF-8 byte order — the order parquet uses
    * for string min/max. Java's String.compareTo (UTF-16 code units)
    * disagrees above the BMP, which would make pruning drop matching
    * files.
    */
  private[graft] def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  private def reduceMin(vs: Seq[String], tag: String): String = tag match {
    case "i" => vs.map(_.toLong).min.toString
    case "f" => vs.map(_.toDouble).min.toString
    case _ => vs.reduce((a, b) => if (utf8Cmp(a, b) <= 0) a else b)
  }

  private def reduceMax(vs: Seq[String], tag: String): String = tag match {
    case "i" => vs.map(_.toLong).max.toString
    case "f" => vs.map(_.toDouble).max.toString
    case _ => vs.reduce((a, b) => if (utf8Cmp(a, b) >= 0) a else b)
  }

  // -- persistence ----------------------------------------------------------

  def write(root: Path, dir: String, stats: Full): Unit = {
    if (stats.isEmpty) return
    val node = mapper.createObjectNode()
    node.put("_v", 2) // format version; file keys never start with '_'
    stats.foreach { case (file, meta) =>
      val fn = node.putObject(file)
      fn.put("n", meta.rows)
      val pn = fn.putArray("p")
      meta.present.toSeq.sorted.foreach(pn.add)
      val zn = fn.putObject("z")
      meta.nulls.foreach { case (c, z) => zn.put(c, z) }
      val cn = fn.putObject("c")
      meta.cols.foreach { case (c, (mn, mx, t)) =>
        val col = cn.putObject(c)
        col.put("min", mn); col.put("max", mx); col.put("t", t)
      }
    }
    val statsDir = root.resolve("stats")
    Files.createDirectories(statsDir)
    // data dirs are uuid-named but may nest (bucketed "uuid/bucket=i")
    Files.write(statsDir.resolve(flatName(dir)), mapper.writeValueAsBytes(node))
  }

  /** Full per-file metadata (rows/present/nulls/ranges). STRICT: any
    * entry whose row count is missing or non-integral (a pre-upgrade
    * stats file, or an old-format file that happens to have a column
    * literally named "n") rejects the WHOLE set — metadata-only
    * aggregation must never fabricate a FileMeta (a fabricated
    * rows=0 would be served as count(*)=0). Pruning still works for
    * legacy files via [[read]]'s fallback parse.
    */
  def readFull(root: Path, dir: String): Option[Full] = {
    val p = root.resolve("stats").resolve(flatName(dir))
    if (!Files.exists(p)) None
    else try {
      val node = mapper.readTree(Files.readAllBytes(p))
      Some(node.fields().asScala.filterNot(_.getKey.startsWith("_")).map { e =>
        val fn = e.getValue
        val rn = fn.get("n")
        require(rn != null && rn.isIntegralNumber,
          s"stats entry ${e.getKey} has no integral row count (legacy format?)")
        val present = Option(fn.get("p")).map(_.elements().asScala.map(_.asText).toSet)
          .getOrElse(Set.empty[String])
        val nulls = Option(fn.get("z")).map(_.fields().asScala.map { z =>
          z.getKey -> z.getValue.asLong
        }.toMap).getOrElse(Map.empty[String, Long])
        val cols = Option(fn.get("c")).map(_.fields().asScala.map { c =>
          c.getKey -> ((c.getValue.get("min").asText,
            c.getValue.get("max").asText, c.getValue.get("t").asText))
        }.toMap).getOrElse(Map.empty[String, (String, String, String)])
        e.getKey -> FileMeta(rn.asLong, present, nulls, cols)
      }.toMap)
    } catch { case _: Throwable => None }
  }

  /** Min/max ranges only (pruning). Falls back to the pre-v2 layout
    * (`file -> {col -> {min,max,t}}`) so tables written before the
    * rows/nulls upgrade keep their pruning instead of silently
    * degrading to full scans.
    */
  def read(root: Path, dir: String): Option[Stats] =
    readFull(root, dir).map(_.map { case (f, m) => f -> m.cols })
      .orElse {
        val p = root.resolve("stats").resolve(flatName(dir))
        if (!Files.exists(p)) None
        else try {
          val node = mapper.readTree(Files.readAllBytes(p))
          Some(node.fields().asScala.filterNot(_.getKey.startsWith("_")).map { e =>
            e.getKey -> e.getValue.fields().asScala.map { c =>
              c.getKey -> ((c.getValue.get("min").asText,
                c.getValue.get("max").asText, c.getValue.get("t").asText))
            }.toMap
          }.toMap)
        } catch { case _: Throwable => None }
      }

  private def flatName(dir: String): String =
    dir.replace('/', '_').replace('=', '_') + ".json"

  // -- pruning --------------------------------------------------------------

  /** True iff a file with the given column ranges can contain a row
    * matching the filter. Unknown filters and columns without stats
    * keep the file (advisory semantics).
    */
  def mayMatch(cols: Map[String, (String, String, String)],
               filter: org.apache.spark.sql.sources.Filter): Boolean = {
    import org.apache.spark.sql.sources._
    def rng(a: String): Option[(String, String, String)] = cols.get(a)
    def cmp(v: Any, bound: String, tag: String): Int = tag match {
      case "i" | "f" => BigDecimal(v.toString).compare(BigDecimal(bound))
      case _ => v match {
        case s: String => utf8Cmp(s, bound)
        // non-string value against string stats (shouldn't occur now
        // that raw-binary columns are untagged) — throw; every caller
        // catches and keeps the file
        case other => sys.error(s"non-string value for string stats: ${other.getClass}")
      }
    }
    filter match {
      case EqualTo(a, v) => rng(a).forall { case (mn, mx, t) =>
        try cmp(v, mn, t) >= 0 && cmp(v, mx, t) <= 0 catch { case _: Throwable => true } }
      case GreaterThan(a, v) => rng(a).forall { case (_, mx, t) =>
        try cmp(v, mx, t) < 0 catch { case _: Throwable => true } }
      case GreaterThanOrEqual(a, v) => rng(a).forall { case (_, mx, t) =>
        try cmp(v, mx, t) <= 0 catch { case _: Throwable => true } }
      case LessThan(a, v) => rng(a).forall { case (mn, _, t) =>
        try cmp(v, mn, t) > 0 catch { case _: Throwable => true } }
      case LessThanOrEqual(a, v) => rng(a).forall { case (mn, _, t) =>
        try cmp(v, mn, t) >= 0 catch { case _: Throwable => true } }
      case In(a, vs) => rng(a).forall { case (mn, mx, t) =>
        try vs.exists(v => cmp(v, mn, t) >= 0 && cmp(v, mx, t) <= 0)
        catch { case _: Throwable => true } }
      // LIKE 'p%' pruning: a string with prefix p can live in
      // [min, max] iff p is between the two bounds TRUNCATED to p's
      // byte length — p > max[:|p|] means every value is too small,
      // p < min[:|p|] means every value is past the prefix range.
      // Only meaningful for string-tagged stats (parquet's UTF-8 byte
      // order, same order LIKE prefixes imply).
      case StringStartsWith(a, p) => rng(a).forall {
        case (mn, mx, "s") =>
          prefixCmp(p, mn) >= 0 && prefixCmp(p, mx) <= 0
        case _ => true
      }
      case And(l, r) => mayMatch(cols, l) && mayMatch(cols, r)
      case Or(l, r) => mayMatch(cols, l) || mayMatch(cols, r)
      case _ => true
    }
  }

  /** Compare prefix `p` against `bound` truncated to p's UTF-8 byte
    * length (unsigned byte order — the order parquet stats use). A
    * bound SHORTER than p compares as-is: if it is a strict prefix of
    * p it sorts below every p-prefixed string (return > 0), otherwise
    * the first differing byte decides.
    */
  private def prefixCmp(p: String, bound: String): Int = {
    val pb = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = bound.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(pb.length, bb.length)
    var i = 0
    while (i < n) {
      val c = (pb(i) & 0xff) - (bb(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    if (bb.length >= pb.length) 0 // bound carries the whole prefix range
    else pb.length - bb.length    // bound is a strict prefix of p
  }
}
