package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat image/audio/video as opaque
  * `BINARY` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * The Spark-side machinery here — schema, batching shape,
  * partition-parallel feature extraction, feature-vector output — is
  * real and tested. The *decoder* is a clearly-marked deterministic
  * STUB (this container has no image/audio codecs): a production
  * pipeline swaps [[decodeStub]] for a real codec call without
  * touching anything else.
  */
object Multimodal {

  /** Attach a synthetic media payload to each document: the UTF-8
    * bytes of its text standing in for an encoded image, plus typed
    * metadata the way a real ingest would carry (width/height/format).
    */
  def synthesizeMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        col("n_chars").cast("int").as("width"),
        (col("doc_id") % 256).cast("int").as("height"),
        lit("fake/v1").as("format")).as("meta"))

  /** STUB decoder: a deterministic 8-dim feature vector from raw
    * bytes (length, moments, class histogram). Replace with a real
    * image/audio decoder at the marked line; the batching and schema
    * contract stay the same.
    */
  private[ops] def decodeStub(bytes: Array[Byte]): Array[Float] = {
    // <<< real codec goes here: e.g. JPEG decode + CNN embedding >>>
    if (bytes == null || bytes.isEmpty) return Array.fill(8)(0.0f)
    val n = bytes.length
    var sum = 0L; var sumSq = 0L
    var vowels = 0; var spaces = 0; var digits = 0
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      sum += b; sumSq += b.toLong * b
      b match {
        case 'a' | 'e' | 'i' | 'o' | 'u' => vowels += 1
        case ' ' => spaces += 1
        case d if d >= '0' && d <= '9' => digits += 1
        case _ =>
      }
      i += 1
    }
    val mean = sum.toDouble / n
    val variance = sumSq.toDouble / n - mean * mean
    Array(n.toFloat, mean.toFloat, variance.toFloat,
      vowels.toFloat / n, spaces.toFloat / n, digits.toFloat / n,
      (bytes.head & 0xff).toFloat, (bytes.last & 0xff).toFloat)
  }

  /** Frame-sampling plumbing for video-like payloads: the media blob
    * is cut into fixed-`stride` frames, every `every`-th frame is
    * kept (the "1 fps from N fps" shape), and each sampled frame gets
    * a deterministic checksum standing in for per-frame decode. All
    * of it is column expressions — the explode produces (doc, frame)
    * rows that downstream per-frame decoders consume in parallel, and
    * no frame payload ever routes through the driver. Like
    * [[decodeStub]], the checksum is the swap-point for a real codec;
    * payload bytes are ASCII here so the char sum IS the byte sum.
    */
  def sampleFrames(media: DataFrame, stride: Int, every: Int): DataFrame =
    media
      .withColumn("_s", decode(col("media"), "UTF-8"))
      .withColumn("_nf",
        greatest(ceil(length(col("_s")) / lit(stride.toDouble)).cast("int"), lit(1)))
      .select(col("doc_id"), col("_s"),
        explode(sequence(lit(0), col("_nf") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % every === 0)
      .withColumn("_fr", expr(s"substring(_s, frame_idx * $stride + 1, $stride)"))
      .select(col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        length(col("_fr")).cast("long").as("frame_len"),
        coalesce(
          expr("aggregate(transform(split(_fr, ''), c -> cast(ascii(c) as bigint)), 0L, (a, x) -> a + x)"),
          lit(0L)).as("frame_checksum"))

  /** Perceptual-hash STUB over the media payload — the dHash shape
    * (difference/gradient hash): the payload is cut into 63 equal
    * blocks and bit `j` records whether block `j`'s byte-sum exceeds
    * block `j+1`'s — 62 adjacent-gradient bits folded into a BIGINT
    * signature whose hamming distance is small for payloads differing
    * in a few bytes. Gradient bits (not mean-threshold aHash bits) on
    * purpose: against a statistically uniform corpus, mean-threshold
    * bits correlate across documents (block sums hug the global
    * mean), collapsing signature entropy and exploding the candidate
    * join — adjacent comparisons are a coin flip per bit, so
    * unrelated payloads sit at hamming ~31. A real pipeline swaps the
    * block byte-sum for decode→grayscale-resize at the marked line;
    * the banding/dedup machinery downstream is agnostic to where the
    * 62 bits come from. All column expressions — one O(bytes) pass
    * per payload, nothing through the driver. Payload bytes are ASCII
    * here so the char sum IS the byte sum (same contract as
    * [[sampleFrames]]).
    */
  def perceptualHash(media: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(media.sparkSession)
    // <<< real codec goes here: decode + grayscale resize to 8x9,
    //     then per-cell means instead of byte-sum blocks >>>
    media.select(col("doc_id"),
      call_function("graft_phash", col("media")).as("phash"))
  }

  /** The declarative twin of the `graft_phash` kernel — kept as the
    * executable specification (the DuckDB oracle mirrors THIS form;
    * `MultimodalSpec` proves kernel ≡ declarative). Three interpreted
    * lambda frames per character — do not put it on a hot path.
    */
  private[ops] def perceptualHashDeclarative(media: DataFrame): DataFrame =
    media
      .withColumn("_s", decode(col("media"), "UTF-8"))
      .withColumn("_bl",
        greatest(expr("CAST((length(_s) + 62) DIV 63 AS INT)"), lit(1)))
      .withColumn("_sums", expr(
        "transform(sequence(0, 62), j -> coalesce(aggregate(" +
          "transform(split(substring(_s, j * _bl + 1, _bl), ''), c -> CAST(ascii(c) AS BIGINT)), " +
          "0L, (a, x) -> a + x), 0L))"))
      .select(col("doc_id"), expr(
        "aggregate(sequence(0, 61), 0L, (acc, j) -> acc + " +
          "IF(element_at(_sums, j + 1) > element_at(_sums, j + 2), " +
          "shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))").as("phash"))

  /** Partition-parallel feature extraction over the media column.
    * `mapPartitions` keeps per-batch decoder state (real codecs are
    * expensive to construct) and processes rows streaming — the same
    * shape `mapInPandas` batches give a Python pipeline.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init would happen here
        rows.map { case (id, bytes) => (id, decodeStub(bytes)) }
      }
      .toDF("doc_id", "features")
  }
}
