package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for training-data pipelines: exact,
  * fingerprint, MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: exact/fingerprint dedup group on a hash of the
  * content, never shuffling full text as the key. Near-dup candidate
  * generation is LSH-banded — work is linear in corpus size plus the
  * (small) intra-bucket pair blowup, never all-pairs. All-pairs
  * verification only ever runs on LSH candidates or inside explicit
  * blocking keys.
  */
object Dedup {

  // ---- exact / fingerprint ----------------------------------------------

  /** Exact-dup groups keyed by full content; returns one row per
    * distinct text with the surviving (min) doc id and group size.
    * At 100 TB, group by `fingerprint128` instead of raw text — same
    * plan shape with a 16-byte shuffle key.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .drop(textCol)

  def fingerprintGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keep_id"))

  // ---- shingling ---------------------------------------------------------

  /** Distinct word k-shingles as strings (lowercased alpha words). */
  def wordShingles(text: Column, k: Int): Column = {
    val ws = TextAnalysis.words(text)
    when(size(ws) >= k,
      array_distinct(transform(sequence(lit(1), size(ws) - (k - 1)), i =>
        concat_ws(" ", (0 until k).map(j => element_at(ws, i + j)): _*))))
      .otherwise(array(concat_ws(" ", ws)))
  }

  // ---- MinHash + banded LSH ---------------------------------------------

  /** 64 universal-hash permutations over Mersenne prime 2^31-1.
    * Constants are fixed (seeded LCG) so signatures are reproducible
    * across runs and engines.
    */
  val NumPerms = 64
  val LshBands = 16 // 16 bands x 4 rows
  private val MersennePrime = 2147483647L // 2^31 - 1
  private[ops] val (permA, permB): (Array[Long], Array[Long]) = {
    var state = 42L
    def next(): Long = { state = (state * 6364136223846793005L + 1442695040888963407L); (state >>> 33) % (MersennePrime - 1) + 1 }
    (Array.fill(NumPerms)(next()), Array.fill(NumPerms)(next()))
  }

  /** MinHash signature (array of 64 ints) from a shingle-string array.
    * Shingles are first hashed to 31-bit ints (xxhash64 masked), then
    * each permutation takes the min of (a*s + b) mod p — all inside
    * long range.
    */
  def minhashSignature(shingles: Column): Column = {
    val aLit = array(permA.map(lit): _*)
    val bLit = array(permB.map(lit): _*)
    val hashed = transform(shingles, s => pmod(xxhash64(s), lit(MersennePrime)))
    transform(sequence(lit(0), lit(NumPerms - 1)), i =>
      array_min(transform(hashed, s =>
        pmod(element_at(aLit, i + 1) * s + element_at(bLit, i + 1), lit(MersennePrime)))))
  }

  /** Banded LSH bucket keys: one 64-bit key per band (hash of the
    * band's signature slice). Docs sharing ANY band key become
    * candidate pairs.
    */
  def lshBandKeys(signature: Column): Column = {
    val rows = NumPerms / LshBands
    transform(sequence(lit(0), lit(LshBands - 1)), b =>
      xxhash64(b, concat_ws(",", slice(signature, b * rows + 1, lit(rows)))))
  }

  /** Candidate near-dup pairs via banded LSH, scored by signature
    * agreement (estimated Jaccard), thresholded.
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sigs = docs
      .select(col(idCol).as("doc_id"),
        minhashSignature(wordShingles(col(textCol), shingleK)).as("sig"))
    val buckets = sigs
      .select(col("doc_id"), col("sig"), posexplode(lshBandKeys(col("sig"))).as(Seq("band", "key")))
    val pairs = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
    pairs
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / NumPerms)
      .filter(col("est_jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  // ---- SimHash -----------------------------------------------------------

  /** 64-bit SimHash over word unigrams (occurrence-weighted): bit i of
    * the output is the sign of the sum of ±1 contributions from each
    * word's hash bit i. Computed as 64 conditional-sum aggregations —
    * wide but fully codegen'd, one shuffle on the doc id.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.words(col(textCol))).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    val bitSums = (0 until 64).map { i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1)).as(s"b$i")
    }
    val agg = exploded.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val hashExpr = (0 until 64).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc_id"), hashExpr.as("simhash"))
  }

  // ---- n-gram Jaccard verification --------------------------------------

  /** Exact word-k-gram Jaccard for a candidate pair set (columns
    * doc_a, doc_b) against the docs table. Distinct-shingle semantics
    * on both sides; inter/union derived from sizes so engines agree.
    */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("_id"), wordShingles(col(textCol), k).as("_sh"))
    pairs
      .join(sh.withColumnRenamed("_id", "doc_a").withColumnRenamed("_sh", "sh_a"), "doc_a")
      .join(sh.withColumnRenamed("_id", "doc_b").withColumnRenamed("_sh", "sh_b"), "doc_b")
      .withColumn("union_n", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("inter_n", size(col("sh_a")) + size(col("sh_b")) - col("union_n"))
      .withColumn("jaccard", col("inter_n").cast("double") / col("union_n"))
      .drop("sh_a", "sh_b")
  }
}
