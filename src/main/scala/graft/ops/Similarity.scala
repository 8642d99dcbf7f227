package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Scale design: the query set is always the broadcast side; the
  * corpus never shuffles for scoring. Brute force is the correctness
  * baseline (exact, one corpus scan per query batch); LSH and IVF are
  * the 100 TB paths — they bound the candidate set per query so the
  * per-query work is a small fraction of the corpus.
  */
object Similarity {

  /** Codegen'd cosine similarity (see [[graft.functions.CosineSimilarity]]). */
  def cosine(spark: SparkSession, a: Column, b: Column): Column = {
    GraftFunctions.register(spark)
    call_function("graft_cosine", a, b)
  }

  /** Exact top-k cosine neighbors of each query vector over the whole
    * corpus. Queries are broadcast; scores are ranked on the rounded
    * value with an id tie-break so results are engine-deterministic.
    */
  def bruteForceTopK(spark: SparkSession, queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.join(broadcast(queries), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(spark, col("qe"), col("embedding")), 6).as("score"))
    // custom bounded-heap top-k operator: no per-group sort (see graft.plans.TopK)
    graft.plans.TopK.perKey(scored, Seq("query_id"),
        Seq(col("score"), -col("neighbor_id")), k)
      .select("query_id", "neighbor_id", "rank", "score")
  }

  // ---- random-hyperplane LSH --------------------------------------------

  val NumPlanes = 8

  /** Deterministic pseudo-random hyperplanes (seeded LCG), dim x planes. */
  private[graft] def planes(dim: Int): Array[Array[Double]] = {
    var state = 20240812L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    Array.fill(NumPlanes)(Array.fill(dim)(next()))
  }

  /** Bit-signature of an embedding under the fixed hyperplanes: bit p
    * = sign(v · plane_p). One long-typed bucket key per row, computed
    * by the codegen'd [[graft.functions.HyperplaneSignature]] — a
    * single fused loop. (The previous interpreted `zip_with` +
    * `aggregate` formulation ran 8 higher-order traversals per row —
    * the per-row hot loop of the 100 TB ANN path.)
    */
  def lshSignature(spark: SparkSession, emb: Column, dim: Int): Column = {
    GraftFunctions.register(spark)
    call_function("graft_hyperplane_sig", emb, lit(dim))
  }

  /** Approximate top-k via LSH bucketing with hamming-1 multiprobe:
    * candidates are corpus rows whose signature matches any of the
    * query's probe signatures (its own bucket plus each one-bit
    * flip). At scale this turns an O(|corpus|) scan per query into
    * NumPlanes+1 bucket lookups; recall is measured against brute
    * force in ScalaTest.
    */
  def lshTopK(spark: SparkSession, queries: DataFrame, corpus: DataFrame, k: Int, dim: Int): DataFrame = {
    // compute the signature once per query row, then derive the probe
    // set by XOR-ing bit masks — not one signature evaluation per probe
    val masks = (lit(0L) +: (0 until NumPlanes).map(p => lit(1L << p)))
    val qSig = queries
      .withColumn("_sig0", lshSignature(spark, col("qe"), dim))
      .withColumn("sig", explode(array(masks.map(m => col("_sig0").bitwiseXOR(m)): _*)))
      .drop("_sig0")
    val cSig = corpus.withColumn("sig", lshSignature(spark, col("embedding"), dim))
    val scored = cSig.join(broadcast(qSig), Seq("sig"))
      .dropDuplicates("query_id", "vec_id")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(spark, col("qe"), col("embedding")), 6).as("score"))
    // bounded-heap top-k per query (no per-group full sort)
    graft.plans.TopK.perKey(scored, Seq("query_id"),
        Seq(col("score"), -col("neighbor_id")), k)
      .select("query_id", "neighbor_id", "rank", "score")
  }

  // ---- IVF (inverted-file) ----------------------------------------------

  /** Lloyd's k-means codebook over the corpus: deterministic seed
    * (lowest vec_ids), `iters` rounds of assign + element-wise mean.
    * Each round is one distributed aggregation; only the
    * nCells × dim means ever reach the driver (bounded, ~1k values).
    * Centroids are rounded so the distributed float-summation order
    * cannot leak into assignments. At 100 TB the trainer runs on a
    * sample with the identical computation.
    */
  def kmeansCentroids(spark: SparkSession, corpus: DataFrame, embCol: String,
                      nCells: Int, iters: Int = 2): Seq[(Int, Seq[Float])] = {
    var cents: Seq[(Int, Seq[Float])] = corpus.orderBy("vec_id").limit(nCells)
      .select(col(embCol)).collect()
      .zipWithIndex.map { case (r, i) => i -> r.getSeq[Float](0) }.toSeq
    for (_ <- 1 to iters) {
      def cellScores(v: Column): Column = array(cents.map { case (i, c) =>
        struct(round(cosine(spark, v, typedLit(c)), 6).as("s"), lit(i).as("cell"))
      }: _*)
      val means = corpus
        .withColumn("cell", array_max(cellScores(col(embCol))).getField("cell"))
        .select(col("cell"), posexplode(col(embCol)).as(Seq("pos", "v")))
        .groupBy("cell", "pos").agg(avg("v").as("m"))
        .collect() // bounded: nCells × dim rows
        .groupBy(_.getInt(0))
      cents = cents.map { case (i, old) =>
        i -> means.get(i).map(_.sortBy(_.getInt(1))
            .map(r => math.rint(r.getDouble(2) * 10000).toFloat / 10000f).toSeq)
          .getOrElse(old) // an emptied cell keeps its previous centroid
      }
    }
    cents
  }

  /** IVF-style ANN: k-means codebook (trained inline, deterministic),
    * corpus partitioned by nearest centroid, queries probing the
    * `nProbe` nearest cells.
    */
  def ivfTopK(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
              k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = kmeansCentroids(spark, corpus, "embedding", nCells)

    def cellScores(v: Column): Column = array(cents.map { case (i, c) =>
      struct(round(cosine(spark, v, typedLit(c)), 6).as("s"), lit(i).as("cell"))
    }: _*)

    val assigned = corpus.withColumn("cell", array_max(cellScores(col("embedding"))).getField("cell"))
    val probes = queries.withColumn("probe_cells",
        slice(reverse(array_sort(cellScores(col("qe")))), 1, nProbe))
      .withColumn("cell", explode(transform(col("probe_cells"), p => p.getField("cell"))))
      .drop("probe_cells")
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(spark, col("qe"), col("embedding")), 6).as("score"))
    // bounded-heap top-k per query (no per-group full sort)
    graft.plans.TopK.perKey(scored, Seq("query_id"),
        Seq(col("score"), -col("neighbor_id")), k)
      .select("query_id", "neighbor_id", "rank", "score")
  }

  /** k-NN join inside equality blocks (here: label) — each left row
    * gets its k nearest right rows sharing the blocking key. The join
    * is a plain shuffled equi-join on the block key; no all-pairs work
    * crosses blocks.
    */
  def knnJoinWithinBlocks(spark: SparkSession, left: DataFrame, right: DataFrame,
                          blockCol: String, k: Int): DataFrame = {
    val scored = right.join(broadcast(left), Seq(blockCol))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(spark, col("qe"), col("embedding")), 6).as("score"))
    graft.plans.TopK.perKey(scored, Seq("query_id"),
        Seq(col("score"), -col("neighbor_id")), k)
      .select("query_id", "neighbor_id", "rank", "score")
  }

  /** Near-duplicate pairs: LSH candidate generation (hyperplane
    * signatures, hamming ≤ 1 via multiprobe) + EXACT cosine scoring.
    *
    * Candidates are pairs whose signatures differ in at most one bit
    * — the a-side probes its own bucket plus each one-bit flip, so
    * each qualifying pair is produced by exactly one probe and no
    * all-pairs join exists anywhere in the plan. Work is linear in
    * corpus size plus the intra-bucket pair blowup (buckets are
    * corpus/2^NumPlanes on neutral data), which is the shape that
    * survives 100 TB; the previous label-blocked all-pairs was
    * O(n²/blocks).
    */
  def nearDupPairs(spark: SparkSession, vectors: DataFrame, dim: Int,
                   threshold: Double): DataFrame = {
    // signature subtree feeds both sides of the self-join
    val sigd = graft.Caches.register(vectors
      .select(col("vec_id"), col("embedding"),
        lshSignature(spark, col("embedding"), dim).as("sig")))
    val masks = (lit(0L) +: (0 until NumPlanes).map(p => lit(1L << p)))
    val a = sigd.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
      explode(array(masks.map(m => col("sig").bitwiseXOR(m)): _*)).as("probe"))
    val b = sigd.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      col("sig").as("probe"))
    a.join(b, Seq("probe"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("score", round(cosine(spark, col("ea"), col("eb")), 6))
      .filter(col("score") >= threshold)
      .select("vec_a", "vec_b", "score")
  }
}
