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

  /** Project-then-rescore ANN: both sides drop to ProjDim dims via the
    * compiled JL kernel, candidates rank by PROJECTED cosine (¼ the
    * flops and bytes of a full scan at dim 64 — the point at 10^9
    * vectors, where the projected corpus fits in a quarter of the
    * memory), the top `r` per query join back to the full vectors for
    * exact rescoring. Deterministic end to end: projected scores
    * round to 6 dp with a vec_id tie-break before selection, so the
    * candidate SET (not just the final ranking) is reproducible by
    * the oracle from the shared plane literals.
    */
  def projectTopK(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
                  dim: Int, r: Int, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    def proj(c: Column): Column = call_function("graft_random_project", c, lit(dim))
    val cp = corpus.select(col("vec_id"), proj(col("embedding")).as("cproj"))
    val qp = queries.select(col("query_id"), proj(col("qe")).as("qproj"))
    val cand = cp.join(broadcast(qp), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(spark, col("qproj"), col("cproj")), 6).as("pscore"))
    val shortlist = graft.plans.TopK.perKey(cand, Seq("query_id"),
        Seq(col("pscore"), -col("neighbor_id")), r)
      .select("query_id", "neighbor_id")
    val rescored = shortlist
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("embedding")), "neighbor_id")
      .join(broadcast(queries), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(spark, col("qe"), col("embedding")), 6).as("score"))
    graft.plans.TopK.perKey(rescored, Seq("query_id"),
        Seq(col("score"), -col("neighbor_id")), k)
      .select("query_id", "neighbor_id", "rank", "score")
  }

  // ---- random-hyperplane LSH --------------------------------------------
  //
  // One 64-plane signature (one fused codegen pass per row), consumed
  // as NumBands independent 16-bit hash tables — the banded-signature
  // layout minhash LSH uses (Dedup.lshBandKeys). A pair/query-match is
  // a candidate iff SOME band's 16-bit sub-signature is within hamming
  // 1 (multiprobe). Effective bucket space is 2^16 per band — with a
  // single flat 8-bit table (the previous design) candidate volume on
  // neutral data was ~9n²/2^8, i.e. still quadratic at 10^9 vectors;
  // banding caps any one table's collision rate at ~17·(n/2^16)
  // candidates per row while the band union keeps recall high for
  // genuinely-near pairs (P[candidate] ≈ 1-(1-p_band)^4, p_band =
  // p^16 + 16·p^15(1-p) for per-bit agreement p).

  val NumPlanes = 64
  val NumBands = 4
  val BandBits = 16 // NumPlanes / NumBands; one hash table per band

  /** Deterministic pseudo-random hyperplanes (seeded LCG), dim x planes. */
  private[graft] def planes(dim: Int): Array[Array[Double]] = {
    var state = 20240812L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    Array.fill(NumPlanes)(Array.fill(dim)(next()))
  }

  /** Output dimensionality of the JL random projection. */
  val ProjDim = 16

  /** Deterministic JL projection planes (own seed, same LCG): ProjDim
    * rows of `dim` components, shared verbatim with the SQL oracle.
    */
  private[graft] def projectionPlanes(dim: Int): Array[Array[Double]] = {
    var state = 20260813L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    Array.fill(ProjDim)(Array.fill(dim)(next()))
  }

  /** Bit-signature of an embedding under the fixed hyperplanes: bit p
    * = sign(v · plane_p). One long-typed signature per row, computed
    * by the codegen'd [[graft.functions.HyperplaneSignature]] — a
    * single fused loop over a flattened plane matrix (the per-row hot
    * loop of the 100 TB ANN path).
    */
  def lshSignature(spark: SparkSession, emb: Column, dim: Int): Column = {
    GraftFunctions.register(spark)
    call_function("graft_hyperplane_sig", emb, lit(dim))
  }

  /** Band `b`'s sub-signature, truncated to its `bits` low planes. */
  private def bandKey(sig: Column, b: Int, bits: Int): Column =
    shiftrightunsigned(sig, BandBits * b).bitwiseAND(lit((1L << bits) - 1))

  /** Composite join key: band id in the high bits, band value below —
    * one long-typed shuffle/probe key instead of a (band, key) pair.
    */
  private def tableKey(sig: Column, b: Int, bits: Int): Column =
    lit(b.toLong << BandBits) + bandKey(sig, b, bits)

  /** Probe keys for one side of a match: each band's own bucket plus
    * every one-bit flip within the band — hamming ≤ 1 multiprobe.
    */
  private def probeKeys(sig: Column, bits: Int): Seq[Column] =
    for {
      b <- 0 until NumBands
      m <- 0L +: (0 until bits).map(i => 1L << i)
    } yield tableKey(sig, b, bits).bitwiseXOR(lit(m))

  /** True iff no band BEFORE `band` also qualifies (hamming ≤ 1 on its
    * `bits` low planes) — makes multi-band emission exactly-once
    * without a dedup shuffle: each qualifying pair survives only via
    * its first qualifying band.
    */
  private def firstQualifyingBand(band: Column, sigA: Column, sigB: Column, bits: Int): Column = {
    val x = sigA.bitwiseXOR(sigB)
    (0 until NumBands).map { bp =>
      lit(bp) >= band || bit_count(bandKey(x, bp, bits)) > 1
    }.reduce(_ && _)
  }

  /** Per-table bit width sized to the corpus: ~4 rows per bucket,
    * clamped to [8, BandBits]. A fixed-width table is wrong at both
    * ends — 8 bits is quadratic at 10^9 rows, 16 bits finds nothing
    * at 10^3 — so the index adapts the way any ANN build step does
    * (one count job, bounded output, deterministic). INTEGER-only
    * (smallest b with 2^b · 4 ≥ n): a float log2 could flip the
    * ceiling by one ulp at exact powers of two, and the oracle must
    * size its tables identically.
    */
  private[graft] def autoBits(n: Long): Int = {
    var b = 0
    while (b < BandBits && (1L << b) * 4 < n) b += 1
    math.min(BandBits, math.max(8, b))
  }

  /** Approximate top-k via banded LSH: the corpus side publishes one
    * key per band (4 slim rows/vector), the query side probes each
    * band's bucket plus its one-bit flips. Corpus never shuffles —
    * the probe set is broadcast and candidates flow straight into the
    * bounded-heap top-k. At scale this turns an O(|corpus|) scan per
    * query into NumBands·(bits+1) bucket lookups over 2^bits-bucket
    * tables; recall is measured against brute force in ScalaTest.
    */
  def lshTopK(spark: SparkSession, queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
              bitsPerTable: Option[Int] = None): DataFrame = {
    val bits = bitsPerTable.getOrElse(autoBits(corpus.count()))
    // compute the signature once per side, then derive keys/probes by
    // shift/XOR — not one signature evaluation per probe
    val qSig = queries
      .withColumn("_qsig", lshSignature(spark, col("qe"), dim))
      .withColumn("bkey", explode(array(probeKeys(col("_qsig"), bits): _*)))
    val cSig = corpus
      .withColumn("_csig", lshSignature(spark, col("embedding"), dim))
      .withColumn("bkey", explode(array(
        (0 until NumBands).map(b => tableKey(col("_csig"), b, bits)): _*)))
    val scored = cSig.join(broadcast(qSig), Seq("bkey"))
      .filter(col("query_id") =!= col("vec_id"))
      // exactly-once across bands (no dedup shuffle): keep a match
      // only via its first qualifying band
      .filter(firstQualifyingBand(shiftrightunsigned(col("bkey"), BandBits),
        col("_qsig"), col("_csig"), bits))
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
    *
    * Means are EXACT integer sums of elements quantized to 1e-4
    * (`floor(v·10⁴ + ½)` — pure IEEE ops), divided once at the driver:
    * integer addition commutes, so the codebook is a pure function of
    * the input multiset — no partitioning/summation-order leak, and an
    * external engine (the DuckDB oracle) reproduces every centroid
    * bit-for-bit. At 100 TB the trainer runs on a sample with the
    * identical computation.
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
        .groupBy("cell", "pos")
        .agg(sum(floor(col("v").cast("double") * 1e4 + 0.5).cast("long")).as("qs"),
          count(lit(1)).as("cnt"))
        .collect() // bounded: nCells × dim rows
        .groupBy(_.getInt(0))
      cents = cents.map { case (i, old) =>
        i -> means.get(i).map(_.sortBy(_.getInt(1))
            .map(r => (r.getLong(2) / (r.getLong(3) * 1e4)).toFloat).toSeq)
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
              k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame =
    ivfTopKWith(spark, queries, corpus, k,
      kmeansCentroids(spark, corpus, "embedding", nCells), nProbe)

  /** IVF serving against a PRE-TRAINED centroid codebook — the
    * train-once/serve-everywhere split a fleet actually runs: the
    * codebook is an artifact ([[ModelArtifacts.saveIvfCentroids]] /
    * `loadIvfCentroids`), trained on one (sampled) corpus pass and
    * reloaded by every scoring job. Because centroids persist as
    * exact parquet floats, a reloaded codebook serves bit-identically
    * to the in-memory one (`ModelArtifactSpec`).
    */
  /** Per-cell `(score, cell)` structs against an IVF codebook — the
    * ONE definition of IVF scoring, shared by batch assignment,
    * query probing, and the streaming index maintainer
    * (graft.streaming.AnnIndexStream): a write-side assignment and a
    * read-side probe that disagreed would silently lose recall.
    */
  def cellScores(spark: SparkSession, v: Column,
      cents: Seq[(Int, Seq[Float])]): Column = array(cents.map { case (i, c) =>
    struct(round(cosine(spark, v, typedLit(c)), 6).as("s"), lit(i).as("cell"))
  }: _*)

  /** The argmax IVF cell of a vector under the codebook. */
  def assignCell(spark: SparkSession, v: Column,
      cents: Seq[(Int, Seq[Float])]): Column =
    array_max(cellScores(spark, v, cents)).getField("cell")

  def ivfTopKWith(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
                  k: Int, cents: Seq[(Int, Seq[Float])], nProbe: Int = 4): DataFrame = {

    def cellScores(v: Column): Column = Similarity.cellScores(spark, v, cents)

    val assigned = corpus.withColumn("cell", assignCell(spark, col("embedding"), cents))
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

  /** IVF-routed hard-negative mining — the contrastive-training shape
    * at fleet scale, where EVERY training doc is an anchor and the
    * per-anchor corpus scan of the brute-force miner stops working:
    * anchors probe their `nProbe` nearest IVF cells, the same-label /
    * self exclusions filter INSIDE the cell join, and the bounded-heap
    * TopK keeps the k most similar different-label candidates.
    * Candidates per anchor are bounded by the probed cells' occupancy
    * (corpus/nCells × nProbe expected), not the corpus; the corpus is
    * assigned once and never shuffles; anchors broadcast. Recall vs
    * the brute-force miner is asserted in SimilaritySpec.
    *
    * `anchors` carry (query_id, qlabel, qe); `corpus` carries
    * (vec_id, label, embedding).
    */
  def ivfHardNegatives(spark: SparkSession, anchors: DataFrame, corpus: DataFrame,
                       k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = kmeansCentroids(spark, corpus, "embedding", nCells)
    def cellScores(v: Column): Column = array(cents.map { case (i, c) =>
      struct(round(cosine(spark, v, typedLit(c)), 6).as("s"), lit(i).as("cell"))
    }: _*)
    val assigned = corpus
      .withColumn("cell", array_max(cellScores(col("embedding"))).getField("cell"))
    val probes = anchors.withColumn("probe_cells",
        slice(reverse(array_sort(cellScores(col("qe")))), 1, nProbe))
      .withColumn("cell", explode(transform(col("probe_cells"), p => p.getField("cell"))))
      .drop("probe_cells")
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id") && col("label") =!= col("qlabel"))
      .select(col("query_id"), col("vec_id").as("neg_id"),
        round(cosine(spark, col("qe"), col("embedding")), 6).as("score"))
    graft.plans.TopK.perKey(scored, Seq("query_id"),
        Seq(col("score"), -col("neg_id")), k)
      .select("query_id", "neg_id", "rank", "score")
  }

  /** IVF-PQ ANN — the memory-bounded scale path: the IVF codebook
    * prunes the corpus to `nProbe` cells, product quantization
    * replaces each candidate's dim floats with M one-byte codes
    * (32× compression at dim=64/M=8 — what lets a 10^9-vector index
    * live in RAM), and scoring is ADC: the query precomputes an M×K
    * lookup table once, every candidate costs M array lookups, zero
    * float math. The top `rerank` ADC candidates per query join back
    * to their exact vectors for true-cosine rescoring, then the final
    * top-k. Ranking quality is recall-defined (rows-only gate query;
    * recall vs brute force asserted in ScalaTest, like ann_ivf).
    *
    * The PQ codebook here is picked deterministically (subvectors of
    * the first K corpus vectors — the seeding k-means-lite uses too);
    * at production scale the sub-centroids come from per-subspace
    * k-means on a sample, with the identical encode/LUT/ADC kernels.
    *
    * Scale shape: codes are computed in one compiled pass over the
    * corpus (no shuffle), candidate generation reuses the IVF cell
    * join (queries broadcast, corpus never shuffles), ADC runs inside
    * whole-stage codegen, and only (query, neighbor, code-score) rows
    * reach the bounded-heap top-k. The exact-rescore join moves just
    * rerank × queries rows.
    */
  def ivfPqTopK(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
                k: Int, nCells: Int = 16, nProbe: Int = 4,
                numSub: Int = 8, numCodes: Int = 16, rerank: Int = 64): DataFrame =
    ivfPqTopKWith(spark, queries, corpus, k,
      kmeansCentroids(spark, corpus, "embedding", nCells),
      trainPqCodebook(spark, corpus, numSub, numCodes), nProbe, rerank)

  /** The PQ codebook trainer, split from serving so the codebook can
    * persist as an artifact ([[ModelArtifacts.savePqCodebook]]) —
    * numSub × numCodes × (dim/numSub) sub-centroids.
    */
  def trainPqCodebook(spark: SparkSession, corpus: DataFrame,
                      numSub: Int = 8, numCodes: Int = 16): Seq[Seq[Seq[Double]]] = {
    import graft.functions.PqEncode
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    // deterministic PQ codebook seeds: a UNIFORM hash-picked sample
    // (smallest md5 of vec_id), not the first ids — contiguous ids are
    // usually correlated (one source, one cluster) and a codebook
    // drawn from one region can't represent the rest of the space.
    // Bounded driver collect: numCodes × dim floats.
    val seeds = corpus
      .orderBy(conv(substring(md5(col("vec_id").cast("string")), 1, 12), 16, 10)
        .cast("long"), col("vec_id"))
      .limit(numCodes)
      .select(col("embedding")).collect().map(_.getSeq[Float](0))
    val dim = seeds.head.length
    require(dim % numSub == 0,
      s"PQ requires dim divisible by numSub (dim=$dim, numSub=$numSub): an " +
        "indivisible split would silently drop the trailing components from " +
        "every code, LUT, and score")
    // a corpus smaller than numCodes yields a smaller codebook — the
    // ADC stride must match the ACTUAL code count, not the requested
    val kActual = seeds.length
    val sub = dim / numSub
    var codebook: Seq[Seq[Seq[Double]]] = (0 until numSub).map { mi =>
      seeds.toSeq.map(s => s.slice(mi * sub, (mi + 1) * sub).map(_.toDouble).toSeq)
    }
    // per-subspace Lloyd's refinement (PQ training): one compiled
    // encode pass assigns every subvector, means come back as
    // numSub × numCodes × sub rows — bounded driver traffic, exactly
    // the kmeansCentroids shape. Means are exact integer sums of
    // 1e-4-quantized elements divided at the driver (same trick as
    // the IVF codebook: commutative, partitioning-independent);
    // emptied codes keep their previous centroid.
    for (_ <- 1 to 2) {
      val cb = codebook
      val means = corpus
        .select(column(PqEncode(expression(col("embedding")), cb)).as("codes"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .select((col("pos") / sub).cast("int").as("mi"),
          element_at(col("codes"), (col("pos") / sub).cast("int") + 1).as("code"),
          col("pos").as("pos"), col("v"))
        .groupBy("mi", "code", "pos")
        .agg(sum(floor(col("v").cast("double") * 1e4 + 0.5).cast("long")).as("qs"),
          count(lit(1)).as("cnt"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
          r.getLong(3) / (r.getLong(4) * 1e4))
        .toMap
      codebook = codebook.zipWithIndex.map { case (codes, mi) =>
        codes.zipWithIndex.map { case (old, c) =>
          val updated = (0 until sub).map(i => means.get((mi, c, mi * sub + i)))
          if (updated.forall(_.isDefined)) updated.map(_.get) else old
        }
      }
    }
    codebook
  }

  /** IVF-PQ serving against PRE-TRAINED centroid and PQ codebooks —
    * both persistable via [[ModelArtifacts]]; a reloaded pair serves
    * bit-identically (`ModelArtifactSpec`).
    */
  def ivfPqTopKWith(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
                    k: Int, cents: Seq[(Int, Seq[Float])],
                    codebook: Seq[Seq[Seq[Double]]],
                    nProbe: Int = 4, rerank: Int = 64): DataFrame = {
    import graft.functions.{PqAdc, PqEncode, PqLut}
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val kActual = codebook.head.length

    def cellScores(v: Column): Column = array(cents.map { case (i, c) =>
      struct(round(cosine(spark, v, typedLit(c)), 6).as("s"), lit(i).as("cell"))
    }: _*)

    // corpus side: cell + PQ codes, one compiled pass, embeddings dropped
    val encoded = corpus
      .withColumn("cell", array_max(cellScores(col("embedding"))).getField("cell"))
      .select(col("vec_id"), col("cell"),
        column(PqEncode(expression(col("embedding")), codebook)).as("codes"))
    // query side: probed cells + ADC lookup table, computed once per query
    val probes = queries
      .withColumn("lut", column(PqLut(expression(col("qe")), codebook)))
      .withColumn("probe_cells",
        slice(reverse(array_sort(cellScores(col("qe")))), 1, nProbe))
      .withColumn("cell", explode(transform(col("probe_cells"), p => p.getField("cell"))))
      .select(col("query_id"), col("cell"), col("lut"))
    val adc = encoded.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        column(PqAdc(expression(col("codes")), expression(col("lut")), kActual)).as("adc"))
    val shortlist = graft.plans.TopK.perKey(adc, Seq("query_id"),
        Seq(col("adc"), -col("neighbor_id")), rerank)
      .select("query_id", "neighbor_id")
    // exact rescore of the shortlist only
    val exact = shortlist
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("embedding")), "neighbor_id")
      .join(broadcast(queries), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(spark, col("qe"), col("embedding")), 6).as("score"))
    graft.plans.TopK.perKey(exact, Seq("query_id"),
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

  /** Banded-LSH candidate pairs (ids only): pairs of vectors some band
    * of whose signatures is within hamming 1. The probe/publish rows
    * carry ONLY (vec_id, sig, key) — 16-byte rows — so candidate
    * generation never shuffles an embedding, and the first-qualifying-
    * band filter makes emission exactly-once with no dedup shuffle.
    * Exposed for the candidate-volume ScalaTest.
    */
  private[graft] def bandedCandidatePairs(sigd: DataFrame): DataFrame = {
    val slim = sigd.select(col("vec_id"), col("sig"))
    val a = slim.select(col("vec_id").as("vec_a"), col("sig").as("sig_a"),
      explode(array(probeKeys(col("sig"), BandBits): _*)).as("bkey"))
    val b = slim.select(col("vec_id").as("vec_b"), col("sig").as("sig_b"),
      explode(array((0 until NumBands).map(bd =>
        tableKey(col("sig"), bd, BandBits)): _*)).as("bkey"))
    a.join(b, Seq("bkey"))
      .filter(col("vec_a") < col("vec_b"))
      .filter(firstQualifyingBand(shiftrightunsigned(col("bkey"), BandBits),
        col("sig_a"), col("sig_b"), BandBits))
      .select("vec_a", "vec_b")
  }

  /** Near-duplicate pairs: banded-LSH candidate generation (some band
    * within hamming ≤ 1 via multiprobe) + EXACT cosine scoring.
    *
    * Work is linear in corpus size plus the intra-bucket pair blowup —
    * buckets are n/2^BandBits per band on neutral data, so candidate
    * volume is ~NumBands·(BandBits+1)·n²/2^17, 512× fewer than the
    * previous flat 8-plane table — and no all-pairs join exists
    * anywhere in the plan. Embeddings are attached to the (small)
    * candidate set by two hash joins for exact rescoring; candidate
    * generation itself moves only 16-byte rows.
    */
  def nearDupPairs(spark: SparkSession, vectors: DataFrame, dim: Int,
                   threshold: Double): DataFrame = {
    // signature subtree feeds both candidate sides; cache ONLY
    // (vec_id, sig) — 16 bytes/vector — never the embedding column,
    // which would pin the whole corpus in storage memory. The two
    // rescoring joins re-read embeddings from the source, touching
    // only the (small) candidate set.
    val sigs = graft.Caches.register(vectors
      .select(col("vec_id"), lshSignature(spark, col("embedding"), dim).as("sig")))
    val cand = bandedCandidatePairs(sigs)
    val ea = vectors.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val eb = vectors.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    cand.join(ea, Seq("vec_a")).join(eb, Seq("vec_b"))
      .withColumn("score", round(cosine(spark, col("ea"), col("eb")), 6))
      .filter(col("score") >= threshold)
      .select("vec_a", "vec_b", "score")
  }

  // ---- semantic (cluster-then-compare) near-dup ---------------------------

  /** SemDeDup-shaped semantic dedup: assign every vector to its
    * nearest centroid (broadcast — the corpus never shuffles for
    * assignment), then emit near-dup pairs ONLY within a cluster,
    * scored by exact cosine. Clusters bound the quadratic comparison
    * work the way LSH buckets do, but by SEMANTIC locality: two
    * paraphrases land in the same cluster even when no hash bucket
    * would pair them.
    *
    * `centroids` must be (cluster_id, centroid) rows, small enough to
    * broadcast — at production scale the [[kmeansCentroids]] codebook
    * (cluster count grows with the corpus, keeping cluster sizes — and
    * so the per-cluster pair blowup — bounded). The gate query instead
    * picks deterministic medoids so the full decision (assignment +
    * pairing + scores) is reproducible by the DuckDB oracle; Lloyd's
    * iterations average floats and are not oracle-exact.
    *
    * Assignment maximizes the ROUNDED cosine with a cluster-id
    * tie-break, so the argmax is engine-deterministic.
    */
  def semanticNearDupPairs(spark: SparkSession, vectors: DataFrame,
                           centroids: DataFrame, threshold: Double): DataFrame = {
    val assigned = vectors
      .crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("cluster_id"),
        round(cosine(spark, col("embedding"), col("centroid")), 6).as("cscore"))
      .groupBy("vec_id")
      .agg(max_by(struct(col("cluster_id"), col("embedding")),
        struct(col("cscore"), -col("cluster_id"))).as("best"))
      .select(col("vec_id"), col("best.cluster_id").as("cluster"),
        col("best.embedding").as("e"))
    val a = assigned.select(col("vec_id").as("vec_a"), col("cluster"), col("e").as("ea"))
    val b = assigned.select(col("vec_id").as("vec_b"), col("cluster"), col("e").as("eb"))
    a.join(b, Seq("cluster"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("score", round(cosine(spark, col("ea"), col("eb")), 6))
      .filter(col("score") >= threshold)
      .select("vec_a", "vec_b", "cluster", "score")
  }
}
