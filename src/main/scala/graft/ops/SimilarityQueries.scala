package graft.ops

import graft.{QueryDef, QueryModule}
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search + multimodal query block over `embeddings`. */
object SimilarityQueries extends QueryModule {

  private val Dim = 64

  // Tables.parallel: the corpus side does per-row vector math
  // (signatures, cosine) — restore parallelism when the scan
  // collapsed to one split (no-op on multi-split input)
  private def corpus(s: SparkSession, dir: String): DataFrame =
    Tables.parallel(Tables.embeddings(s, dir))

  private def queries(s: SparkSession, dir: String, n: Int): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))

  private def queriesWithLabel(s: SparkSession, dir: String, n: Int): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"), col("label"), col("embedding").as("qe"))

  // -- exact brute-force top-k (oracle) ------------------------------------

  private def annBrute(s: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(s, queries(s, dir, 10), corpus(s, dir), k = 5)
      .orderBy("query_id", "rank")

  private val annBruteSql =
    """WITH q AS (
      |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
      |  FROM embeddings WHERE vec_id < 10),
      |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS ce FROM embeddings),
      |s AS (
      |  SELECT query_id, neighbor_id,
      |    round(list_cosine_similarity(qe, ce), 6) AS score
      |  FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
      |r AS (
      |  SELECT query_id, neighbor_id, score,
      |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
      |  FROM s)
      |SELECT query_id, neighbor_id, rank, score FROM r
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  // -- k-NN join within label blocks (oracle) ------------------------------

  private def knnJoin(s: SparkSession, dir: String): DataFrame =
    Similarity.knnJoinWithinBlocks(s, queriesWithLabel(s, dir, 50), corpus(s, dir),
        blockCol = "label", k = 3)
      .orderBy("query_id", "rank")

  private val knnJoinSql =
    """WITH q AS (
      |  SELECT vec_id AS query_id, label, embedding::DOUBLE[] AS qe
      |  FROM embeddings WHERE vec_id < 50),
      |s AS (
      |  SELECT q.query_id, c.vec_id AS neighbor_id,
      |    round(list_cosine_similarity(q.qe, c.embedding::DOUBLE[]), 6) AS score
      |  FROM q JOIN embeddings c ON q.label = c.label AND q.query_id <> c.vec_id),
      |r AS (
      |  SELECT query_id, neighbor_id, score,
      |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
      |  FROM s)
      |SELECT query_id, neighbor_id, rank, score FROM r
      |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  // -- embedding near-dup pairs via LSH candidates (oracle) ----------------

  private def embedNearDup(s: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(s, corpus(s, dir), dim = Dim, threshold = 0.3)
      .orderBy("vec_a", "vec_b")

  /** Oracle mirrors the banded LSH candidate rule exactly: DuckDB
    * recomputes each vector's four 16-bit band sub-signatures from the
    * SAME plane constants (emitted as literals from the single Scala
    * source of truth) and takes pairs where ANY band is within
    * hamming 1, scored with exact cosine — so the hash compare
    * verifies signature computation, banding, candidate generation,
    * and scoring end to end. (The Spark side's first-qualifying-band
    * trick only dedups emission; the emitted SET is exactly this.)
    */
  /** Per-band 16-bit sub-signature SQL over column `e`, from the SAME
    * plane constants as the Scala side — shared by the near-dup and
    * ann_lsh oracles.
    */
  private def bandSigCols: String = {
    val ps = Similarity.planes(Dim)
    def bandExpr(band: Int): String = (0 until Similarity.BandBits).map { p =>
      val lits = ps(band * Similarity.BandBits + p)
        .map(java.lang.Double.toString).mkString("[", ",", "]")
      s"(CASE WHEN list_dot_product(e, $lits::DOUBLE[]) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("\n      + ")
    (0 until Similarity.NumBands)
      .map(b => s"CAST(${bandExpr(b)} AS BIGINT) AS b$b").mkString(",\n  ")
  }

  private val embedNearDupSql = {
    val bandCols = bandSigCols
    val anyBand = (0 until Similarity.NumBands)
      .map(b => s"bit_count(xor(a.b$b, b.b$b)) <= 1").mkString(" OR ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |sigs AS (SELECT vec_id, e,
       |  $bandCols FROM v)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  round(list_cosine_similarity(a.e, b.e), 6) AS score
       |FROM sigs a JOIN sigs b
       |  ON a.vec_id < b.vec_id AND ($anyBand)
       |WHERE round(list_cosine_similarity(a.e, b.e), 6) >= 0.3
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  // -- semantic (cluster-then-compare) near-dup ----------------------------

  private val SemClusters = 10
  private val SemThreshold = 0.25

  /** SemDeDup-shaped dedup gate: 10 deterministic medoids (the
    * vectors with the smallest portable hash of vec_id — a seeded
    * sample, so the oracle can recompute them), nearest-medoid
    * assignment, exact-cosine pairs within clusters. See
    * [[Similarity.semanticNearDupPairs]] for why medoids, not Lloyd's
    * means, anchor the GATE query.
    */
  private def dedupSemantic(s: SparkSession, dir: String): DataFrame = {
    val v = corpus(s, dir)
    val medoids = Tables.embeddings(s, dir)
      .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"),
        conv(substring(md5(col("vec_id").cast("string")), 1, 12), 16, 10)
          .cast("long").as("_h"))
      .orderBy(col("_h"), col("cluster_id")).limit(SemClusters)
      .drop("_h")
    Similarity.semanticNearDupPairs(s, v, medoids, SemThreshold)
      .orderBy("vec_a", "vec_b")
  }

  private val dedupSemanticSql =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |med AS (
       |  SELECT vec_id AS cid, e AS ce FROM v
       |  ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 12))::BIGINT,
       |    vec_id
       |  LIMIT $SemClusters),
       |asn AS (
       |  SELECT vec_id, cid, e FROM (
       |    SELECT v.vec_id, med.cid, v.e,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY round(list_cosine_similarity(v.e, med.ce), 6) DESC,
       |          med.cid) AS rn
       |    FROM v CROSS JOIN med)
       |  WHERE rn = 1)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cid AS cluster,
       |  round(list_cosine_similarity(a.e, b.e), 6) AS score
       |FROM asn a JOIN asn b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |WHERE round(list_cosine_similarity(a.e, b.e), 6) >= $SemThreshold
       |ORDER BY vec_a, vec_b""".stripMargin

  // -- cluster topic labeling ----------------------------------------------

  /** Top-3 characteristic terms per semantic cluster — the corpus
    * exploration step after clustering ("what is cluster 7 about?"):
    * nearest-medoid assignment over the embeddings (1:1 with
    * `documents`), then a concentration score per (cluster, term) —
    * `tf · (tf / total_tf)`, high only for terms that are frequent AND
    * concentrated in the cluster, so evenly-spread background words
    * self-demote (χ²-flavored, log-free → cross-engine-exact) — ranked
    * by the bounded-heap TopK.
    *
    * Scale shape: assignment broadcasts the K medoids (corpus never
    * shuffles); the term stats are two aggregations at
    * (cluster, term) cardinality — text leaves the scan only as
    * exploded term rows feeding a partial-aggregated groupBy.
    */
  private def clusterTopics(s: SparkSession, dir: String): DataFrame = {
    val medoids = Tables.embeddings(s, dir)
      .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"),
        conv(substring(md5(col("vec_id").cast("string")), 1, 12), 16, 10)
          .cast("long").as("_h"))
      .orderBy(col("_h"), col("cluster_id")).limit(SemClusters)
      .drop("_h")
    val assigned = Tables.embeddings(s, dir)
      .crossJoin(broadcast(medoids))
      .select(col("vec_id"), col("cluster_id"),
        round(Similarity.cosine(s, col("embedding"), col("centroid")), 6).as("cscore"))
      .groupBy("vec_id")
      .agg(max_by(col("cluster_id"), struct(col("cscore"), -col("cluster_id")))
        .as("cluster"))
    val sizes = assigned.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
    val tf = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), explode(TextAnalysis.words(col("text"))).as("term"))
      .join(assigned.withColumnRenamed("vec_id", "doc_id"), "doc_id")
      .groupBy("cluster", "term").agg(count(lit(1)).as("tf"))
    // concentration score tf·(tf/total): high only when a term is
    // frequent AND its occurrences concentrate in this cluster, so
    // evenly-spread background words (stopwords) self-demote by the
    // ~1/K share factor — no absolute df cutoff that a small shared
    // vocabulary would empty. tf² stays under 2^53 → IEEE-exact.
    val tot = tf.groupBy("term").agg(sum("tf").as("tot"))
    val scored = tf.join(tot, "term")
      .select(col("cluster"), col("term"),
        ((col("tf").cast("double") * col("tf").cast("double")) /
          col("tot").cast("double")).as("score"))
    graft.plans.TopK.perKey(scored, Seq("cluster"),
        Seq(col("score"), col("term")), k = 3)
      .join(broadcast(sizes), "cluster")
      .select(col("cluster"), col("cluster_size"), col("term"), col("rank"),
        round(col("score"), 4).as("topic_score"))
      .orderBy("cluster", "rank")
  }

  private val clusterTopicsSql =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |med AS (
       |  SELECT vec_id AS cid, e AS ce FROM v
       |  ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 12))::BIGINT,
       |    vec_id
       |  LIMIT $SemClusters),
       |asn AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT v.vec_id, med.cid,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY round(list_cosine_similarity(v.e, med.ce), 6) DESC,
       |          med.cid) AS rn
       |    FROM v CROSS JOIN med)
       |  WHERE rn = 1),
       |sz AS (SELECT cid, count(*) AS cluster_size FROM asn GROUP BY 1),
       |w AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
       |  FROM documents),
       |tf AS (
       |  SELECT cid AS cluster, term, count(*) AS tf
       |  FROM w JOIN asn ON w.doc_id = asn.vec_id GROUP BY 1, 2),
       |tot AS (SELECT term, CAST(sum(tf) AS BIGINT) AS tot FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT cluster, tf.term,
       |    (CAST(tf AS DOUBLE) * CAST(tf AS DOUBLE)) / CAST(tot AS DOUBLE) AS score
       |  FROM tf JOIN tot ON tf.term = tot.term)
       |SELECT cluster, CAST(cluster_size AS BIGINT) AS cluster_size, term,
       |  CAST(row_number() OVER (PARTITION BY cluster
       |    ORDER BY score DESC, term DESC) AS INT) AS rank,
       |  round(score, 4) AS topic_score
       |FROM scored JOIN sz ON scored.cluster = sz.cid
       |QUALIFY rank <= 3
       |ORDER BY cluster, rank""".stripMargin

  // -- int8 embedding quantization -----------------------------------------

  /** Per-vector 8-bit quantization (the 4× storage cut a 10^9-vector
    * store takes before ANN indexing): linear [min,max] → 256 levels
    * with FLOOR bucketing — floor, not round, because IEEE floor /
    * divide / multiply are exactly specified, so the quantized codes,
    * their checksum, and the reconstruction error are bit-identical
    * in any engine evaluating the same formula (round-half ties are
    * not). Output verifies codes (checksum), range metadata, and the
    * max absolute reconstruction error, which is bounded by scale/2.
    */
  private def embedQuantize(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // one fused compiled pass per vector (QuantizeStats); the previous
    // five-HOF chain interpreted a lambda per element and was the
    // slowest query in the suite (8.2s → sub-second at sf0.1)
    val st = call_function("graft_quantize_stats", col("embedding"))
    Tables.embeddings(s, dir).select(col("vec_id"), st.as("st"))
      .select(
        col("vec_id"),
        round(col("st.qmin"), 6).as("qmin"),
        round(col("st.qmax"), 6).as("qmax"),
        col("st.q_checksum").as("q_checksum"),
        round(col("st.max_abs_err"), 6).as("max_abs_err"))
      .orderBy("vec_id")
  }

  private val embedQuantizeSql =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |b AS (SELECT vec_id, e, list_min(e) AS mn, list_max(e) AS mx FROM v),
      |s AS (SELECT vec_id, e, mn, mx,
      |  CASE WHEN mx > mn THEN (mx - mn) / 256.0 ELSE 1.0 END AS sc FROM b),
      |q AS (SELECT vec_id, mn, mx,
      |  list_transform(e, x -> least(floor((x - mn) / sc)::BIGINT, 255)) AS qs,
      |  list_transform(e, x ->
      |    abs(x - (mn + (least(floor((x - mn) / sc)::BIGINT, 255) + 0.5) * sc))) AS errs
      |  FROM s)
      |SELECT vec_id, round(mn, 6) AS qmin, round(mx, 6) AS qmax,
      |  CAST(list_aggregate(qs, 'sum') AS BIGINT) AS q_checksum,
      |  round(list_max(errs), 6) AS max_abs_err
      |FROM q ORDER BY vec_id""".stripMargin

  // -- approximate paths ----------------------------------------------------
  // ann_lsh and ann_ivf are fully hash-oracled (planes, banding, auto
  // table width, k-means re-training on exact quantized integer sums —
  // every step deterministic and engine-portable); only ann_ivfpq
  // stays rows-only: its oracle would have to replay PQ encode/LUT/ADC
  // on top of the k-means, and its ranking quality is recall-defined —
  // asserted in ScalaTest instead.

  private def annLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(s, queries(s, dir, 10), corpus(s, dir), k = 5, dim = Dim)
      .orderBy("query_id", "rank")

  /** DuckDB recomputes the whole LSH read path: the four 16-bit band
    * sub-signatures from the shared plane literals, the integer
    * corpus-sized table width (smallest b with 2^b·4 ≥ n, clamped to
    * [8,16] — same integer formula as `Similarity.autoBits`), the
    * any-band-within-hamming-1 candidate rule on the truncated bands
    * (= bucket + one-bit-flip multiprobe), exact cosine rescoring,
    * and the (score desc, neighbor asc) top-5 — so the gate certifies
    * the approximate ALGORITHM bit-for-bit, not just row counts.
    */
  private val annLshSql = {
    val bandCols = bandSigCols
    val anyBand = (0 until Similarity.NumBands)
      .map(b => s"bit_count(xor(q.b$b & m.mask, c.b$b & m.mask)) <= 1").mkString("\n      OR ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |m AS (
       |  -- smallest b in [0,16] with 2^b*4 >= n (none -> 16), clamped to [8,16]
       |  SELECT (1::BIGINT << least(16, greatest(8,
       |    (SELECT coalesce(min(b), 16) FROM range(0, 17) r(b)
       |     WHERE (1::BIGINT << b) * 4 >= (SELECT count(*) FROM embeddings))))) - 1 AS mask),
       |sigs AS (SELECT vec_id, e,
       |  $bandCols FROM v),
       |q AS (SELECT vec_id AS query_id, e AS qe, b0, b1, b2, b3
       |      FROM sigs WHERE vec_id < 10),
       |cand AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    round(list_cosine_similarity(q.qe, c.e), 6) AS score
       |  FROM q, m, sigs c
       |  WHERE q.query_id <> c.vec_id AND (
       |      $anyBand)),
       |r AS (
       |  SELECT query_id, neighbor_id, score,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
       |  FROM cand)
       |SELECT query_id, neighbor_id, rank, score FROM r
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** The gate serves from a RELOADED index on purpose: train the
    * centroid codebook, persist it via [[ModelArtifacts]], reload,
    * and serve with [[Similarity.ivfTopKWith]] — so the oracle
    * certifies the full train → publish-artifact → serve loop a
    * fleet deployment runs, not just the in-memory path.
    */
  /** Gate for the STREAMING ANN index maintainer (§2 75): the corpus
    * arrives as two micro-batches through AnnIndexStream — per-trigger
    * cell assignment against the trained codebook, exactly-once
    * MergeTable appends, cell-contiguous files — and `topK` serves
    * from the TABLE. Serving is bit-identical to the batch IVF by
    * construction (write-side assignment and read-side probing share
    * the one `Similarity.cellScores` definition), so the gate reuses
    * `ann_ivf_topk`'s full DuckDB training-replay oracle: the hash
    * certifies the streamed index end to end — assignment, exactly-
    * once ingest, storage, probe, and rescoring.
    */
  private def annStream(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(sys.props.getOrElse("user.dir", "."))
      .toAbsolutePath.resolve("target").resolve("graft_tmp")
      .resolve(s"ann_stream_${dir.replaceAll("[^a-zA-Z0-9.]", "_")}").toString
    graft.cdc.MergeTable.drop(root)
    val cents = Similarity.kmeansCentroids(s, corpus(s, dir), "embedding", 16)
    val ais = new graft.streaming.AnnIndexStream(s, root, cents)
    val c = corpus(s, dir).select("vec_id", "embedding")
    ais.processBatch(c.filter(col("vec_id") % 2 === 0), 0L)
    ais.processBatch(c.filter(col("vec_id") % 2 === 1), 1L)
    ais.topK(queries(s, dir, 10), k = 5).orderBy("query_id", "rank")
  }

  private def annIvf(s: SparkSession, dir: String): DataFrame = {
    val cents = Similarity.kmeansCentroids(s, corpus(s, dir), "embedding", 16)
    // per-run unique path: a fixed relative path races concurrent
    // runs (overwrite vs reload) and scatters artifacts on a
    // non-repo-root CWD. Deleted after the reload COLLECTS (the
    // loaded codebook is driver-resident) — a gate run must not leak
    // one temp dir per invocation.
    val tmp = java.nio.file.Files.createTempDirectory("ann_ivf_centroids")
    val loaded =
      try {
        ModelArtifacts.saveIvfCentroids(s, cents, tmp.resolve("index").toString)
        ModelArtifacts.loadIvfCentroids(s, tmp.resolve("index").toString)
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(tmp).iterator().asScala.toSeq
          .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
      }
    Similarity.ivfTopKWith(s, queries(s, dir, 10), corpus(s, dir), k = 5, loaded)
      .orderBy("query_id", "rank")
  }

  /** DuckDB re-trains the ENTIRE IVF index and replays the read path:
    * the 16 seed centroids (lowest vec_ids), two unrolled Lloyd's
    * rounds — assignment by rounded cosine with the same
    * (score desc, cell desc) argmax tie-break, re-centering via exact
    * BIGINT sums of 1e-4-quantized elements (`floor(x·10⁴+½)`, pure
    * IEEE ops — the reason `kmeansCentroids` quantizes: integer
    * addition commutes, so the codebook is partitioning-independent
    * and externally reproducible), float-rounded centroid components,
    * emptied cells inheriting their previous centroid — then the
    * 4-cell probe, cell-join candidate generation, exact rescoring,
    * and (score desc, neighbor asc) top-5. Every approximation the
    * index makes is certified bit-for-bit, not just row counts.
    */
  // one Lloyd's assignment: nearest (rounded-cosine, cell-desc
  // tie-break) centroid from table `cents(cell, c)` for every vector
  private def ivfAssign(cents: String, name: String): String =
    s"""$name AS (
       |  SELECT vec_id, e, cell FROM (
       |    SELECT v.vec_id, v.e, c.cell,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY round(list_cosine_similarity(v.e, c.c), 6) DESC, c.cell DESC) AS rn
       |    FROM v CROSS JOIN $cents c) WHERE rn = 1)"""

  // re-center: exact quantized BIGINT sums per (cell, pos), one
  // float-rounded division per component, empty cells keep `prev`'s
  private def ivfRecenter(asn: String, prev: String, name: String): String =
    s"""$name AS (
       |  SELECT p.cell, coalesce(n.c, p.c) AS c
       |  FROM $prev p LEFT JOIN (
       |    SELECT cell, list(CAST(CAST(qs / (cnt * 10000.0) AS REAL) AS DOUBLE) ORDER BY pos) AS c
       |    FROM (
       |      SELECT cell, pos, sum(CAST(floor(x * 10000 + 0.5) AS BIGINT)) AS qs, count(*) AS cnt
       |      FROM (SELECT cell, unnest(range(1, len(e)+1)) AS pos, unnest(e) AS x FROM $asn)
       |      GROUP BY cell, pos) GROUP BY cell) n USING (cell))"""

  /** Shared by the IVF and IVF-PQ oracles: re-train the IVF index
    * (16 lowest-id seeds, two unrolled Lloyd's rounds) and derive the
    * final corpus assignment `asn(vec_id, e, cell)` plus the 4-cell
    * query probes `probe(query_id, qe, cell)`.
    */
  private val ivfIndexCtes: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |seed AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, e AS c
       |  FROM (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT 16)),
       |${ivfAssign("seed", "a1")},
       |${ivfRecenter("a1", "seed", "c1")},
       |${ivfAssign("c1", "a2")},
       |${ivfRecenter("a2", "c1", "c2")},
       |${ivfAssign("c2", "asn")},
       |probe AS (
       |  SELECT query_id, qe, cell FROM (
       |    SELECT q.vec_id AS query_id, q.e AS qe, c.cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY round(list_cosine_similarity(q.e, c.c), 6) DESC, c.cell DESC) AS rn
       |    FROM v q CROSS JOIN c2 c WHERE q.vec_id < 10) WHERE rn <= 4)"""

  private val annIvfSql = {
    s"""$ivfIndexCtes,
       |cand AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    round(list_cosine_similarity(p.qe, a.e), 6) AS score
       |  FROM probe p JOIN asn a USING (cell)
       |  WHERE p.query_id <> a.vec_id),
       |r AS (
       |  SELECT query_id, neighbor_id, score,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
       |  FROM cand)
       |SELECT query_id, neighbor_id, rank, score FROM r
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Attribute-FILTERED ANN through the IVF index (r12) — the serving
    * shape RAG pipelines need ("nearest docs WHERE lang='en' AND
    * license=permissive"): the index is built over the FULL corpus
    * once, and the predicate (label = 3 here) applies to candidates
    * INSIDE the probed cells BEFORE any distance math. Because a
    * vector's cell assignment is independent of every other vector,
    * filter-then-assign ≡ assign-then-filter, so the filter legally
    * pushes all the way to the corpus scan — Catalyst serves it as a
    * parquet PushedFilter and the per-row cosine work shrinks by the
    * selectivity. Top-k per query comes from the bounded heap, never
    * a per-group sort.
    */
  private def annIvfFiltered(s: SparkSession, dir: String): DataFrame = {
    val cents = Similarity.kmeansCentroids(s, corpus(s, dir), "embedding", 16)
    Similarity.ivfTopKWith(s, queries(s, dir, 10),
        corpus(s, dir).filter(col("label") === 3), k = 5, cents)
      .orderBy("query_id", "rank")
  }

  /** DuckDB re-trains the full-corpus IVF index (shared CTEs) and
    * replays the filtered read path: 4-cell probes, cell-join
    * candidates restricted to the predicate rows, exact rescoring,
    * (score desc, neighbor asc) top-5 — certifying that the filter
    * composes with every index approximation bit-for-bit.
    */
  private val annIvfFilteredSql =
    s"""$ivfIndexCtes,
       |cand AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    round(list_cosine_similarity(p.qe, a.e), 6) AS score
       |  FROM probe p JOIN asn a USING (cell)
       |  JOIN embeddings al ON al.vec_id = a.vec_id
       |  WHERE p.query_id <> a.vec_id AND al.label = 3),
       |r AS (
       |  SELECT query_id, neighbor_id, score,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
       |  FROM cand)
       |SELECT query_id, neighbor_id, rank, score FROM r
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Hard-negative mining routed through the IVF index — the shape
    * that scales to every-doc-as-anchor (see
    * [[Similarity.ivfHardNegatives]]); 50 anchors here, candidates
    * bounded by the 4 probed cells each.
    */
  private def hardNegativesIvf(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfHardNegatives(s,
      queriesWithLabel(s, dir, 50).withColumnRenamed("label", "qlabel"),
      corpus(s, dir), k = 5)
      .orderBy("query_id", "rank")

  /** DuckDB re-trains the same IVF index (shared CTEs) and replays
    * the mining read path: labeled 4-cell probes, cell-join candidate
    * generation with self/same-label exclusion, exact rescoring, and
    * the (score desc, neg asc) top-5 — the whole approximate pipeline
    * certified bit-for-bit, not just row counts.
    */
  private val hardNegativesIvfSql =
    s"""$ivfIndexCtes,
       |aprobe AS (
       |  SELECT query_id, qe, qlabel, cell FROM (
       |    SELECT q.vec_id AS query_id, q.e AS qe, l.label AS qlabel, c.cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY round(list_cosine_similarity(q.e, c.c), 6) DESC, c.cell DESC) AS rn
       |    FROM v q JOIN embeddings l ON l.vec_id = q.vec_id
       |    CROSS JOIN c2 c WHERE q.vec_id < 50) WHERE rn <= 4),
       |cand AS (
       |  SELECT p.query_id, a.vec_id AS neg_id,
       |    round(list_cosine_similarity(p.qe, a.e), 6) AS score
       |  FROM aprobe p JOIN asn a USING (cell)
       |  JOIN embeddings al ON al.vec_id = a.vec_id
       |  WHERE p.query_id <> a.vec_id AND al.label <> p.qlabel),
       |r AS (
       |  SELECT query_id, neg_id, score,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neg_id) AS rank
       |  FROM cand)
       |SELECT query_id, neg_id, CAST(rank AS INT) AS rank, score FROM r
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  private def annIvfPq(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfPqTopK(s, queries(s, dir, 10), corpus(s, dir), k = 5)
      .orderBy("query_id", "rank")

  /** DuckDB re-trains the ENTIRE IVF-PQ index and replays the read
    * path on top of the shared IVF CTEs: the 16 hash-picked PQ seeds
    * (smallest md5(vec_id) 48-bit prefix — same `conv(substring(md5))`
    * key as the Scala side), two per-subspace Lloyd's rounds (encode =
    * nearest-L2 sub-centroid with an ordered left-fold distance and
    * lowest-code tie-break; re-center = exact BIGINT sums of
    * 1e-4-quantized components, emptied codes inherit), the final
    * encode, the query ADC lookup tables (ordered-fold dot products),
    * ADC scoring as an mi-ordered 8-term fold (matching `PqAdc`'s
    * ascending loop), the (adc desc, neighbor asc) top-64 shortlist,
    * exact-cosine rescoring, and the final top-5. Every float op is a
    * correctly-rounded IEEE add/mul/div in a deterministic order, so
    * the full compression→score→rerank pipeline is certified
    * bit-for-bit.
    */
  private val annIvfPqSql = {
    val Sub = 8   // components per subspace (dim 64 / numSub 8)
    val NSub = 8  // subspaces
    val NCodes = 16
    // encode under codebook `cb(mi, c, comps)`: nearest sub-centroid
    // by L2, distance = ordered left-fold of squared diffs (PqEncode's
    // ascending accumulation), ties -> lowest code
    def pqEncode(cb: String, name: String): String =
      s"""$name AS (
         |  SELECT vec_id, mi, c FROM (
         |    SELECT v.vec_id, cb.mi, cb.c,
         |      row_number() OVER (PARTITION BY v.vec_id, cb.mi
         |        ORDER BY list_reduce(
         |          list_transform(range(1, ${Sub + 1}),
         |            i -> (cb.comps[i] - v.e[cb.mi*$Sub + i]) * (cb.comps[i] - v.e[cb.mi*$Sub + i])),
         |          (a, x) -> a + x) ASC, cb.c ASC) AS rn
         |    FROM v CROSS JOIN $cb cb) WHERE rn = 1)"""
    // re-center: exact quantized BIGINT sums per (mi, c, pos); a code
    // with no assigned subvectors keeps `prev`'s sub-centroid. The PQ
    // codebook stays DOUBLE (no float round-trip — unlike the IVF
    // centroids, the Scala side never casts these to Float)
    def pqRecenter(enc: String, prev: String, name: String): String =
      s"""$name AS (
         |  SELECT p.mi, p.c, coalesce(n.comps, p.comps) AS comps
         |  FROM $prev p LEFT JOIN (
         |    SELECT mi, c, list(CAST(qs AS DOUBLE) / (cnt * 10000.0) ORDER BY pos) AS comps
         |    FROM (
         |      SELECT en.mi, en.c, u.pos,
         |        sum(CAST(floor(u.x * 10000 + 0.5) AS BIGINT)) AS qs, count(*) AS cnt
         |      FROM $enc en JOIN (
         |        SELECT vec_id, unnest(range(0, ${NSub * Sub})) AS pos, unnest(e) AS x FROM v) u
         |        ON en.vec_id = u.vec_id AND en.mi = u.pos // $Sub
         |      GROUP BY 1, 2, 3)
         |    GROUP BY mi, c) n ON p.mi = n.mi AND p.c = n.c)"""
    s"""$ivfIndexCtes,
       |pqseed AS (
       |  SELECT CAST(row_number() OVER (ORDER BY hk, vec_id) - 1 AS INT) AS c, e
       |  FROM (SELECT vec_id, e,
       |          ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 12))::BIGINT AS hk
       |        FROM v ORDER BY hk, vec_id LIMIT $NCodes)),
       |cb0 AS (
       |  SELECT mi, c, e[mi*$Sub + 1 : mi*$Sub + $Sub] AS comps
       |  FROM pqseed CROSS JOIN (SELECT unnest(range(0, $NSub)) AS mi)),
       |${pqEncode("cb0", "penc1")},
       |${pqRecenter("penc1", "cb0", "cb1")},
       |${pqEncode("cb1", "penc2")},
       |${pqRecenter("penc2", "cb1", "cb2")},
       |${pqEncode("cb2", "pencf")},
       |lut AS (
       |  SELECT p.query_id, cb.mi, cb.c,
       |    list_reduce(list_transform(range(1, ${Sub + 1}),
       |        i -> cb.comps[i] * p.qe[cb.mi*$Sub + i]),
       |      (a, x) -> a + x) AS dot
       |  FROM (SELECT DISTINCT query_id, qe FROM probe) p CROSS JOIN cb2 cb),
       |adcp AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    list_reduce(list(l.dot ORDER BY l.mi), (a, x) -> a + x) AS adc
       |  FROM probe p
       |  JOIN asn a USING (cell)
       |  JOIN pencf pc ON pc.vec_id = a.vec_id
       |  JOIN lut l ON l.query_id = p.query_id AND l.mi = pc.mi AND l.c = pc.c
       |  WHERE p.query_id <> a.vec_id
       |  GROUP BY 1, 2),
       |short AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rn
       |    FROM adcp) WHERE rn <= 64),
       |resc AS (
       |  SELECT s.query_id, s.neighbor_id,
       |    round(list_cosine_similarity(q.qe, c.e), 6) AS score
       |  FROM short s
       |  JOIN v c ON c.vec_id = s.neighbor_id
       |  JOIN (SELECT DISTINCT query_id, qe FROM probe) q ON q.query_id = s.query_id),
       |r AS (
       |  SELECT query_id, neighbor_id, score,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
       |  FROM resc)
       |SELECT query_id, neighbor_id, rank, score FROM r
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  // -- multimodal plumbing (decode stub; featurization oracled) ------------

  /** The gate output recovers INTEGER quantities from the stub's
    * float features (count = round(ratio · n) is exact while
    * n · count < 2^23), so the DuckDB compare is immune to
    * float-vs-double rounding at .xx5 boundaries while still
    * verifying the whole mapPartitions decode path: payload length,
    * byte sum (mean·n), class counts (ratio·n), first/last byte.
    */
  private def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthesizeMedia(Tables.parallel(Tables.documents(s, dir)))
    def f(i: Int) = element_at(col("features"), i).cast("double")
    Multimodal.extractFeatures(s, media)
      .select(col("doc_id"),
        f(1).cast("long").as("n_bytes"),
        round(f(2) * f(1)).cast("long").as("byte_sum"),
        round(f(4) * f(1)).cast("long").as("n_vowels"),
        round(f(5) * f(1)).cast("long").as("n_spaces"),
        round(f(6) * f(1)).cast("long").as("n_digits"),
        f(7).cast("long").as("first_byte"),
        f(8).cast("long").as("last_byte"))
      .orderBy("doc_id")
  }

  /** DuckDB recomputes the stub features from the same UTF-8 payload
    * (documents are pure ASCII, so `ascii(c)` IS the byte value).
    */
  private val mediaFeaturesSql =
    """SELECT doc_id,
      |  CAST(strlen(text) AS BIGINT) AS n_bytes,
      |  CAST(list_sum([ascii(c)::BIGINT FOR c IN string_split(text, '')]) AS BIGINT) AS byte_sum,
      |  CAST(strlen(text) - strlen(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS n_vowels,
      |  CAST(strlen(text) - strlen(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
      |  CAST(strlen(text) - strlen(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
      |  CAST(ascii(left(text, 1)) AS BIGINT) AS first_byte,
      |  CAST(ascii(right(text, 1)) AS BIGINT) AS last_byte
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Frame sampling over the synthesized media column
    * ([[Multimodal.sampleFrames]]): 64-byte frames, every 4th kept.
    * The oracle recomputes each sampled frame's checksum from the
    * same ASCII payload with `substr` — verifying slicing bounds,
    * sampling cadence, and the per-frame fold end to end.
    */
  private def mediaFrameSample(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthesizeMedia(Tables.parallel(Tables.documents(s, dir)))
    Multimodal.sampleFrames(media, stride = 64, every = 4)
      .orderBy("doc_id", "frame_idx")
  }

  private val mediaFrameSampleSql =
    """WITH fr AS (
      |  SELECT doc_id, text AS s,
      |    unnest(range(0, GREATEST(CAST(ceil(strlen(text) / 64.0) AS INT), 1))) AS frame_idx
      |  FROM documents)
      |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      |  CAST(strlen(sub) AS BIGINT) AS frame_len,
      |  CAST(coalesce(list_sum([ascii(c)::BIGINT FOR c IN string_split(sub, '')]), 0) AS BIGINT) AS frame_checksum
      |FROM (SELECT doc_id, frame_idx,
      |        substr(s, CAST(frame_idx * 64 + 1 AS INT), 64) AS sub
      |      FROM fr WHERE frame_idx % 4 = 0)
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** Multimodal near-dup detection over the BINARY media column via
    * the perceptual-hash stub ([[Multimodal.perceptualHash]] — aHash
    * block signature standing in for decode+DCT): near-identical
    * payloads land within hamming τ=6 and surface as pairs through
    * the SAME 4×16-bit banded LSH join the text/embedding dedups use
    * (any equal band → candidate; only (doc, band) longs shuffle, the
    * payload never leaves its scan). The gate decorates ~1/13 of docs
    * with 2-byte in-place mutations (length-preserving, so block
    * boundaries hold) as near-dup clones. FULLY hash-oracled: DuckDB
    * recomputes every block sum, threshold bit, band key, candidate
    * join, and hamming distance from the same ASCII payload —
    * certifying the whole approximate pipeline, not just row counts.
    */
  /** Banded-phash candidate pairs with hamming ≤ 6 — shared by the
    * pair gate and the media cluster decision. */
  private def phashPairs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.parallel(Tables.documents(s, dir))
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars").map(col)
    val clones = d.filter(col("doc_id") % 13 === 0 && length(col("text")) >= 7)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(substring(col("text"), 1, 4), lit("zz"), expr("substring(text, 7)")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    // cached: the band frame feeds BOTH sides of the candidate join —
    // without it every signature computes twice more
    val sigs = graft.Caches.register(Multimodal.perceptualHash(
      Multimodal.synthesizeMedia(d.select(cols: _*).unionByName(clones))))
    val bands = sigs.select(col("doc_id"), col("phash"), expr(
        "explode(array(" +
          "struct(0 AS band, CAST(phash % 65536 AS BIGINT) AS bv), " +
          "struct(1 AS band, CAST((phash DIV 65536) % 65536 AS BIGINT) AS bv), " +
          "struct(2 AS band, CAST((phash DIV 4294967296) % 65536 AS BIGINT) AS bv), " +
          "struct(3 AS band, CAST(phash DIV 281474976710656 AS BIGINT) AS bv))) AS bb"))
      .select(col("doc_id"), col("phash"), col("bb.band").as("band"), col("bb.bv").as("bv"))
    val left = bands.select(col("doc_id").as("doc_a"), col("phash").as("ha"),
      col("band"), col("bv"))
    val right = bands.select(col("doc_id").as("doc_b"), col("phash").as("hb"),
      col("band"), col("bv"))
    left.join(right, Seq("band", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "ha", "hb").distinct()
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(bit_count(ha ^ hb) AS INT)").as("hamming"))
      .filter(col("hamming") <= 6)
  }

  private def mediaPhashDedup(s: SparkSession, dir: String): DataFrame =
    phashPairs(s, dir).orderBy("doc_a", "doc_b")

  /** Media near-dup CLUSTERS: connected components over the banded
    * phash pairs — the decision layer for binary media, the same
    * large-star/small-star-capable component machinery the text
    * near-dups use (one keep per cluster downstream). Oracle replays
    * the full phash pipeline and closes components with a recursive
    * CTE. Components close via large-star/small-star contraction —
    * O(log²) shuffle rounds regardless of cluster diameter.
    */
  private def mediaDedupClusters(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.connectedComponentsLSS(
        phashPairs(s, dir).select(col("doc_a"), col("doc_b")))
      .orderBy("doc_id")

  // CTE chain through `cand(doc_a, doc_b, ha, hb)` — the full phash
  // pipeline replay, shared by the pair and cluster oracles
  private val phashCandCtes =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, substr(text, 1, 4) || 'zz' || substr(text, 7)
      |  FROM documents WHERE doc_id % 13 = 0 AND strlen(text) >= 7),
      |s1 AS (
      |  SELECT doc_id, text, GREATEST((strlen(text) + 62) // 63, 1) AS bl
      |  FROM corpus),
      |s2 AS (
      |  SELECT doc_id,
      |    [coalesce(list_sum([ascii(c)::BIGINT FOR c IN
      |       string_split(substr(text, CAST(j * bl + 1 AS INT), CAST(bl AS INT)), '')]), 0)
      |     FOR j IN range(0, 63)] AS sums
      |  FROM s1),
      |sig AS (
      |  SELECT doc_id,
      |    CAST(list_sum([CASE WHEN sums[j + 1] > sums[j + 2]
      |      THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END
      |      FOR j IN range(0, 62)]) AS BIGINT) AS phash
      |  FROM s2),
      |bands AS (
      |  SELECT doc_id, phash, 0 AS band, phash % 65536 AS bv FROM sig
      |  UNION ALL SELECT doc_id, phash, 1, (phash // 65536) % 65536 FROM sig
      |  UNION ALL SELECT doc_id, phash, 2, (phash // 4294967296) % 65536 FROM sig
      |  UNION ALL SELECT doc_id, phash, 3, phash // 281474976710656 FROM sig),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    a.phash AS ha, b.phash AS hb
      |  FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv
      |    AND a.doc_id < b.doc_id)""".stripMargin

  private val mediaPhashDedupSql =
    s"""WITH $phashCandCtes
       |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(ha, hb)) <= 6
       |ORDER BY doc_a, doc_b""".stripMargin

  private val mediaDedupClustersSql =
    s"""WITH RECURSIVE $phashCandCtes,
       |p AS (
       |  SELECT doc_a, doc_b FROM cand
       |  WHERE bit_count(xor(ha, hb)) <= 6),
       |${graft.ops.Dedup.componentClosureSql}
       |${graft.ops.Dedup.componentSelectSql}""".stripMargin

  // -- JL random projection (dim reduction) --------------------------------

  /** 64→16 JL projection of every corpus vector, verified value by
    * value: the projected array explodes to (vec_id, dim_j, val) rows
    * and the oracle recomputes each dot product from the SAME plane
    * literals ([[Similarity.projectionPlanes]]) — the compiled
    * [[graft.functions.RandomProjection]] kernel accumulates in
    * ascending component order, matching DuckDB's list_dot_product
    * fold, so raw IEEE doubles agree before the 6 dp round.
    */
  private def embedProject(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    corpus(s, dir)
      .select(col("vec_id"),
        posexplode(call_function("graft_random_project", col("embedding"), lit(Dim))))
      .select(col("vec_id"), col("pos").as("dim_j"),
        round(col("col"), 6).as("val"))
      .orderBy("vec_id", "dim_j")
  }

  private val embedProjectSql = {
    val branches = Similarity.projectionPlanes(Dim).zipWithIndex.map { case (row, j) =>
      val lits = row.map(java.lang.Double.toString).mkString("[", ",", "]")
      s"SELECT vec_id, $j AS dim_j, round(list_dot_product(e, $lits::DOUBLE[]), 6) AS val FROM v"
    }.mkString("\nUNION ALL\n")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
       |$branches
       |ORDER BY vec_id, dim_j""".stripMargin
  }

  // -- project-then-rescore ANN --------------------------------------------

  /** ANN through the JL projection: shortlist of 50 by projected
    * cosine (16-dim compiled scoring — ¼ the flops/bytes of the full
    * scan), exact rescore of the shortlist, top-5. The oracle replays
    * projection, shortlist selection (rounded score + vec_id
    * tie-break), rescoring, and ranking — certifying the approximate
    * pipeline bit-for-bit, like ann_lsh/ann_ivf.
    */
  private def annProject(s: SparkSession, dir: String): DataFrame =
    Similarity.projectTopK(s, queries(s, dir, 10), corpus(s, dir),
        dim = Dim, r = 50, k = 5)
      .orderBy("query_id", "rank")

  private val annProjectSql = {
    val projList = (e: String) => Similarity.projectionPlanes(Dim).map { row =>
      val lits = row.map(java.lang.Double.toString).mkString("[", ",", "]")
      s"list_dot_product($e, $lits::DOUBLE[])"
    }.mkString("[", ",\n      ", "]")
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
       |  FROM embeddings WHERE vec_id < 10),
       |c AS (SELECT vec_id, embedding::DOUBLE[] AS ce FROM embeddings),
       |qp AS (SELECT query_id, qe, ${projList("qe")} AS qproj FROM q),
       |cp AS (SELECT vec_id, ce, ${projList("ce")} AS cproj FROM c),
       |s AS (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    round(list_cosine_similarity(qproj, cproj), 6) AS pscore
       |  FROM qp CROSS JOIN cp WHERE query_id <> vec_id),
       |short AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY pscore DESC, neighbor_id)
       |      AS prank
       |  FROM s),
       |resc AS (
       |  SELECT sh.query_id, sh.neighbor_id,
       |    round(list_cosine_similarity(q2.qe, c2.ce), 6) AS score
       |  FROM short sh
       |  JOIN qp q2 ON q2.query_id = sh.query_id
       |  JOIN cp c2 ON c2.vec_id = sh.neighbor_id
       |  WHERE sh.prank <= 50),
       |r AS (
       |  SELECT query_id, neighbor_id, score,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id)
       |      AS rank
       |  FROM resc)
       |SELECT query_id, neighbor_id, rank, score FROM r
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  // -- recall evaluation -----------------------------------------------------

  /** Recall@5 of the IVF read path against exact brute force, as an
    * ORACLE-CERTIFIED gate: per query, how many of the exact top-5
    * neighbors the 4-probe IVF serve returns. Recall is the number an
    * ANN deployment actually negotiates (probes vs accuracy) — here
    * the accuracy/speed tradeoff itself is part of the cross-engine
    * contract (DuckDB re-trains the index AND re-ranks brute force),
    * not just a ScalaTest assertion. Integer hit counts — no float in
    * the output.
    */
  private def annRecallEval(s: SparkSession, dir: String): DataFrame = {
    val cents = Similarity.kmeansCentroids(s, corpus(s, dir), "embedding", 16)
    val ivf = Similarity.ivfTopKWith(s, queries(s, dir, 10), corpus(s, dir), k = 5, cents)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    val brute = Similarity.bruteForceTopK(s, queries(s, dir, 10), corpus(s, dir), k = 5)
      .select(col("query_id"), col("neighbor_id"))
    brute.join(ivf, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits_at_5"))
      .orderBy("query_id")
  }

  private val annRecallEvalSql =
    s"""$ivfIndexCtes,
       |icand AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    round(list_cosine_similarity(p.qe, a.e), 6) AS score
       |  FROM probe p JOIN asn a USING (cell)
       |  WHERE p.query_id <> a.vec_id),
       |ivf AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
       |    FROM icand) WHERE rank <= 5),
       |brute AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY round(list_cosine_similarity(q.e, a.e), 6) DESC, a.vec_id) AS rank
       |    FROM v q CROSS JOIN v a WHERE q.vec_id < 10 AND q.vec_id <> a.vec_id)
       |  WHERE rank <= 5)
       |SELECT b.query_id, CAST(count(i.neighbor_id) AS BIGINT) AS hits_at_5
       |FROM brute b LEFT JOIN ivf i
       |  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("ann_recall_eval", annRecallEval, Some(annRecallEvalSql)),
    QueryDef("embed_project", embedProject, Some(embedProjectSql)),
    QueryDef("ann_project_topk", annProject, Some(annProjectSql)),
    QueryDef("ann_bruteforce_topk", annBrute, Some(annBruteSql)),
    QueryDef("knn_join", knnJoin, Some(knnJoinSql)),
    QueryDef("dedup_embedding", embedNearDup, Some(embedNearDupSql)),
    QueryDef("dedup_semantic", dedupSemantic, Some(dedupSemanticSql)),
    QueryDef("docs_cluster_topics", clusterTopics, Some(clusterTopicsSql)),
    QueryDef("embed_quantize", embedQuantize, Some(embedQuantizeSql)),
    QueryDef("ann_lsh_topk", annLsh, Some(annLshSql)),
    QueryDef("ann_ivf_topk", annIvf, Some(annIvfSql)),
    QueryDef("ann_ivf_filtered_topk", annIvfFiltered, Some(annIvfFilteredSql)),
    QueryDef("ann_stream_topk", annStream, Some(annIvfSql)),
    QueryDef("embed_hard_negatives_ivf", hardNegativesIvf, Some(hardNegativesIvfSql)),
    QueryDef("ann_ivfpq_topk", annIvfPq, Some(annIvfPqSql)),
    QueryDef("media_features", mediaFeatures, Some(mediaFeaturesSql)),
    QueryDef("media_frame_sample", mediaFrameSample, Some(mediaFrameSampleSql)),
    QueryDef("media_phash_dedup", mediaPhashDedup, Some(mediaPhashDedupSql)),
    QueryDef("media_dedup_clusters", mediaDedupClusters, Some(mediaDedupClustersSql)),
  )
}
