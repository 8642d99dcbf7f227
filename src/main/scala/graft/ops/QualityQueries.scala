package graft.ops

import graft.{QueryDef, QueryModule}
import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-quality query block: span-level dedup (the CCNet
  * paragraph-dedup shape adapted to single-line documents), duplicate-
  * aware soft-dedup reweighting, Gopher-style quality rules, and
  * radius (range) similarity search.
  *
  * Scale design notes are on each operator; the common theme is that
  * dedup decisions travel as longs — the document text never leaves
  * its scan except for the one reconstruction join that must deliver
  * cleaned text.
  */
object QualityQueries extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.parallel(Tables.documents(s, dir))

  // -- span-level dedup (CCNet paragraph dedup, span = word window) --------

  /** Span width in words. CCNet dedups at paragraph granularity; the
    * synthetic corpus is single-line, so the unit of dedup is a fixed
    * word window — the same remove-duplicated-units-keep-the-rest
    * semantics at a granularity that actually repeats here.
    */
  private val SpanWords = 4

  /** Packs (doc_id, span_idx) into one long so the per-span winner is
    * a plain `min` — span_idx is bounded far below the packing base
    * (a 1e6-word doc at 4-word spans).
    */
  private val PackBase = 1000000L

  private def wordsCol: Column = split(col("text"), " ")

  private def nSpansCol: Column =
    ceil(size(wordsCol) / lit(SpanWords.toDouble)).cast("long")

  private def spanAt(ws: Column, i: Column): Column =
    concat_ws(" ", slice(ws, (i * SpanWords + 1).cast("int"), lit(SpanWords)))

  /** (doc_id, span_idx, h) — one row per span, hashes computed INSIDE
    * the document scan via a single array transform, so only longs
    * ever shuffle. xxhash64 stands in for span equality (a collision
    * needs ~2^32 distinct spans to become likely; at that corpus size
    * the LSH dedup family is the tool, not exact spans).
    */
  private def spanHashes(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
        col("doc_id"),
        posexplode(transform(sequence(lit(0L), nSpansCol - 1),
          i => xxhash64(spanAt(wordsCol, i)))))
      .toDF("doc_id", "span_idx", "h")

  /** Corpus-wide span dedup keeping first occurrence (doc_id, then
    * span position): duplicated spans are REMOVED from later docs and
    * the cleaned text is reconstructed from the surviving spans.
    *
    * 100 TB shape: the winner-per-hash aggregation and the kept-index
    * list both carry only longs; the full text moves exactly once, in
    * the final reconstruction join keyed by doc_id (and that join is
    * unavoidable — it produces the cleaned text).
    */
  private def spanDedup(s: SparkSession, dir: String): DataFrame = {
    val packed = spanHashes(s, dir)
      .select(col("h"), (col("doc_id") * PackBase + col("span_idx")).as("k"))
    val keptIdx = packed.groupBy("h").agg(min(col("k")).as("wk"))
      .select(expr(s"wk div $PackBase").as("doc_id"),
        pmod(col("wk"), lit(PackBase)).cast("int").as("span_idx"))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(col("span_idx"))).as("keep"))
    docs(s, dir).join(keptIdx, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        array_join(transform(
          coalesce(col("keep"), array().cast("array<int>")),
          i => spanAt(wordsCol, i)), " ").as("clean_text"),
        nSpansCol.as("n_spans"),
        (nSpansCol - size(coalesce(col("keep"), array().cast("array<int>"))))
          .as("dropped_spans"))
      .orderBy("doc_id")
  }

  private val spanDedupSql =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |s AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS span_idx,
       |    array_to_string(list_slice(ws, i * $SpanWords + 1,
       |      least((i + 1) * $SpanWords, len(ws))), ' ') AS span
       |  FROM w, unnest(range((len(ws) + ${SpanWords - 1}) // $SpanWords)) AS t(i)),
       |win AS (
       |  SELECT span, min(doc_id * $PackBase + span_idx) AS wk
       |  FROM s GROUP BY span),
       |kp AS (SELECT wk // $PackBase AS doc_id, wk % $PackBase AS span_idx FROM win),
       |cln AS (
       |  SELECT s.doc_id,
       |    string_agg(s.span, ' ' ORDER BY s.span_idx) AS clean_text,
       |    count(*) AS kept
       |  FROM s JOIN kp ON s.doc_id = kp.doc_id AND s.span_idx = kp.span_idx
       |  GROUP BY s.doc_id),
       |tot AS (SELECT doc_id, count(*) AS n_spans FROM s GROUP BY doc_id)
       |SELECT t.doc_id, coalesce(c.clean_text, '') AS clean_text,
       |  CAST(t.n_spans AS BIGINT) AS n_spans,
       |  CAST(t.n_spans - coalesce(c.kept, 0) AS BIGINT) AS dropped_spans
       |FROM tot t LEFT JOIN cln c ON t.doc_id = c.doc_id
       |ORDER BY t.doc_id""".stripMargin

  // -- soft dedup: duplicate-aware reweighting -----------------------------

  /** SoftDeDup-style reweighting: instead of dropping near-duplicate
    * content, each document is down-weighted by how common its spans
    * are corpus-wide — the sampling weight is the mean inverse span
    * frequency. Kept integer-exact as micro-units (1e6 div freq,
    * summed) so the artifact hash is engine-independent; the double
    * `weight` is one exact-int division, deterministic on both sides.
    *
    * 100 TB shape: span frequency is a long-only aggregation; no text
    * leaves the scan at all (weights don't need reconstruction).
    */
  private def softDedup(s: SparkSession, dir: String): DataFrame = {
    val spans = spanHashes(s, dir).select("doc_id", "h")
    val freq = spans.groupBy("h").agg(count(lit(1)).as("c"))
    spans.join(freq, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(expr(s"${PackBase} div c")).as("inv_sum_micro"))
      .select(col("doc_id"), col("n_spans"), col("inv_sum_micro"),
        round(col("inv_sum_micro") / (col("n_spans") * lit(PackBase.toDouble)), 6)
          .as("weight"))
      .orderBy("doc_id")
  }

  private val softDedupSql =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |s AS (
       |  SELECT doc_id,
       |    array_to_string(list_slice(ws, i * $SpanWords + 1,
       |      least((i + 1) * $SpanWords, len(ws))), ' ') AS span
       |  FROM w, unnest(range((len(ws) + ${SpanWords - 1}) // $SpanWords)) AS t(i)),
       |f AS (SELECT span, count(*) AS c FROM s GROUP BY span)
       |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       |  CAST(sum($PackBase // f.c) AS BIGINT) AS inv_sum_micro,
       |  round(CAST(sum($PackBase // f.c) AS DOUBLE)
       |        / (count(*) * $PackBase.0), 6) AS weight
       |FROM s JOIN f ON s.span = f.span
       |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin

  // -- Gopher quality rules ------------------------------------------------

  /** The Gopher corpus-filter rule family (word-count bounds, mean
    * word length band, minimum stopword evidence, repetition cap),
    * evaluated per document with integer-exact comparisons. The
    * repetition rule (top word ≤ 20% of words) compares `top_cnt * 5
    * <= n_words` so no float threshold leaks into the flags.
    *
    * 100 TB shape: pure column expressions inside the scan — zero
    * shuffles; the per-doc top-word count is an array fold bounded by
    * the doc's distinct-word count.
    */
  private def gopherRules(s: SparkSession, dir: String): DataFrame = {
    val ws = TextAnalysis.words(col("text"))
    val nWords = TextAnalysis.wordCount(col("text"))
    val mean = TextAnalysis.wordCharSum(col("text")).cast("double") / nWords
    val stopHits = size(array_intersect(array_distinct(ws),
      typedLit(TextAnalysis.StopWords)))
    val topCnt = array_max(transform(array_distinct(ws),
      w => size(filter(ws, x => x === w))))
    docs(s, dir).select(
        col("doc_id"), nWords.as("n_words"),
        round(mean, 4).as("mean_word_len"),
        stopHits.as("stop_hits"), topCnt.as("top_cnt"),
        (nWords >= 50 && nWords <= 100000).as("pass_words"),
        (mean >= 3.0 && mean <= 10.0).as("pass_mean"),
        (stopHits >= 2).as("pass_stop"),
        (topCnt * 5 <= nWords).as("pass_rep"))
      .withColumn("pass_all",
        col("pass_words") && col("pass_mean") && col("pass_stop") && col("pass_rep"))
      .orderBy("doc_id")
  }

  private val gopherRulesSql = {
    val stopList = TextAnalysis.StopWords.map(w => s"'$w'").mkString(", ")
    s"""WITH w AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, len(ws) AS n_words,
       |    CAST(list_aggregate(list_transform(ws, x -> len(x)), 'sum') AS BIGINT) AS char_sum,
       |    len(list_filter(list_distinct(ws), x -> x IN ($stopList))) AS stop_hits,
       |    list_aggregate(list_transform(list_distinct(ws),
       |      w -> len(list_filter(ws, x -> x = w))), 'max') AS top_cnt
       |  FROM w)
       |SELECT doc_id, n_words,
       |  round(CAST(char_sum AS DOUBLE) / n_words, 4) AS mean_word_len,
       |  stop_hits, top_cnt,
       |  n_words >= 50 AND n_words <= 100000 AS pass_words,
       |  CAST(char_sum AS DOUBLE) / n_words >= 3.0
       |    AND CAST(char_sum AS DOUBLE) / n_words <= 10.0 AS pass_mean,
       |  stop_hits >= 2 AS pass_stop,
       |  top_cnt * 5 <= n_words AS pass_rep,
       |  (n_words >= 50 AND n_words <= 100000)
       |    AND (CAST(char_sum AS DOUBLE) / n_words >= 3.0
       |         AND CAST(char_sum AS DOUBLE) / n_words <= 10.0)
       |    AND stop_hits >= 2 AND top_cnt * 5 <= n_words AS pass_all
       |FROM f ORDER BY doc_id""".stripMargin
  }

  // -- radius (range) similarity search ------------------------------------

  /** All corpus neighbors within a cosine radius of each anchor —
    * the similarity-search dual of top-k (fixed quality bar instead
    * of fixed result count; the shape used for near-duplicate audits
    * and retrieval cutoffs).
    *
    * 100 TB shape: anchors broadcast, corpus never shuffles, the
    * radius predicate filters inside the scan — output is bounded by
    * the radius, not the corpus.
    */
  private val Radius = 0.25

  private def rangeSearch(s: SparkSession, dir: String): DataFrame = {
    val anchors = Tables.embeddings(s, dir).filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    Tables.parallel(Tables.embeddings(s, dir))
      .join(broadcast(anchors), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(Similarity.cosine(s, col("qe"), col("embedding")), 6).as("score"))
      .filter(col("score") >= Radius)
      .orderBy("query_id", "neighbor_id")
  }

  private val rangeSearchSql =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
       |  FROM embeddings WHERE vec_id < 8),
       |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS ce FROM embeddings)
       |SELECT query_id, neighbor_id,
       |  round(list_cosine_similarity(qe, ce), 6) AS score
       |FROM q CROSS JOIN c
       |WHERE query_id <> neighbor_id
       |  AND round(list_cosine_similarity(qe, ce), 6) >= $Radius
       |ORDER BY query_id, neighbor_id""".stripMargin

  // -- exact set-similarity join via prefix filtering (PPJoin) -------------

  /** Exact trigram-Jaccard self-join at τ = 0.8 with PREFIX-FILTER
    * candidates — the database-literature EXACT alternative to the
    * MinHash/LSH family (Chaudhuri/Ganti/Kaushik's SSJoin, Xiao's
    * PPJoin): order every doc's gram set by ascending global
    * frequency (rarest first); two sets with Jaccard ≥ τ MUST share a
    * token in their first `sz − ceil(τ·sz) + 1` tokens, so candidates
    * = pairs sharing any PREFIX token — no hash families, no recall
    * loss, and the prefix is the RAREST slice of each doc, so bucket
    * sizes stay small exactly where LSH banding would need tuning.
    *
    * 100 TB shape: grams hash to 48-bit md5 longs at the scan (text
    * never shuffles); the global frequency rank rides the distributed
    * [[PrefixSum]] (vocabulary-level); candidates and verification
    * move (doc, rank) longs only, with the exact intersection on the
    * compiled sorted-merge kernel. The τ cut is the integer
    * cross-multiplication `5·|∩| ≥ 4·|∪|` — no float thresholds.
    *
    * Every 10th doc is decorated with a 2-words-dropped clone so the
    * ≥ τ band is populated at every SF (the dedup-gate convention);
    * the oracle replays the decoration.
    */
  private def ppjoin(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.{Dedup, PrefixSum}
    graft.functions.GraftFunctions.register(s)
    val base = docs(s, dir).select(col("doc_id"), col("text"))
    val clones = base.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s+\\S+\\s+", "").as("text"))
    val corpus = base.unionByName(clones)
    // cached: grams feeds BOTH the vocabulary rank and the per-doc
    // token arrays — uncached, the explode+md5+distinct (the query's
    // dominant stage) evaluates twice
    val grams = graft.Caches.register(corpus
      .select(col("doc_id"), explode(Dedup.wordShingles(col("text"), 3)).as("g"))
      .select(col("doc_id"),
        conv(substring(md5(col("g")), 1, 12), 16, 10).cast("long").as("h"))
      .distinct())
    val vocab = grams.groupBy("h").agg(count(lit(1)).as("df"))
      .withColumn("_g", lit(1)).withColumn("_one", lit(1L))
    val ranked = PrefixSum.runningTotal(vocab, "_g", Seq("df", "h"), "_one", "rk")
      .select(col("h"), col("rk"))
    val toks = graft.Caches.register(
      grams.join(ranked, "h")
        .groupBy("doc_id").agg(sort_array(collect_list(col("rk"))).as("arr"))
        .withColumn("sz", size(col("arr"))))
    val pref = toks.select(col("doc_id"),
      explode(slice(col("arr"), lit(1),
        (col("sz") - expr("(4 * sz + 4) div 5") + 1).cast("int"))).as("rk"))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.rk") === col("b.rk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    cand
      .join(toks.select(col("doc_id").as("doc_a"), col("arr").as("arr_a"),
        col("sz").as("sz_a")), "doc_a")
      .join(toks.select(col("doc_id").as("doc_b"), col("arr").as("arr_b"),
        col("sz").as("sz_b")), "doc_b")
      .withColumn("inter",
        call_function("graft_sorted_intersect_count", col("arr_a"), col("arr_b")))
      .withColumn("uni", col("sz_a") + col("sz_b") - col("inter"))
      .filter(col("inter") * 5 >= col("uni") * 4)
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") / col("uni"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  private val ppjoinSql =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |    regexp_replace(text, '^\S+\s+\S+\s+', '') AS text
      |  FROM documents WHERE doc_id % 10 = 0),
      |w AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
      |  FROM corpus),
      |sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(ws) >= 3 THEN
      |      list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)])
      |    ELSE [array_to_string(ws, ' ')] END AS gs
      |  FROM w),
      |grams AS (
      |  SELECT DISTINCT doc_id,
      |    ('0x' || substr(md5(g.g), 1, 12))::BIGINT AS h
      |  FROM sh, unnest(gs) AS g(g)),
      |vocab AS (
      |  SELECT h, count(*) AS df,
      |    row_number() OVER (ORDER BY count(*), h) AS rk
      |  FROM grams GROUP BY h),
      |toks AS (
      |  SELECT g.doc_id, list_sort(list(v.rk)) AS arr, count(*) AS sz
      |  FROM grams g JOIN vocab v ON g.h = v.h
      |  GROUP BY g.doc_id),
      |pref AS (
      |  SELECT doc_id, u.rk
      |  FROM toks, unnest(arr[1:(sz - (4 * sz + 4) // 5 + 1)]) AS u(rk)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM pref a JOIN pref b ON a.rk = b.rk AND a.doc_id < b.doc_id),
      |scored AS (
      |  SELECT c.doc_a, c.doc_b,
      |    len(list_intersect(ta.arr, tb.arr)) AS inter_n,
      |    ta.sz + tb.sz - len(list_intersect(ta.arr, tb.arr)) AS union_n
      |  FROM cand c
      |  JOIN toks ta ON ta.doc_id = c.doc_a
      |  JOIN toks tb ON tb.doc_id = c.doc_b)
      |SELECT doc_a, doc_b,
      |  round(CAST(inter_n AS DOUBLE) / union_n, 4) AS jaccard
      |FROM scored WHERE inter_n * 5 >= union_n * 4
      |ORDER BY doc_a, doc_b""".stripMargin

  // -- hard-negative mining for retrieval training -------------------------

  /** Hard-negative mining — the contrastive-training data step for
    * dense retrievers: for each anchor, the top-k most similar
    * corpus vectors with a DIFFERENT label (same-label hits are
    * positives, low-similarity negatives are uninformative; the
    * high-similarity different-label band is what the training batch
    * needs). Anchors broadcast; the corpus never shuffles; the label
    * exclusion filters inside the scan; ranking on the bounded-heap
    * TopK operator.
    */
  private def hardNegatives(s: SparkSession, dir: String): DataFrame = {
    val anchors = Tables.embeddings(s, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("embedding").as("qe"))
    val scored = Tables.parallel(Tables.embeddings(s, dir))
      .join(broadcast(anchors), col("query_id") =!= col("vec_id"))
      .filter(col("label") =!= col("qlabel"))
      .select(col("query_id"), col("vec_id").as("neg_id"),
        round(Similarity.cosine(s, col("qe"), col("embedding")), 6).as("score"))
    graft.plans.TopK.perKey(scored, Seq("query_id"),
        Seq(col("score"), -col("neg_id")), 5)
      .select(col("query_id"), col("neg_id"), col("rank"), col("score"))
      .orderBy("query_id", "rank")
  }

  private val hardNegativesSql =
    """WITH q AS (
      |  SELECT vec_id AS query_id, label AS qlabel, embedding::DOUBLE[] AS qe
      |  FROM embeddings WHERE vec_id < 10),
      |s AS (
      |  SELECT query_id, c.vec_id AS neg_id,
      |    round(list_cosine_similarity(qe, c.embedding::DOUBLE[]), 6) AS score
      |  FROM q JOIN embeddings c
      |    ON c.vec_id <> q.query_id AND c.label <> q.qlabel),
      |r AS (
      |  SELECT query_id, neg_id, score,
      |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neg_id) AS rank
      |  FROM s)
      |SELECT query_id, neg_id, CAST(rank AS INT) AS rank, score FROM r
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  // -- per-source corpus health report -------------------------------------

  /** The corpus-health dashboard a data-curation run publishes per
    * source: volume (docs/words/chars), language spread, exact-dup
    * incidence, and the Gopher pass rate — the composition readout
    * over the signals the individual operators compute. One word-level
    * pass + one exact-dup aggregation, both keyed on bounded `source`;
    * ratios are single exact-int divisions rounded at the edge.
    */
  private def corpusReport(s: SparkSession, dir: String): DataFrame = {
    val ws = TextAnalysis.words(col("text"))
    val nWords = TextAnalysis.wordCount(col("text"))
    val mean = TextAnalysis.wordCharSum(col("text")).cast("double") / nWords
    val stopHits = size(array_intersect(array_distinct(ws),
      typedLit(TextAnalysis.StopWords)))
    val topCnt = array_max(transform(array_distinct(ws),
      w => size(filter(ws, x => x === w))))
    val gopherPass = (nWords >= 50 && nWords <= 100000) &&
      (mean >= 3.0 && mean <= 10.0) && (stopHits >= 2) && (topCnt * 5 <= nWords)
    val d = docs(s, dir)
    val perDoc = d.select(col("doc_id"), col("source"), col("lang"),
      nWords.as("nw"), length(col("text")).as("nc"),
      gopherPass.cast("int").as("gp"), md5(col("text")).as("fp"))
    val dupDocs = perDoc.groupBy("fp").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select(col("fp"))
    val flagged = perDoc.join(dupDocs, Seq("fp"), "left_semi")
      .groupBy("source").agg(count(lit(1)).as("dup_docs"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("nw").as("n_words"),
        sum("nc").as("n_chars"),
        countDistinct("lang").as("n_langs"),
        sum("gp").as("gopher_pass"))
      .join(flagged, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_words"), col("n_chars"),
        col("n_langs"), col("gopher_pass"),
        coalesce(col("dup_docs"), lit(0L)).as("dup_docs"),
        round(col("gopher_pass").cast("double") / col("n_docs"), 4)
          .as("gopher_rate"))
      .orderBy("source")
  }

  private val corpusReportSql = {
    val stopList = TextAnalysis.StopWords.map(w => s"'$w'").mkString(", ")
    s"""WITH w AS (
       |  SELECT doc_id, source, lang, length(text) AS nc, md5(text) AS fp,
       |    regexp_extract_all(lower(text), '[a-z]+') AS ws
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, source, lang, nc, fp, len(ws) AS nw,
       |    CAST(list_aggregate(list_transform(ws, x -> len(x)), 'sum') AS BIGINT) AS cs,
       |    len(list_filter(list_distinct(ws), x -> x IN ($stopList))) AS sh,
       |    list_aggregate(list_transform(list_distinct(ws),
       |      w2 -> len(list_filter(ws, x -> x = w2))), 'max') AS tc
       |  FROM w),
       |g AS (
       |  SELECT *, CASE WHEN nw >= 50 AND nw <= 100000
       |    AND CAST(cs AS DOUBLE) / nw >= 3.0 AND CAST(cs AS DOUBLE) / nw <= 10.0
       |    AND sh >= 2 AND tc * 5 <= nw THEN 1 ELSE 0 END AS gp
       |  FROM f),
       |dups AS (SELECT fp FROM g GROUP BY fp HAVING count(*) > 1),
       |fl AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS dup_docs
       |  FROM g WHERE fp IN (SELECT fp FROM dups) GROUP BY source)
       |SELECT g.source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(nw) AS BIGINT) AS n_words,
       |  CAST(sum(nc) AS BIGINT) AS n_chars,
       |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       |  CAST(sum(gp) AS BIGINT) AS gopher_pass,
       |  coalesce(any_value(fl.dup_docs), 0) AS dup_docs,
       |  round(CAST(sum(gp) AS DOUBLE) / count(*), 4) AS gopher_rate
       |FROM g LEFT JOIN fl ON g.source = fl.source
       |GROUP BY g.source ORDER BY g.source""".stripMargin
  }

  // -- PCA top component via exact-integer power iteration -----------------

  /** PCA's top principal direction over the embedding corpus (the
    * whitening/dim-reduction initializer an embedding pipeline runs
    * before indexing), computed as power iteration on the UNCENTERED
    * second-moment (Gram) matrix with exact integer arithmetic end to
    * end.
    *
    * 100 TB shape: the only data-scaled stage is the Gram
    * aggregation — one pass over the corpus producing Dim² bounded
    * cells (elements quantized `floor(x·10⁴ + ½)`, summed as exact
    * integers, order-independent). The 64×64 matrix collects to the
    * driver (the IVF-centroid bounded-traffic pattern) and the 4
    * power-iteration rounds run in BigInt with truncating division —
    * the SAME integer semantics DuckDB's `//` and HUGEINT sums give,
    * so the resulting eigenvector hash-matches bit for bit with no
    * float accumulation anywhere.
    */
  private val PcaDim = 64
  private val PcaQ = 10000L
  private val PcaIters = 4
  private val PcaWScale = 1000000L

  private def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.parallel(Tables.embeddings(s, dir))
      .select(col("vec_id"),
        expr(s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $PcaQ + 0.5) AS BIGINT))").as("q"))

  /** Gram build + power iteration, memoized per corpus dir: the
    * trained component is shared by the eigenvector gate and the
    * projection gate — training once is the lmMemo pattern (the
    * model lives for the session like the artifact it stands in for).
    */
  private val pcaMemo =
    scala.collection.concurrent.TrieMap.empty[String, Array[BigInt]]

  private def trainedComponent(s: SparkSession, dir: String): Array[BigInt] =
    pcaMemo.getOrElseUpdate(dir, {
      val qv = quantized(s, dir)
      val e1 = qv.select(col("q"), posexplode(col("q"))).toDF("q", "i", "qi")
      val e2 = e1.select(col("i"), col("qi"), posexplode(col("q"))).toDF("i", "qi", "j", "qj")
      val cells = e2.groupBy("i", "j").agg(sum(col("qi") * col("qj")).as("g"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      powerIterate(cells, PcaDim, PcaIters)
    })

  private def pcaPower(s: SparkSession, dir: String): DataFrame = {
    val w = trainedComponent(s, dir)
    import s.implicits._
    w.zipWithIndex.map { case (x, j) => (j, x.toLong) }.toSeq
      .toDF("dim_j", "w").orderBy("dim_j")
  }

  /** The exact-integer power iteration on a collected Gram matrix —
    * BigInt products/sums, truncating division (DuckDB `//`
    * semantics), renormalized to ~[[PcaWScale]] each round.
    */
  private[ops] def powerIterate(cells: Map[(Int, Int), Long], dim: Int,
      iters: Int): Array[BigInt] = {
    var w = Array.fill(dim)(BigInt(PcaWScale))
    for (_ <- 1 to iters) {
      val v = Array.tabulate(dim) { i =>
        (0 until dim).map(j => BigInt(cells.getOrElse((i, j), 0L)) * w(j)).sum
      }
      val scale = (v.map(_.abs).max / PcaWScale).max(BigInt(1))
      w = v.map(_ / scale) // BigInt / truncates toward zero, like DuckDB //
    }
    w
  }

  /** Training CTEs (quantized vectors → Gram cells → unrolled power
    * rounds) shared by the eigenvector gate and the projection gate.
    */
  private val pcaCtes = {
    val base =
      s"""WITH q AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * $PcaQ + 0.5) AS BIGINT)) AS q
         |  FROM embeddings),
         |cell AS (
         |  SELECT ii.i AS i, jj.j AS j,
         |    CAST(sum(q[ii.i + 1] * q[jj.j + 1]) AS HUGEINT) AS g
         |  FROM q, range($PcaDim) ii(i), range($PcaDim) jj(j)
         |  GROUP BY 1, 2),
         |w0 AS (SELECT i AS jdx, CAST($PcaWScale AS HUGEINT) AS w
         |       FROM range($PcaDim) t(i))""".stripMargin
    val rounds = (1 to PcaIters).map { k =>
      s"""v$k AS (
         |  SELECT c.i AS jdx, sum(c.g * w.w) AS v
         |  FROM cell c JOIN w${k - 1} w ON c.j = w.jdx GROUP BY 1),
         |s$k AS (SELECT greatest(max(abs(v)) // $PcaWScale, 1) AS sc FROM v$k),
         |w$k AS (SELECT jdx, v // (SELECT sc FROM s$k) AS w FROM v$k)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  private val pcaPowerSql =
    s"""$pcaCtes
       |SELECT jdx AS dim_j, CAST(w AS BIGINT) AS w FROM w$PcaIters
       |ORDER BY dim_j""".stripMargin

  /** Projection of every vector onto the trained top component — the
    * APPLY half of the PCA pipeline (the score an outlier audit or a
    * whitening pass consumes): exact integer dot of the quantized
    * vector with the integer eigenvector, so ranking ties out bit for
    * bit cross-engine. One corpus scan; the component broadcasts as a
    * literal array.
    */
  private def pcaScores(s: SparkSession, dir: String): DataFrame = {
    val w = trainedComponent(s, dir)
    val wLit = array(w.map(x => lit(x.toLong)): _*)
    quantized(s, dir).select(col("vec_id"),
        aggregate(zip_with(col("q"), wLit, (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("score"))
      .orderBy(abs(col("score")).desc, col("vec_id")).limit(20)
  }

  private val pcaScoresSql =
    s"""$pcaCtes,
       |scores AS (
       |  SELECT q.vec_id, CAST(sum(q.q[jj.j + 1] * w.w) AS BIGINT) AS score
       |  FROM q, range($PcaDim) jj(j) JOIN w$PcaIters w ON w.jdx = jj.j
       |  GROUP BY q.vec_id)
       |SELECT vec_id, score FROM scores
       |ORDER BY abs(score) DESC, vec_id LIMIT 20""".stripMargin

  // -- learned quality classifier (CCNet/fastText filter shape) -----------

  /** Train a word-count linear classifier on weak labels and score
    * the whole corpus — the CCNet/fastText quality-filter shape
    * (train on "looks like the target distribution" labels, keep
    * crawl docs the model scores high). Here the weak label is
    * `lang = 'en'` on the EVEN doc_ids (the train split); every doc
    * gets an odds score and a predicted label, and the held-out odd
    * ids are where accuracy is measured (`QualityClassifierSpec`).
    *
    * The per-word weight is the Laplace-smoothed class-conditional
    * ODDS as an integer micro-ratio —
    * `(c⁺+1)(N⁻+V)·10⁶ div (c⁻+1)(N⁺+V)` — and a doc's score is the
    * plain integer mean over its token occurrences. Log-free on
    * purpose, like the bigram LM: libm `ln` is 1-ulp and could flip
    * scores between engines, while integer products/divisions are
    * engine-identical (products stay < 2⁶³ while class token counts
    * are < ~2×10⁹ — far beyond this corpus; a 100 TB corpus promotes
    * the weight arithmetic to decimal, same plan).
    *
    * Scale shape: tokens shuffle once to train counts (bounded by
    * vocabulary) and once to score (doc_id key); the model — one long
    * per vocab word — broadcasts or shuffle-joins by AQE's choice;
    * text never leaves its scan.
    */
  private def qualityClassifier(s: SparkSession, dir: String): DataFrame =
    classifierScores(docs(s, dir))

  /** Core train+score over any (doc_id, lang, text) frame — split out
    * so `QualityClassifierSpec` can verify learning on a corpus with
    * REAL label↔word signal (the synthetic testdata's lang column is
    * independent of its words, which is exactly what the gate's hash
    * oracle doesn't care about but a learning test does).
    */
  private[ops] def classifierScores(d: DataFrame): DataFrame =
    scoreWithClassifier(d, trainClassifierModel(d))

  /** The TRAINED model as one persistable artifact frame: one
    * (w, wgt) row per vocab word plus a single w=NULL row carrying
    * the out-of-vocabulary weight — the [[ModelArtifacts]] contract:
    * the session memo caches stand in for exactly this frame, and a
    * saved+reloaded copy must score identically
    * (`ModelArtifactSpec`).
    */
  private[ops] def trainClassifierModel(d: DataFrame): DataFrame = {
    val tok = d.select(col("doc_id"), col("lang"),
      explode(TextAnalysis.words(col("text"))).as("w"))
    val train = tok.filter(col("doc_id") % 2 === 0)
    val counts = train.groupBy("w").agg(
      count(when(col("lang") === "en", 1)).as("cpos"),
      count(when(col("lang") =!= "en", 1)).as("cneg"))
    // one row of model scalars, broadcast under every weight
    val scalars = train.agg(
      count(when(col("lang") === "en", 1)).as("npos"),
      count(when(col("lang") =!= "en", 1)).as("nneg"),
      countDistinct("w").as("v"))
    val weights = counts.crossJoin(broadcast(scalars))
      .select(col("w"), expr(
        "(cpos + 1) * (nneg + v) * 1000000L DIV ((cneg + 1) * (npos + v))")
        .as("wgt"))
    val oov = scalars.select(lit(null).cast("string").as("w"),
      expr("(nneg + v) * 1000000L DIV (npos + v)").as("wgt"))
    weights.unionByName(oov)
  }

  /** Score any (doc_id, lang, text) frame under a trained (or
    * reloaded) model frame — the inference half: tokens join the
    * vocab weights (broadcast or shuffle by AQE's choice), OOV
    * tokens take the model's null-word weight, text never shuffles.
    */
  private[ops] def scoreWithClassifier(d: DataFrame, model: DataFrame): DataFrame = {
    val tok = d.select(col("doc_id"), col("lang"),
      explode(TextAnalysis.words(col("text"))).as("w"))
    val weights = model.filter(col("w").isNotNull)
    val oov = model.filter(col("w").isNull).select(col("wgt").as("oov_wgt"))
    val scored = tok.join(weights, Seq("w"), "left")
      .crossJoin(broadcast(oov))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"),
        sum(coalesce(col("wgt"), col("oov_wgt"))).as("ssum"))
    d.select(col("doc_id"), col("lang")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(expr("ssum DIV n_tokens"), lit(0L)).as("odds_micro"),
        coalesce(expr("ssum DIV n_tokens") >= 1000000L, lit(false))
          .cast("int").as("pred_en"),
        (col("lang") === "en").cast("int").as("is_en"))
      .orderBy("doc_id")
  }

  private val qualityClassifierSql =
    """WITH tok AS (
      |  SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      |  FROM documents),
      |train AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
      |counts AS (
      |  SELECT w,
      |    count(*) FILTER (lang = 'en') AS cpos,
      |    count(*) FILTER (lang <> 'en') AS cneg
      |  FROM train GROUP BY w),
      |scalars AS (
      |  SELECT count(*) FILTER (lang = 'en') AS npos,
      |    count(*) FILTER (lang <> 'en') AS nneg,
      |    count(DISTINCT w) AS v
      |  FROM train),
      |weights AS (
      |  SELECT w,
      |    ((cpos + 1) * (nneg + v) * 1000000) // ((cneg + 1) * (npos + v)) AS wgt
      |  FROM counts, scalars),
      |oov AS (SELECT (nneg + v) * 1000000 // (npos + v) AS oov_wgt FROM scalars),
      |scored AS (
      |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |    CAST(sum(coalesce(wgt, oov_wgt)) AS BIGINT) AS ssum
      |  FROM tok t LEFT JOIN weights ww ON t.w = ww.w, oov
      |  GROUP BY t.doc_id)
      |SELECT d.doc_id,
      |  coalesce(n_tokens, 0) AS n_tokens,
      |  CAST(coalesce(ssum // n_tokens, 0) AS BIGINT) AS odds_micro,
      |  CAST(coalesce(ssum // n_tokens >= 1000000, false) AS INT) AS pred_en,
      |  CAST(d.lang = 'en' AS INT) AS is_en
      |FROM documents d LEFT JOIN scored sc ON d.doc_id = sc.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // -- cross-source overlap matrix -----------------------------------------

  /** The source-pair contamination matrix over word-3-shingle
    * content: how many distinct shingles each pair of sources SHARES
    * (off-diagonal — the provenance question "how much of source B's
    * phrasing already lives in source A") and how many repeat across
    * docs WITHIN a source (diagonal — internal boilerplate
    * incidence). One (shingle-hash, source) aggregation, then a
    * hash-keyed self-join whose fan-out is bounded by the number of
    * SOURCES holding each shingle (≤ |sources|², a handful) — never
    * doc×doc. Text reduces to 16-byte hashes at the scan; shingle
    * extraction is [[Dedup.wordShingles]], the same distinct-per-doc
    * semantics the minhash pipeline certifies.
    */
  private def overlapMatrix(s: SparkSession, dir: String): DataFrame = {
    val fs = docs(s, dir)
      .select(col("source"), explode(Dedup.wordShingles(col("text"), 3)).as("sh"))
      .groupBy(md5(col("sh")).as("fp"), col("source"))
      .agg(count(lit(1)).as("n"))
    val fsr = graft.Caches.register(fs)
    val diag = fsr.filter(col("n") >= 2).groupBy("source")
      .agg(count(lit(1)).as("shared_fps"))
      .select(col("source").as("source_a"), col("source").as("source_b"),
        col("shared_fps"))
    val off = fsr.as("a").join(fsr.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared_fps"))
    diag.unionByName(off).orderBy("source_a", "source_b")
  }

  private val overlapMatrixSql =
    """WITH w AS (
      |  SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z]+') AS ws
      |  FROM documents),
      |g AS (
      |  SELECT DISTINCT doc_id, source,
      |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
      |  FROM w, UNNEST(range(1, greatest(len(ws) - 1, 1))) AS t(i)
      |  WHERE len(ws) >= 3
      |  UNION ALL
      |  SELECT DISTINCT doc_id, source, array_to_string(ws, ' ') AS sh
      |  FROM w WHERE len(ws) < 3),
      |fs AS (
      |  SELECT md5(sh) AS fp, source, CAST(count(*) AS BIGINT) AS n
      |  FROM g GROUP BY 1, 2),
      |diag AS (
      |  SELECT source AS source_a, source AS source_b,
      |    CAST(count(*) AS BIGINT) AS shared_fps
      |  FROM fs WHERE n >= 2 GROUP BY 1, 2),
      |off AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    CAST(count(*) AS BIGINT) AS shared_fps
      |  FROM fs a JOIN fs b ON a.fp = b.fp AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT * FROM diag UNION ALL SELECT * FROM off
      |ORDER BY source_a, source_b""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("corpus_overlap_matrix", overlapMatrix, Some(overlapMatrixSql)),
    QueryDef("docs_quality_classifier", qualityClassifier, Some(qualityClassifierSql)),
    QueryDef("docs_span_dedup", spanDedup, Some(spanDedupSql)),
    QueryDef("docs_soft_dedup", softDedup, Some(softDedupSql)),
    QueryDef("docs_gopher_rules", gopherRules, Some(gopherRulesSql)),
    QueryDef("ann_range_search", rangeSearch, Some(rangeSearchSql)),
    QueryDef("embed_pca_power", pcaPower, Some(pcaPowerSql)),
    QueryDef("dedup_ppjoin", ppjoin, Some(ppjoinSql)),
    QueryDef("corpus_report", corpusReport, Some(corpusReportSql)),
    QueryDef("embed_pca_scores", pcaScores, Some(pcaScoresSql)),
    QueryDef("embed_hard_negatives", hardNegatives, Some(hardNegativesSql)),
  )
}
