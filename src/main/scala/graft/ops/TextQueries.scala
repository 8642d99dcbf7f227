package graft.ops

import graft.{QueryDef, QueryModule}
import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis + dedup query block over `documents`. */
object TextQueries extends QueryModule {

  // Tables.parallel: every query here runs per-row text compute
  // (signatures, n-grams, regex) — a single-split scan would pin it
  // to one task (no-op when the corpus arrives in many splits)
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.parallel(Tables.documents(s, dir))

  // -- token counting ------------------------------------------------------

  private def tokenCount(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.wordCount(col("text")).as("n_words"),
      TextAnalysis.subwordCount(col("text")).as("n_subwords"))
      .orderBy("doc_id")

  private val tokenCountSql =
    """SELECT doc_id,
      |  len(string_split_regex(trim(text), '\s+')) AS n_tokens,
      |  len(regexp_extract_all(lower(text), '[a-z]+')) AS n_words,
      |  len(regexp_extract_all(lower(text), '[aeiou]+|[bcdfghjklmnpqrstvwxyz]+')) AS n_subwords
      |FROM documents ORDER BY doc_id""".stripMargin

  // -- readability ---------------------------------------------------------

  /** Flesch-style readability per document (r12) — the classic
    * surface-statistics quality signal corpus filters bucket on:
    * words per sentence and (vowel-group-proxied) syllables per word,
    * folded into the standard 206.835 − 1.015·(W/S) − 84.6·(Syl/W)
    * score. All three counts are exact integers from the same
    * regex-token definitions as the other text gates (one vowel run ≈
    * one syllable, floor 1 per word — the usual heuristic), and the
    * score itself is reported as the EXACT scaled integer
    * flesch_scaled = 206835·S·W − 1015·W² − 84600·Syl·S over
    * denominator 1000·S·W — multiplying the formula through clears
    * every division, so no float (or round-half mode) ever enters and
    * the hash is engine-exact. Pure per-row scan work — parallelizes
    * with the read, nothing shuffles.
    */
  private def readability(s: SparkSession, dir: String): DataFrame = {
    val nWords = greatest(TextAnalysis.wordCount(col("text")), lit(1L))
    val nSents = greatest(
      expr("size(regexp_extract_all(text, '[.!?]+', 0))").cast("long"), lit(1L))
    val nSyl = expr(
      """aggregate(
        |  transform(regexp_extract_all(lower(text), '[a-z]+', 0),
        |    w -> greatest(size(regexp_extract_all(w, '[aeiou]+', 0)), 1)),
        |  CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin)
    docs(s, dir)
      .select(col("doc_id"), nWords.as("n_words"), nSents.as("n_sentences"),
        nSyl.as("n_syllables"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"), col("n_syllables"),
        (lit(206835L) * col("n_sentences") * col("n_words")
          - lit(1015L) * col("n_words") * col("n_words")
          - lit(84600L) * col("n_syllables") * col("n_sentences"))
          .as("flesch_scaled"),
        (lit(1000L) * col("n_sentences") * col("n_words")).as("flesch_denom"))
      .orderBy("doc_id")
  }

  private val readabilitySql =
    """SELECT doc_id, n_words, n_sentences, n_syllables,
      |  (206835 * n_sentences * n_words - 1015 * n_words * n_words
      |   - 84600 * n_syllables * n_sentences)::BIGINT AS flesch_scaled,
      |  (1000 * n_sentences * n_words)::BIGINT AS flesch_denom
      |FROM (
      |  SELECT doc_id,
      |    greatest(len(regexp_extract_all(lower(text), '[a-z]+')), 1)::BIGINT AS n_words,
      |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT AS n_sentences,
      |    CAST(coalesce(list_sum(list_transform(regexp_extract_all(lower(text), '[a-z]+'),
      |      w -> greatest(len(regexp_extract_all(w, '[aeiou]+')), 1))), 0) AS BIGINT)
      |      AS n_syllables
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  // -- quality features ----------------------------------------------------

  private def quality(s: SparkSession, dir: String): DataFrame = {
    val nWords = TextAnalysis.wordCount(col("text"))
    val charSum = TextAnalysis.wordCharSum(col("text"))
    val stops = TextAnalysis.stopwordCount(col("text"))
    val stopRatio = stops.cast("double") / nWords
    val score = least(nWords.cast("double") / 100.0, lit(1.0)) * (lit(1.0) - stopRatio)
    docs(s, dir).select(
      col("doc_id"),
      nWords.as("n_words"),
      round(charSum.cast("double") / nWords, 4).as("mean_word_len"),
      round(stopRatio, 4).as("stop_ratio"),
      round(score, 4).as("score"))
      .orderBy("doc_id")
  }

  private val qualitySql = {
    val stopList = TextAnalysis.StopWords.map(w => s"'$w'").mkString(", ")
    s"""WITH w AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents),
       |f AS (
       |  SELECT doc_id, len(ws) AS n_words,
       |    CAST(list_aggregate(list_transform(ws, x -> len(x)), 'sum') AS BIGINT) AS char_sum,
       |    len(list_filter(ws, x -> x IN ($stopList))) AS stops
       |  FROM w)
       |SELECT doc_id, n_words,
       |  round(CAST(char_sum AS DOUBLE) / n_words, 4) AS mean_word_len,
       |  round(CAST(stops AS DOUBLE) / n_words, 4) AS stop_ratio,
       |  round(least(CAST(n_words AS DOUBLE) / 100.0, 1.0)
       |        * (1.0 - CAST(stops AS DOUBLE) / n_words), 4) AS score
       |FROM f ORDER BY doc_id""".stripMargin
  }

  // -- language guess ------------------------------------------------------

  private def langid(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), TextAnalysis.langGuess(col("text")).as("guess"))
      .orderBy("doc_id")

  // language-ID SQL fragments shared by text_langid and
  // docs_filter_pipeline — one source of truth for the marker-count
  // expressions and the tie-break CASE chain
  private val langNames = TextAnalysis.LangMarkers.map(_._1) // de, en, es, fr, zh

  private def langHits(lang: String): String = {
    val markers = TextAnalysis.LangMarkers.toMap.apply(lang)
    // zh: character-occurrence count over the raw text, mirroring
    // TextAnalysis.markerHits (CJK never matches the [a-z]+ words)
    if (lang == "zh") s"len(regexp_extract_all(text, '[${markers.mkString}]'))"
    else {
      val set = markers.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(ws, x -> x IN ($set)))"
    }
  }

  private val langHitCols: String =
    langNames.map(l => s"${langHits(l)} AS h_$l").mkString(",\n    ")

  private val langGuessCase: String = {
    val cases = langNames.init.zipWithIndex.map { case (l, i) =>
      val conds = langNames.drop(i + 1).map(o => s"h_$l >= h_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString(" ")
    s"CASE $cases ELSE '${langNames.last}' END"
  }

  private val langidSql =
    s"""WITH w AS (
       |  SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents),
       |h AS (
       |  SELECT doc_id, $langHitCols
       |  FROM w)
       |SELECT doc_id, $langGuessCase AS guess
       |FROM h ORDER BY doc_id""".stripMargin

  /** Classifier-evaluation readout for the language guesser: the
    * (true lang × guess) confusion matrix — the standard way to judge
    * a filter model before trusting it on a corpus. Bounded |langs|²
    * output from one row-scaled aggregation; shares the marker/CASE
    * SQL fragments with `text_langid`, so the oracle certifies the
    * SAME classifier the pipeline runs.
    */
  private def langidConfusion(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("lang").as("true_lang"),
        TextAnalysis.langGuess(col("text")).as("guess"))
      .groupBy("true_lang", "guess")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("true_lang", "guess")

  private val langidConfusionSql =
    s"""WITH w AS (
       |  SELECT doc_id, lang, text, regexp_extract_all(lower(text), '[a-z]+') AS ws
       |  FROM documents),
       |h AS (
       |  SELECT doc_id, lang, $langHitCols
       |  FROM w)
       |SELECT lang AS true_lang, $langGuessCase AS guess,
       |  CAST(count(*) AS BIGINT) AS n_docs
       |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- fingerprints --------------------------------------------------------

  private def fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      TextAnalysis.rollingFingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  private val fingerprintSql =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
      |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // -- normalization -------------------------------------------------------

  private def normalize(s: SparkSession, dir: String): DataFrame = {
    // one bound normalization chain feeding both outputs — norm_fp and
    // norm_len must describe the SAME string
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    docs(s, dir).select(
      col("doc_id"), md5(norm).as("norm_fp"), length(norm).as("norm_len"))
      .orderBy("doc_id")
  }

  private val normalizeSql =
    """SELECT doc_id,
      |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_fp,
      |  length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_len
      |FROM documents ORDER BY doc_id""".stripMargin

  // -- dedup ---------------------------------------------------------------

  private def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(docs(s, dir), "doc_id", "text").orderBy("keep_id")

  private val dedupExactSql =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_dups
      |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin

  private def dedupFingerprint(s: SparkSession, dir: String): DataFrame =
    Dedup.fingerprintGroups(docs(s, dir), "doc_id", "text").orderBy("fp")

  private val dedupFingerprintSql =
    """SELECT md5(text) AS fp, count(*) AS n, min(doc_id) AS keep_id
      |FROM documents GROUP BY md5(text) ORDER BY fp""".stripMargin

  private def minhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashCandidates(docs(s, dir), "doc_id", "text", shingleK = 3, threshold = 0.2)
      .orderBy("doc_a", "doc_b")

  /** DuckDB recomputation of the ENTIRE minhash pipeline — portable
    * md5-prefix word hashes, mod-prime shingle folds, the 64
    * universal-hash minima (permutation constants injected from the
    * one Scala source of truth), the seeded band folds, the
    * same-band candidate join, and the agreement rescoring — so the
    * gate certifies signatures, banding, candidate generation AND
    * scores end to end (this query was rows-only while the word hash
    * was xxhash64).
    */
  // CTEs through `scored` (per-candidate band agreement) split out and
  // parameterized by the source relation so the split-leakage audit
  // and the keep-best selection reuse the identical certified pipeline
  private lazy val minhashScoredCtes: String = "WITH " + minhashScoredCtesFor("documents")

  /** The CTE chain from `perms` through `scored`, WITHOUT the leading
    * WITH so callers can prepend their own CTEs (e.g. a decorated
    * corpus).
    */
  private def minhashScoredCtesFor(src: String): String = {
    val p = Dedup.MinhashPrime
    val bp = Dedup.BandKeyPrime
    val perms = graft.ops.Dedup.permA.zip(graft.ops.Dedup.permB).zipWithIndex
      .map { case ((a, b), i) => s"($i, ${a}::BIGINT, ${b}::BIGINT)" }.mkString(", ")
    // band key: acc = b, then 4 steps of (acc*31 + sig[4b+j]) % bp
    val bandFold = (1 to 4).foldLeft("CAST(b AS BIGINT)") { (acc, j) =>
      s"(($acc * 31 + sig[4*b + $j]) % $bp)"
    }
    s"""perms(p, a, b) AS (VALUES $perms),
       |w AS (
       |  SELECT doc_id, list_transform(regexp_extract_all(lower(text), '[a-z]+'),
       |    x -> ('0x' || substr(md5(x), 1, 12))::BIGINT % $p) AS wh
       |  FROM $src),
       |sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(wh) = 0 THEN []
       |         WHEN len(wh) >= 3 THEN
       |           [(((wh[i]*31 + wh[i+1]) % $p)*31 + wh[i+2]) % $p FOR i IN range(1, len(wh) - 1)]
       |         WHEN len(wh) = 2 THEN [(wh[1]*31 + wh[2]) % $p]
       |         ELSE [wh[1]] END AS shs
       |  FROM w),
       |sigv AS (
       |  SELECT doc_id, p.p AS perm,
       |    CASE WHEN len(shs) = 0 THEN 0
       |         ELSE list_min(list_transform(shs, s -> (p.a * s + p.b) % $p)) END AS m
       |  FROM sh, perms p),
       |sig AS (SELECT doc_id, list(m ORDER BY perm) AS sig FROM sigv GROUP BY 1),
       |bands AS (
       |  SELECT doc_id, b, $bandFold AS key
       |  FROM sig, range(0, 16) AS t(b)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id),
       |scored AS (
       |  SELECT doc_a, doc_b,
       |    len([i FOR i IN range(1, 65) IF sa.sig[i] = sb.sig[i]]) AS agree
       |  FROM cand
       |  JOIN sig sa ON sa.doc_id = doc_a
       |  JOIN sig sb ON sb.doc_id = doc_b)""".stripMargin
  }

  private val minhashLshSql =
    s"""$minhashScoredCtes
       |SELECT doc_a, doc_b, round(CAST(agree AS DOUBLE) / 64, 4) AS est_jaccard
       |FROM scored WHERE CAST(agree AS DOUBLE) / 64 >= 0.2
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Split-leakage audit — the contamination a random doc-level
    * split always ships: near-duplicate pairs (the certified minhash
    * LSH candidates at the dedup threshold) counted by the train/
    * val/test cells their endpoints land in under the SAME
    * deterministic hash-split as `docs_split`. Off-diagonal rows
    * (train↔val, train↔test, val↔test) are evaluation leakage; the
    * fix is splitting by DEDUP CLUSTER, not by document. Candidate
    * volume and the split hash are both bounded/exact, so this runs
    * wherever the dedup itself runs.
    */
  private def splitLeakage(s: SparkSession, dir: String): DataFrame = {
    def splitOf(c: Column): Column = {
      val b = CorpusQueries.hashBucket("split", c)
      when(b < 80, "train").when(b < 90, "val").otherwise("test")
    }
    Dedup.minhashCandidates(docs(s, dir), "doc_id", "text",
        shingleK = 3, threshold = 0.2)
      .select(splitOf(col("doc_a")).as("sa"), splitOf(col("doc_b")).as("sb"))
      .select(least(col("sa"), col("sb")).as("split_a"),
        greatest(col("sa"), col("sb")).as("split_b"))
      .groupBy("split_a", "split_b").agg(count(lit(1)).as("n_pairs"))
      .orderBy("split_a", "split_b")
  }

  private val splitLeakageSql = {
    def bucket(k: String) = CorpusQueries.sqlBucket("split", k)
    s"""$minhashScoredCtes,
       |pairs AS (
       |  SELECT doc_a, doc_b FROM scored
       |  WHERE CAST(agree AS DOUBLE) / 64 >= 0.2),
       |sp AS (
       |  SELECT
       |    CASE WHEN ba < 80 THEN 'train' WHEN ba < 90 THEN 'val' ELSE 'test' END AS sa,
       |    CASE WHEN bb < 80 THEN 'train' WHEN bb < 90 THEN 'val' ELSE 'test' END AS sb
       |  FROM (SELECT ${bucket("doc_a")} AS ba, ${bucket("doc_b")} AS bb FROM pairs))
       |SELECT least(sa, sb) AS split_a, greatest(sa, sb) AS split_b,
       |  CAST(count(*) AS BIGINT) AS n_pairs
       |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  private def simhashQ(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash(docs(s, dir), "doc_id", "text").orderBy("doc_id")

  /** DuckDB recomputes the full SimHash: per word, the same two
    * mod-prime polynomial byte-folds (`list_reduce` over the word's
    * chars — documents are pure ASCII so `ascii(c)` IS the byte),
    * then the 62 sign-of-±1-sum bits. One source of truth with
    * [[graft.functions.SimHash64]]; a drift anywhere (word split,
    * hash constants, tie rule) hash-mismatches the gate.
    */
  /** DuckDB recomputation of the 62-bit SimHash for an arbitrary
    * (doc_id, text) relation `src`, emitting CTEs `<p>w`, `<p>h`, and
    * `<p>sigs` — parameterized so one oracle can signature several
    * document sets (e.g. a decorated batch AND a historical index).
    */
  private def simhashSigsCteFor(src: String, p: String): String = {
    val bitTerms = (0 until 62).map { j =>
      s"(CASE WHEN sum(CASE WHEN (hw >> $j) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("\n      + ")
    s"""${p}w AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |  FROM $src),
       |${p}h AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(0::BIGINT, [ascii(c)::BIGINT FOR c IN string_split(word, '')]),
       |      (acc, c) -> (acc * 31 + c) % 2147483647)
       |    + list_reduce(list_prepend(0::BIGINT, [ascii(c)::BIGINT FOR c IN string_split(word, '')]),
       |      (acc, c) -> (acc * 37 + c) % 2147483629) * 2147483648 AS hw
       |  FROM ${p}w),
       |${p}sigs AS (
       |  SELECT d.doc_id, COALESCE(b.simhash, 0) AS simhash
       |  FROM $src d LEFT JOIN (
       |    SELECT doc_id, CAST($bitTerms AS BIGINT) AS simhash
       |    FROM ${p}h GROUP BY doc_id) b ON d.doc_id = b.doc_id)""".stripMargin
  }

  private val simhashSigsCte = simhashSigsCteFor("documents", "")

  private val simhashSql =
    s"""WITH $simhashSigsCte
       |SELECT doc_id, simhash FROM sigs ORDER BY doc_id""".stripMargin

  private def simhashPairsQ(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(docs(s, dir), "doc_id", "text", tau = 3)
      .orderBy("doc_a", "doc_b")

  /** Banded candidate rule mirrored exactly: pairs sharing any 16-bit
    * band, kept at hamming ≤ 3 (`bit_count(xor(...))`).
    */
  private val simhashPairsSql = {
    val bandEq = (0 until 4).map(b =>
      s"(a.simhash >> ${16 * b}) & 65535 = (b.simhash >> ${16 * b}) & 65535").mkString("\n   OR ")
    s"""WITH $simhashSigsCte
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       | AND ($bandEq)
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** SimHash near-dup CLUSTERS: connected components over the banded
    * simhash pairs — completing the decision layer across all three
    * near-dup signature families (minhash `dedup_clusters`, phash
    * `media_dedup_clusters`, simhash here), same component machinery,
    * recursive-CTE oracle over the same banded pair derivation. Runs
    * on the large-star/small-star contraction (O(log²) rounds) — LP's
    * diameter-bound rounds are kept only where the LP/LSS pair is the
    * deliberate gate (`dedup_clusters` vs `dedup_clusters_lss`).
    */
  private def simhashClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponentsLSS(
        Dedup.simhashPairs(docs(s, dir), "doc_id", "text", tau = 3)
          .select(col("doc_a"), col("doc_b")))
      .orderBy("doc_id")

  private val simhashClustersSql = {
    val bandEq = (0 until 4).map(b =>
      s"(a.simhash >> ${16 * b}) & 65535 = (b.simhash >> ${16 * b}) & 65535").mkString("\n   OR ")
    s"""WITH RECURSIVE $simhashSigsCte,
       |p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |   AND ($bandEq)
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
       |${Dedup.componentClosureSql}
       |${Dedup.componentSelectSql}""".stripMargin
  }

  // -- incremental near-dup against a signature index ----------------------

  /** Continuous-ingest near-dup ([[Dedup.incrementalNearDup]]): the
    * corpus has no natural near-duplicates, so the batch is decorated
    * with one-word-appended re-crawls of index docs and of in-batch
    * originals — each lands within a few hamming bits of its source.
    * The oracle recomputes BOTH signature sets and takes min hamming
    * over ALL pairs at ≤ τ (no band condition), so the hash also
    * certifies that 4×16 banding is lossless at τ ≤ 3 on this data.
    */
  private val NearMark = " nearduplicatemarker"

  private def dedupIncrementalNear(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val index = d.filter(col("doc_id") % 5 =!= 0)
    val fresh = d.filter(col("doc_id") % 5 === 0)
    val recrawl = index.filter(col("doc_id") % 7 === 3)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(NearMark)).as("text"))
    val inBatch = fresh.filter(col("doc_id") % 3 === 1)
      .select((col("doc_id") + 2000000).as("doc_id"),
        concat(col("text"), lit(NearMark)).as("text"))
    val batch = fresh.unionByName(recrawl).unionByName(inBatch)
    Dedup.incrementalNearDup(batch, Dedup.simhash(index, "doc_id", "text"),
        "doc_id", "text", tau = 3)
      .orderBy("doc_id")
  }

  private val dedupIncrementalNearSql =
    s"""WITH idx AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
       |batch AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
       |  UNION ALL
       |  SELECT doc_id + 1000000, text || '$NearMark' FROM documents
       |  WHERE doc_id % 5 <> 0 AND doc_id % 7 = 3
       |  UNION ALL
       |  SELECT doc_id + 2000000, text || '$NearMark' FROM documents
       |  WHERE doc_id % 5 = 0 AND doc_id % 3 = 1),
       |${simhashSigsCteFor("batch", "b")},
       |${simhashSigsCteFor("idx", "i")},
       |vs_index AS (
       |  SELECT b.doc_id, min(bit_count(xor(b.simhash, i.simhash))) AS h
       |  FROM bsigs b JOIN isigs i ON bit_count(xor(b.simhash, i.simhash)) <= 3
       |  GROUP BY 1),
       |within AS (
       |  SELECT a.doc_id, min(bit_count(xor(a.simhash, b.simhash))) AS h
       |  FROM bsigs a JOIN bsigs b
       |    ON b.doc_id < a.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= 3
       |  GROUP BY 1)
       |SELECT s.doc_id, s.simhash,
       |  CAST(coalesce(v.h, -1) AS INTEGER) AS index_hamming,
       |  CAST(coalesce(w.h, -1) AS INTEGER) AS batch_hamming,
       |  v.h IS NULL AND w.h IS NULL AS keep
       |FROM bsigs s
       |LEFT JOIN vs_index v ON s.doc_id = v.doc_id
       |LEFT JOIN within w ON s.doc_id = w.doc_id
       |ORDER BY s.doc_id""".stripMargin

  // -- n-gram Jaccard near-dup within blocks -------------------------------

  private def ngramJaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairsBlocked(docs(s, dir), "doc_id", "text",
        blockCol = "source", maxCharDiff = 20, charsCol = "n_chars",
        k = 3, threshold = 0.1)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")

  private val ngramJaccardSql =
    """WITH w AS (
      |  SELECT doc_id, source, n_chars,
      |    regexp_extract_all(lower(text), '[a-z]+') AS ws
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, source, n_chars,
      |    CASE WHEN len(ws) >= 3 THEN
      |      list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)])
      |    ELSE [array_to_string(ws, ' ')] END AS gs
      |  FROM w),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.gs AS ga, b.gs AS gb
      |  FROM sh a JOIN sh b
      |    ON a.source = b.source AND abs(a.n_chars - b.n_chars) <= 20
      |   AND a.doc_id < b.doc_id),
      |scored AS (
      |  SELECT doc_a, doc_b,
      |    len(list_distinct(list_concat(ga, gb))) AS union_n,
      |    len(ga) + len(gb) - len(list_distinct(list_concat(ga, gb))) AS inter_n
      |  FROM pairs)
      |SELECT doc_a, doc_b,
      |  round(CAST(inter_n AS DOUBLE) / union_n, 4) AS jaccard
      |FROM scored
      |WHERE CAST(inter_n AS DOUBLE) / union_n >= 0.1
      |ORDER BY doc_a, doc_b""".stripMargin

  // -- transitive dup clusters over jaccard candidate pairs ----------------

  private def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.jaccardPairsBlocked(docs(s, dir), "doc_id", "text",
        blockCol = "source", maxCharDiff = 20, charsCol = "n_chars",
        k = 3, threshold = 0.1)
      .select("doc_a", "doc_b")
    Dedup.connectedComponents(pairs).orderBy("doc_id")
  }

  /** The same clustering through large-star/small-star contraction
    * (Kiveris et al. SoCC'14) — O(log) rounds where label propagation
    * needs diameter rounds; both must produce IDENTICAL (doc_id,
    * cluster-min) labels, so it shares dedup_clusters' recursive-CTE
    * oracle verbatim.
    */
  private def dedupClustersLss(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.jaccardPairsBlocked(docs(s, dir), "doc_id", "text",
        blockCol = "source", maxCharDiff = 20, charsCol = "n_chars",
        k = 3, threshold = 0.1)
      .select("doc_a", "doc_b")
    Dedup.connectedComponentsLSS(pairs).orderBy("doc_id")
  }

  /** Shingle → candidate-pair → edge → reachability CTE chain shared
    * verbatim by dedup_clusters and dedup_keep_list: one source of
    * truth for the shingle rule (len >= 3 / whole-doc fallback), the
    * blocking keys, and the 0.1 jaccard cutoff.
    */
  private val dupReachCtes =
    """w AS (
      |  SELECT doc_id, source, n_chars,
      |    regexp_extract_all(lower(text), '[a-z]+') AS ws
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, source, n_chars,
      |    CASE WHEN len(ws) >= 3 THEN
      |      list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)])
      |    ELSE [array_to_string(ws, ' ')] END AS gs
      |  FROM w),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    len(a.gs) + len(b.gs) - len(list_distinct(list_concat(a.gs, b.gs))) AS inter_n,
      |    len(list_distinct(list_concat(a.gs, b.gs))) AS union_n
      |  FROM sh a JOIN sh b
      |    ON a.source = b.source AND abs(a.n_chars - b.n_chars) <= 20
      |   AND a.doc_id < b.doc_id),
      |p AS (
      |  SELECT doc_a, doc_b FROM pairs
      |  WHERE CAST(inter_n AS DOUBLE) / union_n >= 0.1),
      |""".stripMargin + Dedup.componentClosureSql

  private val dedupClustersSql =
    s"""WITH RECURSIVE
       |$dupReachCtes
       |${Dedup.componentSelectSql}""".stripMargin

  // -- benchmark decontamination -------------------------------------------

  /** Eval-set contamination scan: flag corpus documents sharing ≥ τ
    * distinct word trigrams with a benchmark/eval set (here: the
    * first 20 docs as a stand-in). The benchmark's gram set is tiny
    * and broadcast; the corpus side explodes compiled trigrams and
    * the semi-join + per-doc distinct count never shuffles the text —
    * the shape that scans 100 TB against a fixed eval suite.
    */
  private def decontaminate(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val ws = TextAnalysis.words(col("text"))
    val grams = when(size(ws) >= 3, call_function("graft_word_trigrams", ws))
      .otherwise(array())
    val d = docs(s, dir)
    val benchGrams = d.filter(col("doc_id") < 20)
      .select(explode(grams).as("g")).distinct()
    d.filter(col("doc_id") >= 20)
      .select(col("doc_id"), explode(grams).as("g"))
      .join(broadcast(benchGrams), Seq("g")) // eval suite: genuinely small
      .groupBy("doc_id").agg(countDistinct(col("g")).as("n_shared_grams"))
      .filter(col("n_shared_grams") >= 2)
      .orderBy("doc_id")
  }

  private val decontaminateSql =
    """WITH w AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents),
      |g AS (
      |  SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
      |  FROM w, UNNEST(range(1, greatest(len(ws) - 1, 1))) AS t(i)),
      |bench AS (SELECT DISTINCT g FROM g WHERE doc_id < 20)
      |SELECT doc_id, CAST(count(DISTINCT g.g) AS BIGINT) AS n_shared_grams
      |FROM g JOIN bench ON g.g = bench.g
      |WHERE doc_id >= 20
      |GROUP BY doc_id HAVING count(DISTINCT g.g) >= 2
      |ORDER BY doc_id""".stripMargin

  // -- end-to-end dedup decision: pairs → clusters → keep list -------------

  /** The full dedup pipeline as one decision query: candidate pairs
    * (blocked 3-gram Jaccard) → transitive clusters → keep the
    * smallest doc_id per cluster, drop the rest — reported as kept/
    * dropped counts per source. This is the query a corpus build
    * actually runs; the oracle recomputes the identical decision with
    * a recursive CTE, so candidate generation, clustering, AND the
    * keep rule are all hash-verified together.
    */
  private def dedupKeepList(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.jaccardPairsBlocked(docs(s, dir), "doc_id", "text",
        blockCol = "source", maxCharDiff = 20, charsCol = "n_chars",
        k = 3, threshold = 0.1)
      .select("doc_a", "doc_b")
    // star contraction, not label propagation: the keep decision is
    // identical (cluster = component min) but converges in O(log²)
    // rounds instead of component-diameter rounds
    val dropped = Dedup.connectedComponentsLSS(pairs)
      .filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id"), lit(1L).as("is_dropped"))
    // no broadcast hint: the drop list can be a large fraction of the
    // corpus at scale — shuffle on doc_id, AQE broadcasts when small
    docs(s, dir).join(dropped, Seq("doc_id"), "left")
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col("is_dropped"), lit(0L))).as("n_dropped"))
      .select(col("source"), col("n_docs"),
        (col("n_docs") - col("n_dropped")).as("n_kept"), col("n_dropped"))
      .orderBy("source")
  }

  private val dedupKeepListSql =
    s"""WITH RECURSIVE
       |$dupReachCtes,
       |drops AS (SELECT id FROM reach GROUP BY id HAVING id <> min(comp))
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(*) - count(d.id) AS BIGINT) AS n_kept,
       |  CAST(count(d.id) AS BIGINT) AS n_dropped
       |FROM documents LEFT JOIN drops d ON documents.doc_id = d.id
       |GROUP BY source ORDER BY source""".stripMargin

  // -- quality-aware canonical selection -----------------------------------

  /** Keep-BEST canonical selection — the end of the near-dup pipeline
    * a training corpus actually ships: in each transitive near-dup
    * cluster keep the highest-QUALITY member (most words, doc_id
    * tie-break), not the smallest id — a re-crawl that truncated the
    * original must lose to it. Pairs come from the certified minhash
    * LSH pipeline, clusters from the large-star/small-star scale path
    * (O(log) rounds), and the per-cluster argmax is one `max_by`
    * aggregation — no per-cluster sort. Decorated clones (every 10th
    * doc re-crawled with its first two words dropped — STRICTLY
    * shorter, so the original must win) populate clusters at every
    * SF; the oracle replays decoration, signatures, banding,
    * candidates, reachability, and the argmax.
    */
  private def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), col("text"))
    val clones = base.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s+\\S+\\s+", "").as("text"))
    val corpus = base.unionByName(clones)
    val pairs = Dedup.minhashCandidates(corpus, "doc_id", "text",
        shingleK = 3, threshold = 0.2)
      .select("doc_a", "doc_b")
    val comp = Dedup.connectedComponentsLSS(pairs)
    val words = corpus.select(col("doc_id"),
      TextAnalysis.wordCount(col("text")).as("nw"))
    comp.join(words, "doc_id")
      .groupBy("cluster").agg(
        count(lit(1)).as("n_members"),
        expr("max_by(doc_id, struct(nw, -doc_id))").as("keep_id"),
        max(col("nw")).as("best_words"))
      .select(col("cluster"), col("keep_id"), col("n_members"), col("best_words"))
      .orderBy("cluster")
  }

  private val dedupKeepBestSql =
    s"""WITH RECURSIVE corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id,
       |    regexp_replace(text, '^\\S+\\s+\\S+\\s+', '') AS text
       |  FROM documents WHERE doc_id % 10 = 0),
       |${minhashScoredCtesFor("corpus")},
       |p AS (
       |  SELECT doc_a, doc_b FROM scored
       |  WHERE CAST(agree AS DOUBLE) / 64 >= 0.2),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM p
       |  UNION ALL SELECT doc_b, doc_a FROM p),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(id, comp) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
       |cl AS (SELECT id, min(comp) AS cluster FROM reach GROUP BY id),
       |wrd AS (
       |  SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z]+')) AS nw
       |  FROM corpus),
       |rk AS (
       |  SELECT cl.cluster, cl.id, w.nw,
       |    row_number() OVER (PARTITION BY cl.cluster
       |      ORDER BY w.nw DESC, cl.id) AS rn
       |  FROM cl JOIN wrd w ON w.doc_id = cl.id),
       |sizes AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_members FROM rk GROUP BY cluster)
       |SELECT r.cluster, r.id AS keep_id, s.n_members,
       |  CAST(r.nw AS BIGINT) AS best_words
       |FROM rk r JOIN sizes s ON r.cluster = s.cluster
       |WHERE r.rn = 1 ORDER BY r.cluster""".stripMargin

  // -- corpus n-gram top-k -------------------------------------------------

  private def ngramTopk(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val ws = TextAnalysis.words(col("text"))
    // compiled trigram builder; keep only true trigrams to mirror the
    // oracle (short docs contribute nothing)
    val grams = when(size(ws) >= 3, call_function("graft_word_trigrams", ws))
      .otherwise(array())
    docs(s, dir).select(explode(grams).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram"))
      .limit(20)
  }

  private val ngramTopkSql =
    """WITH w AS (
      |  SELECT regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents),
      |g AS (
      |  SELECT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ngram
      |  FROM w, UNNEST(range(1, greatest(len(ws) - 1, 1))) AS t(i)
      |  WHERE len(ws) >= 3)
      |SELECT ngram, count(*) AS n FROM g
      |GROUP BY ngram ORDER BY n DESC, ngram LIMIT 20""".stripMargin

  // -- end-to-end corpus filter decision -----------------------------------

  /** The filter DECISION a training-corpus build actually applies —
    * the quality/repetition/language signals composed into one
    * keep/drop verdict per document with the first failing rule as
    * the reason (Gopher/C4-style gating). Signals reuse the exact
    * column expressions of `text_quality`/`text_langid` and the
    * repetition aggregation of `docs_repetition`; thresholds are set
    * so every reason fires on testdata (non-vacuous at both gate
    * SFs). One word-level aggregation + per-row expressions — the
    * whole verdict is a single pass at any scale.
    */
  private def filterPipeline(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), col("lang"), col("text"))
    val rep = base.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg((max("c").cast("double") / sum("c")).as("top_word_frac"))
    val nWords = TextAnalysis.wordCount(col("text"))
    val stopRatio = TextAnalysis.stopwordCount(col("text")).cast("double") / nWords
    val score = least(nWords.cast("double") / 100.0, lit(1.0)) * (lit(1.0) - stopRatio)
    val sig = base.select(col("doc_id"), col("lang"), nWords.as("n_words"),
      score.as("score"), TextAnalysis.langGuess(col("text")).as("guess"))
    val reason = when(col("n_words") < 25, "too_short")
      .when(col("top_word_frac") > 0.14, "repetitive")
      .when(col("score") < 0.30, "low_quality")
      .when(col("guess") =!= col("lang"), "lang_mismatch")
      .otherwise("ok")
    sig.join(rep, "doc_id")
      .select(col("doc_id"), reason.as("reason"))
      .select(col("doc_id"), (col("reason") === "ok").as("keep"), col("reason"))
      .orderBy("doc_id")
  }

  private val filterPipelineSql = {
    val stopList = TextAnalysis.StopWords.map(w => s"'$w'").mkString(", ")
    s"""WITH ws AS (
       |  SELECT doc_id, lang, text, regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents),
       |sig AS (
       |  SELECT doc_id, lang, len(ws) AS n_words,
       |    CAST(len(list_filter(ws, x -> x IN ($stopList))) AS DOUBLE) / len(ws) AS stop_ratio,
       |    $langHitCols
       |  FROM ws),
       |rep AS (
       |  SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_word_frac FROM (
       |    SELECT doc_id, x, count(*) AS c
       |    FROM documents, unnest(string_split(text, ' ')) AS t(x) GROUP BY 1, 2)
       |  GROUP BY 1),
       |g AS (
       |  SELECT doc_id, lang, n_words, top_word_frac,
       |    least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * (1.0 - stop_ratio) AS score,
       |    $langGuessCase AS guess
       |  FROM sig JOIN rep USING (doc_id)),
       |r AS (
       |  SELECT doc_id,
       |    CASE WHEN n_words < 25 THEN 'too_short'
       |         WHEN top_word_frac > 0.14 THEN 'repetitive'
       |         WHEN score < 0.30 THEN 'low_quality'
       |         WHEN guess <> lang THEN 'lang_mismatch'
       |         ELSE 'ok' END AS reason
       |  FROM g)
       |SELECT doc_id, (reason = 'ok') AS keep, reason FROM r ORDER BY doc_id""".stripMargin
  }

  // -- BPE merge-pair counting (tokenizer training, round one) -------------

  /** The inner statistic of BPE tokenizer training: frequency of every
    * adjacent character pair across corpus word OCCURRENCES — the pair
    * a first merge round would fuse. Scale shape: the corpus
    * aggregates once to (word, count) — bounded by vocabulary, the
    * shuffle carries words not documents — and pairs then explode from
    * DISTINCT words only (pair work is vocabulary-sized, however big
    * the corpus); the final pair table is alphabet²-bounded. Exact
    * integer counts end to end; top-20 with a lexical tie-break.
    */
  private def bpePairCounts(s: SparkSession, dir: String): DataFrame = {
    val words = docs(s, dir)
      .select(explode(TextAnalysis.words(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .filter(length(col("w")) >= 2)
    words
      .select(col("cnt"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum("cnt").as("n"))
      .orderBy(col("n").desc, col("pair")).limit(20)
  }

  private val bpePairCountsSql =
    """WITH words AS (
      |  SELECT w, count(*) AS cnt
      |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      |        FROM documents)
      |  GROUP BY w),
      |pairs AS (
      |  SELECT unnest(list_transform(range(1, strlen(w)),
      |           i -> substr(w, CAST(i AS INT), 2))) AS pair, cnt
      |  FROM words WHERE strlen(w) >= 2)
      |SELECT pair, CAST(sum(cnt) AS BIGINT) AS n
      |FROM pairs GROUP BY pair
      |ORDER BY n DESC, pair LIMIT 20""".stripMargin

  // -- threshold curve ------------------------------------------------------

  /** The dedup threshold curve: LSH candidate pairs histogrammed by
    * raw signature agreement (0..64 matching minima ≈ Jaccard·64)
    * with the cumulative count at-or-above each level — what an
    * operator reads BEFORE picking a near-dup threshold, because it
    * says how many pairs (and so roughly how much corpus) each
    * candidate threshold would delete. Candidates are the certified
    * banded-LSH set (same-band pairs only — no all-pairs stage), the
    * histogram collapses them to ≤65 rows before the one bounded
    * running-total window.
    */
  private def thresholdCurve(s: SparkSession, dir: String): DataFrame = {
    val hist = Dedup.minhashAgreements(docs(s, dir), "doc_id", "text")
      .groupBy(col("agree").cast("long").as("agree"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("_nagree", -col("agree"))
    // suffix sum over agree DESC — a prefix sum over -agree. The frame
    // is ≤ #bands+1 rows, but PrefixSum keeps it window-free (no
    // "moving all data to a single partition" plan ever appears).
    PrefixSum.runningTotalGlobal(hist, Seq("_nagree"), "n_pairs", "pairs_at_or_above")
      .drop("_nagree")
      .orderBy("agree")
  }

  private val thresholdCurveSql =
    s"""$minhashScoredCtes,
       |hist AS (
       |  SELECT CAST(agree AS BIGINT) AS agree, CAST(count(*) AS BIGINT) AS n_pairs
       |  FROM scored GROUP BY 1)
       |SELECT agree, n_pairs,
       |  CAST(sum(n_pairs) OVER (ORDER BY agree DESC) AS BIGINT) AS pairs_at_or_above
       |FROM hist ORDER BY agree""".stripMargin

  // -- LSH candidate verification -------------------------------------------

  /** The VERIFY stage of candidate-based near-dup dedup: every banded
    * LSH candidate pair re-scored with its EXACT trigram Jaccard
    * (integer micro-units) next to the minhash estimate — production
    * dedup verifies candidates exactly before deleting, and this gate
    * certifies estimate and truth side by side (the estimator's error
    * is thereby cross-engine-pinned per pair, the text sibling of
    * `ann_recall_eval`). Exact sets are distinct trigram STRINGS —
    * no engine-local hash anywhere — and only the candidate sliver
    * (O(LSH pairs), not O(n²)) pays the set intersection.
    */
  private def lshVerify(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val d = docs(s, dir)
    val ws = TextAnalysis.words(col("text"))
    val grams = when(size(ws) >= 3, call_function("graft_word_trigrams", ws))
      .otherwise(array(concat_ws(" ", ws)))
    val sh = graft.Caches.register(
      d.select(col("doc_id"), array_distinct(grams).as("gs"))
        .withColumn("sz", size(col("gs"))))
    Dedup.minhashAgreements(d, "doc_id", "text")
      .join(sh.select(col("doc_id").as("doc_a"), col("gs").as("ga"), col("sz").as("sa")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("gs").as("gb"), col("sz").as("sb")), "doc_b")
      // size() is IntegerType — widen BEFORE the 10^6 scale or pairs
      // with ≥2148 shared trigrams overflow int (ANSI: a query abort)
      .withColumn("inter_n", size(array_intersect(col("ga"), col("gb"))).cast("long"))
      .select(col("doc_a"), col("doc_b"), col("agree").cast("long").as("agree"),
        expr("inter_n * 1000000 div (sa + sb - inter_n)").as("jaccard_micro"))
      .orderBy("doc_a", "doc_b")
  }

  private val lshVerifySql =
    s"""$minhashScoredCtes,
       |tw AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
       |  FROM documents),
       |tg AS (
       |  SELECT doc_id,
       |    CASE WHEN len(ws) >= 3 THEN
       |      list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)])
       |    ELSE [array_to_string(ws, ' ')] END AS gs
       |  FROM tw)
       |SELECT s.doc_a, s.doc_b, CAST(s.agree AS BIGINT) AS agree,
       |  (len(a.gs) + len(b.gs) - len(list_distinct(list_concat(a.gs, b.gs))))
       |    * 1000000
       |    // len(list_distinct(list_concat(a.gs, b.gs))) AS jaccard_micro
       |FROM scored s
       |JOIN tg a ON a.doc_id = s.doc_a
       |JOIN tg b ON b.doc_id = s.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("dedup_lsh_verify", lshVerify, Some(lshVerifySql)),
    QueryDef("dedup_threshold_curve", thresholdCurve, Some(thresholdCurveSql)),
    QueryDef("text_token_count", tokenCount, Some(tokenCountSql)),
    QueryDef("text_quality", quality, Some(qualitySql)),
    QueryDef("text_readability", readability, Some(readabilitySql)),
    QueryDef("text_langid", langid, Some(langidSql)),
    QueryDef("text_langid_confusion", langidConfusion, Some(langidConfusionSql)),
    QueryDef("text_fingerprint", fingerprint, Some(fingerprintSql)),
    QueryDef("text_normalize", normalize, Some(normalizeSql)),
    QueryDef("dedup_exact", dedupExact, Some(dedupExactSql)),
    QueryDef("dedup_fingerprint", dedupFingerprint, Some(dedupFingerprintSql)),
    QueryDef("dedup_minhash_lsh", minhashLsh, Some(minhashLshSql)),
    QueryDef("docs_split_leakage", splitLeakage, Some(splitLeakageSql)),
    QueryDef("dedup_simhash", simhashQ, Some(simhashSql)),
    QueryDef("dedup_simhash_pairs", simhashPairsQ, Some(simhashPairsSql)),
    QueryDef("dedup_simhash_clusters", simhashClusters, Some(simhashClustersSql)),
    QueryDef("dedup_incremental_near", dedupIncrementalNear, Some(dedupIncrementalNearSql)),
    QueryDef("ngram_jaccard_pairs", ngramJaccardPairs, Some(ngramJaccardSql)),
    QueryDef("dedup_clusters", dedupClusters, Some(dedupClustersSql)),
    QueryDef("dedup_clusters_lss", dedupClustersLss, Some(dedupClustersSql)),
    QueryDef("dedup_keep_list", dedupKeepList, Some(dedupKeepListSql)),
    QueryDef("dedup_keep_best", dedupKeepBest, Some(dedupKeepBestSql)),
    QueryDef("docs_decontaminate", decontaminate, Some(decontaminateSql)),
    QueryDef("docs_ngram_topk", ngramTopk, Some(ngramTopkSql)),
    QueryDef("docs_filter_pipeline", filterPipeline, Some(filterPipelineSql)),
    QueryDef("bpe_pair_counts", bpePairCounts, Some(bpePairCountsSql)),
  )
}
