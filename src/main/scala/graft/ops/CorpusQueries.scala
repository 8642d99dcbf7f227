package graft.ops

import graft.{QueryDef, QueryModule}
import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-preparation query block: the operators a large-scale
  * training-data pipeline runs between raw text and training shards —
  * repetition/quality signals, deterministic splits, stratified
  * sampling, PII scrubbing, weighted source mixing, context-window
  * chunking. All are pure column pipelines (no UDFs), hash-oracled in
  * DuckDB, and shaped for 100 TB: per-row compute parallelizes with
  * the scan; the only shuffles are the per-key aggregations and the
  * per-stratum windows, both on bounded-cardinality keys.
  *
  * Cross-engine determinism rests on md5: Spark's
  * `conv(substring(md5(x),1,6),16,10)` equals DuckDB's
  * `('0x'||substr(md5(x),1,6))::BIGINT` for the same input string, so
  * split/sample/mix decisions are bit-identical on both engines.
  */
object CorpusQueries extends QueryModule {

  // per-row heavy (word explodes, regex, hashes) — restore scan
  // parallelism on single-split staging (no-op on real multi-split input)
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.parallel(Tables.documents(s, dir))

  /** Stable per-document bucket in [0, 100): the md5-prefix trick
    * above, salted so independent decisions don't correlate.
    */
  private[ops] def hashBucket(salt: String, key: Column): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 6), 16, 10)
      .cast("long") % 100

  private[ops] def sqlBucket(salt: String, key: String): String =
    s"(('0x' || substr(md5('$salt' || CAST($key AS VARCHAR)), 1, 6))::BIGINT % 100)"

  // -- repetition signals (Gopher-style quality filters) -------------------

  /** Word- and bigram-repetition features: the "fraction of the
    * document that is its own most common n-gram" signals used to
    * drop template/boilerplate pages from training corpora. Explode →
    * two-level aggregation; partial aggregation keeps the shuffle at
    * (doc, gram) cardinality.
    */
  private def repetition(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), split(col("text"), " ").as("ws"))
    val uni = base.select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_words"), count(lit(1)).as("n_unique"), max("c").as("top_word_n"))
    val bigrams = base.select(col("doc_id"),
        explode(zip_with(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(sum("c").as("n_bigrams"), max("c").as("top_bigram_n"))
    uni.join(bigrams, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("n_unique"),
        round(col("n_unique") / col("n_words"), 6).as("frac_unique"),
        round(col("top_word_n") / col("n_words"), 6).as("top_word_frac"),
        round(coalesce(col("top_bigram_n") / col("n_bigrams"), lit(0.0)), 6)
          .as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  private val repetitionSql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |wc AS (SELECT doc_id, x, count(*) AS c FROM w, unnest(ws) AS t(x) GROUP BY 1, 2),
      |uni AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
      |  CAST(count(*) AS BIGINT) AS n_unique, max(c) AS top_word_n FROM wc GROUP BY 1),
      |bgc AS (
      |  SELECT doc_id, bg, count(*) AS c
      |  FROM w, unnest(list_transform(range(len(ws) - 1),
      |    i -> ws[i + 1] || ' ' || ws[i + 2])) AS t(bg)
      |  GROUP BY 1, 2),
      |bgs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
      |  max(c) AS top_bigram_n FROM bgc GROUP BY 1)
      |SELECT uni.doc_id, n_words, n_unique,
      |  round(n_unique / n_words, 6) AS frac_unique,
      |  round(top_word_n / n_words, 6) AS top_word_frac,
      |  round(coalesce(top_bigram_n / n_bigrams, 0.0), 6) AS top_bigram_frac
      |FROM uni LEFT JOIN bgs ON uni.doc_id = bgs.doc_id
      |ORDER BY uni.doc_id""".stripMargin

  // -- deterministic train/val/test split ----------------------------------

  /** Hash-split: every engine, every run, every shard assigns each
    * document to the same split — no global sort, no sampling state;
    * at 100 TB the split is a per-row expression on the scan.
    */
  private def split80(s: SparkSession, dir: String): DataFrame = {
    val b = hashBucket("split", col("doc_id"))
    docs(s, dir)
      .select(col("lang"),
        when(b < 80, "train").when(b < 90, "val").otherwise("test").as("split"))
      .groupBy("split", "lang").agg(count(lit(1)).as("n_docs"))
      .orderBy("split", "lang")
  }

  private val split80Sql =
    s"""SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
       |  lang, CAST(count(*) AS BIGINT) AS n_docs
       |FROM (SELECT lang, ${sqlBucket("split", "doc_id")} AS b FROM documents)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- stratified deterministic sample -------------------------------------

  /** ~10% per-language sample, deterministic: rank documents inside
    * each stratum by a stable hash and keep the first ceil(n/10).
    *
    * The rank is a distributed prefix COUNT ([[PrefixSum]]) — a rank
    * window partitioned by `lang` (5 values) would sort each stratum
    * on a single reducer at any scale. Here the only per-row shuffle
    * is one range-repartition; stratum totals come from the same
    * bounded subtotal pass (max rank per lang), so the result is
    * bit-identical to the window formulation without its ceiling.
    */
  private def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(lit("sample"), col("doc_id").cast("string")))
    val slim = docs(s, dir).select(col("doc_id"), col("lang"), h.as("h"))
      .withColumn("_one", lit(1L))
    val ranked = PrefixSum.runningTotal(slim, "lang", Seq("h"), "_one", "rn")
    val totals = ranked.groupBy("lang").agg(max("rn").as("n"))
    ranked.join(broadcast(totals), "lang")
      .filter(col("rn") <= ceil(col("n") / 10.0))
      .select(col("doc_id"), col("lang"), col("rn").as("rank_in_stratum"))
      .orderBy("doc_id")
  }

  private val sampleStratifiedSql =
    """SELECT doc_id, lang, CAST(rn AS BIGINT) AS rank_in_stratum FROM (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang ORDER BY md5('sample' || CAST(doc_id AS VARCHAR))) AS rn,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM documents)
      |WHERE rn <= ceil(n / 10.0) ORDER BY doc_id""".stripMargin

  // -- PII scrubbing --------------------------------------------------------

  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhonePat = "\\+1-[0-9]{3}-[0-9]{4}"

  /** Regex redaction of emails/phone numbers with per-doc match
    * counts. The testdata corpus contains no natural PII, so each doc
    * is deterministically decorated with synthetic contact strings
    * first — the oracle applies the identical decoration, making the
    * count and the scrubbed-text fingerprint non-vacuous at every SF.
    * Patterns are restricted to the regex subset Java and RE2 agree
    * on, so both engines see identical matches.
    */
  private def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val decorated = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"), lit("@mail.example.com or +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    val scrubbed = regexp_replace(
      regexp_replace(decorated, EmailPat, "[EMAIL]"), PhonePat, "[PHONE]")
    docs(s, dir).select(col("doc_id"),
      size(regexp_extract_all(decorated, lit(EmailPat), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(decorated, lit(PhonePat), lit(0))).cast("long").as("n_phones"),
      length(scrubbed).cast("long").as("n_chars_scrubbed"),
      md5(scrubbed).as("scrub_md5"))
      .orderBy("doc_id")
  }

  private val piiScrubSql = {
    val decorated = "text || ' contact user' || CAST(doc_id AS VARCHAR) || " +
      "'@mail.example.com or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\+1-[0-9]{3}-[0-9]{4}"
    s"""WITH d AS (SELECT doc_id, $decorated AS t FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(t, '$phone')) AS BIGINT) AS n_phones,
       |  CAST(strlen(regexp_replace(regexp_replace(t, '$email', '[EMAIL]', 'g'), '$phone', '[PHONE]', 'g')) AS BIGINT) AS n_chars_scrubbed,
       |  md5(regexp_replace(regexp_replace(t, '$email', '[EMAIL]', 'g'), '$phone', '[PHONE]', 'g')) AS scrub_md5
       |FROM d ORDER BY doc_id""".stripMargin
  }

  // -- weighted source mixing ----------------------------------------------

  /** Data mixing: each source gets a sampling weight (here a
    * deterministic 25/50/75/100% by source number) and documents are
    * kept by an independent hash draw — the standard way to re-weight
    * corpus components without a shuffle: keep/drop is a per-row
    * expression, counts verify the realized mix.
    */
  private def mixWeighted(s: SparkSession, dir: String): DataFrame = {
    val srcNum = substring(col("source"), 4, 10).cast("int")
    val wPct = (pmod(srcNum, lit(4)) + 1) * 25
    val keep = hashBucket("mix", col("doc_id")) < wPct
    docs(s, dir)
      .select(col("source"), wPct.cast("long").as("weight_pct"), keep.cast("long").as("k"))
      .groupBy("source", "weight_pct")
      .agg(count(lit(1)).as("n_docs"), sum("k").as("n_kept"))
      .orderBy("source")
  }

  private val mixWeightedSql =
    s"""SELECT source,
       |  CAST((CAST(substr(source, 4) AS INTEGER) % 4 + 1) * 25 AS BIGINT) AS weight_pct,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN ${sqlBucket("mix", "doc_id")} < (CAST(substr(source, 4) AS INTEGER) % 4 + 1) * 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM documents GROUP BY 1, 2 ORDER BY source""".stripMargin

  // -- temperature-flattened source rebalancing ------------------------------

  /** α=0.5 temperature sampling across sources — the multilingual /
    * multi-source rebalancing shape (mT5's p_s ∝ n_s^α): the smallest
    * source keeps everything and every larger source subsamples at
    * `rate_s = sqrt(n_min / n_s)`, so realized counts flatten to
    * ∝ sqrt(n_s) without any cross-source normalizing sum (a Σ n_t^α
    * of doubles would be summation-order-dependent; the min is not).
    * α=0.5 is the one temperature whose weight function (sqrt) is a
    * correctly-rounded IEEE op, so every keep decision — a 48-bit
    * md5-prefix uniform in [0,1) against the exact-divided rate — is
    * bit-identical cross-engine and the whole realized mix
    * hash-oracles.
    *
    * Scale shape: one bounded per-source count aggregation broadcast
    * back; the keep decision is per-row; text never shuffles.
    */
  private def mixTemperature(s: SparkSession, dir: String): DataFrame = {
    // the synthetic corpus is perfectly source-balanced, so the srcN
    // labels regroup deterministically into four unequal families
    // (6:2:1:1) — otherwise every rate is 1.0 and the flattening path
    // is vacuous
    val g = pmod(substring(col("source"), 4, 10).cast("int"), lit(8))
    val group = when(g < 4, "web").when(g < 6, "wiki")
      .when(g === 6, "books").otherwise("code")
    val d = docs(s, dir).select(group.as("src_group"), col("doc_id"))
    val counts = d.groupBy("src_group").agg(count(lit(1)).as("n_docs"))
    val nMin = counts.agg(min("n_docs").as("n_min"))
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col("src_group"), col("n_docs"),
        sqrt(col("n_min").cast("double") / col("n_docs").cast("double")).as("rate"))
    // exact uniform in [0,1): 48-bit md5 prefix (≤ 2^48 < 2^53 exact
    // in double) scaled by the power-of-two 2^48 — no rounding anywhere
    val u = conv(substring(md5(concat(lit("temp"), col("doc_id").cast("string"))), 1, 12), 16, 10)
      .cast("double") / lit(math.pow(2, 48))
    d.select(col("src_group"), u.as("u"))
      .join(broadcast(rates), "src_group")
      .select(col("src_group"), col("n_docs"), col("rate"),
        (col("u") < col("rate")).cast("long").as("k"))
      .groupBy("src_group", "n_docs", "rate")
      .agg(sum("k").as("n_kept"))
      .select(col("src_group"), col("n_docs"), round(col("rate"), 6).as("rate"),
        col("n_kept"))
      .orderBy("src_group")
  }

  private val mixTemperatureSql =
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN CAST(substr(source, 4) AS INTEGER) % 8 < 4 THEN 'web'
      |         WHEN CAST(substr(source, 4) AS INTEGER) % 8 < 6 THEN 'wiki'
      |         WHEN CAST(substr(source, 4) AS INTEGER) % 8 = 6 THEN 'books'
      |         ELSE 'code' END AS src_group
      |  FROM documents),
      |counts AS (SELECT src_group, count(*) AS n_docs FROM d GROUP BY 1),
      |nmin AS (SELECT min(n_docs) AS n_min FROM counts),
      |rates AS (
      |  SELECT src_group, n_docs,
      |    sqrt(CAST(n_min AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS rate
      |  FROM counts CROSS JOIN nmin),
      |kept AS (
      |  SELECT d.src_group,
      |    CAST(sum(CASE WHEN
      |      CAST(('0x' || substr(md5('temp' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS DOUBLE)
      |        / 281474976710656.0 < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |  FROM d JOIN rates USING (src_group)
      |  GROUP BY 1)
      |SELECT src_group, CAST(n_docs AS BIGINT) AS n_docs, round(rate, 6) AS rate, n_kept
      |FROM rates JOIN kept USING (src_group)
      |ORDER BY src_group""".stripMargin

  // -- context-window chunking ---------------------------------------------

  private val ChunkWords = 50

  /** Fixed-budget chunking: split each document into 50-word windows
    * (the context-window sharding step before tokenization). Pure
    * per-row explode — chunk count is derived, no state, no shuffle;
    * chunk text is fingerprinted rather than materialized in the
    * output.
    */
  private def chunk(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("n_chunks", expr(s"(size(ws) + ${ChunkWords - 1}) div $ChunkWords"))
    val piece = slice(col("ws"), col("chunk_id") * ChunkWords + 1, lit(ChunkWords))
    base.select(col("doc_id"), col("ws"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        size(piece).cast("long").as("n_chunk_words"),
        md5(array_join(piece, " ")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")
  }

  private val chunkSql =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |c AS (SELECT doc_id, ws, i FROM w,
       |  unnest(range((len(ws) + ${ChunkWords - 1}) // $ChunkWords)) AS t(i))
       |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       |  CAST(len(list_slice(ws, i * $ChunkWords + 1, least((i + 1) * $ChunkWords, len(ws)))) AS BIGINT) AS n_chunk_words,
       |  md5(array_to_string(list_slice(ws, i * $ChunkWords + 1, least((i + 1) * $ChunkWords, len(ws))), ' ')) AS chunk_md5
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  // -- token-budget shard packing ------------------------------------------

  private val ShardTokens = 500

  /** Assign documents to training shards of ~500 tokens per source:
    * a running token total in stable doc_id order places each doc in
    * the shard where its first token lands.
    *
    * The running total is a distributed prefix sum ([[PrefixSum]]) —
    * a window partitioned by `source` would serialize each source
    * onto one reducer (5 sources at 100 TB = 5 straggler tasks doing
    * a full per-source sort). Shard ids stay deterministic across
    * engines and runs (the global (source, doc_id) order defines
    * them; no RNG, no coordinator).
    */
  private def packShards(s: SparkSession, dir: String): DataFrame = {
    val toks = size(split(col("text"), " ")).cast("long")
    val slim = docs(s, dir).select(col("doc_id"), col("source"), toks.as("n_tokens"))
    PrefixSum.runningTotal(slim, "source", Seq("doc_id"), "n_tokens", "cum")
      .withColumn("shard_id", floor((col("cum") - col("n_tokens")) / ShardTokens))
      .groupBy("source", "shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("shard_tokens"))
      .orderBy("source", "shard_id")
  }

  // -- seeded shuffle sharding ---------------------------------------------

  private val ShuffleShards = 8
  private val ShuffleSeed = "graft-shuffle-7:"

  /** Deterministic GLOBAL training-order shuffle: every doc gets a
    * pseudo-random rank from `md5(seed || doc_id)` (ties broken by
    * doc_id) and round-robins into one of 8 EQUAL-SIZE shards (±1
    * doc) — the reproducible corpus shuffle a training run needs,
    * where the hash-split (`docs_split`) gives binomially-sized
    * shards and no defined within-shard order. The global rank rides
    * the distributed [[PrefixSum]] (no partitionless window); no RNG
    * state, no coordinator — any engine reproduces the identical
    * permutation from the seed alone. Output: per-shard counts with
    * membership witnesses (doc_id sum + the shard's first hash).
    */
  private def shuffleShards(s: SparkSession, dir: String): DataFrame = {
    val seeded = docs(s, dir).select(col("doc_id"),
      md5(concat(lit(ShuffleSeed), col("doc_id").cast("string"))).as("h"))
      .withColumn("_g", lit(1)).withColumn("_one", lit(1L))
    PrefixSum.runningTotal(seeded, "_g", Seq("h", "doc_id"), "_one", "rank")
      .withColumn("shard_id", (col("rank") - 1) % ShuffleShards)
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("doc_id").as("doc_id_sum"),
        min("h").as("first_hash"))
      .orderBy("shard_id")
  }

  private val shuffleShardsSql =
    s"""SELECT CAST((rn - 1) % $ShuffleShards AS BIGINT) AS shard_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(doc_id) AS BIGINT) AS doc_id_sum,
       |  min(h) AS first_hash
       |FROM (
       |  SELECT doc_id, h, row_number() OVER (ORDER BY h, doc_id) AS rn
       |  FROM (SELECT doc_id,
       |          md5('$ShuffleSeed' || CAST(doc_id AS VARCHAR)) AS h
       |        FROM documents))
       |GROUP BY 1 ORDER BY 1""".stripMargin

  private val packShardsSql =
    s"""SELECT source, shard_id, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
       |FROM (
       |  SELECT doc_id, source, n_tokens,
       |    CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
       |      / $ShardTokens) AS BIGINT) AS shard_id
       |  FROM (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
       |        FROM documents))
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- fixed-length sequence packing ---------------------------------------

  private val SeqTokens = 512

  /** Concat-and-chunk sequence packing — the step that turns a
    * document corpus into fixed-length training sequences: documents
    * concatenate in deterministic (doc_id) order into one token
    * stream, chunked every `SeqTokens` tokens; a document spans every
    * sequence its token range overlaps. Output per sequence: how many
    * documents contribute and how many tokens land in it (= SeqTokens
    * except the tail).
    *
    * The stream offset is the same distributed prefix sum as
    * `docs_pack_shards` (no single-reducer window), and the
    * doc→sequence fan-out is a bounded explode (total output rows =
    * total_tokens / SeqTokens). Deterministic — no RNG, no
    * coordinator — so shard-parallel packing runs agree.
    */
  private def packSequences(s: SparkSession, dir: String): DataFrame = {
    val toks = size(split(col("text"), " ")).cast("long")
    val slim = docs(s, dir).select(col("doc_id"), toks.as("n_tokens"))
      .withColumn("_g", lit(0))
    val cum = PrefixSum.runningTotal(slim, "_g", Seq("doc_id"), "n_tokens", "cum")
    val start = col("cum") - col("n_tokens")
    cum
      .withColumn("seq_id", explode(sequence(
        floor(start / SeqTokens), floor((col("cum") - 1) / SeqTokens))))
      .withColumn("in_seq",
        least(col("cum"), (col("seq_id") + 1) * SeqTokens)
          - greatest(col("cum") - col("n_tokens"), col("seq_id") * SeqTokens))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("in_seq").as("n_tokens"))
      .orderBy("seq_id")
  }

  private val packSequencesSql =
    s"""WITH t AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |    sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t),
       |x AS (
       |  SELECT doc_id, n_tokens, cum,
       |    unnest(generate_series(
       |      CAST(floor((cum - n_tokens) / $SeqTokens.0) AS BIGINT),
       |      CAST(floor((cum - 1) / $SeqTokens.0) AS BIGINT))) AS seq_id
       |  FROM c)
       |SELECT seq_id, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(least(cum, (seq_id + 1) * $SeqTokens)
       |           - greatest(cum - n_tokens, seq_id * $SeqTokens)) AS BIGINT) AS n_tokens
       |FROM x GROUP BY 1 ORDER BY 1""".stripMargin

  // -- KMV distinct-count sketch -------------------------------------------

  /** Distinct word-trigram cardinality per source, exact AND by KMV
    * sketch ([[Sketches.kmvDistinct]]): the "how many distinct
    * n-grams / URLs / docs does this corpus slice hold" question that
    * exact distinct cannot answer at 100 TB but a k-longs-per-group
    * sketch can. The estimate is a deterministic function of the
    * input set (md5-prefix hashes), so the oracle reproduces BOTH
    * columns bit-for-bit — a sketch whose correctness is
    * hash-verifiable cross-engine, unlike HLL.
    */
  private def sketchDistinct(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val grams = docs(s, dir).select(col("source"),
      explode(call_function("graft_word_trigrams", split(col("text"), " "))).as("gram"))
    Sketches.kmvDistinct(grams, "source", "gram").orderBy("source")
  }

  private val sketchDistinctSql = {
    val k = Sketches.DefaultK
    s"""WITH w AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
       |g AS (SELECT DISTINCT source, unnest(
       |        CASE WHEN len(ws) >= 3 THEN
       |          [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)]
       |        ELSE [array_to_string(ws, ' ')] END) AS gram
       |      FROM w),
       |d AS (SELECT DISTINCT source, ('0x' || substr(md5(gram), 1, 12))::BIGINT AS h FROM g),
       |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM d),
       |kth AS (SELECT source, h AS hk FROM r WHERE rn = $k),
       |ex AS (SELECT source, CAST(count(*) AS BIGINT) AS exact_distinct FROM d GROUP BY 1)
       |SELECT ex.source, exact_distinct,
       |  round(coalesce(${k - 1} * 281474976710656.0 / hk, exact_distinct::DOUBLE), 2) AS kmv_estimate
       |FROM ex LEFT JOIN kth ON ex.source = kth.source
       |ORDER BY ex.source""".stripMargin
  }

  /** Vocabulary overlap between corpus slices from their KMV sketches
    * (r12, [[Sketches.kmvOverlap]]) — theta-sketch set algebra: each
    * source's distinct word-trigram set reduces to its 64 smallest hashes,
    * and every pairwise intersection is estimated from the sketches
    * alone as |S_a ∩ S_b ∩ [0,θ)|·2^48/θ, θ = min(θ_a, θ_b). The
    * cross-slice contamination/affinity question at 100 TB, where the
    * element sets never co-locate and an exact distinct-join is off
    * the table; here the exact overlap rides alongside as the
    * judged-against column. Fully deterministic — the oracle replays
    * sketch construction, θ, the filtered common count, and the
    * estimate division bit-for-bit.
    */
  private def sketchOverlap(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val grams = docs(s, dir).select(col("source"),
      explode(call_function("graft_word_trigrams", split(col("text"), " "))).as("w"))
    Sketches.kmvOverlap(grams, "source", "w").orderBy("group_a", "group_b")
  }

  private val sketchOverlapSql = {
    val k = Sketches.DefaultK
    s"""WITH w AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
       |g AS (SELECT DISTINCT source, unnest(
       |        CASE WHEN len(ws) >= 3 THEN
       |          [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)]
       |        ELSE [array_to_string(ws, ' ')] END) AS word
       |      FROM w),
       |d AS (SELECT DISTINCT source, ('0x' || substr(md5(word), 1, 12))::BIGINT AS h
       |      FROM g),
       |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |      FROM d),
       |sk AS (SELECT source, h, rn FROM r WHERE rn <= $k),
       |th AS (SELECT source,
       |         coalesce(max(CASE WHEN rn = $k THEN h END), 281474976710656) AS theta
       |       FROM sk GROUP BY 1),
       |pairs AS (
       |  SELECT ta.source AS group_a, tb.source AS group_b,
       |    least(ta.theta, tb.theta) AS theta
       |  FROM th ta JOIN th tb ON ta.source < tb.source),
       |common AS (
       |  SELECT p.group_a, p.group_b, count(*)::BIGINT AS n_common
       |  FROM pairs p
       |  JOIN sk a ON a.source = p.group_a
       |  JOIN sk b ON b.source = p.group_b AND b.h = a.h
       |  WHERE a.h < p.theta GROUP BY 1, 2),
       |ex AS (
       |  SELECT a.source AS group_a, b.source AS group_b,
       |    count(*)::BIGINT AS exact_overlap
       |  FROM d a JOIN d b ON a.h = b.h AND a.source < b.source GROUP BY 1, 2)
       |SELECT p.group_a, p.group_b, p.theta,
       |  coalesce(n_common, 0) AS n_common,
       |  round(coalesce(n_common, 0) * 281474976710656.0 / p.theta, 2) AS est_overlap,
       |  coalesce(exact_overlap, 0) AS exact_overlap
       |FROM pairs p
       |LEFT JOIN common USING (group_a, group_b)
       |LEFT JOIN ex USING (group_a, group_b)
       |ORDER BY group_a, group_b""".stripMargin
  }

  /** Distinct users per HOUR, exact and by the same KMV sketch — the
    * time-bucketed uniques question ("DAU per window") that exact
    * distinct cannot answer over an unbounded stream but k longs per
    * bucket can; per-bucket sketches of disjoint shards merge by
    * keeping the k smallest hashes. Ids hash through the portable
    * md5 prefix (cast to string on BOTH engines — md5 of a raw
    * BIGINT casts differently per engine), so estimate and exact are
    * bit-reproducible.
    */
  private def sketchUniquesHourly(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(date_trunc("hour", col("ts")).as("hour"),
        col("user_id").cast("string").as("uid"))
    Sketches.kmvDistinct(e, "hour", "uid").orderBy("hour")
  }

  private val sketchUniquesHourlySql = {
    val k = Sketches.DefaultK
    s"""WITH e AS (
       |  SELECT date_trunc('hour', ts) AS hour, CAST(user_id AS VARCHAR) AS uid
       |  FROM events),
       |d AS (SELECT DISTINCT hour, ('0x' || substr(md5(uid), 1, 12))::BIGINT AS h FROM e),
       |r AS (SELECT hour, h, row_number() OVER (PARTITION BY hour ORDER BY h) AS rn FROM d),
       |kth AS (SELECT hour, h AS hk FROM r WHERE rn = $k),
       |ex AS (SELECT hour, CAST(count(*) AS BIGINT) AS exact_distinct FROM d GROUP BY 1)
       |SELECT ex.hour, exact_distinct,
       |  round(coalesce(${k - 1} * 281474976710656.0 / hk, exact_distinct::DOUBLE), 2) AS kmv_estimate
       |FROM ex LEFT JOIN kth ON ex.hour = kth.hour
       |ORDER BY ex.hour""".stripMargin
  }

  // -- count-min frequency sketch ------------------------------------------

  /** Count-min word-frequency estimates for the corpus's 20 heaviest
    * words ([[Sketches.countMinTable]]): d×w counters of state however
    * large the vocabulary, shard sketches merge by addition — the
    * heavy-hitter counting story at 100 TB, where exact counts shuffle
    * the whole vocabulary. Salted-md5 bucket hashes make the sketch a
    * pure function of the input multiset, so the oracle reproduces
    * every estimate bit-for-bit; the CM guarantee (estimate ≥ exact,
    * bounded overestimate) is asserted in ScalaTest.
    */
  private def sketchCountMin(s: SparkSession, dir: String): DataFrame = {
    val words = graft.Caches.register(
      docs(s, dir).select(explode(TextAnalysis.words(col("text"))).as("w")))
    val table = Sketches.countMinTable(words, "w")
    val top = words.groupBy("w").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("w")).limit(20)
    Sketches.cmEstimates(top, table, "w")
      .orderBy(col("exact_n").desc, col("w"))
  }

  private val sketchCountMinSql = {
    def bucket(saltedElem: String) =
      s"('0x' || substr(md5($saltedElem), 1, 12))::BIGINT % 256"
    s"""WITH wds AS (
       |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |  FROM documents),
       |tbl AS (
       |  SELECT j, ${bucket("'cm' || CAST(j AS VARCHAR) || ':' || w")} AS bucket,
       |    count(*) AS n
       |  FROM wds CROSS JOIN unnest([0, 1, 2, 3]) AS t(j)
       |  GROUP BY 1, 2),
       |top AS (
       |  SELECT w, count(*) AS exact_n FROM wds
       |  GROUP BY 1 ORDER BY exact_n DESC, w LIMIT 20)
       |SELECT top.w, top.exact_n, min(coalesce(n, 0)) AS cm_estimate
       |FROM top CROSS JOIN unnest([0, 1, 2, 3]) AS q(j)
       |LEFT JOIN tbl ON tbl.j = q.j
       |  AND tbl.bucket = ${bucket("'cm' || CAST(q.j AS VARCHAR) || ':' || top.w")}
       |GROUP BY 1, 2
       |ORDER BY exact_n DESC, w""".stripMargin
  }

  // -- deterministic quantile sketch ---------------------------------------

  /** Per-event-type value quantiles from a 256-row deterministic
    * hash-sample ([[Sketches.sampleQuantiles]]): the bounded-state
    * companion to exact `events_percentiles` — per-group state is k
    * (hash, value) pairs at any group size and shard samples merge by
    * union, which is what quantile estimation over 100 TB needs
    * (exact percentile must collect every value per group). The
    * sample membership is a deterministic function of event_ids, so
    * the oracle reproduces the ESTIMATES bit-for-bit; accuracy vs the
    * exact quantiles is asserted in ScalaTest.
    */
  private def sketchQuantiles(s: SparkSession, dir: String): DataFrame =
    Sketches.sampleQuantiles(Tables.events(s, dir),
        groupCol = "event_type", keyCol = "event_id", valCol = "value")
      .orderBy("event_type")

  private val sketchQuantilesSql = {
    val k = 256
    def pick(q: Double, name: String) =
      s"vs[CAST(ceil($q * m) AS INT)] AS $name"
    s"""WITH h AS (
       |  SELECT event_type,
       |    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))::BIGINT AS h,
       |    value AS v
       |  FROM events),
       |r AS (
       |  SELECT event_type, h, v,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h, v) AS rn
       |  FROM h),
       |s AS (
       |  SELECT event_type, list_sort(list(v)) AS vs, count(*) AS m
       |  FROM r WHERE rn <= $k GROUP BY 1)
       |SELECT event_type, m AS n_sampled,
       |  ${pick(0.5, "p50")},
       |  ${pick(0.9, "p90")},
       |  ${pick(0.99, "p99")}
       |FROM s ORDER BY event_type""".stripMargin
  }

  /** Split-drift monitor (train/val/test integrity): for each pair of
    * md5-split buckets, a two-sample z² on token-count means. Each
    * split reduces to exact integer sufficient statistics (n, Σtok,
    * Σtok²) in ONE aggregation; the 3 pairwise tests run on those 3
    * rows — the 100 TB cost is one pass over the corpus regardless of
    * how many pairs are compared. z² = (mā−m̄b)²/(va/na+vb/nb) is
    * evaluated in double from the exact stats with an identical
    * operation tree in both engines (every step correctly rounded →
    * bit-identical), rounded only at the report edge. A correct
    * hash split should NOT drift — the expected flag is false, and
    * that's the audit's point; the z² magnitudes prove the test ran.
    */
  private def splitDrift(s: SparkSession, dir: String): DataFrame = {
    val b = hashBucket("split", col("doc_id"))
    val stats = docs(s, dir)
      .select(
        when(b < 80, "train").when(b < 90, "val").otherwise("test").as("split"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("t"))
      .groupBy("split")
      .agg(count(lit(1)).as("n"), sum("t").as("st"),
        sum(col("t") * col("t")).as("st2"))
    val a = stats.select(col("split").as("split_a"), col("n").as("na"),
      col("st").as("sa"), col("st2").as("qa"))
    val bb = stats.select(col("split").as("split_b"), col("n").as("nb"),
      col("st").as("sb"), col("st2").as("qb"))
    a.join(bb, col("split_a") < col("split_b"))
      .select(col("split_a"), col("split_b"), col("na"), col("nb"),
        round(
          (((col("sa").cast("double") / col("na")) - (col("sb").cast("double") / col("nb"))) *
            ((col("sa").cast("double") / col("na")) - (col("sb").cast("double") / col("nb")))) /
            (((col("qa").cast("double") / col("na")) - (col("sa").cast("double") / col("na")) * (col("sa").cast("double") / col("na"))) / col("na") +
             ((col("qb").cast("double") / col("nb")) - (col("sb").cast("double") / col("nb")) * (col("sb").cast("double") / col("nb"))) / col("nb")),
          4).as("z2"))
      .orderBy("split_a", "split_b")
  }

  private val splitDriftSql =
    s"""WITH stats AS (
       |  SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(t) AS BIGINT) AS st, CAST(sum(t * t) AS BIGINT) AS st2
       |  FROM (SELECT ${sqlBucket("split", "doc_id")} AS b,
       |          CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS t
       |        FROM documents)
       |  GROUP BY 1)
       |SELECT a.split AS split_a, b.split AS split_b, a.n AS na, b.n AS nb,
       |  round(
       |    ((CAST(a.st AS DOUBLE) / a.n) - (CAST(b.st AS DOUBLE) / b.n)) *
       |    ((CAST(a.st AS DOUBLE) / a.n) - (CAST(b.st AS DOUBLE) / b.n)) /
       |    (((CAST(a.st2 AS DOUBLE) / a.n) - (CAST(a.st AS DOUBLE) / a.n) * (CAST(a.st AS DOUBLE) / a.n)) / a.n +
       |     ((CAST(b.st2 AS DOUBLE) / b.n) - (CAST(b.st AS DOUBLE) / b.n) * (CAST(b.st AS DOUBLE) / b.n)) / b.n),
       |  4) AS z2
       |FROM stats a JOIN stats b ON a.split < b.split
       |ORDER BY split_a, split_b""".stripMargin

  /** Feature-hashing vectorizer (the hashing trick): each token maps
    * to one of 1024 buckets by md5, with an md5-derived ±1 sign to
    * de-bias collisions; a document's vector is the signed occurrence
    * sum per bucket. NO vocabulary is ever built or shuffled — the
    * defining property of the trick at corpus scale; the only shuffle
    * carries (doc, bucket) partial sums, capped at 1024/doc. The
    * gate row per doc is (nnz, l1, checksum) — exact BIGINT summaries
    * of the sparse vector rather than 1024 dense columns.
    */
  private def featureHash(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
    val hashed = toks.select(
      col("doc_id"),
      (conv(substring(md5(col("w")), 1, 6), 16, 10).cast("long") % 1024).as("b"),
      when(conv(substring(md5(col("w")), 7, 1), 16, 10).cast("long") % 2 === 0, 1L)
        .otherwise(-1L).as("sgn"))
    hashed.groupBy("doc_id", "b").agg(sum("sgn").as("v"))
      .groupBy("doc_id")
      .agg(
        sum((col("v") =!= 0).cast("long")).as("nnz"),
        sum(abs(col("v"))).as("l1"),
        sum((col("b") + 1) * col("v")).as("checksum"))
      .orderBy("doc_id")
  }

  private val featureHashSql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
      |  FROM documents),
      |h AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(w), 1, 6))::BIGINT % 1024 AS b,
      |    CASE WHEN ('0x' || substr(md5(w), 7, 1))::BIGINT % 2 = 0
      |         THEN 1 ELSE -1 END AS sgn
      |  FROM toks WHERE length(w) > 0),
      |v AS (SELECT doc_id, b, sum(sgn) AS v FROM h GROUP BY 1, 2)
      |SELECT doc_id,
      |  CAST(sum(CASE WHEN v <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nnz,
      |  CAST(sum(abs(v)) AS BIGINT) AS l1,
      |  CAST(sum((b + 1) * v) AS BIGINT) AS checksum
      |FROM v GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** DSIR-shaped data selection: importance weights toward a TARGET
    * distribution via hashed n-gram features (Xie et al.'s
    * data-selection-for-LMs recipe, here with the `lang = 'en'` slice
    * standing in for the target corpus). Every doc's word bigrams
    * hash into 256 buckets (md5 prefix — engine-portable, NO
    * vocabulary is ever built or shuffled); each bucket's importance
    * ratio compares target frequency to corpus frequency; a doc's
    * score sums its bucket counts times the bucket weights. Docs
    * resembling the target rank first — the sampling key for
    * target-matched pretraining mixes.
    *
    * All arithmetic is EXACT: the bucket weight is an integer
    * micro-ratio `(10^6·t_b·C + D/2) div D` with `D = c_b·T` computed
    * in decimal(38,0) (HUGEINT in the oracle — products reach ~10^19
    * at corpus scale, past BIGINT), and scores are plain BIGINT sums
    * of count×weight — no logs, no floats, so the ranking is
    * bit-identical cross-engine. Scale shape: the corpus shuffles
    * only (doc, bucket, count) partials capped at 256/doc; the
    * 256-row weight table and 1-row scalars broadcast back; text
    * never leaves its scan.
    */
  private def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    // the word array is hoisted to a column: referencing `wl` inside
    // the transform lambda evaluates the split ONCE per row — inlining
    // split(trim(text)) in the lambda body re-split the text per
    // ELEMENT (O(words²) per doc, the query's dominant CPU)
    val bigrams = when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(expr(
        "transform(sequence(0, size(wl) - 2), " +
          "i -> concat(element_at(wl, i + 1), ' ', element_at(wl, i + 2)))"))
    // cached: perBucket feeds the bucket totals AND the final re-join
    val perBucket = graft.Caches.register(docs(s, dir)
      .withColumn("wl", split(trim(col("text")), "\\s+"))
      .select(col("doc_id"), col("lang"), explode(bigrams).as("g"))
      .select(col("doc_id"), col("lang"),
        (conv(substring(md5(col("g")), 1, 6), 16, 10).cast("long") % 256).as("b"))
      .groupBy("doc_id", "lang", "b").agg(count(lit(1)).as("n")))
    val dec = "decimal(38,0)"
    val buckets = perBucket.groupBy("b").agg(
      sum("n").cast(dec).as("c_b"),
      sum(when(col("lang") === "en", col("n")).otherwise(0L)).cast(dec).as("t_b"))
    val scalars = buckets.agg(
      sum("c_b").cast(dec).as("corpus_total"), sum("t_b").cast(dec).as("target_total"))
    val weights = buckets.crossJoin(broadcast(scalars))
      .select(col("b"), expr(
        "CAST(((CAST(1000000 AS DECIMAL(38,0)) * t_b * corpus_total) + " +
          "((c_b * target_total) DIV 2)) DIV (c_b * target_total) AS BIGINT)").as("w"))
    perBucket.join(broadcast(weights), "b")
      .groupBy("doc_id", "lang")
      .agg(sum("n").cast("long").as("n_bigrams"),
        sum(col("n") * col("w")).cast("long").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(50)
  }

  private val dsirWeightsSql =
    """WITH t AS (
      |  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS l
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, lang, l[i] || ' ' || l[i + 1] AS g
      |  FROM (
      |    SELECT doc_id, lang, l, unnest(generate_series(1, len(l) - 1)) AS i
      |    FROM t WHERE len(l) >= 2)),
      |n AS (
      |  SELECT doc_id, lang, ('0x' || substr(md5(g), 1, 6))::BIGINT % 256 AS b,
      |    count(*)::HUGEINT AS n
      |  FROM bg GROUP BY 1, 2, 3),
      |bt AS (
      |  SELECT b, sum(n)::HUGEINT AS c_b,
      |    sum(CASE WHEN lang = 'en' THEN n ELSE 0 END)::HUGEINT AS t_b
      |  FROM n GROUP BY 1),
      |s AS (SELECT sum(c_b)::HUGEINT AS corpus_total, sum(t_b)::HUGEINT AS target_total FROM bt),
      |w AS (
      |  SELECT b,
      |    ((1000000::HUGEINT * t_b * (SELECT corpus_total FROM s))
      |      + ((c_b * (SELECT target_total FROM s)) // 2))
      |      // (c_b * (SELECT target_total FROM s)) AS w
      |  FROM bt)
      |SELECT doc_id, lang, CAST(sum(n) AS BIGINT) AS n_bigrams,
      |  CAST(sum(n * w) AS BIGINT) AS score
      |FROM n JOIN w USING (b)
      |GROUP BY doc_id, lang
      |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin

  // -- weighted sample without replacement ----------------------------------

  private val WSampleN = 200

  /** Deterministic weighted sampling without replacement via PRIORITY
    * SAMPLING (Duffield–Lund–Thorup, JACM 2007): every document draws
    * a stable uniform h (48-bit md5 prefix — exact in a double) and
    * the sample is the [[WSampleN]] smallest h/weight priorities, so
    * inclusion probability grows with weight (here n_chars: longer
    * docs are likelier picks — the length-weighted corpus draw used
    * to build eval slices). The only double op is ONE division per
    * row — IEEE-exact and identical cross-engine, unlike pow/ln-based
    * A-Res — and the selection is a top-k, which Spark executes as
    * TakeOrderedAndProject (per-partition heaps + one merge, no
    * global sort) at any corpus size.
    */
  private def sampleWeighted(s: SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(concat(lit("wsample"), col("doc_id").cast("string"))), 1, 12), 16, 10)
      .cast("long")
    docs(s, dir).filter(col("n_chars") > 0)
      .select(col("doc_id"), col("source"), col("n_chars"), h.as("h"))
      .orderBy((col("h").cast("double") / col("n_chars")).asc, col("doc_id"))
      .limit(WSampleN)
  }

  private val sampleWeightedSql =
    s"""SELECT doc_id, source, n_chars, h FROM (
       |  SELECT doc_id, source, n_chars,
       |    ('0x' || substr(md5('wsample' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS h
       |  FROM documents WHERE n_chars > 0)
       |ORDER BY CAST(h AS DOUBLE) / n_chars ASC, doc_id LIMIT $WSampleN""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("docs_repetition", repetition, Some(repetitionSql)),
    QueryDef("docs_sample_weighted", sampleWeighted, Some(sampleWeightedSql)),
    QueryDef("docs_dsir_weights", dsirWeights, Some(dsirWeightsSql)),
    QueryDef("docs_split", split80, Some(split80Sql)),
    QueryDef("docs_sample_stratified", sampleStratified, Some(sampleStratifiedSql)),
    QueryDef("docs_pii_scrub", piiScrub, Some(piiScrubSql)),
    QueryDef("docs_mix_weighted", mixWeighted, Some(mixWeightedSql)),
    QueryDef("docs_mix_temperature", mixTemperature, Some(mixTemperatureSql)),
    QueryDef("docs_chunk", chunk, Some(chunkSql)),
    QueryDef("docs_pack_shards", packShards, Some(packShardsSql)),
    QueryDef("docs_shuffle_shards", shuffleShards, Some(shuffleShardsSql)),
    QueryDef("docs_pack_sequences", packSequences, Some(packSequencesSql)),
    QueryDef("sketch_uniques_hourly", sketchUniquesHourly, Some(sketchUniquesHourlySql)),
    QueryDef("sketch_distinct_ngrams", sketchDistinct, Some(sketchDistinctSql)),
    QueryDef("sketch_overlap_kmv", sketchOverlap, Some(sketchOverlapSql)),
    QueryDef("sketch_quantiles", sketchQuantiles, Some(sketchQuantilesSql)),
    QueryDef("sketch_countmin_words", sketchCountMin, Some(sketchCountMinSql)),
    QueryDef("docs_feature_hash", featureHash, Some(featureHashSql)),
    QueryDef("docs_split_drift", splitDrift, Some(splitDriftSql)),
    // both gates serve from the per-corpus-dir training memo: the
    // 6-round merge loop runs once per dir, shared across queries
    QueryDef("bpe_train_merges",
      (s, dir) => BpeTrain.trainMergesMemo(s, dir, docs(s, dir), rounds = 6),
      Some(BpeTrain.trainMergesSql(6))),
    QueryDef("docs_tokenize_bpe",
      (s, dir) => BpeTrain.tokenizeBpeMemo(s, dir, docs(s, dir), rounds = 6),
      Some(BpeTrain.tokenizeBpeSql(6))),
    QueryDef("bpe_fertility_by_lang",
      (s, dir) => BpeTrain.fertilityByLang(s, dir, docs(s, dir), rounds = 6),
      Some(BpeTrain.fertilityByLangSql(6))),
    QueryDef("bpe_vocab_curve",
      (s, dir) => BpeTrain.vocabCurve(s, dir, docs(s, dir), rounds = 6),
      Some(BpeTrain.vocabCurveSql(6))),
  )
}
