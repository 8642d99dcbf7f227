package graft.ops

import graft.{QueryDef, QueryModule}
import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus/embedding profiling block (r13): the contribution and
  * health metrics a training-data pipeline reports per refresh —
  * n-gram novelty, vocabulary-growth (Heaps) curve, per-source
  * duplicate ratios, and embedding-norm profiles.
  */
object ProfileQueries extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)

  // -- n-gram novelty ----------------------------------------------------------

  /** Per-document trigram NOVELTY: the fraction of a doc's distinct
    * word-trigram types whose FIRST appearance (by doc_id order) is
    * this doc — the contribution score that separates fresh content
    * from recombinations of what the corpus already holds. One
    * (trigram → min doc_id) aggregation, one join back; the corpus
    * shuffles (doc, trigram) pairs once, text never twice.
    */
  private def ngramNovelty(s: SparkSession, dir: String): DataFrame = {
    val ws = docs(s, dir).select(col("doc_id"), split(col("text"), " ").as("ws"))
    val tri = ws.select(col("doc_id"),
        explode(zip_with(
          zip_with(
            slice(col("ws"), lit(1), greatest(size(col("ws")) - 2, lit(0))),
            slice(col("ws"), lit(2), greatest(size(col("ws")) - 2, lit(0))),
            (a, b) => concat(a, lit(" "), b)),
          slice(col("ws"), lit(3), greatest(size(col("ws")) - 2, lit(0))),
          (ab, c) => concat(ab, lit(" "), c))).as("tg"))
      .distinct()
    val first = tri.groupBy(col("tg")).agg(min(col("doc_id")).as("first_doc"))
    tri.join(first, "tg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_trigrams"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_trigrams"), 6).as("novelty"))
      .orderBy("doc_id")
  }

  private val ngramNoveltySql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |tri AS (
      |  SELECT DISTINCT doc_id, tg
      |  FROM w, unnest(list_transform(range(len(ws) - 2),
      |    i -> ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3])) AS t(tg)),
      |f AS (SELECT tg, min(doc_id) AS first_doc FROM tri GROUP BY 1)
      |SELECT tri.doc_id, count(*)::BIGINT AS n_trigrams,
      |  CAST(sum(CASE WHEN f.first_doc = tri.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |  ROUND(sum(CASE WHEN f.first_doc = tri.doc_id THEN 1 ELSE 0 END)::DOUBLE
      |    / count(*), 6) AS novelty
      |FROM tri JOIN f USING (tg)
      |GROUP BY 1 ORDER BY doc_id""".stripMargin

  // -- vocabulary growth (Heaps' law curve) -------------------------------------

  /** Vocabulary size after each doc_id DECILE of the corpus — the
    * Heaps-law growth curve that says whether more data still buys new
    * vocabulary. One (word → first doc) aggregation; the curve itself
    * is a bounded 10-row cross join over the aggregate, never a
    * re-scan per checkpoint.
    */
  private def vocabGrowth(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val firsts = d.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(min(col("doc_id")).as("first_doc"))
    val maxId = d.agg(max(col("doc_id"))).head().getLong(0)
    val cuts = (1 to 10).map(i => (i.toLong, maxId * i / 10))
    val cutDf = s.createDataFrame(cuts).toDF("decile", "cut")
    firsts.crossJoin(broadcast(cutDf))
      .filter(col("first_doc") <= col("cut"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("vocab_size"))
      .orderBy("decile")
  }

  private val vocabGrowthSql =
    """WITH f AS (
      |  SELECT x AS w, min(doc_id) AS first_doc
      |  FROM documents, unnest(string_split(text, ' ')) AS t(x)
      |  GROUP BY 1),
      |cuts AS (
      |  SELECT i + 1 AS decile,
      |    (SELECT max(doc_id) FROM documents) * (i + 1) / 10 AS cut
      |  FROM range(10) AS r(i))
      |SELECT decile, count(*)::BIGINT AS vocab_size
      |FROM f JOIN cuts ON f.first_doc <= cuts.cut
      |GROUP BY 1 ORDER BY decile""".stripMargin

  // -- duplicate ratio per source ------------------------------------------------

  /** Per-source exact-duplicate health report: docs, distinct text
    * fingerprints, and the dup ratio — the per-feed monitor that
    * catches a misbehaving crawler before it floods the corpus.
    * Fingerprints are md5 (never raw text) so the shuffle carries
    * 32 bytes per doc.
    */
  private def dupRatioBySource(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("source"), md5(col("text")).as("fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_distinct"))
      .select(col("source"), col("n_docs"), col("n_distinct"),
        round((col("n_docs") - col("n_distinct")).cast("double") / col("n_docs"), 6)
          .as("dup_ratio"))
      .orderBy("source")

  private val dupRatioBySourceSql =
    """SELECT source, count(*)::BIGINT AS n_docs,
      |  count(DISTINCT md5(text))::BIGINT AS n_distinct,
      |  ROUND((count(*) - count(DISTINCT md5(text)))::DOUBLE / count(*), 6) AS dup_ratio
      |FROM documents GROUP BY 1 ORDER BY source""".stripMargin

  // -- embedding norm profile -------------------------------------------------

  /** Per-label L2-norm profile of the embedding table — the sanity
    * check that catches an unnormalized (or zero-filled) encoder batch
    * before it poisons similarity search. The squared-norm fold runs
    * in DOUBLE over the array's own order (Spark `aggregate` ≡ DuckDB
    * `list_reduce`, bit-identical left folds); per-row, no shuffle
    * until the label rollup.
    */
  private def embedNormProfile(s: SparkSession, dir: String): DataFrame = {
    val norm: Column = sqrt(aggregate(col("embedding"), lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    Tables.embeddings(s, dir)
      .select(col("label"), norm.as("l2"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("l2")), 5).as("avg_norm"),
        round(min(col("l2")), 6).as("min_norm"),
        round(max(col("l2")), 6).as("max_norm"))
      .orderBy("label")
  }

  private val embedNormProfileSql =
    """WITH n AS (
      |  SELECT label,
      |    sqrt(list_reduce(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, x) -> a + x)) AS l2
      |  FROM embeddings)
      |SELECT label, count(*)::BIGINT AS n,
      |  ROUND(avg(l2), 5) AS avg_norm,
      |  ROUND(min(l2), 6) AS min_norm,
      |  ROUND(max(l2), 6) AS max_norm
      |FROM n GROUP BY 1 ORDER BY label""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("docs_ngram_novelty", ngramNovelty, Some(ngramNoveltySql)),
    QueryDef("docs_vocab_growth", vocabGrowth, Some(vocabGrowthSql)),
    QueryDef("docs_dup_ratio_by_source", dupRatioBySource, Some(dupRatioBySourceSql)),
    QueryDef("embed_norm_profile", embedNormProfile, Some(embedNormProfileSql)),
  )
}
