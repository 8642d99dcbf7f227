package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer training — the full iterative merge loop, not just
  * the first round's pair statistic (`bpe_pair_counts`): R rounds of
  * count-adjacent-pairs → pick the most frequent pair (deterministic
  * tie-break) → fuse it everywhere → recount.
  *
  * Scale design: all compute is VOCABULARY-level. The corpus
  * aggregates once to (word, count) — the only shuffle that scales
  * with data, and it carries distinct words, not documents. Every
  * round then works on the vocab frame (cached): pair counts weight
  * by the word count, the argmax is a 1-row collect, and the merge
  * application is ONE string replace over the delimited token
  * rendering — exactly the greedy left-to-right non-overlapping fuse
  * BPE specifies, because `replace` resumes scanning after each
  * replacement. Driver traffic is R rows total.
  *
  * Token sequences render as `|t1|t2|...|` so a merge of (l, r) is
  * `replace(s, "|l|r|", "|lr|")` — token boundaries are explicit, and
  * token text (letters only) can never contain the delimiter.
  */
object BpeTrain {

  final case class Merge(round: Int, left: String, right: String, count: Long)

  /** (word, cnt, s) vocabulary frame with the delimited char rendering. */
  private def vocab(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalysis.words(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("s",
        concat(lit("|"), array_join(split(col("w"), ""), "|"), lit("|")))

  /** Adjacent-pair weighted counts of the current token rendering. */
  private def pairCounts(v: DataFrame): DataFrame = {
    val toks = filter(split(col("s"), "\\|"), t => t =!= "")
    v.select(col("cnt"), toks.as("toks"))
      // a fully-merged (single-token) word has no pairs — and Spark's
      // sequence(0, -1) would DESCEND, not produce an empty list
      .filter(size(col("toks")) >= 2)
      .select(col("cnt"), posexplode(expr(
        "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS l, toks[i + 1] AS r))")))
      .select(col("col.l").as("l"), col("col.r").as("r"), col("cnt"))
      .groupBy("l", "r").agg(sum("cnt").as("c"))
  }

  /** The training loop itself: `rounds` merges in training order,
    * collected to the driver (R rows — the trained model, not data).
    */
  private def runTraining(docs: DataFrame, rounds: Int): Seq[Merge] = {
    var v = graft.Caches.register(vocab(docs))
    val merges = Seq.newBuilder[Merge]
    for (r <- 1 to rounds) {
      val top = pairCounts(v)
        .orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      if (top.nonEmpty) {
        val (l, rt, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(r, l, rt, c)
        // one replace per round; the vocab frame is tiny relative to
        // the corpus, so each round re-renders from the cached frame
        v = graft.Caches.register(v.withColumn("s",
          regexp_replace(col("s"),
            java.util.regex.Pattern.quote(s"|$l|$rt|"), s"|$l$rt|")))
      }
    }
    merges.result()
  }

  /** Session memo of trained merge tables, keyed by (corpus dir,
    * rounds) — the `lmMemo` pattern: a tokenizer is trained ONCE per
    * corpus and served everywhere, so `bpe_train_merges` and
    * `docs_tokenize_bpe` (and any future encoder) share one training
    * run instead of each re-running the R-round loop. The memoized
    * value is the R-row driver-side merge list (the model artifact,
    * bytes not gigabytes), session-lived like the trained model it
    * stands in for. The key carries a CONTENT fingerprint of the dir
    * (sorted relpath/size/mtime, the MaterializedViews staleness
    * shape) alongside the path, so a corpus dir whose files change
    * within one JVM retrains instead of silently serving the stale
    * model; the fingerprint is a driver-side directory listing, no
    * data files opened.
    */
  // keyed by (path, rounds) with the fingerprint IN THE VALUE (replace
  // on mismatch): at most one live entry per corpus dir — a fingerprint
  // in the key would leak one dead entry per corpus mutation, since old
  // fingerprints never recur
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(String, Int), (String, Seq[Merge])]

  /** Cheap content fingerprint of a corpus path: every regular file's
    * (relative path, size, mtime), sorted and hashed. O(listing). */
  private def corpusFingerprint(corpusDir: String): String = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(corpusDir)
    if (!java.nio.file.Files.exists(root)) return "absent"
    val entries = scala.util.Using.resource(java.nio.file.Files.walk(root)) {
      _.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p))
        .map { p =>
          val rel = root.relativize(p).toString.replace('\\', '/')
          s"$rel:${java.nio.file.Files.size(p)}:${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
        }.toSeq
    }
    java.lang.Long.toHexString(
      entries.sorted.foldLeft(17L)((h, e) => h * 31 + e.hashCode))
  }

  def trainedMergesFor(corpusDir: String, docs: => DataFrame,
      rounds: Int): Seq[Merge] = {
    val fp = corpusFingerprint(corpusDir)
    memo.get((corpusDir, rounds)) match {
      case Some((`fp`, merges)) => merges
      case _ =>
        val merges = runTraining(docs, rounds)
        memo.put((corpusDir, rounds), (fp, merges))
        merges
    }
  }

  private def mergesToDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("merge_round", "mleft", "mright", "pair_count")
      .orderBy("merge_round")
  }

  /** Train `rounds` merges over the corpus; returns one row per merge
    * (merge_round, mleft, mright, pair_count) in training order.
    */
  def trainMerges(spark: SparkSession, docs: DataFrame, rounds: Int): DataFrame =
    mergesToDf(spark, runTraining(docs, rounds))

  /** [[trainMerges]] served from the per-corpus-dir memo. */
  def trainMergesMemo(spark: SparkSession, corpusDir: String,
      docs: => DataFrame, rounds: Int): DataFrame =
    mergesToDf(spark, trainedMergesFor(corpusDir, docs, rounds))

  /** ENCODE with the trained merges — the apply half of the tokenizer
    * loop: each document's words render as delimited char sequences
    * and the R learned merges replay over them IN TRAINING ORDER
    * (same single-replace-per-merge as training, so encoding is
    * exactly the greedy segmentation the trained ranks define).
    * Per-doc output: words, chars (= pre-merge tokens), and the
    * token count under the learned vocab — the corpus statistic a
    * tokenizer change is judged by (compression ratio).
    *
    * 100 TB shape: training is vocabulary-level (see
    * [[trainMerges]]); encoding is a pure per-row expression chain (R
    * chained replaces inside the scan, no shuffle beyond the final
    * per-doc aggregation — which is row-per-doc, not per-token).
    */
  def tokenizeBpe(spark: SparkSession, docs: DataFrame, rounds: Int): DataFrame =
    tokenizeBpeWith(docs, runTraining(docs, rounds).map(m => (m.left, m.right)))

  /** [[tokenizeBpe]] with training served from the per-corpus-dir
    * memo — the gate entry point: training runs once per corpus and
    * every encode invocation replays the stored merges.
    */
  def tokenizeBpeMemo(spark: SparkSession, corpusDir: String,
      docs: => DataFrame, rounds: Int): DataFrame =
    tokenizeBpeWith(docs,
      trainedMergesFor(corpusDir, docs, rounds).map(m => (m.left, m.right)))

  /** Encode with an explicit (already-trained) merge list. The render
    * and ALL R merge replaces fuse into ONE `transform` lambda —
    * literal `replace` (the merge strings are literals, nothing to
    * regex) nested R deep, so the per-document cost is a single array
    * pass instead of R+1 intermediate array materializations.
    */
  def tokenizeBpeWith(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val words = TextAnalysis.words(col("text"))
    val applied = transform(words, w => {
      val rendered = concat(lit("|"), array_join(split(w, ""), "|"), lit("|"))
      merges.foldLeft(rendered) { case (acc, (l, r)) =>
        org.apache.spark.sql.functions.replace(acc, lit(s"|$l|$r|"), lit(s"|$l$r|"))
      }
    })
    // tokens per word = delimiters - 1; the '|' count is (chars of the
    // rendering - letters), both already available per element
    val tokensPerWord = transform(applied,
      s => length(s) - length(org.apache.spark.sql.functions.replace(s, lit("|"))) - 1)
    docs.select(col("doc_id"),
        size(words).as("n_words"),
        aggregate(transform(words, w => length(w)), lit(0L), (a, x) => a + x)
          .as("n_chars"),
        aggregate(tokensPerWord, lit(0L), (a, x) => a + x).as("n_tokens"))
      .orderBy("doc_id")
  }

  /** Tokenizer FERTILITY by language — tokens-per-word under the
    * trained merges, the statistic a tokenizer choice is judged by
    * per language (a high-fertility language pays more sequence
    * length per word, skewing both cost and mixing weights). Serves
    * from the same per-corpus-dir training memo as the other BPE
    * gates: one training run, three consumers. Corpus-level ratio of
    * exact integer sums; zero-word docs contribute nothing to either
    * sum on both engines.
    */
  def fertilityByLang(spark: SparkSession, corpusDir: String,
      docs: => DataFrame, rounds: Int): DataFrame = {
    val d = docs
    tokenizeBpeMemo(spark, corpusDir, d, rounds)
      .join(d.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy("lang")
      .agg(sum("n_words").as("words"), sum("n_tokens").as("tokens"))
      // a language with ZERO extractable words has no fertility (the
      // oracle's word-instance unnest omits it entirely, and 0/0 is
      // not a statistic) — drop it on this side too
      .filter(col("words") > 0)
      .select(col("lang"), col("words"), col("tokens"),
        round(col("tokens").cast("double") / col("words"), 4).as("fertility"))
      .orderBy("lang")
  }

  /** Shared encode-replay scaffolding for the BPE oracles: the
    * training CTEs + the per-word-instance dw/enc CTEs (rendered
    * words folded through the R learned replaces in training order),
    * parameterized on the extra columns (`carry`) the final SELECT
    * needs. ONE source of truth — the word-extraction regex, the
    * rendering, and the replace fold must stay byte-identical across
    * every BPE gate or their oracles silently diverge.
    */
  private def encodeReplayCtes(rounds: Int, carry: Seq[String]): String = {
    val trainCtes = trainMergesSql(rounds).split("\nSELECT 1 AS merge_round")(0)
    val repl = (1 to rounds).foldLeft("s0.s") { (acc, r) =>
      s"replace($acc, '|' || m$r.l || '|' || m$r.r2 || '|', '|' || m$r.l || m$r.r2 || '|')"
    }
    val mJoins = (1 to rounds).map(r => s"CROSS JOIN m$r").mkString(" ")
    val carryCols = ("doc_id" +: carry).mkString(", ")
    val carryS0 = ("doc_id" +: carry).map(c => s"s0.$c").mkString(", ")
    s"""$trainCtes,
       |dw AS (
       |  SELECT $carryCols, w.w AS w,
       |    '|' || array_to_string(regexp_extract_all(w.w, '.'), '|') || '|' AS s
       |  FROM (SELECT $carryCols, regexp_extract_all(lower(text), '[a-z]+') AS ws
       |        FROM documents), unnest(ws) AS w(w)),
       |enc AS (
       |  SELECT $carryS0, s0.w,
       |    $repl AS s
       |  FROM dw s0 $mJoins)""".stripMargin
  }

  /** Vocabulary-growth CURVE — corpus token count (and chars/token
    * compression) after each merge-count prefix k = 0..rounds: the
    * statistic that answers "how many merges does this corpus need"
    * when sizing a tokenizer. BPE training is greedy, so the first k
    * merges of an R-round training ARE the k-round training — the
    * whole curve reads off ONE memoized training run, and the encode
    * side computes every prefix in ONE corpus pass (k+1 fused
    * replace-chains per word, no per-k re-scan). The final 1-row
    * melt is driver-side O(rounds).
    */
  def vocabCurve(spark: SparkSession, corpusDir: String,
      docs: => DataFrame, rounds: Int): DataFrame = {
    val merges = trainedMergesFor(corpusDir, docs, rounds)
      .map(m => (m.left, m.right))
    val words = TextAnalysis.words(col("text"))
    def tokensForK(k: Int): Column = {
      val applied = transform(words, w => {
        val rendered = concat(lit("|"), array_join(split(w, ""), "|"), lit("|"))
        merges.take(k).foldLeft(rendered) { case (acc, (l, r)) =>
          org.apache.spark.sql.functions.replace(acc, lit(s"|$l|$r|"), lit(s"|$l$r|"))
        }
      })
      aggregate(transform(applied,
        s => length(s) - length(org.apache.spark.sql.functions.replace(s, lit("|"))) - 1),
        lit(0L), (a, x) => a + x)
    }
    val aggs = (0 to rounds).map(k => sum(tokensForK(k)).as(s"t$k")) :+
      sum(aggregate(transform(words, w => length(w).cast("long")),
        lit(0L), (a, x) => a + x)).as("chars")
    val row = docs.agg(aggs.head, aggs.tail: _*).head()
    import spark.implicits._
    // Empty corpus (or one with zero extractable words): every sum is
    // NULL — getLong would NPE and the ratio would be NaN. An empty
    // curve is the honest answer (there is nothing to measure), and
    // any nonempty corpus has every prefix's token count ≥ its word
    // count > 0, so this is the only degenerate shape.
    if (row.isNullAt(rounds + 1) || row.getLong(rounds + 1) == 0L)
      return Seq.empty[(Int, Long, Double)]
        .toDF("merges", "tokens", "chars_per_token")
    val chars = row.getLong(rounds + 1)
    (0 to rounds).map { k =>
      val t = row.getLong(k)
      (k, t, BigDecimal(chars.toDouble / t)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("merges", "tokens", "chars_per_token").orderBy("merges")
  }

  /** DuckDB oracle for [[vocabCurve]]: the 6-round training CTEs +
    * one UNION branch per prefix k, each inlining its own k-deep
    * replace chain over the shared word-instance rendering.
    */
  def vocabCurveSql(rounds: Int): String = {
    val trainCtes = trainMergesSql(rounds).split("\nSELECT 1 AS merge_round")(0)
    val branches = (0 to rounds).map { k =>
      val repl = (1 to k).foldLeft("s0.s") { (acc, r) =>
        s"replace($acc, '|' || m$r.l || '|' || m$r.r2 || '|', '|' || m$r.l || m$r.r2 || '|')"
      }
      val joins = (1 to k).map(r => s"CROSS JOIN m$r").mkString(" ")
      s"""SELECT $k AS merges,
         |  CAST(sum(len(s) - len(replace(s, '|', '')) - 1) AS BIGINT) AS tokens,
         |  round(CAST(sum(len(w)) AS DOUBLE)
         |        / sum(len(s) - len(replace(s, '|', '')) - 1), 4) AS chars_per_token
         |FROM (SELECT s0.w AS w, $repl AS s FROM dw s0 $joins)""".stripMargin
    }
    s"""$trainCtes,
       |dw AS (
       |  SELECT doc_id, w.w AS w,
       |    '|' || array_to_string(regexp_extract_all(w.w, '.'), '|') || '|' AS s
       |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
       |        FROM documents), unnest(ws) AS w(w))
       |${branches.mkString("\nUNION ALL\n")}
       |ORDER BY merges""".stripMargin
  }

  /** DuckDB oracle for [[fertilityByLang]]: the shared encode replay
    * aggregated per language instead of per doc. Zero-word languages
    * are naturally absent (dw unnests word INSTANCES).
    */
  def fertilityByLangSql(rounds: Int): String =
    s"""${encodeReplayCtes(rounds, Seq("lang"))}
       |SELECT lang,
       |  CAST(count(*) AS BIGINT) AS words,
       |  CAST(sum(len(s) - len(replace(s, '|', '')) - 1) AS BIGINT) AS tokens,
       |  round(CAST(sum(len(s) - len(replace(s, '|', '')) - 1) AS DOUBLE)
       |        / count(*), 4) AS fertility
       |FROM enc GROUP BY lang ORDER BY lang""".stripMargin

  /** DuckDB oracle for [[tokenizeBpe]]: the shared encode replay
    * aggregated per doc.
    */
  def tokenizeBpeSql(rounds: Int): String =
    s"""${encodeReplayCtes(rounds, Nil)}
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(len(w)) AS BIGINT) AS n_chars,
       |  CAST(sum(len(s) - len(replace(s, '|', '')) - 1) AS BIGINT) AS n_tokens
       |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DuckDB oracle: the identical training loop unrolled to `rounds`
    * CTE stages (the Lloyd's-rounds replay pattern) — pair counting,
    * argmax tie-break, and the boundary-delimited replace are all
    * replayed from SQL, so the hash compare certifies every merge
    * decision, not just the first.
    */
  def trainMergesSql(rounds: Int): String = {
    val base =
      """WITH v0 AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cnt,
        |    '|' || array_to_string(regexp_extract_all(w, '.'), '|') || '|' AS s
        |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |        FROM documents)
        |  GROUP BY w)""".stripMargin
    val stages = (1 to rounds).map { r =>
      val prev = s"v${r - 1}"
      s"""p$r AS (
         |  SELECT t.l, t.r2, CAST(sum(cnt) AS BIGINT) AS c FROM (
         |    SELECT cnt, ws[i + 1] AS l, ws[i + 2] AS r2
         |    FROM (SELECT cnt, list_filter(string_split(s, '|'), x -> x <> '') AS ws
         |          FROM $prev),
         |      unnest(range(len(ws) - 1)) AS u(i)) t
         |  GROUP BY t.l, t.r2),
         |m$r AS (SELECT l, r2, c FROM p$r ORDER BY c DESC, l, r2 LIMIT 1),
         |v$r AS (
         |  SELECT w, cnt,
         |    replace(s, '|' || m.l || '|' || m.r2 || '|', '|' || m.l || m.r2 || '|') AS s
         |  FROM $prev CROSS JOIN m$r m)""".stripMargin
    }
    val out = (1 to rounds).map(r =>
      s"SELECT $r AS merge_round, l AS mleft, r2 AS mright, c AS pair_count FROM m$r")
      .mkString("\nUNION ALL\n")
    (base +: stages).mkString(",\n").stripSuffix(",") + "\n" +
      out + "\nORDER BY merge_round"
  }
}
