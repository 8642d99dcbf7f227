package graft.ops

import graft.SparkSpec

/** BPE training + encoding (BpeTrain): the merge loop's greedy
  * left-to-right non-overlapping fuse, the deterministic argmax
  * tie-break, the fused-lambda encoder, and the per-corpus-dir
  * training memo (train once, serve everywhere — the lmMemo pattern).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // words: aaab ×3, xy ×3. Round 1: (a,a) weighs 6 (twice per aaab)
  // and wins; the greedy fuse leaves |aa|a|b| (the second overlapping
  // (a,a) is consumed). Round 2: (aa,a), (a,b), (x,y) all weigh 3 —
  // the (l, r) tie-break picks (a,b).
  private def corpus = Seq(
    (1L, "aaab aaab xy"), (2L, "aaab xy xy")).toDF("doc_id", "text")

  test("merge rounds: weighted argmax, greedy fuse, lexicographic tie-break") {
    val m = BpeTrain.trainMerges(spark, corpus, rounds = 2)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(m === Seq((1, "a", "a", 6L), (2, "a", "b", 3L)))
  }

  test("encode replays the merges in training order (fused single-pass lambda)") {
    val enc = BpeTrain.tokenizeBpe(spark, corpus, rounds = 2)
      .as[(Long, Int, Long, Long)].collect().toSeq
    // aaab → |aa|ab| (2 tokens), xy → |x|y| (2 tokens)
    assert(enc === Seq((1L, 3, 10L, 6L), (2L, 3, 8L, 6L)))
  }

  test("the corpus-dir memo trains once and serves every later call") {
    val key = "spec://bpe-memo"
    val first = BpeTrain.trainMergesMemo(spark, key, corpus, rounds = 2)
      .as[(Int, String, String, Long)].collect().toSeq
    // the docs thunk is by-name: a memo HIT must never evaluate it
    val second = BpeTrain.trainMergesMemo(spark, key,
      sys.error("memo miss: training re-ran"), rounds = 2)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(first === second)
    // a different round count is a different model → trains fresh
    val three = BpeTrain.trainMergesMemo(spark, key, corpus, rounds = 3)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(three.size === 3)
  }

  test("the memo retrains when the corpus dir's contents change") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_memo_fp").toString
    def write(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").parquet(dir)
    write(corpus)
    val first = BpeTrain.trainMergesMemo(spark, dir,
      spark.read.parquet(dir), rounds = 1)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(first === Seq((1, "a", "a", 6L)))
    // same dir, different bytes: the content fingerprint must force a
    // retrain instead of serving the stale model (mtime granularity
    // can be coarse, so make the file SIZES differ too)
    write(Seq((1L, "qq qq qq qq qq qq qq qq"), (2L, "qq qq zz")).toDF("doc_id", "text"))
    val second = BpeTrain.trainMergesMemo(spark, dir,
      spark.read.parquet(dir), rounds = 1)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(second.map(m => (m._2, m._3)) === Seq(("q", "q")), second.toString)
  }

  test("vocabCurve on an empty corpus is an empty curve, not an NPE") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val curve = BpeTrain.vocabCurve(spark, "spec://bpe-empty", empty, rounds = 2)
    assert(curve.columns.toSeq === Seq("merges", "tokens", "chars_per_token"))
    assert(curve.count() === 0L)
    // punctuation-only corpus extracts zero words → same clean shape
    val noWords = Seq((1L, "1234 !!! ...")).toDF("doc_id", "text")
    val c2 = BpeTrain.vocabCurve(spark, "spec://bpe-nowords", noWords, rounds = 2)
    assert(c2.count() === 0L)
  }
}
