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
}
