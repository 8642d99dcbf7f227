package graft.ops

import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse: overlapped doc sums both legs and outranks single-leg docs") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "lex_rank")
    val dense = Seq((20L, 1), (40L, 2)).toDF("doc_id", "dense_rank")
    val out = SearchQueries.rrfFuse(lex, dense, k = 10)
      .select("doc_id", "rrf").as[(Long, Double)].collect().toMap
    // doc 20 is ranked by both legs: 1/(60+2) + 1/(60+1)
    assert(math.abs(out(20L) - (1.0 / 62 + 1.0 / 61)) < 1e-6)
    // single-leg docs carry exactly one contribution
    assert(math.abs(out(10L) - 1.0 / 61) < 1e-6)
    assert(math.abs(out(40L) - 1.0 / 62) < 1e-6)
    // the overlapped doc beats every single-leg doc despite worse ranks
    assert(out(20L) > out(10L) && out(20L) > out(30L) && out(20L) > out(40L))
  }

  test("containmentPairs: embedded quote scores 1.0 toward the source") {
    def sentence(tag: String, n: Int): String =
      (0 until n).map(i => s"$tag${('a' + i % 26).toChar}${('a' + (i / 26) % 26).toChar}").mkString(" ")
    val quoted = sentence("src", 30)
    val docs = Seq(
      (1L, quoted),                                    // the source
      (2L, sentence("host", 40) + " " + quoted),       // embeds it whole
      (3L, sentence("other", 50))).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text", w = 20, tau = 0.8)
      .select("doc_a", "doc_b", "c_a", "c_b").as[(Long, Long, Double, Double)].collect()
    assert(out.length === 1)
    val (a, b, ca, cb) = out.head
    assert((a, b) === (1L, 2L))
    assert(ca === 1.0)      // every source gram appears in the host
    assert(cb < 0.8)        // but the host is NOT contained in the source
  }

  test("containmentPairs: frequency cap suppresses boilerplate buckets") {
    def sentence(tag: String, n: Int): String =
      (0 until n).map(i => s"$tag${('a' + i % 26).toChar}${('a' + (i / 26) % 26).toChar}").mkString(" ")
    val boiler = sentence("boiler", 20)
    // 60 docs share ONE 20-word boilerplate window -> bucket of 60 docs
    val docs = (1L to 60L).map(i => (i, sentence(s"u$i", 25) + " " + boiler))
      .toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(docs, "doc_id", "text",
      w = 20, tau = 0.1, maxShare = 50)
    assert(capped.count() === 0) // 60 > cap: no quadratic bucket blow-up
    val uncapped = Dedup.containmentPairs(docs, "doc_id", "text",
      w = 20, tau = 0.1, maxShare = 100)
    assert(uncapped.count() === 60L * 59 / 2) // same corpus, cap lifted
  }

  test("rrfFuse: k bounds the output, ordered (rrf desc, doc_id asc)") {
    val lex = (1 to 30).map(i => (i.toLong, i)).toDF("doc_id", "lex_rank")
    val dense = Seq.empty[(Long, Int)].toDF("doc_id", "dense_rank")
    val out = SearchQueries.rrfFuse(lex, dense, k = 5)
      .select("doc_id").as[Long].collect()
    assert(out === Array(1L, 2L, 3L, 4L, 5L))
  }
}
