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

  test("rrfFuse: k bounds the output, ordered (rrf desc, doc_id asc)") {
    val lex = (1 to 30).map(i => (i.toLong, i)).toDF("doc_id", "lex_rank")
    val dense = Seq.empty[(Long, Int)].toDF("doc_id", "dense_rank")
    val out = SearchQueries.rrfFuse(lex, dense, k = 5)
      .select("doc_id").as[Long].collect()
    assert(out === Array(1L, 2L, 3L, 4L, 5L))
  }
}
