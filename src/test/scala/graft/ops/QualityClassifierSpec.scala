package graft.ops

import graft.SparkSpec

/** The learned quality classifier must actually LEARN: on a corpus
  * where the positive class has marker vocabulary, training on the
  * even ids must classify the held-out odd ids far above base rate.
  * (The gate query runs the identical code over the synthetic corpus
  * and hash-checks every weight fold against DuckDB; this spec owns
  * the ML semantics the hash can't express.)
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // positives write about databases, negatives about weather; shared
  // filler words appear in both so weights must separate signal from
  // noise rather than memorize documents
  private def corpus: org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(7)
    val pos = Seq("query", "index", "table", "join", "scan")
    val neg = Seq("rain", "cloud", "wind", "storm", "sun")
    val fill = Seq("the", "a", "of", "and", "with")
    def doc(id: Long, markers: Seq[String]): (Long, String, String) = {
      val ws = Seq.fill(12)(markers(rnd.nextInt(markers.size))) ++
        Seq.fill(8)(fill(rnd.nextInt(fill.size)))
      (id, if (markers == pos) "en" else "de", rnd.shuffle(ws).mkString(" "))
    }
    (0L until 200L).map(i => doc(i, if (i % 4 < 2) pos else neg))
      .toDF("doc_id", "lang", "text")
  }

  test("held-out accuracy is near-perfect when the label has word signal") {
    val out = QualityQueries.classifierScores(corpus)
      .select("doc_id", "pred_en", "is_en")
      .as[(Long, Int, Int)].collect()
    val held = out.filter(_._1 % 2 == 1)
    assert(held.length === 100)
    val acc = held.count(r => r._2 == r._3).toDouble / held.length
    assert(acc >= 0.99, s"held-out accuracy $acc")
  }

  test("marker words get the expected smoothed odds weights") {
    // 2 positive docs, 1 negative, no shared words: check a weight by hand
    val tiny = Seq(
      (0L, "en", "good good"),
      (2L, "en", "good fine"),
      (4L, "de", "bad bad bad"),
      (1L, "de", "bad good") // held out — scored, not trained
    ).toDF("doc_id", "lang", "text")
    val out = QualityQueries.classifierScores(tiny)
      .as[(Long, Long, Long, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    // train: npos=4 (good,good,good,fine), nneg=3 (bad x3), v=3
    // wgt(good) = (3+1)*(3+3)*1e6 / ((0+1)*(4+3)) = 24e6/7 = 3428571
    // wgt(bad)  = (0+1)*6*1e6 / ((3+1)*7) = 6e6/28 = 214285
    // doc 1 = (bad good): mean = (214285 + 3428571) DIV 2 = 1821428
    assert(out(1L)._3 === 1821428L)
    assert(out(1L)._4 === 1) // odds > 1: the 'good' evidence dominates
    assert(out(4L)._4 === 0)
  }

  test("scores are deterministic across runs") {
    val a = QualityQueries.classifierScores(corpus).collect().toSeq
    val b = QualityQueries.classifierScores(corpus).collect().toSeq
    assert(a === b)
  }
}
