package graft.ops

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("langGuess discriminates real multilingual text") {
    val samples = Seq(
      (1L, "the cat is on the mat and it is a fine day", "en"),
      (2L, "le chat est dans la maison et les oiseaux", "fr"),
      (3L, "el gato es una mascota por como los perros", "es"),
      (4L, "der hund und die katze das ist mit nicht ein", "de"),
      (5L, "我是在这里的人，我不知道他有没有来，和我们一起了。", "zh"),
    ).toDF("doc_id", "text", "expected")
    val out = samples.withColumn("guess", TextAnalysis.langGuess($"text"))
      .filter($"guess" === $"expected")
    assert(out.count() === 5)
  }

  test("rolling fingerprint matches a reference computation") {
    val fp = Seq(Tuple1("ab")).toDF("text")
      .select(TextAnalysis.rollingFingerprint($"text")).as[Long].head()
    // (0*31+97)=97; (97*31+98)=3105
    assert(fp === 3105L)
  }

  test("word shingles: distinct k-grams, short docs degrade to one shingle") {
    val out = Seq(Tuple1("a b c d"), Tuple1("x y")).toDF("text")
      .select(Dedup.wordShingles($"text", 3).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq("a b c", "b c d"))
    assert(out(1) === Seq("x y"))
  }

  test("minhash est_jaccard approximates true jaccard for near-dup docs") {
    // distinct ALPHA-only words (the [a-z]+ word extractor drops
    // digits): realistic shingle sets — a repeated-vocabulary doc has
    // ~10 distinct shingles and band hits become hash-luck
    def w(prefix: String, i: Int) =
      s"$prefix${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
    val base = (0 until 60).map(w("word", _)).mkString(" ")
    val near = base.replace(w("word", 30), "graft") // one substitution in 60
    val far = (0 until 60).map(w("other", _)).mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidates(df, "doc_id", "text", shingleK = 3, threshold = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("lsh candidates recall exact-jaccard pairs on the corpus sample") {
    val docs = Tables.documents(spark, sfDir).limit(200).cache()
    // ground truth: all-pairs exact jaccard >= 0.5 (tiny sample, ok to brute force)
    val ids = docs.select($"doc_id").as[Long].collect().toSet
    val pairsAll = docs.as("a").crossJoin(docs.as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
    val truth = Dedup.ngramJaccard(pairsAll, docs, "doc_id", "text", 3)
      .filter($"jaccard" >= 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text", 3, threshold = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // every true near-dup pair must be recalled by LSH at the lower threshold
    assert(truth.subsetOf(cands), s"missed: ${truth.diff(cands)}")
    docs.unpersist()
  }

  test("simhash: near-identical docs have small hamming distance") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 10
    val near = base.replace("kappa", "graft")
    val far = "one two three four five six seven eight nine ten " * 10
    val out = Dedup.simhash(
      Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long)].collect().map(_._2)
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // one substituted word out of ten must perturb far fewer bits than
    // a fully disjoint vocabulary
    assert(hamming(out(0), out(1)) < hamming(out(0), out(2)))
    assert(hamming(out(0), out(1)) <= 16)
  }

  test("simhashPairs: banding recalls every pair at hamming <= tau") {
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", tau = 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.nonEmpty)
    // ground truth from all-pairs over the signatures (test-only scale)
    val sigs = Dedup.simhash(docs, "doc_id", "text").as[(Long, Long)].collect()
    val truth = (for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b, java.lang.Long.bitCount(sa ^ sb))).toSet
    assert(pairs.toSet === truth) // 4x16 banding is lossless for tau <= 3
  }

  test("incremental near-dup drops decorated re-crawls via the right path") {
    val out = graft.SparkEntry.queries("dedup_incremental_near")(spark, sfDir)
      .select($"doc_id", $"index_hamming", $"batch_hamming", $"keep")
      .as[(Long, Int, Int, Boolean)].collect()
    assert(out.nonEmpty)
    val byId = out.map(r => r._1 -> r).toMap
    // every one-word-appended re-crawl of an index doc must be caught
    // by the index path (its source signature is in the index)
    // appending one word moves a LONG doc a bit or two but can push a
    // short doc past τ (bit sums near zero flip easily), so the
    // decorated classes assert majority capture, not universal — the
    // per-row decision itself is certified exactly by the DuckDB
    // oracle
    val recrawls = out.filter(r => r._1 >= 1000000 && r._1 < 2000000)
    assert(recrawls.nonEmpty)
    val caughtByIndex = recrawls.count(r => r._2 >= 0 && !r._4)
    assert(caughtByIndex >= recrawls.length * 6 / 10,
      s"only $caughtByIndex/${recrawls.length} re-crawls caught by the index")
    val inBatch = out.filter(_._1 >= 2000000)
    assert(inBatch.nonEmpty)
    val caughtWithin = inBatch.count(r => r._3 >= 0 && !r._4)
    assert(caughtWithin >= inBatch.length * 6 / 10,
      s"only $caughtWithin/${inBatch.length} in-batch copies caught")
    // caught matches are genuinely near: within the τ=3 radius
    out.foreach { case (id, ih, bh, _) =>
      assert(ih <= 3 && bh <= 3, s"$id reported hamming beyond tau")
    }
  }

  test("lm_score: probabilities bound every score in (0, 1], non-vacuous") {
    val out = graft.SparkEntry.queries("docs_lm_score")(spark, sfDir)
      .select("doc_id", "n_bigrams", "lm_score")
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    // a mean of conditional probabilities can never leave (0, 1]; a
    // doc with bigrams always has positive mass on its own bigrams
    val scored = out.filter(_._2 > 0)
    assert(scored.nonEmpty, "no doc had bigrams")
    assert(scored.forall { case (_, _, sc) => sc > 0.0 && sc <= 1.0 },
      s"scores escaped (0,1]: ${scored.filterNot(t => t._3 > 0 && t._3 <= 1).take(3).toSeq}")
    // the model discriminates: corpus docs are not all equally likely
    assert(scored.map(_._3).distinct.length > 10, "scores are degenerate")
  }

  test("window hashes: rolling pass equals the direct per-window fold") {
    import graft.functions.WindowHashes.{B, P}
    // alpha-only words: TextAnalysis.words extracts [a-z]+ runs
    val words = (1 to 50).map(i => s"w${('a' + i % 17).toChar}")
    val hs = words.map { w =>
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5hex, 16) % P
    }
    val w = 20
    val direct = (0 to hs.length - w).map { i =>
      hs.slice(i, i + w).foldLeft(0L)((a, x) => (a * B + x) % P)
    }
    graft.functions.GraftFunctions.register(spark)
    val out = Seq(words.mkString(" ")).toDF("text")
      .select(call_function("graft_window_hashes",
        transform(TextAnalysis.words($"text"),
          c => conv(substring(md5(c), 1, 12), 16, 10).cast("long") % P),
        lit(w)).as("whs"))
      .as[Seq[Long]].collect().head
    assert(out === direct)
    // shorter than the window -> no windows
    val short = Seq("one two three").toDF("text")
      .select(call_function("graft_window_hashes",
        transform(TextAnalysis.words($"text"),
          c => conv(substring(md5(c), 1, 12), 16, 10).cast("long") % P),
        lit(w)).as("whs"))
      .as[Seq[Long]].collect().head
    assert(short.isEmpty)
  }

  test("graft_winnow equals the declarative min-in-window + distinct formulation") {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    // random arrays incl. duplicates and ties; plus degenerate shapes
    val cases: Seq[Seq[Long]] =
      (1 to 30).map(n => Seq.fill(rnd.nextInt(40) + 1)(rnd.nextInt(12).toLong)) ++
        Seq(Seq(5L), Seq(3L, 3L, 3L), Seq.empty[Long])
    for (w <- Seq(1, 3, 4, 7); hs <- cases) {
      val got = Seq(hs).toDF("hs")
        .select(call_function("graft_winnow", $"hs", lit(w)).as("sel"))
        .as[Seq[Long]].collect().head
      val want =
        if (hs.size < w) Seq.empty[Long]
        else (0 to hs.size - w).map(j => hs.slice(j, j + w).min).distinct
      assert(got === want, s"w=$w hs=$hs")
    }
  }

  test("dedup_substring flags every decorated doc with the full shared tail") {
    val out = graft.SparkEntry.queries("dedup_substring")(spark, sfDir)
      .select($"doc_id", $"n_dup_windows", $"has_dup")
      .as[(Long, Long, Boolean)].collect()
    assert(out.nonEmpty)
    val flagged = out.filter(_._3).map(_._1).toSet
    val decorated = out.map(_._1).filter(_ % 11 == 4).toSet
    // every doc carrying the 40-word boilerplate tail is flagged, and
    // at least its 21 windows fully inside the tail count as shared
    // (the corpus also shares some natural 20-word spans — those docs
    // may be flagged too, which is the operator doing its job)
    assert(decorated.nonEmpty && decorated.subsetOf(flagged))
    out.filter(r => decorated(r._1)).foreach { case (id, nDup, _) =>
      assert(nDup >= 21L, s"doc $id")
    }
  }
}
