package graft.ops

import graft.SparkSpec
import graft.functions.GraftFunctions
import graft.tables.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def clustered(nClusters: Int, perCluster: Int, dim: Int = 16) = {
    // deterministic clustered vectors: cluster center + small id-dependent jitter
    val rows = for {
      c <- 0 until nClusters
      i <- 0 until perCluster
    } yield {
      val id = (c * perCluster + i).toLong
      val v = Array.tabulate(dim) { d =>
        val center = if (d % nClusters == c) 1.0f else 0.1f
        center + 0.01f * ((id * 31 + d * 7) % 13).toFloat / 13f
      }
      (id, v.toSeq, c)
    }
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("cosine expression equals composed-builtin computation") {
    GraftFunctions.register(spark)
    val df = Tables.embeddings(spark, sfDir).limit(50)
      .select($"vec_id", $"embedding")
    val pairs = df.as("a").crossJoin(df.as("b")).filter($"a.vec_id" < $"b.vec_id").limit(200)
    val builtin = aggregate(zip_with($"a.embedding", $"b.embedding",
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x) /
      (sqrt(aggregate(transform($"a.embedding", x => x.cast("double") * x.cast("double")), lit(0.0), (a, x) => a + x)) *
        sqrt(aggregate(transform($"b.embedding", x => x.cast("double") * x.cast("double")), lit(0.0), (a, x) => a + x)))
    val diff = pairs.select(
        abs(call_function("graft_cosine", $"a.embedding", $"b.embedding") - builtin).as("d"))
      .agg(max($"d")).as[Double].head()
    assert(diff < 1e-12, s"max deviation $diff")
  }

  test("cosine expression participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    val df = Tables.embeddings(spark, sfDir).limit(10)
      .select(call_function("graft_cosine", $"embedding", $"embedding").as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_cosine"), plan)
    assert(df.as[Double].collect().forall(c => math.abs(c - 1.0) < 1e-9))
  }

  test("cosine of zero-norm or null-bearing inputs is 0, never NaN") {
    GraftFunctions.register(spark)
    // NaN would sort ABOVE every real score and pass every >= filter
    val rows = Seq(
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f)), // zero norm left
      (Array[Float](), Array[Float]()),       // empty
      (Array(1.0f, 1.0f), Array(0.0f, 0.0f)), // zero norm right
    ).toDF("a", "b")
    val out = rows.select(call_function("graft_cosine", $"a", $"b").as("c"))
      .as[Double].collect()
    assert(out.forall(_ == 0.0), out.mkString(", "))
  }

  test("string-array functions skip null elements instead of crashing") {
    GraftFunctions.register(spark)
    val df = Seq(Tuple1(Seq[String]("alpha", null, "beta", "gamma", null)))
      .toDF("ws")
    val sig = df.select(call_function("graft_simhash", $"ws")).as[Long].head()
    val sigClean = Seq(Tuple1(Seq("alpha", "beta", "gamma"))).toDF("ws")
      .select(call_function("graft_simhash", $"ws")).as[Long].head()
    assert(sig === sigClean, "simhash must treat null elements as absent")
    val grams = df.select(call_function("graft_word_trigrams", $"ws"))
      .as[Seq[String]].head()
    assert(grams === Seq("alpha beta gamma"))
    assert(grams.forall(_ != null), "containsNull=false output must hold")
    val mh = df.select(call_function("graft_minhash_words", $"ws")).as[Seq[Long]].head()
    val mhClean = Seq(Tuple1(Seq("alpha", "beta", "gamma"))).toDF("ws")
      .select(call_function("graft_minhash_words", $"ws")).as[Seq[Long]].head()
    assert(mh === mhClean)
  }

  test("random projection equals the per-plane fold exactly, nulls as zero") {
    GraftFunctions.register(spark)
    val ps = Similarity.projectionPlanes(64)
    val df = Tables.embeddings(spark, sfDir).limit(100)
      .select($"vec_id", $"embedding")
    // naive: one ascending-order fold per plane, same null convention
    val naive = ps.map { row =>
      val planeLit = array(row.map(lit): _*)
      aggregate(
        zip_with($"embedding", planeLit,
          (x, p) => coalesce(x.cast("double"), lit(0.0)) * p),
        lit(0.0), (acc, x) => acc + x)
    }
    val rows = df.select($"vec_id",
        call_function("graft_random_project", $"embedding", lit(64)).as("proj"),
        array(naive.toIndexedSeq: _*).as("expect"))
      .select($"vec_id", $"proj", $"expect").collect()
    rows.foreach { r =>
      val proj = r.getSeq[Double](1)
      val expect = r.getSeq[Double](2)
      assert(proj.length === Similarity.ProjDim)
      proj.zip(expect).foreach { case (a, b) => assert(a === b) } // bit-exact
    }
    // null elements count as 0.0, not NaN / crash
    val withNull = Seq((1L, Array(Some(1.0f), None, Some(2.0f)))).toDF("id", "embedding")
      .select(call_function("graft_random_project", $"embedding", lit(3)).as("p"))
      .selectExpr("p[0]").as[Double].head()
    val expectNull = 1.0 * ps(0)(0) + 2.0 * ps(0)(2)
    // projectionPlanes(3) differs from (64): recompute with dim=3 planes
    val ps3 = Similarity.projectionPlanes(3)
    assert(withNull === 1.0 * ps3(0)(0) + 2.0 * ps3(0)(2))
    assert(!withNull.isNaN && expectNull != 0.0) // sanity on the fixture
  }

  test("brute force topk: exact ranking, descending scores") {
    val corpus = clustered(4, 25)
    val qs = corpus.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val out = Similarity.bruteForceTopK(spark, qs, corpus, k = 5)
      .orderBy("query_id", "rank")
      .select("query_id", "rank", "score").as[(Long, Int, Double)].collect()
    assert(out.length === 15)
    out.groupBy(_._1).values.foreach { rows =>
      val scores = rows.sortBy(_._2).map(_._3)
      assert(scores.sorted.reverse.toSeq === scores.toSeq)
    }
  }

  test("lsh topk recalls most true neighbors on clustered data at full 2^16 tables") {
    val corpus = clustered(4, 50)
    val qs = corpus.filter($"vec_id" % 20 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val exact = Similarity.bruteForceTopK(spark, qs, corpus, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // bitsPerTable forced to the full 16 — recall must hold at 2^16
    // effective buckets per band, not only at the small-corpus width
    // the auto-sizing would pick
    val approx = Similarity.lshTopK(spark, qs, corpus, k = 5, dim = 16,
        bitsPerTable = Some(16))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
    info(f"banded lsh recall at 4x16-bit tables on clustered corpus: ${recall}%.2f")
  }

  test("project topk recalls most true neighbors through the 16-dim shortlist") {
    val corpus = clustered(4, 50)
    val qs = corpus.filter($"vec_id" % 20 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val exact = Similarity.bruteForceTopK(spark, qs, corpus, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.projectTopK(spark, qs, corpus, dim = 16, r = 20, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    // a r=4k shortlist through the JL projection keeps most of the
    // true top-k on clustered data
    assert(recall >= 0.8, s"recall $recall")
    info(f"project-then-rescore recall at r=20: ${recall}%.2f")
  }

  test("ivf hard negatives: different-label only, bounded candidates, brute-force recall") {
    import org.apache.spark.sql.expressions.Window
    val corpus = clustered(4, 50)
    val anchors = corpus.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("query_id"), $"label".as("qlabel"), $"embedding".as("qe"))
    // ground truth: exact different-label top-5 per anchor
    val scoredAll = corpus.crossJoin(anchors)
      .filter($"query_id" =!= $"vec_id" && $"label" =!= $"qlabel")
      .select($"query_id", $"vec_id".as("neg_id"),
        round(Similarity.cosine(spark, $"qe", $"embedding"), 6).as("score"))
    val w = Window.partitionBy($"query_id").orderBy($"score".desc, $"neg_id")
    val exact = scoredAll.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select("query_id", "neg_id").as[(Long, Long)].collect().toSet
    val mined = Similarity.ivfHardNegatives(spark, anchors, corpus,
        k = 5, nCells = 8, nProbe = 5)
      .select("query_id", "neg_id").as[(Long, Long)].collect().toSet
    // the label-exclusion contract: no mined pair shares a label
    val labels = corpus.select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    mined.foreach { case (q, n) =>
      assert(labels(q) !== labels(n), s"same-label pair ($q, $n)")
    }
    val recall = exact.intersect(mined).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
    info(f"ivf hard-negative recall at 5/8 probed cells: ${recall}%.2f")
  }

  test("lsh topk auto-sizes table width to the corpus and still fills k") {
    val corpus = clustered(4, 50)
    val qs = corpus.filter($"vec_id" % 20 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    // 200 vectors → 8-bit tables; the point is the query returns a
    // full top-k (small corpora must not fall into empty 2^16 buckets)
    val out = Similarity.lshTopK(spark, qs, corpus, k = 5, dim = 16)
      .groupBy("query_id").count().as[(Long, Long)].collect()
    assert(out.nonEmpty && out.forall(_._2 === 5L), out.mkString(","))
  }

  test("ivf topk recalls most true neighbors on clustered data") {
    val corpus = clustered(4, 50)
    val qs = corpus.filter($"vec_id" % 20 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val exact = Similarity.bruteForceTopK(spark, qs, corpus, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(spark, qs, corpus, k = 5, nCells = 8, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("pq adc score equals the query dot the reconstructed vector exactly") {
    import graft.functions.{PqAdc, PqEncode, PqLut}
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val df = Tables.embeddings(spark, sfDir).limit(64)
      .select($"vec_id", $"embedding").cache()
    val seeds = df.orderBy("vec_id").limit(16).select($"embedding")
      .collect().map(_.getSeq[Float](0))
    val numSub = 8; val sub = seeds.head.length / numSub
    val codebook: Seq[Seq[Seq[Double]]] = (0 until numSub).map { mi =>
      seeds.toSeq.map(s => s.slice(mi * sub, (mi + 1) * sub).map(_.toDouble).toSeq)
    }
    val q = df.limit(1).select($"embedding".as("qe")).collect().head.getSeq[Float](0)
    // driver-side LUT for q — lut[m*16+c] = q_m · centroid_mc
    val lut = (0 until numSub).flatMap { mi =>
      (0 until 16).map { c =>
        (0 until sub).map(i => codebook(mi)(c)(i) * q(mi * sub + i)).sum
      }
    }
    val got = df.select($"vec_id",
        column(PqAdc(expression(column(PqEncode(expression($"embedding"), codebook))),
          expression(typedLit(lut)), 16)).as("adc"))
      .as[(Long, Double)].collect().toMap
    val codes = df.select($"vec_id",
        column(PqEncode(expression($"embedding"), codebook)).as("codes"))
      .as[(Long, Seq[Int])].collect()
    codes.foreach { case (id, cs) =>
      val expected = cs.zipWithIndex.map { case (c, mi) =>
        (0 until sub).map(i => codebook(mi)(c)(i) * q(mi * sub + i)).sum
      }.sum
      assert(math.abs(got(id) - expected) < 1e-9, s"vec $id")
    }
    df.unpersist()
  }

  test("ivf-pq topk recalls most true neighbors on clustered data") {
    val corpus = clustered(4, 50, dim = 16)
    val qs = corpus.filter($"vec_id" % 20 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val exact = Similarity.bruteForceTopK(spark, qs, corpus, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // rerank is the recall/cost knob: on this corpus same-cluster ADC
    // scores are nearly tied (jitter ≪ quantization step), so the
    // shortlist must cover a cluster's worth of candidates
    val approx = Similarity.ivfPqTopK(spark, qs, corpus, k = 5,
        nCells = 8, nProbe = 4, numSub = 4, numCodes = 16, rerank = 48)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"ivf-pq recall on clustered corpus: $recall%.2f")
    assert(recall >= 0.6, s"recall $recall")
  }

  // the interpreted higher-order formulation HyperplaneSignature
  // replaced — kept here as the semantic reference
  private def interpretedSignature(emb: org.apache.spark.sql.Column, dim: Int) = {
    val ps = Similarity.planes(dim)
    (0 until Similarity.NumPlanes).map { p =>
      val plane = typedLit(ps(p).toSeq)
      val dot = aggregate(zip_with(emb, plane, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L << p)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  test("hyperplane signature expression matches the interpreted formulation") {
    val df = Tables.embeddings(spark, sfDir)
    val mismatches = df.select(
        Similarity.lshSignature(spark, $"embedding", 64).as("native"),
        interpretedSignature($"embedding", 64).as("interp"))
      .filter($"native" =!= $"interp").count()
    assert(mismatches === 0)
  }

  test("hyperplane signature expression runs in whole-stage codegen and is faster") {
    GraftFunctions.register(spark)
    val base = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding")
    val n = 40000L
    val wide = base.crossJoin(spark.range(n / base.count() + 1)).limit(n.toInt)
      .select($"embedding").cache()
    wide.count()
    val plan = wide.select(Similarity.lshSignature(spark, $"embedding", 64).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_hyperplane_sig"), plan)
    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    // bit_count, not sum(s): 64-bit signatures span the long range and
    // a 40k-row ANSI sum of them overflows
    def run(c: org.apache.spark.sql.Column): Double =
      time(wide.select(c.as("s")).agg(sum(bit_count($"s"))).collect())
    run(Similarity.lshSignature(spark, $"embedding", 64)) // JIT/codegen warm-up
    run(interpretedSignature($"embedding", 64))
    val native = (1 to 3).map(_ => run(Similarity.lshSignature(spark, $"embedding", 64))).min
    val interp = (1 to 3).map(_ => run(interpretedSignature($"embedding", 64))).min
    info(f"hyperplane signature over $n rows: codegen $native%.3fs vs interpreted $interp%.3fs (${interp / native}%.1fx)")
    wide.unpersist()
    // conservative CI bound; measured speedup is recorded in SURVEY §5
    assert(native * 2 < interp, f"expected >=2x, got codegen=$native%.3fs interpreted=$interp%.3fs")
  }

  // the banded candidate rule, restated independently: some 16-bit
  // band of the two signatures is within hamming 1
  private def someBandClose(sa: Long, sb: Long): Boolean =
    (0 until Similarity.NumBands).exists { b =>
      java.lang.Long.bitCount(((sa ^ sb) >>> (Similarity.BandBits * b)) & 0xFFFFL) <= 1
    }

  test("nearDupPairs: banded candidates, exactly-once emission, exact scores") {
    val corpus = clustered(4, 50)
    val rows = Similarity.nearDupPairs(spark, corpus, dim = 16, threshold = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(rows.nonEmpty)
    // exactly-once: no pair emitted twice despite 4 bands qualifying
    assert(rows.map(_._1).distinct.length === rows.length, "duplicate pair emitted")
    val out = rows.toMap
    val sigs = corpus.select($"vec_id",
        Similarity.lshSignature(spark, $"embedding", 16).as("sig"))
      .as[(Long, Long)].collect().toMap
    out.keys.foreach { case (a, b) =>
      assert(someBandClose(sigs(a), sigs(b)), s"pair ($a,$b) shares no close band")
    }
    val exact = corpus.as("a").crossJoin(corpus.as("b"))
      .filter($"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id", $"b.vec_id",
        round(call_function("graft_cosine", $"a.embedding", $"b.embedding"), 6).as("c"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    out.foreach { case (pair, score) =>
      assert(exact(pair) === score && score >= 0.3, s"$pair -> $score vs ${exact(pair)}")
    }
    // emitted pairs are exactly the qualifying banded subset
    val expected = exact.filter { case ((a, b), c) =>
      c >= 0.3 && someBandClose(sigs(a), sigs(b))
    }
    assert(out.keySet === expected.keySet)
    val recall = out.size.toDouble / math.max(exact.count(_._2 >= 0.3), 1)
    info(f"nearDupPairs recall vs exact all-pairs at 0.3: $recall%.2f (${out.size}/${exact.count(_._2 >= 0.3)})")
  }

  test("banded LSH candidate volume is far below all-pairs on uniform embeddings") {
    // sf0.1 embeddings are near-uniform: the regime where a too-coarse
    // table degenerates toward all-pairs. With 4 x 16-bit tables the
    // candidate set must stay orders of magnitude under n^2/2.
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select($"vec_id", $"embedding")
    val n = emb.count()
    val sigd = emb.withColumn("sig", Similarity.lshSignature(spark, $"embedding", 64))
    val cands = Similarity.bandedCandidatePairs(sigd).count()
    val allPairs = n * (n - 1) / 2
    info(s"banded LSH candidates on uniform n=$n: $cands of $allPairs all-pairs " +
      f"(${cands.toDouble / allPairs * 100}%.3f%%)")
    assert(cands > 0, "candidate generation produced nothing at all")
    assert(cands < allPairs / 100, s"$cands candidates is not sublinear vs $allPairs")
  }

  test("quantize stats expression matches the higher-order formulation exactly") {
    GraftFunctions.register(spark)
    // the interpreted five-HOF chain QuantizeStats replaced — kept as
    // the semantic reference (exact double equality expected: both
    // evaluate the identical IEEE formula)
    val e = transform($"embedding", x => x.cast("double"))
    val mn = array_min(e)
    val mx = array_max(e)
    val scale = when(mx > mn, (mx - mn) / 256.0).otherwise(lit(1.0))
    val q = transform(e, x => least(floor((x - mn) / scale), lit(255L)))
    val errs = zip_with(e, q, (x, qq) => abs(x - (mn + (qq.cast("double") + 0.5) * scale)))
    val st = call_function("graft_quantize_stats", $"embedding")
    val mismatches = Tables.embeddings(spark, sfDir).select(
        (st.getField("qmin") === mn &&
          st.getField("qmax") === mx &&
          st.getField("q_checksum") === aggregate(q, lit(0L), (a, x) => a + x) &&
          st.getField("max_abs_err") === array_max(errs)).as("ok"))
      .filter(!$"ok").count()
    assert(mismatches === 0)
  }

  test("semantic near-dup: within-cluster pairs equal the naive computation") {
    val v = Tables.embeddings(spark, sfDir).limit(120)
      .select($"vec_id", $"embedding").cache()
    val medoids = v.limit(4)
      .select($"vec_id".as("cluster_id"), $"embedding".as("centroid"))
    val got = Similarity.semanticNearDupPairs(spark, v, medoids, threshold = 0.1)
      .select($"vec_a", $"vec_b", $"cluster", $"score")
      .as[(Long, Long, Long, Double)].collect().toSet

    // naive ground truth on the driver (test-only scale)
    val vecs = v.as[(Long, Array[Float])].collect()
    val meds = medoids.as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val assign = vecs.map { case (id, e) =>
      val best = meds.map { case (cid, ce) => (r6(cos(e, ce)), cid) }
        .minBy { case (s, cid) => (-s, cid) }
      id -> (best._2, e)
    }.toMap
    val truth = (for {
      (a, (ca, ea)) <- assign.toSeq; (b, (cb, eb)) <- assign.toSeq
      if a < b && ca == cb
      s = r6(cos(ea, eb)) if s >= 0.1
    } yield (a, b, ca, s)).toSet
    assert(got.nonEmpty && got === truth)
  }

  test("multimodal pipeline: schema, batching, deterministic features") {
    val media = Multimodal.synthesizeMedia(Tables.documents(spark, sfDir).limit(50))
    assert(media.schema("media").dataType.typeName === "binary")
    assert(media.schema("meta").dataType.typeName === "struct")
    val feats = Multimodal.extractFeatures(spark, media)
    val rows = feats.as[(Long, Array[Float])].collect()
    assert(rows.length === 50)
    assert(rows.forall(_._2.length === 8))
    // deterministic across runs
    val again = Multimodal.extractFeatures(spark, media).as[(Long, Array[Float])].collect()
    assert(rows.map(_._2.toSeq).toSeq === again.map(_._2.toSeq).toSeq)
    // n_bytes feature equals payload length
    val check = media.select($"doc_id", length($"media").as("len")).as[(Long, Int)].collect().toMap
    assert(rows.forall { case (id, f) => f(0).toInt === check(id) })
  }

  test("graft_phash kernel equals the declarative block-gradient formulation") {
    val real = Multimodal.synthesizeMedia(Tables.documents(spark, sfDir).limit(100))
    val edge = Multimodal.synthesizeMedia(
      Seq((9001L, "", "en", "srcX", 0), (9002L, "x", "en", "srcX", 1),
        (9003L, "a" * 62, "en", "srcX", 62), (9004L, "ab" * 200, "en", "srcX", 400))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    for (m <- Seq(real, edge)) {
      val kernel = Multimodal.perceptualHash(m)
        .as[(Long, Long)].collect().sortBy(_._1)
      val decl = Multimodal.perceptualHashDeclarative(m)
        .as[(Long, Long)].collect().sortBy(_._1)
      assert(kernel === decl)
    }
  }
}
