package graft.ops

import graft.SparkSpec

/** The model-artifact contract (docs/model-artifacts.md): a trained
  * model persisted with [[ModelArtifacts]] and reloaded must score
  * BIT-IDENTICALLY to the in-memory one — the property that lets the
  * session memo caches (`lmMemo`, `pcaMemo`, train-on-first-use)
  * swap for real train-once/score-everywhere artifacts at scale.
  */
class ModelArtifactSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val p = s"target/test_tmp/artifact_$name"
    graft.cdc.MergeTable.drop(p)
    p
  }

  private def corpus: org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(11)
    val pos = Seq("query", "index", "table", "join", "scan")
    val neg = Seq("rain", "cloud", "wind", "storm", "sun")
    def doc(id: Long, markers: Seq[String]): (Long, String, String) = {
      val ws = Seq.fill(10)(markers(rnd.nextInt(markers.size)))
      (id, if (markers == pos) "en" else "de", ws.mkString(" "))
    }
    (0L until 80L).map(i => doc(i, if (i % 4 < 2) pos else neg))
      .toDF("doc_id", "lang", "text")
  }

  test("a reloaded classifier model scores identically to the in-memory one") {
    val d = corpus
    val model = QualityQueries.trainClassifierModel(d)
    val direct = QualityQueries.scoreWithClassifier(d, model)
      .as[(Long, Long, Long, Int, Int)].collect().toSeq
    val path = fresh("classifier")
    ModelArtifacts.save(model, path)
    val reloaded = QualityQueries.scoreWithClassifier(
        d, ModelArtifacts.load(spark, path))
      .as[(Long, Long, Long, Int, Int)].collect().toSeq
    assert(reloaded === direct)
    // the artifact really is the model: exactly one OOV row, exact
    // integer weights
    val m = ModelArtifacts.load(spark, path)
    assert(m.filter(org.apache.spark.sql.functions.col("w").isNull).count() === 1)
  }

  test("scoring NEW documents under a reloaded model matches the live model") {
    val train = corpus
    val model = QualityQueries.trainClassifierModel(train)
    val path = fresh("classifier_new")
    ModelArtifacts.save(model, path)
    // unseen docs, including OOV-only text (odd ids = held-out shape)
    val fresh0 = Seq(
      (1001L, "en", "query join index unknownword"),
      (1002L, "de", "storm rain zzz"),
      (1003L, "fr", "entirely out of vocabulary words"))
      .toDF("doc_id", "lang", "text")
    val a = QualityQueries.scoreWithClassifier(fresh0, model)
      .as[(Long, Long, Long, Int, Int)].collect().toSeq
    val b = QualityQueries.scoreWithClassifier(
        fresh0, ModelArtifacts.load(spark, path))
      .as[(Long, Long, Long, Int, Int)].collect().toSeq
    assert(a === b)
  }

  test("a reloaded PCA component round-trips exactly") {
    val w = Array(BigInt(999983), BigInt(-123456), BigInt(0), BigInt(500000))
    val path = fresh("pca")
    ModelArtifacts.saveComponent(spark, w, path)
    assert(ModelArtifacts.loadComponent(spark, path).toSeq === w.toSeq)
  }

  private def embeddings = graft.tables.Tables.embeddings(spark, sfDir)
    .limit(120).select(org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.col("embedding"))

  test("IVF centroids round-trip exactly and a reloaded index serves identically") {
    val corpus = embeddings.cache()
    val queries = corpus.filter("vec_id < 8")
      .select(org.apache.spark.sql.functions.col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.col("embedding").as("qe"))
    val cents = Similarity.kmeansCentroids(spark, corpus, "embedding", nCells = 8)
    val path = fresh("ivf_centroids")
    ModelArtifacts.saveIvfCentroids(spark, cents, path)
    val reloaded = ModelArtifacts.loadIvfCentroids(spark, path)
    assert(reloaded === cents, "centroid floats must persist exactly")
    val direct = Similarity.ivfTopKWith(spark, queries, corpus, k = 5, cents)
      .as[(Long, Long, Int, Double)].collect().toSeq.sorted
    val served = Similarity.ivfTopKWith(spark, queries, corpus, k = 5, reloaded)
      .as[(Long, Long, Int, Double)].collect().toSeq.sorted
    assert(served === direct, "a reloaded IVF index must serve bit-identically")
    corpus.unpersist()
  }

  test("the IVF-PQ index pair reloads and serves bit-identically") {
    val corpus = embeddings.cache()
    val queries = corpus.filter("vec_id < 8")
      .select(org.apache.spark.sql.functions.col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.col("embedding").as("qe"))
    val cents = Similarity.kmeansCentroids(spark, corpus, "embedding", nCells = 8)
    val codebook = Similarity.trainPqCodebook(spark, corpus, numSub = 8, numCodes = 16)
    val cpath = fresh("ivfpq_cents")
    val qpath = fresh("ivfpq_codebook")
    ModelArtifacts.saveIvfCentroids(spark, cents, cpath)
    ModelArtifacts.savePqCodebook(spark, codebook, qpath)
    val rCodebook = ModelArtifacts.loadPqCodebook(spark, qpath)
    assert(rCodebook === codebook, "PQ sub-centroids must persist exactly")
    val direct = Similarity
      .ivfPqTopKWith(spark, queries, corpus, k = 5, cents, codebook)
      .as[(Long, Long, Int, Double)].collect().toSeq.sorted
    val served = Similarity.ivfPqTopKWith(spark, queries, corpus, k = 5,
        ModelArtifacts.loadIvfCentroids(spark, cpath), rCodebook)
      .as[(Long, Long, Int, Double)].collect().toSeq.sorted
    assert(served === direct, "a reloaded IVF-PQ pair must serve bit-identically")
    corpus.unpersist()
  }
}
