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

  test("lsh topk recalls most true neighbors on clustered data") {
    val corpus = clustered(4, 50)
    val qs = corpus.filter($"vec_id" % 20 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val exact = Similarity.bruteForceTopK(spark, qs, corpus, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(spark, qs, corpus, k = 5, dim = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
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
}
