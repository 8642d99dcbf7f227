package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The persist/reload contract for trained model artifacts — the
  * named swap point behind the session memo caches (`lmMemo`,
  * `pcaMemo`, the classifier's train-on-first-use): inside one gate
  * run a trained model lives in a session `TrieMap`, but at
  * production scale it is an ARTIFACT — trained once on a (sampled)
  * corpus pass, written to object storage, and reloaded by every
  * downstream scoring job. Because every model here is a plain
  * DataFrame of exact integers (classifier odds weights, PCA
  * component, bigram counts), persistence is lossless parquet and a
  * reloaded model scores BIT-IDENTICALLY to the in-memory one —
  * asserted by `ModelArtifactSpec`. See docs/model-artifacts.md.
  */
object ModelArtifacts {

  /** Persist a model frame (overwrite = retrain-and-republish). */
  def save(model: DataFrame, path: String): Unit =
    model.write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** The PCA component as an artifact frame (dim_j, w). Component
    * values are renormalized to ~1e6 each round, so they fit a LONG
    * exactly — no precision loss through the round-trip.
    */
  def saveComponent(spark: SparkSession, w: Array[BigInt], path: String): Unit = {
    import spark.implicits._
    save(w.zipWithIndex.map { case (x, j) => (j, x.toLong) }.toSeq
      .toDF("dim_j", "w"), path)
  }

  def loadComponent(spark: SparkSession, path: String): Array[BigInt] =
    load(spark, path).orderBy("dim_j")
      .collect().map(r => BigInt(r.getLong(1)))

  /** The IVF centroid codebook as an artifact frame (cell, pos, v) —
    * the index a 10⁹-vector fleet actually ships: trained once with
    * [[Similarity.kmeansCentroids]] on a (sampled) corpus pass, then
    * reloaded by every serving job via [[Similarity.ivfTopKWith]].
    * Centroid floats persist exactly (parquet FLOAT), so a reloaded
    * codebook serves bit-identically (`ModelArtifactSpec`).
    */
  def saveIvfCentroids(spark: SparkSession, cents: Seq[(Int, Seq[Float])],
                       path: String): Unit = {
    import spark.implicits._
    save(cents.flatMap { case (cell, vs) =>
      vs.zipWithIndex.map { case (v, pos) => (cell, pos, v) }
    }.toDF("cell", "pos", "v"), path)
  }

  def loadIvfCentroids(spark: SparkSession, path: String): Seq[(Int, Seq[Float])] =
    load(spark, path).collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (cell, rows) =>
        cell -> rows.sortBy(_.getInt(1)).map(_.getFloat(2)).toSeq
      }

  /** The PQ sub-centroid codebook (mi, code, pos, v) — with the IVF
    * centroids this is the complete IVF-PQ index artifact; serve a
    * reloaded pair with [[Similarity.ivfPqTopKWith]]. Doubles persist
    * exactly (parquet DOUBLE).
    */
  def savePqCodebook(spark: SparkSession, codebook: Seq[Seq[Seq[Double]]],
                     path: String): Unit = {
    import spark.implicits._
    save(codebook.zipWithIndex.flatMap { case (codes, mi) =>
      codes.zipWithIndex.flatMap { case (c, code) =>
        c.zipWithIndex.map { case (v, pos) => (mi, code, pos, v) }
      }
    }.toDF("mi", "code", "pos", "v"), path)
  }

  def loadPqCodebook(spark: SparkSession, path: String): Seq[Seq[Seq[Double]]] =
    load(spark, path).collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, sub) =>
        sub.groupBy(_.getInt(1)).toSeq.sortBy(_._1).map { case (_, rows) =>
          rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
        }
      }
}
