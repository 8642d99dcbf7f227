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
}
