package graft

import graft.functions.{CosineSimilarity, GraftFunctions, HyperplaneSignature, MinHashSignature, MinHashWords, SignatureAgreement, SortedIntersectCount, WordNGrams}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extensions entry point: enables graft's planner strategy
  * and native functions via configuration —
  * `spark.sql.extensions=graft.GraftExtensions` — so a cluster picks
  * them up without code changes. (The library also self-registers at
  * first use for programmatic sessions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectResolutionRule(session => new graft.sources.ResolveMergeTableDml(session))
    ext.injectParser((_, delegate) => new graft.sources.GraftSqlParser(delegate))
    def info(name: String, clazz: Class[_]) = new ExpressionInfo(clazz.getName, name)
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", classOf[CosineSimilarity]),
      (children: Seq[Expression]) => CosineSimilarity(children.head, children(1))))
    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", classOf[MinHashSignature]),
      (children: Seq[Expression]) =>
        MinHashSignature(children.head, graft.ops.Dedup.permA.toSeq, graft.ops.Dedup.permB.toSeq)))
    ext.injectFunction((FunctionIdentifier("graft_minhash_words"),
      info("graft_minhash_words", classOf[MinHashWords]),
      (children: Seq[Expression]) =>
        MinHashWords(children.head, 3, graft.ops.Dedup.permA.toSeq, graft.ops.Dedup.permB.toSeq)))
    ext.injectFunction((FunctionIdentifier("graft_sorted_intersect_count"),
      info("graft_sorted_intersect_count", classOf[SortedIntersectCount]),
      (children: Seq[Expression]) => SortedIntersectCount(children.head, children(1))))
    ext.injectFunction((FunctionIdentifier("graft_sig_agreement"),
      info("graft_sig_agreement", classOf[SignatureAgreement]),
      (children: Seq[Expression]) => SignatureAgreement(children.head, children(1))))
    ext.injectFunction((FunctionIdentifier("graft_word_trigrams"),
      info("graft_word_trigrams", classOf[WordNGrams]),
      (children: Seq[Expression]) => WordNGrams(children.head, 3)))
    ext.injectFunction((FunctionIdentifier("graft_hyperplane_sig"),
      info("graft_hyperplane_sig", classOf[HyperplaneSignature]),
      GraftFunctions.hyperplaneBuilder))
    ext.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash", classOf[graft.functions.SimHash64]),
      (children: Seq[Expression]) => graft.functions.SimHash64(children.head)))
    ext.injectFunction((FunctionIdentifier("graft_window_hashes"),
      info("graft_window_hashes", classOf[graft.functions.WindowHashes]),
      GraftFunctions.windowHashesBuilder))
  }
}
