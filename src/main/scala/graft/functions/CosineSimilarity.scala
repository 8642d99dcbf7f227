package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over two float-array columns.
  *
  * A custom Catalyst `Expression` with `doGenCode` so the dot product
  * runs inside whole-stage codegen as a tight primitive loop — no
  * boxing, no interpreted higher-order functions. Floats are widened
  * to double and accumulated left-to-right, which keeps results
  * bit-comparable with engines that do the same (e.g. DuckDB's
  * list_cosine_similarity over DOUBLE lists).
  *
  * This is the (b)-tier extension point from the design notes: a
  * scalar function Spark lacks, added as a codegen expression rather
  * than a UDF.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects two ARRAY<FLOAT> args, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = (double) $a.getFloat($i);
         |  double y = (double) $b.getFloat($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session-scoped registration of graft's native functions, so they
  * are callable via `call_function` / SQL by name. Idempotent.
  */
object GraftFunctions {

  /** graft_hyperplane_sig(emb, dim): dim must be a foldable int — the
    * plane matrix is fixed at plan time, exactly like the minhash
    * permutation constants.
    */
  private[graft] def hyperplaneBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2, "graft_hyperplane_sig expects (embedding, dim)")
    require(children(1).foldable, "graft_hyperplane_sig dim must be a literal")
    val dim = children(1).eval().asInstanceOf[Number].intValue()
    HyperplaneSignature(children.head,
      graft.ops.Similarity.planes(dim).map(_.toSeq).toSeq)
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val cosIdent = FunctionIdentifier("graft_cosine")
    if (!registry.functionExists(cosIdent)) {
      registry.registerFunction(
        cosIdent,
        new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
        (children: Seq[Expression]) => CosineSimilarity(children.head, children(1)))
    }
    val mhIdent = FunctionIdentifier("graft_minhash")
    if (!registry.functionExists(mhIdent)) {
      registry.registerFunction(
        mhIdent,
        new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
        (children: Seq[Expression]) =>
          MinHashSignature(children.head,
            graft.ops.Dedup.permA.toSeq, graft.ops.Dedup.permB.toSeq))
    }
    val mhwIdent = FunctionIdentifier("graft_minhash_words")
    if (!registry.functionExists(mhwIdent)) {
      registry.registerFunction(
        mhwIdent,
        new ExpressionInfo(classOf[MinHashWords].getName, "graft_minhash_words"),
        (children: Seq[Expression]) =>
          MinHashWords(children.head, k = 3,
            graft.ops.Dedup.permA.toSeq, graft.ops.Dedup.permB.toSeq))
    }
    val sicIdent = FunctionIdentifier("graft_sorted_intersect_count")
    if (!registry.functionExists(sicIdent)) {
      registry.registerFunction(
        sicIdent,
        new ExpressionInfo(classOf[SortedIntersectCount].getName, "graft_sorted_intersect_count"),
        (children: Seq[Expression]) => SortedIntersectCount(children.head, children(1)))
    }
    val sagIdent = FunctionIdentifier("graft_sig_agreement")
    if (!registry.functionExists(sagIdent)) {
      registry.registerFunction(
        sagIdent,
        new ExpressionInfo(classOf[SignatureAgreement].getName, "graft_sig_agreement"),
        (children: Seq[Expression]) => SignatureAgreement(children.head, children(1)))
    }
    val ngIdent = FunctionIdentifier("graft_word_trigrams")
    if (!registry.functionExists(ngIdent)) {
      registry.registerFunction(
        ngIdent,
        new ExpressionInfo(classOf[WordNGrams].getName, "graft_word_trigrams"),
        (children: Seq[Expression]) => WordNGrams(children.head, k = 3))
    }
    val hpIdent = FunctionIdentifier("graft_hyperplane_sig")
    if (!registry.functionExists(hpIdent)) {
      registry.registerFunction(
        hpIdent,
        new ExpressionInfo(classOf[HyperplaneSignature].getName, "graft_hyperplane_sig"),
        hyperplaneBuilder(_))
    }
    val shIdent = FunctionIdentifier("graft_simhash")
    if (!registry.functionExists(shIdent)) {
      registry.registerFunction(
        shIdent,
        new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
        (children: Seq[Expression]) => SimHash64(children.head))
    }
    val qsIdent = FunctionIdentifier("graft_quantize_stats")
    if (!registry.functionExists(qsIdent)) {
      registry.registerFunction(
        qsIdent,
        new ExpressionInfo(classOf[QuantizeStats].getName, "graft_quantize_stats"),
        (children: Seq[Expression]) => QuantizeStats(children.head))
    }
    val whIdent = FunctionIdentifier("graft_window_hashes")
    if (!registry.functionExists(whIdent)) {
      registry.registerFunction(
        whIdent,
        new ExpressionInfo(classOf[WindowHashes].getName, "graft_window_hashes"),
        windowHashesBuilder(_))
    }
  }

  /** graft_window_hashes(hashes, w): w must be a foldable int — the
    * rolling power B^(w-1) is fixed at plan time.
    */
  private[graft] def windowHashesBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2, "graft_window_hashes expects (hashes, w)")
    require(children(1).foldable, "graft_window_hashes w must be a literal")
    WindowHashes(children.head, children(1).eval().asInstanceOf[Number].intValue())
  }
}
