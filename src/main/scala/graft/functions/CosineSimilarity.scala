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
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects ARRAY<FLOAT>/ARRAY<DOUBLE> args, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  // per-side element width, resolved at plan time: ARRAY<DOUBLE>
  // inputs (e.g. a JL projection) read as-is, floats widen to double
  private def isDouble(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xd = isDouble(left.dataType); val yd = isDouble(right.dataType)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    // zero-norm/empty input → 0.0, not 0/0 = NaN: Spark orders NaN
    // above every double, so a NaN score would top every top-k and
    // pass every >= threshold filter
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      def get(arr: String, idx: String, dbl: Boolean): String =
        if (dbl) s"$arr.getDouble($idx)" else s"(double) $arr.getFloat($idx)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${get(a, i, isDouble(left.dataType))};
         |  double $y = ${get(b, i, isDouble(right.dataType))};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = $denom == 0.0 ? 0.0 : $dot / $denom;
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

  private def arity1(name: String, f: Expression => Expression): Seq[Expression] => Expression =
    cs => {
      require(cs.length == 1, s"$name expects 1 argument, got ${cs.length}")
      f(cs.head)
    }

  private def arity2(name: String, f: (Expression, Expression) => Expression): Seq[Expression] => Expression =
    cs => {
      require(cs.length == 2, s"$name expects 2 arguments, got ${cs.length}")
      f(cs(0), cs(1))
    }

  /** Single source of truth for every native function: (name,
    * implementing class, builder). Consumed by BOTH registration
    * paths — programmatic [[register]] and the config-driven
    * [[graft.GraftExtensions]] — so they cannot drift apart.
    */
  private[graft] val all: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("graft_cosine", classOf[CosineSimilarity],
      arity2("graft_cosine", CosineSimilarity(_, _))),
    ("graft_minhash", classOf[MinHashSignature],
      arity1("graft_minhash",
        MinHashSignature(_, graft.ops.Dedup.permA.toSeq, graft.ops.Dedup.permB.toSeq))),
    ("graft_minhash_words", classOf[MinHashWords],
      arity1("graft_minhash_words",
        MinHashWords(_, 3, graft.ops.Dedup.permA.toSeq, graft.ops.Dedup.permB.toSeq))),
    ("graft_sorted_intersect_count", classOf[SortedIntersectCount],
      arity2("graft_sorted_intersect_count", SortedIntersectCount(_, _))),
    ("graft_sorted_intersect", classOf[SortedIntersect],
      arity2("graft_sorted_intersect", SortedIntersect(_, _))),
    ("graft_sig_agreement", classOf[SignatureAgreement],
      arity2("graft_sig_agreement", SignatureAgreement(_, _))),
    ("graft_word_trigrams", classOf[WordNGrams],
      arity1("graft_word_trigrams", WordNGrams(_, 3))),
    ("graft_hyperplane_sig", classOf[HyperplaneSignature], hyperplaneBuilder(_)),
    ("graft_random_project", classOf[RandomProjection], randomProjectBuilder(_)),
    ("graft_simhash", classOf[SimHash64], arity1("graft_simhash", SimHash64(_))),
    ("graft_quantize_stats", classOf[QuantizeStats],
      arity1("graft_quantize_stats", QuantizeStats(_))),
    ("graft_window_hashes", classOf[WindowHashes], windowHashesBuilder(_)),
    ("graft_winnow", classOf[WinnowSelect], winnowBuilder(_)),
    ("graft_phash", classOf[PerceptualHash],
      arity1("graft_phash", PerceptualHash(_))),
    // the packed-lane literal is decoded at PLAN TIME into the
    // constructor field and dropped — the analyzed plan carries the
    // kernel, never a megabyte literal (see GraftBloomHit)
    ("graft_bloom_hit", classOf[GraftBloomHit], cs => {
      require(cs.length == 2, "graft_bloom_hit expects (fp, packed_lanes)")
      require(cs(1).foldable, "graft_bloom_hit lanes must be a literal")
      GraftBloomHit(cs.head,
        GraftBloomHit.unpackLanes(cs(1).eval().asInstanceOf[Array[Byte]]))
    }),
    ("graft_bounded_collect", classOf[BoundedCollectList], cs => {
      require(cs.length == 2, "graft_bounded_collect expects (expr, cap)")
      require(cs(1).foldable, "graft_bounded_collect cap must be a literal")
      BoundedCollectList(cs.head, cs(1).eval().asInstanceOf[Number].intValue())
    }))

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (name, clazz, builder) =>
      val ident = FunctionIdentifier(name)
      if (!registry.functionExists(ident))
        registry.registerFunction(ident, new ExpressionInfo(clazz.getName, name), builder)
    }
  }

  /** graft_random_project(emb, dim): dim must be a foldable int — the
    * JL plane matrix is fixed at plan time, like the LSH planes.
    */
  private[graft] def randomProjectBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2, "graft_random_project expects (embedding, dim)")
    require(children(1).foldable, "graft_random_project dim must be a literal")
    val dim = children(1).eval().asInstanceOf[Number].intValue()
    RandomProjection(children.head,
      graft.ops.Similarity.projectionPlanes(dim).map(_.toSeq).toSeq)
  }

  /** graft_window_hashes(hashes, w): w must be a foldable int — the
    * rolling power B^(w-1) is fixed at plan time.
    */
  private[graft] def windowHashesBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2, "graft_window_hashes expects (hashes, w)")
    require(children(1).foldable, "graft_window_hashes w must be a literal")
    WindowHashes(children.head, children(1).eval().asInstanceOf[Number].intValue())
  }

  /** graft_winnow(hashes, w): w must be a foldable int. */
  private[graft] def winnowBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2, "graft_winnow expects (hashes, w)")
    require(children(1).foldable, "graft_winnow w must be a literal")
    WinnowSelect(children.head, children(1).eval().asInstanceOf[Number].intValue())
  }
}
