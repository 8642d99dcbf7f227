package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bit-signature of a float embedding: bit p of
  * the output long is `sign(v · plane_p) > 0`.
  *
  * This replaces the interpreted formulation (`zip_with` + `aggregate`
  * per plane — NumPlanes higher-order traversals per row) with ONE
  * fused codegen loop over a flattened `double[]` plane matrix: the
  * corpus-side signature is the per-row hot loop of the 100 TB ANN
  * path, and interpreted HOFs measured 10–300× slower than compiled
  * loops in this repo's minhash work.
  *
  * Semantics match the previous column expression exactly: the dot
  * product runs over `min(len(v), dim)` leading components, floats
  * widened to double, strict `> 0` sign test — so signatures (and
  * the recall measured in ScalaTest) are unchanged.
  */
case class HyperplaneSignature(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_sig expects ARRAY<FLOAT>, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_sig"

  private val numPlanes = planes.length
  private val dim = if (planes.isEmpty) 0 else planes.head.length

  // flattened row-major [plane][component]: one cache-friendly array
  @transient private lazy val flat: Array[Double] = {
    val f = new Array[Double](numPlanes * dim)
    var p = 0
    while (p < numPlanes) {
      val row = planes(p)
      var i = 0
      while (i < dim) { f(p * dim + i) = row(i); i += 1 }
      p += 1
    }
    f
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0
      val base = p * dim
      var i = 0
      while (i < n) { dot += flat(base + i) * v.getFloat(i); i += 1 }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("planes", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val base = ctx.freshName("base")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |long $sig = 0L;
         |for (int $p = 0; $p < $numPlanes; $p++) {
         |  double $dot = 0.0;
         |  int $base = $p * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $flatRef[$base + $i] * (double) $v.getFloat($i);
         |  }
         |  if ($dot > 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
