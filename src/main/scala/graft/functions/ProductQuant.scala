package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (the FAISS IVFPQ memory path): a
  * dim-component float vector is split into M contiguous subvectors
  * and each subvector is replaced by the index of its nearest
  * sub-centroid — M small integers (one byte each at K ≤ 256) instead
  * of dim floats, a 32× compression at dim=64/M=8 that is what lets a
  * 10^9-vector index live in RAM. Scoring against a query uses the
  * ADC trick: the query precomputes its partial dot product with
  * every sub-centroid once (M×K lookup table), and each corpus
  * vector's approximate dot product is M table lookups — no float
  * math per candidate.
  *
  * All three kernels compile the codebook to a flat double[] fixed at
  * plan time (the [[HyperplaneSignature]] pattern) with tight codegen
  * loops; the codebook itself is trained/picked deterministically by
  * the caller ([[graft.ops.Similarity.ivfPqTopK]]).
  */
object ProductQuant {
  /** codebook(m)(c) = sub-centroid c of subspace m (subDim doubles).
    * Flattened row-major to [m][c][i] for the codegen kernels.
    */
  def flatten(codebook: Seq[Seq[Seq[Double]]]): Array[Double] = {
    val m = codebook.length
    val k = codebook.head.length
    val sub = codebook.head.head.length
    val f = new Array[Double](m * k * sub)
    var mi = 0
    while (mi < m) {
      var c = 0
      while (c < k) {
        var i = 0
        while (i < sub) { f((mi * k + c) * sub + i) = codebook(mi)(c)(i); i += 1 }
        c += 1
      }
      mi += 1
    }
    f
  }
}

/** PQ encode: float vector → M nearest-sub-centroid codes (by L2
  * within each subspace; ties take the lower code, so encoding is
  * deterministic for any input).
  */
case class PqEncode(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_pq_encode expects ARRAY<FLOAT>, got $t")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  private val m = codebook.length
  private val k = codebook.head.length
  private val sub = codebook.head.head.length
  @transient private lazy val flat: Array[Double] = ProductQuant.flatten(codebook)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var d = 0.0
        var i = 0
        val base = (mi * k + c) * sub
        val voff = mi * sub
        while (i < sub) {
          // null slots count as 0.0f (explicit: ArrayData.getFloat's
          // null read is representation-dependent)
          val x = if (v.isNullAt(voff + i)) 0.0f else v.getFloat(voff + i)
          val diff = flat(base + i) - x
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(mi) = best
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.evalVector($v);
       """.stripMargin
    })
  }

  /** Public entry for generated code. */
  def evalVector(v: ArrayData): ArrayData = nullSafeEval(v).asInstanceOf[ArrayData]

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC lookup table for one query: lut[m*K + c] = q_m · centroid_mc.
  * Computed once per query row; every candidate's approximate dot
  * product is then M array lookups ([[PqAdc]]).
  */
case class PqLut(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_pq_lut expects ARRAY<FLOAT>, got $t")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  private val m = codebook.length
  private val k = codebook.head.length
  private val sub = codebook.head.head.length
  @transient private lazy val flat: Array[Double] = ProductQuant.flatten(codebook)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Any](m * k)
    var mi = 0
    while (mi < m) {
      var c = 0
      while (c < k) {
        var dot = 0.0
        var i = 0
        val base = (mi * k + c) * sub
        val voff = mi * sub
        while (i < sub) { // null slots count as 0.0f, as in PqEncode
          val x = if (v.isNullAt(voff + i)) 0.0f else v.getFloat(voff + i)
          dot += flat(base + i) * x; i += 1
        }
        out(mi * k + c) = dot
        c += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.evalVector($v);
       """.stripMargin
    })
  }

  /** Public entry for generated code. */
  def evalVector(v: ArrayData): ArrayData = nullSafeEval(v).asInstanceOf[ArrayData]

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC score: Σ_m lut[m*K + codes[m]] ≈ q · v — the per-candidate hot
  * loop of the PQ path, compiled to M primitive lookups.
  */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_adc expects (ARRAY<INT> codes, ARRAY<DOUBLE> lut), got $l / $r")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override protected def nullSafeEval(codes: Any, lut: Any): Any = {
    val cs = codes.asInstanceOf[ArrayData]
    val l = lut.asInstanceOf[ArrayData]
    var s = 0.0
    var mi = 0
    val n = cs.numElements()
    while (mi < n) { s += l.getDouble(mi * k + cs.getInt(mi)); mi += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cs, l) => {
      val mi = ctx.freshName("mi"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |double $s = 0.0;
         |int $n = $cs.numElements();
         |for (int $mi = 0; $mi < $n; $mi++) {
         |  $s += $l.getDouble($mi * $k + $cs.getInt($mi));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
