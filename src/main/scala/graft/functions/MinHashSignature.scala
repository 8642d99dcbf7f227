package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature as a native Catalyst expression.
  *
  * Input: array<long> of hashed shingles (already reduced mod the
  * Mersenne prime 2^31-1). Output: array<long> of `numPerms` minima of
  * the universal hashes (a_p * s + b_p) mod p.
  *
  * The interpreted equivalent — transform(sequence(0,63), i ->
  * array_min(transform(shingles, ...))) — allocates two lambda frames
  * per (perm, shingle) pair and was the dominant cost of the whole
  * dedup pipeline. This expression compiles to a two-level primitive
  * loop inside whole-stage codegen: perms × shingles multiply-mod-min,
  * no allocation beyond the output array.
  */
case class MinHashSignature(child: Expression, permA: Seq[Long], permB: Seq[Long])
    extends UnaryExpression {

  private val prime = 2147483647L // 2^31 - 1

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash expects ARRAY<BIGINT>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash"

  @transient private lazy val aArr: Array[Long] = permA.toArray
  @transient private lazy val bArr: Array[Long] = permB.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Long](aArr.length)
    var p = 0
    while (p < aArr.length) {
      var m = Long.MaxValue
      val a = aArr(p); val b = bArr(p)
      var i = 0
      while (i < n) {
        val h = (a * xs.getLong(i) + b) % prime
        if (h < m) m = h
        i += 1
      }
      out(p) = if (n == 0) 0L else m
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("permA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("permB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val h = ctx.freshName("h")
      s"""
         |int $n = $xs.numElements();
         |long[] $out = new long[$aRef.length];
         |for (int $p = 0; $p < $aRef.length; $p++) {
         |  long $m = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = ($aRef[$p] * $xs.getLong($i) + $bRef[$p]) % ${prime}L;
         |    if ($h < $m) $m = $h;
         |  }
         |  $out[$p] = ($n == 0) ? 0L : $m;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
