package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** dHash-shaped perceptual hash of a binary media payload in ONE
  * compiled byte pass: the payload splits into 63 equal blocks and
  * bit `j` records whether block `j`'s byte-sum exceeds block
  * `j+1`'s — 62 adjacent-gradient bits in a BIGINT. Semantics are
  * exactly the declarative formulation in
  * [[graft.ops.Multimodal.perceptualHash]]'s oracle (per-block char
  * sums over the ASCII payload; byte sum ≡ char sum there), but the
  * interpreted `transform`/`split('')`/`aggregate` chain pays three
  * lambda frames per CHARACTER — ~20k frames per doc, recomputed for
  * every plan consumer — where this kernel is a single O(bytes) loop
  * with one 63-long scratch array. The swap-point for a real
  * decode+resize stays in the Multimodal layer; this expression only
  * fixes how the stub's arithmetic executes.
  */
case class PerceptualHash(child: Expression) extends UnaryExpression {

  private val Blocks = 63

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_phash expects BINARY, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_phash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val n = bytes.length
    val bl = math.max((n + Blocks - 1) / Blocks, 1)
    val sums = new Array[Long](Blocks)
    var i = 0
    while (i < n) { sums(i / bl) += bytes(i) & 0xff; i += 1 }
    var acc = 0L
    var j = 0
    while (j < Blocks - 1) {
      if (sums(j) > sums(j + 1)) acc |= 1L << j
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("perceptualHash", this, classOf[PerceptualHash].getName)
    nullSafeCodeGen(ctx, ev, bytes => {
      s"${ev.value} = $self.evalBytes($bytes);"
    })
  }

  /** Public entry for generated code. */
  def evalBytes(bytes: Array[Byte]): Long =
    nullSafeEval(bytes).asInstanceOf[Long]

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
