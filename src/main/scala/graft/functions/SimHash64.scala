package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Occurrence-weighted SimHash of a word array in ONE codegen pass —
  * no explode, no shuffle, no 64-column aggregation: each row's
  * signature is a self-contained loop, so at 100 TB the simhash stage
  * is a pure map over the corpus.
  *
  * Per word, two polynomial hashes over its UTF-8 bytes
  * (`(acc·31+b) mod 2147483647` and `(acc·37+b) mod 2147483629`)
  * combine to a 62-bit value `h1 | h2 << 31`; bit j of the signature
  * is the sign of the ±1 sums of bit j over all word occurrences.
  * The fold is mod-prime (not wraparound) so an engine with strict
  * integer overflow (DuckDB) can recompute signatures exactly — that
  * is what makes the simhash gate queries hash-comparable.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  private val P1 = 2147483647L // 2^31 - 1
  private val P2 = 2147483629L // largest prime < 2^31 - 1
  private val Bits = 62

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_simhash expects ARRAY<STRING>, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val cnt = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      // null elements are skipped — not words, and getUTF8String
      // would NPE on them (SQL callers can pass any array)
      if (words.isNullAt(i)) { i += 1 }
      else {
      val w = words.getUTF8String(i)
      var h1 = 0L; var h2 = 0L
      var j = 0
      while (j < w.numBytes) {
        val b = (w.getByte(j) & 0xff).toLong
        h1 = (h1 * 31 + b) % P1
        h2 = (h2 * 37 + b) % P2
        j += 1
      }
      val h = h1 | (h2 << 31)
      var t = 0
      while (t < Bits) { if (((h >>> t) & 1L) == 1L) cnt(t) += 1 else cnt(t) -= 1; t += 1 }
      i += 1
      }
    }
    var sig = 0L
    var t = 0
    while (t < Bits) { if (cnt(t) > 0) sig |= (1L << t); t += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val utf8 = classOf[org.apache.spark.unsafe.types.UTF8String].getName
    nullSafeCodeGen(ctx, ev, words => {
      val n = ctx.freshName("n"); val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i"); val w = ctx.freshName("w")
      val h1 = ctx.freshName("h1"); val h2 = ctx.freshName("h2")
      val h = ctx.freshName("h"); val j = ctx.freshName("j")
      val b = ctx.freshName("b"); val t = ctx.freshName("t")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $words.numElements();
         |int[] $cnt = new int[$Bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($words.isNullAt($i)) continue;
         |  $utf8 $w = $words.getUTF8String($i);
         |  long $h1 = 0L; long $h2 = 0L;
         |  for (int $j = 0; $j < $w.numBytes(); $j++) {
         |    long $b = (long) ($w.getByte($j) & 0xff);
         |    $h1 = ($h1 * 31 + $b) % ${P1}L;
         |    $h2 = ($h2 * 37 + $b) % ${P2}L;
         |  }
         |  long $h = $h1 | ($h2 << 31);
         |  for (int $t = 0; $t < $Bits; $t++) {
         |    if ((($h >>> $t) & 1L) == 1L) $cnt[$t]++; else $cnt[$t]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $t = 0; $t < $Bits; $t++) {
         |  if ($cnt[$t] > 0) $sig |= (1L << $t);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
