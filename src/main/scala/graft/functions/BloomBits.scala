package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom membership probe against a driver-built lane array, carried
  * as a CONSTRUCTOR FIELD and emitted through `addReferenceObj` — the
  * array never appears in the plan as a literal (a 2^17-long array
  * literal made every plan-handling step pay megabytes per query; it
  * benched the streaming dedup ingest 15× slower) and never shuffles;
  * it ships once per executor inside the serialized expression.
  *
  * Bit positions are BYTE-IDENTICAL to the SQL derivation the oracled
  * gate uses (`conv(substring(md5(concat('bloom<i>', fp)), 1, 6), 16,
  * 10) % bits`): the first six hex chars of an md5 are its first
  * three bytes, so position_i = 24-bit big-endian of md5("bloom" + i
  * + fp)[0..2] mod bits — reproducible in DuckDB and here.
  */
case class GraftBloomHit(child: Expression, lanes: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bloom_hit expects STRING, got $t")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_hit"
  // default case-class toString would still render child fine; the
  // Array field prints as its JVM identity, never its contents

  override protected def nullSafeEval(fp: Any): Any =
    GraftBloomHit.hit(fp.asInstanceOf[UTF8String], lanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomLanes", lanes, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftBloomHit.hit($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftBloomHit {
  val Probes = 4

  /** Pack/unpack the lane array for the registered builder: the lanes
    * travel to the builder as ONE foldable binary literal, are decoded
    * at PLAN TIME into the constructor field, and the literal child is
    * dropped — the analyzed plan carries no megabyte literal.
    */
  def packLanes(lanes: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](lanes.length * 8)
    java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer().put(lanes)
    bytes
  }

  def unpackLanes(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length % 8 == 0, "packed bloom lanes must be 8-byte aligned")
    val lanes = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(lanes)
    lanes
  }

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Probe position i of `fp`: 24-bit big-endian prefix of
    * md5("bloom" + i + fp) mod (lanes·64). */
  private def position(fpBytes: Array[Byte], i: Int, bits: Long): Int = {
    val d = md5.get()
    d.reset()
    d.update(("bloom" + i).getBytes("UTF-8"))
    d.update(fpBytes)
    val h = d.digest()
    val v = ((h(0) & 0xff) << 16) | ((h(1) & 0xff) << 8) | (h(2) & 0xff)
    (v % bits).toInt
  }

  def hit(fp: UTF8String, lanes: Array[Long]): Boolean = {
    val bits = lanes.length * 64L
    val bs = fp.getBytes
    var i = 0
    while (i < Probes) {
      val p = position(bs, i, bits)
      if ((lanes(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** OR `fp`'s probe bits into `lanes` (the build-side twin of
    * [[hit]]; same positions by construction). */
  def add(fp: UTF8String, lanes: Array[Long]): Unit = {
    val bits = lanes.length * 64L
    val bs = fp.getBytes
    var i = 0
    while (i < Probes) {
      val p = position(bs, i, bits)
      lanes(p >>> 6) |= 1L << (p & 63)
      i += 1
    }
  }
}
