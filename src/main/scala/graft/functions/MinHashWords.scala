package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingle-hash + MinHash signature over a word array.
  *
  * One codegen pass does what previously took four interpreted
  * higher-order stages (k-gram string concat → distinct → hash →
  * per-permutation minima): hash each word once (first 48 bits of its
  * md5 — portable, see below), combine k consecutive word hashes
  * arithmetically into a shingle value mod 2^31-1, and fold every
  * shingle into the `numPerms` universal-hash minima. No shingle
  * strings are ever materialized — at 100 TB that also removes the
  * dominant memory traffic of the dedup pipeline, not just the
  * lambda overhead.
  *
  * The word hash is the md5 48-bit prefix rather than xxhash64 so the
  * ENTIRE minhash pipeline (signatures, band keys, candidate pairs,
  * estimated jaccard) is a pure function of the input reproducible in
  * any engine with md5 — DuckDB computes the identical value as
  * `('0x' || substr(md5(w), 1, 12))::BIGINT % p`, which is what
  * upgrades `dedup_minhash_lsh` from rows-only to hash-oracled.
  *
  * Duplicate shingles cannot affect a min, so no dedup step is
  * needed. Docs shorter than k words contribute their single
  * all-words shingle; empty docs yield the zero signature.
  */
case class MinHashWords(child: Expression, k: Int, permA: Seq[Long], permB: Seq[Long])
    extends UnaryExpression {

  private val prime = 2147483647L // 2^31 - 1

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_minhash_words expects ARRAY<STRING>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_words"

  @transient private lazy val aArr: Array[Long] = permA.toArray
  @transient private lazy val bArr: Array[Long] = permB.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val total = words.numElements()
    val wh = new Array[Long](total)
    // compact: null elements are skipped (not words; getUTF8String
    // would NPE), so n below counts real words only
    var n = 0
    var i = 0
    while (i < total) {
      if (!words.isNullAt(i)) {
        wh(n) = MinHashWords.portableWordHash(words.getUTF8String(i), prime)
        n += 1
      }
      i += 1
    }
    val nShingles = if (n == 0) 0 else math.max(n - k + 1, 1)
    val kk = math.min(k, n)
    val shingles = new Array[Long](nShingles)
    var s = 0
    while (s < nShingles) {
      var sh = 0L
      var j = 0
      while (j < kk) { sh = (sh * 31 + wh(s + j)) % prime; j += 1 }
      shingles(s) = sh
      s += 1
    }
    val out = new Array[Long](aArr.length)
    var p = 0
    while (p < aArr.length) {
      var m = Long.MaxValue
      val a = aArr(p); val b = bArr(p)
      var t = 0
      while (t < nShingles) {
        val h = (a * shingles(t) + b) % prime
        if (h < m) m = h
        t += 1
      }
      out(p) = if (nShingles == 0) 0L else m
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("permA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("permB", bArr, "long[]")
    val utf8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, words => {
      val n = ctx.freshName("n"); val wh = ctx.freshName("wh")
      val i = ctx.freshName("i"); val w = ctx.freshName("w")
      val out = ctx.freshName("out"); val nsh = ctx.freshName("nsh")
      val kk = ctx.freshName("kk"); val p = ctx.freshName("p")
      val m = ctx.freshName("m"); val s = ctx.freshName("s")
      val shs = ctx.freshName("shs"); val sh = ctx.freshName("sh")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val t = ctx.freshName("t")
      val tot = ctx.freshName("tot")
      s"""
         |int $tot = $words.numElements();
         |long[] $wh = new long[$tot];
         |int $n = 0;
         |for (int $i = 0; $i < $tot; $i++) {
         |  if ($words.isNullAt($i)) continue;
         |  $utf8 $w = $words.getUTF8String($i);
         |  $wh[$n++] = graft.functions.MinHashWords$$.MODULE$$.portableWordHash($w, ${prime}L);
         |}
         |int $nsh = ($n == 0) ? 0 : java.lang.Math.max($n - $k + 1, 1);
         |int $kk = java.lang.Math.min($k, $n);
         |long[] $shs = new long[$nsh];
         |for (int $s = 0; $s < $nsh; $s++) {
         |  long $sh = 0L;
         |  for (int $j = 0; $j < $kk; $j++) { $sh = ($sh * 31 + $wh[$s + $j]) % ${prime}L; }
         |  $shs[$s] = $sh;
         |}
         |long[] $out = new long[$aRef.length];
         |for (int $p = 0; $p < $aRef.length; $p++) {
         |  long $m = Long.MAX_VALUE;
         |  for (int $t = 0; $t < $nsh; $t++) {
         |    long $h = ($aRef[$p] * $shs[$t] + $bRef[$p]) % ${prime}L;
         |    if ($h < $m) $m = $h;
         |  }
         |  $out[$p] = ($nsh == 0) ? 0L : $m;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashWords {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  // word→hash memo: vocabulary is Zipfian, so most md5 calls repeat;
  // per-thread (expression objects are shared across tasks), bounded
  // (cleared at 64k entries), keys copied out of reused row buffers
  private val memo: ThreadLocal[java.util.HashMap[UTF8String, java.lang.Long]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[UTF8String, java.lang.Long]())

  /** First 48 bits of md5(word-bytes) as a non-negative long, mod
    * `prime` — bit-identical to DuckDB's
    * `('0x' || substr(md5(w), 1, 12))::BIGINT % prime`.
    *
    * The memo caches the PRE-mod 48-bit digest — a pure function of
    * the word alone — so callers with different primes can never read
    * each other's stale entries; the (cheap) mod applies per call.
    */
  def portableWordHash(w: UTF8String, prime: Long): Long = {
    val m = memo.get()
    val cached = m.get(w)
    if (cached != null) return cached.longValue() % prime
    val md = digests.get()
    md.reset()
    val d = md.digest(w.getBytes)
    val h48 = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
    if (m.size > 65536) m.clear()
    m.put(w.clone(), java.lang.Long.valueOf(h48))
    h48 % prime
  }
}
