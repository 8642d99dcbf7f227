package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of common elements between two SORTED long arrays — a
  * two-pointer merge scan compiled into whole-stage codegen. With
  * per-document shingle sets sorted once, pairwise set intersection
  * costs O(|a|+|b|) primitive comparisons instead of the hash-set
  * build that `array_intersect`/`array_union` pay per pair.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"expects two ARRAY<BIGINT>, got $l / $r")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val c = ctx.freshName("c"); val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; int $c = 0;
         |int $n = $a.numElements(); int $m = $b.numElements();
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The common ELEMENTS of two SORTED long arrays — the member-
  * returning sibling of [[SortedIntersectCount]], same two-pointer
  * merge scan. `array_intersect` builds a hash set per invocation
  * with boxed elements; for pre-sorted adjacency lists (the triangle
  * edge-iterator) this is a primitive O(|a|+|b|) pass into one
  * exact-size array.
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"expects two ARRAY<BIGINT>, got $l / $r")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sorted_intersect"

  def intersect(a: Any, b: Any): GenericArrayData = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    val out = new Array[Long](math.min(n, m))
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { out(c) = xv; c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, c))
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = intersect(a, b)

  // codegen delegates to the compiled method (the QuantizeStats
  // pattern): the loop body is JIT-hot either way and the result is
  // an allocated array, so expression fusion has nothing left to save
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("sortedIntersect", this,
        classOf[SortedIntersect].getName)
      s"${ev.value} = $ref.intersect($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Positional agreement count between two equal-length long arrays —
  * the MinHash estimated-Jaccard numerator (matching minima over
  * numPerms permutations), compiled to a primitive loop. Replaces the
  * interpreted `aggregate(zip_with(...))` formulation in candidate
  * rescoring, which allocates two lambda frames per position per pair.
  */
case class SignatureAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"expects two ARRAY<BIGINT>, got $l / $r")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sig_agreement"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var c = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) { $c++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Rolling polynomial hashes of every w-word window over a document,
  * in ONE pass per document: given the per-word hash values (already
  * reduced mod P), emits the n-w+1 window hashes where
  * H_i = Σ_j v_{i+j}·B^{w-1-j} mod P — the Rabin–Karp recurrence
  * H_{i+1} = (H_i − v_i·B^{w-1})·B + v_{i+w} keeps the cost O(n)
  * regardless of window width, where the naive per-window fold is
  * O(n·w) (a 20× token blowup at w=20). Equals a left fold
  * `(acc·B + v) mod P` over each window, which is what the DuckDB
  * oracle recomputes directly. Inputs shorter than w emit no windows.
  */
case class WindowHashes(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "window width must be >= 1")

  import WindowHashes.{B, P}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects ARRAY<BIGINT>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_window_hashes"

  // B^(w-1) mod P, fixed at plan time
  private val pw: Long = {
    var r = 1L; var i = 1
    while (i < w) { r = r * B % P; i += 1 }
    r
  }

  override protected def nullSafeEval(input: Any): Any = {
    val vs = input.asInstanceOf[ArrayData]
    val n = vs.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Long](n - w + 1)
    var h = 0L
    var i = 0
    while (i < w) { h = (h * B + vs.getLong(i)) % P; i += 1 }
    out(0) = h
    var pos = 1
    while (pos <= n - w) {
      // all intermediates stay below 2^62: h < P ≈ 2^30, v·pw < P² ≈ 2^60
      h = (((h - vs.getLong(pos - 1) * pw % P + P) % P) * B + vs.getLong(pos + w - 1)) % P
      out(pos) = h
      pos += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("windowHashes", this, classOf[WindowHashes].getName)
    nullSafeCodeGen(ctx, ev, vs => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.evalHashes($vs);
       """.stripMargin
    })
  }

  /** Public entry for generated code. */
  def evalHashes(vs: ArrayData): ArrayData =
    nullSafeEval(vs).asInstanceOf[ArrayData]

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowHashes {
  /** Same base/modulus as TextAnalysis.rollingFingerprint, so the
    * DuckDB fold `(acc*31 + v) % 1000000007` reproduces every hash.
    */
  val B = 31L
  val P = 1000000007L
}

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken) in
  * one compiled pass: from the gram-hash array, the minimum VALUE of
  * each sliding window of `w` hashes, deduplicated preserving first
  * occurrence — the fingerprint set a MOSS-style substring index
  * stores. A monotonic deque makes the whole selection O(n) however
  * wide the window, where the declarative formulation
  * `transform(sequence(...), j -> array_min(slice(hs, j+1, w)))` pays
  * O(n·w) slice copies plus two lambda frames per window — the same
  * kernel-vs-lambda economics as [[WindowHashes]]. Value-identical to
  * that formulation followed by `array_distinct` (ties pick equal
  * VALUES, so head-vs-rightmost tie policy cannot change the set).
  * Inputs shorter than w emit no fingerprints (total — safe under
  * optimizer-inferred pre-filter evaluation).
  */
case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "winnow window must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects ARRAY<BIGINT>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(input: Any): Any = {
    val vs = input.asInstanceOf[ArrayData]
    val n = vs.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = Array.newBuilder[Any]
    // deque of candidate indices, values increasing front→back; the
    // front is always the current window's minimum
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    var i = 0
    while (i < n) {
      val v = vs.getLong(i)
      while (tail > head && vs.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = vs.getLong(deque(head))
        if (seen.add(m)) out += m
      }
      i += 1
    }
    new GenericArrayData(out.result())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("winnowSelect", this, classOf[WinnowSelect].getName)
    nullSafeCodeGen(ctx, ev, vs => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.evalHashes($vs);
       """.stripMargin
    })
  }

  /** Public entry for generated code. */
  def evalHashes(vs: ArrayData): ArrayData =
    nullSafeEval(vs).asInstanceOf[ArrayData]

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word k-grams as strings, built in one compiled pass (the
  * interpreted `transform(sequence(...), i -> concat_ws(...))`
  * formulation pays two lambda frames plus string re-copies per
  * gram). Short inputs (< k words) yield the single all-words gram,
  * matching Dedup.wordShingles semantics; grams are NOT deduped.
  */
case class WordNGrams(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects ARRAY<STRING>, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  private def gram(words: Array[UTF8String], start: Int, len: Int): UTF8String = {
    val parts = new Array[UTF8String](2 * len - 1)
    var j = 0
    while (j < len) {
      parts(2 * j) = words(start + j)
      if (j < len - 1) parts(2 * j + 1) = WordNGrams.Space
      j += 1
    }
    UTF8String.concat(parts: _*)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val total = arr.numElements()
    // compact out null elements: a null word would make concat return
    // null — an illegal element under the declared containsNull=false
    val words = new Array[UTF8String](total)
    var n = 0
    var i = 0
    while (i < total) {
      if (!arr.isNullAt(i)) { words(n) = arr.getUTF8String(i); n += 1 }
      i += 1
    }
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val kk = math.min(k, n)
    val out = new Array[Any](math.max(n - k + 1, 1))
    var s = 0
    while (s < out.length) { out(s) = gram(words, s, kk); s += 1 }
    new GenericArrayData(out)
  }

  // eval path only: the per-gram UTF8String.concat dominates, so
  // codegen would buy little; the expression is still ~10x cheaper
  // than the lambda formulation. Marked CodegenFallback-style via
  // genCode delegation.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wordNGrams", this, classOf[WordNGrams].getName)
    nullSafeCodeGen(ctx, ev, words => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.evalWords($words);
       """.stripMargin
    })
  }

  /** Public entry for generated code. */
  def evalWords(words: ArrayData): ArrayData =
    nullSafeEval(words).asInstanceOf[ArrayData]

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNGrams {
  /** Shared separator — one constant instead of (k-1) allocations per
    * gram on the corpus-wide hot path.
    */
  private[functions] val Space: UTF8String = UTF8String.fromString(" ")
}
