package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed cardinality sketches.
  *
  * KMV (k-minimum-values): the classic distinct-count sketch — hash
  * every element to a uniform value, keep the k smallest DISTINCT
  * hashes per group, estimate |D| ≈ (k-1)/u_k where u_k is the k-th
  * smallest hash normalized to (0,1]. Per-group state is k longs no
  * matter how large the group (the property that matters at 100 TB),
  * sketches of disjoint shards merge by keeping the k smallest of the
  * union, and — unlike HyperLogLog — the estimate is a pure
  * deterministic function of the input set, so an independent engine
  * computing the same hash reproduces it bit-for-bit (the DuckDB
  * oracle does exactly that).
  *
  * The hash is the md5-prefix trick used by the split/mix operators
  * (48-bit value, identical in Spark and DuckDB); u_k = h_k / 2^48 is
  * a dyadic rational, exact in double, and IEEE division makes the
  * estimate itself engine-identical.
  */
object Sketches {

  val DefaultK = 64

  private val TwoPow48 = 281474976710656.0 // 2^48, exact in double

  /** 48-bit engine-portable uniform hash of a string column. */
  def portableHash(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** Scalar twin of [[kmvDistinct]]'s estimate column — the SAME
    * `(k−1)·2^48 / h_k` formula and HALF_UP 2 dp rounding over the k
    * smallest distinct hashes (exact count below k, where the sketch
    * IS the full set). The streaming fold ([[graft.streaming.StreamOps
    * .kmvUniquesStream]]) calls this so the two paths cannot drift.
    */
  def kmvEstimate(mins: Seq[Long], k: Int = DefaultK): Double = {
    val raw =
      if (mins.length < k) mins.length.toDouble
      else (k - 1).toDouble * TwoPow48 / mins.last
    BigDecimal(raw).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Per-group KMV distinct-count estimate next to the exact count
    * (the exact count is what the estimate is judged against; at
    * production scale one would keep only the sketch side).
    *
    * `elems` must be (group, elem) rows; duplicates are fine. The
    * k smallest distinct hashes are selected by the bounded-heap
    * [[graft.plans.TopK]] operator — partial heaps merge map-side, so
    * the only full shuffle is the distinct on (group, hash): 16-byte
    * rows, never the element strings.
    */
  def kmvDistinct(elems: DataFrame, groupCol: String, elemCol: String,
                  k: Int = DefaultK): DataFrame = {
    // distinct hashes, not distinct elements: the sketch dedupes in
    // hash space (collisions at n²/2^48 are the sketch's own error
    // floor), so full element strings never shuffle
    val hashes = elems
      .select(col(groupCol), portableHash(col(elemCol)).as("h"))
      .distinct()
    val kth = graft.plans.TopK.perKey(hashes, Seq(groupCol), Seq(-col("h")), k)
      .filter(col("rank") === k)
      .select(col(groupCol), col("h").as("hk"))
    hashes.groupBy(groupCol).agg(count(lit(1)).as("exact_distinct"))
      .join(kth, Seq(groupCol), "left")
      .select(col(groupCol), col("exact_distinct"),
        // fewer than k distinct values → the sketch IS the exact set
        round(coalesce(lit((k - 1).toDouble) * lit(TwoPow48) / col("hk"),
          col("exact_distinct").cast("double")), 2).as("kmv_estimate"))
  }

  /** Pairwise intersection estimates between per-group KMV sketches —
    * theta-sketch set algebra (Dasgupta et al.): with S_g the group's
    * k smallest distinct hashes and θ_g its k-th smallest (2^48 when
    * the sketch holds the whole set), the pair (a,b) estimates
    * |A ∩ B| ≈ |S_a ∩ S_b ∩ [0, θ)| · 2^48/θ at θ = min(θ_a, θ_b).
    * This is the question exact distinct-joins cannot answer at
    * 100 TB — corpus-overlap across slices whose element sets never
    * co-locate — from k longs per group: sketches merge by keeping
    * the k smallest, and set operations need only the sketches.
    * Deterministic (md5-prefix hash), so the DuckDB oracle reproduces
    * θ, the raw common count, AND the estimate bit-for-bit. The exact
    * overlap rides alongside as the judged-against column (gate scale
    * only; production keeps just the sketch side).
    */
  /** Scalar twin of [[kmvOverlap]]'s pair math — the SAME θ rule
    * (k-th smallest; 2^48 when the sketch holds the whole set), the
    * same `h < θ` common count, the same HALF_UP 2 dp estimate. The
    * streaming sketch maintainer ([[graft.streaming.StreamOps
    * .kmvSketchStream]]) pairs its state through this, and the spec
    * asserts it against the DataFrame gate so the two paths cannot
    * drift.
    */
  def overlapEstimate(minsA: Seq[Long], minsB: Seq[Long],
                      k: Int = DefaultK): (Long, Long, Double) = {
    val TwoPow48L = 281474976710656L
    def theta(m: Seq[Long]): Long = if (m.length < k) TwoPow48L else m.max
    val th = math.min(theta(minsA), theta(minsB))
    val common = minsA.toSet.intersect(minsB.toSet).count(_ < th).toLong
    val est = BigDecimal(common.toDouble * TwoPow48 / th)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    (th, common, est)
  }

  def kmvOverlap(elems: DataFrame, groupCol: String, elemCol: String,
                 k: Int = DefaultK): DataFrame = {
    val TwoPow48L = 281474976710656L
    val hashes = graft.Caches.register(elems
      .select(col(groupCol), portableHash(col(elemCol)).as("h"))
      .distinct())
    val sk = graft.Caches.register(
      graft.plans.TopK.perKey(hashes, Seq(groupCol), Seq(-col("h")), k))
    val theta = sk.groupBy(groupCol)
      .agg(max(when(col("rank") === k, col("h"))).as("hk"))
      .select(col(groupCol), coalesce(col("hk"), lit(TwoPow48L)).as("theta"))
    val pairs = theta.select(col(groupCol).as("group_a"), col("theta").as("ta"))
      .join(theta.select(col(groupCol).as("group_b"), col("theta").as("tb")),
        col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"), least(col("ta"), col("tb")).as("theta"))
    val common = pairs
      .join(sk.select(col(groupCol).as("group_a"), col("h")), Seq("group_a"))
      .join(sk.select(col(groupCol).as("group_b"), col("h")), Seq("group_b", "h"))
      .filter(col("h") < col("theta"))
      .groupBy("group_a", "group_b").agg(count(lit(1)).as("n_common"))
    val exact = hashes.select(col(groupCol).as("group_a"), col("h"))
      .join(hashes.select(col(groupCol).as("group_b"), col("h")), Seq("h"))
      .filter(col("group_a") < col("group_b"))
      .groupBy("group_a", "group_b").agg(count(lit(1)).as("exact_overlap"))
    pairs.join(common, Seq("group_a", "group_b"), "left")
      .join(exact, Seq("group_a", "group_b"), "left")
      .select(col("group_a"), col("group_b"), col("theta"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        round(coalesce(col("n_common"), lit(0L)) * lit(TwoPow48) / col("theta"), 2)
          .as("est_overlap"),
        coalesce(col("exact_overlap"), lit(0L)).as("exact_overlap"))
  }

  /** Count-min sketch: frequency estimation with d×w counters of
    * state no matter how many distinct elements flow through — the
    * heavy-hitter counting primitive at 100 TB, where exact per-token
    * counts would shuffle the full vocabulary. Each of the d rows
    * hashes every element into w buckets and counts; an element's
    * estimate is the MINIMUM of its d bucket counts (always ≥ the true
    * count; collisions only inflate). Sketches of disjoint shards
    * merge by adding counters.
    *
    * The d hash functions are salted md5 prefixes, so the whole
    * sketch — and every estimate read from it — is a deterministic
    * pure function of the input multiset, reproducible bit-for-bit by
    * the DuckDB oracle (the same property the KMV and quantile
    * sketches exploit).
    *
    * Returns the d×w counter table as (row, bucket, n) — the caller
    * joins query elements against it ([[cmEstimates]]).
    */
  def countMinTable(elems: DataFrame, elemCol: String,
                    d: Int = 4, w: Int = 256): DataFrame =
    elems.select(posexplode(cmBuckets(col(elemCol), d, w)).as(Seq("row", "bucket")))
      .groupBy("row", "bucket").agg(count(lit(1)).as("n"))

  /** The d salted bucket hashes of an element, as an array column. */
  private def cmBuckets(e: Column, d: Int, w: Int): Column =
    array((0 until d).map { j =>
      conv(substring(md5(concat(lit(s"cm$j:"), e)), 1, 12), 16, 10)
        .cast("long") % w
    }: _*)

  /** Count-min estimates for a set of query elements: look up each
    * element's d buckets in the counter table and take the min. The
    * counter table is tiny (d×w rows) and broadcasts; absent buckets
    * count zero.
    */
  def cmEstimates(queryElems: DataFrame, table: DataFrame, elemCol: String,
                  d: Int = 4, w: Int = 256): DataFrame =
    queryElems
      .select(col("*"), posexplode(cmBuckets(col(elemCol), d, w)).as(Seq("row", "bucket")))
      .join(broadcast(table), Seq("row", "bucket"), "left")
      .groupBy(queryElems.columns.map(col).toSeq: _*)
      .agg(min(coalesce(col("n"), lit(0L))).as("cm_estimate"))

  /** Per-group quantile estimates from a deterministic bounded sample:
    * the k rows with the smallest portable hash of `keyCol` form a
    * uniform sample of the group (the KMV idea applied to rows instead
    * of distinct values), and quantiles are read off the sorted sample
    * by nearest rank. Per-group state is k (hash, value) pairs no
    * matter how large the group, samples of disjoint shards merge by
    * keeping the k smallest of the union (same property that makes
    * KMV 100 TB-safe), and — unlike t-digest/percentile_approx — the
    * estimate is a pure deterministic function of the input, so the
    * DuckDB oracle reproduces every output bit-for-bit. Groups smaller
    * than k degrade to exact nearest-rank quantiles.
    *
    * The sample selection runs on the bounded-heap
    * [[graft.plans.TopK]] operator — partial heaps merge map-side, so
    * no per-group sort and no full shuffle of the group's rows; the
    * only full-width movement is the k sampled values per group.
    */
  def sampleQuantiles(rows: DataFrame, groupCol: String, keyCol: String,
                      valCol: String, k: Int = 256,
                      qs: Seq[(String, Double)] =
                        Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)): DataFrame = {
    val hashed = rows.select(col(groupCol),
      portableHash(col(keyCol).cast("string")).as("h"), col(valCol).as("v"))
    // rank 1 = smallest hash (ties by value, so the selected multiset
    // is engine-independent even across hash collisions)
    val sample = graft.plans.TopK.perKey(hashed, Seq(groupCol),
      Seq(-col("h"), -col("v")), k)
    val agg = sample.groupBy(groupCol)
      .agg(sort_array(collect_list(col("v"))).as("vs"), count(lit(1)).as("m"))
    val qCols = qs.map { case (name, q) =>
      // nearest-rank: index ceil(q·m); values pass through unrounded,
      // so equality with the oracle is exact
      element_at(col("vs"), ceil(lit(q) * col("m")).cast("int")).as(name)
    }
    agg.select(col(groupCol) +: col("m").as("n_sampled") +: qCols: _*)
  }
}
