package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open-session accumulator for [[StreamOps.sessionizeStream]]. */
case class OpenSession(userId: Long, startMs: Long, endMs: Long, nEvents: Long)

/** O(1)-per-user accumulator for [[StreamOps.recurrenceStream]]:
  * event count, EWMA value, Holt (level, trend), the bounded symbol
  * tail, and the latest folded event time (for the idle timeout).
  */
case class RecurrenceState(n: Long, ewma: Double, l: Double, b: Double,
                           tail: String, lastMs: Long)

/** One recurrence update (or final flush when `closed`): the same
  * columns the batch gates report — EWMA (events_ewma), Holt
  * level/trend/one-step forecast (events_holt_linear) — plus the
  * symbol tail the pattern matcher (events_pattern_match) scans.
  */
case class RecurrenceRow(userId: Long, nEvents: Long, ewma: Double,
                         level: Double, trend: Double, forecast1: Double,
                         tail: String, closed: Boolean)

/** A closed session emitted downstream. */
case class ClosedSession(userId: Long, startMs: Long, endMs: Long, nEvents: Long)

/** Per-user funnel-stage minima (epoch ms; MaxValue = stage unseen)
  * plus the max event time seen — the idle horizon must only ever
  * ADVANCE, so it lives in state, not in the micro-batch (a late
  * in-watermark batch would otherwise pull the timeout earlier and
  * close the user prematurely).
  */
case class FunnelState(tSignup: Long, tClick: Long, tPurchase: Long, lastMs: Long)

/** Streaming per-user funnel row; null stage = unseen. */
case class FunnelRow(userId: Long,
                     tSignup: Option[Long], tClick: Option[Long],
                     tPurchase: Option[Long], closed: Boolean)

/** KMV sketch state for one time bucket: the ≤k smallest DISTINCT
  * portable hashes (sorted ascending) — bounded at k longs whatever
  * the bucket's cardinality.
  */
case class KmvState(mins: Seq[Long])

/** One per-bucket KMV update: distinct-count estimate (exact while
  * the bucket still holds fewer than k distinct hashes — the state IS
  * the full set then), same formula and rounding as the batch
  * `Sketches.kmvDistinct`.
  */
case class KmvRow(bucketMs: Long, kmvEstimate: Double, closed: Boolean)

/** One group's current KMV sketch — the MERGEABLE unit theta-sketch
  * set algebra operates on (see `Sketches.overlapEstimate`).
  */
case class SketchRow(group: String, mins: Seq[Long])

/** Streaming analytics building blocks: watermarked windowed
  * aggregation and within-watermark dedup. Batch-equivalent semantics
  * are what the correctness gate checks (events_hourly); these wire
  * the same logic for readStream inputs.
  */
object StreamOps {

  /** Tumbling-window counts/sums per event type with a watermark
    * bounding state. The watermark delay controls how late events may
    * arrive before their window is finalized and state dropped —
    * without it, streaming window state grows unboundedly.
    */
  def hourlyCounts(events: DataFrame, tsCol: String = "ts",
                   watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("hour_ts"), col("event_type"), col("n"), col("sum_value"))

  /** Exactly-once-per-key within the watermark horizon — streaming
    * equivalent of batch dropDuplicates, with bounded state.
    */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, keys: Seq[String],
                           watermarkDelay: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Watermarked stream-stream inner join: match events from two
    * live streams on a key within a bounded event-time window (here:
    * right-side rows joining left-side rows at most `windowMinutes`
    * later). Both watermarks plus the time-range condition make the
    * join state PROVABLY bounded — Spark drops buffered rows once
    * the other side's watermark passes their match horizon. This is
    * the enrich-a-click-stream-with-impressions shape; without the
    * range condition the state would grow forever.
    */
  def joinWithinWindow(left: DataFrame, right: DataFrame, key: String,
                       windowMinutes: Int,
                       watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay)
      .select(col(key).as("k"), col("ts").as("l_ts"),
        struct(left.columns.map(col): _*).as("l"))
    val r = right.withWatermark("ts", watermarkDelay)
      .select(col(key).as("rk"), col("ts").as("r_ts"),
        struct(right.columns.map(col): _*).as("r"))
    l.join(r,
      col("k") === col("rk") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("k").as(key), col("l_ts"), col("r_ts"), col("l"), col("r"))
  }

  /** Streaming twin of the batch ordered-recurrence family
    * (events_ewma / events_holt_linear / events_pattern_match's
    * symbol sequence): per user, `mapGroupsWithState` keeps ONE
    * O(1) record — EWMA value, Holt (level, trend), the last
    * `tailMax` symbol chars — instead of the batch side's collected
    * history, and folds each micro-batch's rows in (ts, event_id)
    * order with the IDENTICAL dyadic constants (¾/¼ EWMA, ½ Holt),
    * so for in-order arrival the emitted values are bit-identical to
    * the batch fold before the shared 6 dp round. Emits an updated
    * row per active user per batch (Update mode); when a user sits
    * idle past `idleMinutes` of EVENT time the event-time timeout
    * emits a final `closed=true` row and drops the state — state is
    * bounded by the active-user set, not by history. Input needs
    * (user_id LONG, ts TIMESTAMP, event_id LONG, value DOUBLE,
    * event_type STRING). Like every streaming recurrence, cross-batch
    * ordering is arrival order: an event arriving after a
    * later-timestamped one folds late (the watermark bounds how far
    * such stragglers can lag before their user's state closes).
    * The batch-internal (ts, event_id) sort buffers one user's slice
    * of ONE micro-batch; `maxBatchEventsPerUser` bounds that buffer
    * and refuses LOUDLY past it (the batch side's
    * [[graft.functions.BoundedCollectList]] contract) instead of
    * letting a pathological hot key OOM the task.
    */
  def recurrenceStream(events: DataFrame, tailMax: Int = 64,
                       watermarkDelay: String = "30 minutes",
                       idleMinutes: Int = 60,
                       maxBatchEventsPerUser: Int = 1 << 20): Dataset[RecurrenceRow] = {
    val idleMs = idleMinutes * 60000L
    implicit val outEnc = Encoders.product[RecurrenceRow]
    implicit val stateEnc = Encoders.product[RecurrenceState]
    implicit val keyEnc = Encoders.scalaLong
    implicit val rowEnc = Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP,
      Encoders.scalaLong, Encoders.scalaDouble, Encoders.STRING)
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def report(userId: Long, st: RecurrenceState, closed: Boolean): RecurrenceRow =
      RecurrenceRow(userId, st.n, round6(st.ewma), round6(st.l), round6(st.b),
        round6(st.l + st.b), st.tail, closed)

    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("value").cast("double"),
        substring(col("event_type"), 1, 1))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp, Long, Double, String)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout())(
        (userId: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Double, String)],
         state: GroupState[RecurrenceState]) => {
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            report(userId, st, closed = true)
          } else {
            var st = state.getOption
              .getOrElse(RecurrenceState(0L, 0.0, 0.0, 0.0, "", Long.MinValue))
            // batch-internal sort restores (ts, event_id) order — the
            // same deterministic ordering the batch collect uses; the
            // buffer it implies is capped, loudly
            val buf = scala.collection.mutable.ArrayBuffer
              .empty[(Long, java.sql.Timestamp, Long, Double, String)]
            rows.foreach { r =>
              buf += r
              if (buf.length > maxBatchEventsPerUser)
                throw new IllegalStateException(
                  s"user $userId exceeds maxBatchEventsPerUser=" +
                    s"$maxBatchEventsPerUser events in one micro-batch; " +
                    "raise the cap or pre-aggregate the stream")
            }
            buf.sortBy(r => (r._2.getTime, r._3)).foreach { r =>
              val x = r._4
              val l2 = x * 0.5 + (st.l + st.b) * 0.5
              st = RecurrenceState(
                st.n + 1,
                st.ewma * 0.75 + x * 0.25,
                l2,
                (l2 - st.l) * 0.5 + st.b * 0.5,
                (st.tail + r._5).takeRight(tailMax),
                math.max(st.lastMs, r._2.getTime))
            }
            state.update(st)
            // clamp like sessionizeStream: the idle horizon of an
            // allowed-late batch can already be behind the watermark
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(math.max(st.lastMs + idleMs, wm + 1))
            report(userId, st, closed = false)
          }
        })
  }

  /** Streaming twin of the batch funnel (`events_funnel`): per user,
    * `mapGroupsWithState` keeps the FIRST timestamp of each funnel
    * stage — three longs of state vs the batch groupBy's full event
    * shuffle — and emits the updated stage minima per active user per
    * batch; the funnel rollup (users whose click follows signup, …)
    * is the same constant-size arithmetic downstream. min() is
    * order-independent, so unlike the recurrence twin this fold
    * equals the batch answer under ANY arrival order, in-order or
    * not. Event-time timeout emits a final `closed` row and drops
    * idle users' state. Input needs (user_id LONG, ts TIMESTAMP,
    * event_type STRING).
    */
  def funnelStream(events: DataFrame,
                   watermarkDelay: String = "30 minutes",
                   idleMinutes: Int = 60): Dataset[FunnelRow] = {
    val idleMs = idleMinutes * 60000L
    implicit val outEnc = Encoders.product[FunnelRow]
    implicit val stEnc = Encoders.product[FunnelState]
    implicit val keyEnc = Encoders.scalaLong
    implicit val rowEnc = Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP,
      Encoders.STRING)
    val U = Long.MaxValue
    def opt(v: Long): Option[Long] = if (v == U) None else Some(v)
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_type").cast("string"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout())(
        (userId: Long, rows: Iterator[(Long, java.sql.Timestamp, String)],
         state: GroupState[FunnelState]) => {
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            FunnelRow(userId, opt(st.tSignup), opt(st.tClick), opt(st.tPurchase),
              closed = true)
          } else {
            var st = state.getOption.getOrElse(FunnelState(U, U, U, Long.MinValue))
            rows.foreach { r =>
              val t = r._2.getTime
              if (t > st.lastMs) st = st.copy(lastMs = t)
              r._3 match {
                case "signup"   => if (t < st.tSignup) st = st.copy(tSignup = t)
                case "click"    => if (t < st.tClick) st = st.copy(tClick = t)
                case "purchase" => if (t < st.tPurchase) st = st.copy(tPurchase = t)
                case _          => ()
              }
            }
            state.update(st)
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(math.max(st.lastMs + idleMs, wm + 1))
            FunnelRow(userId, opt(st.tSignup), opt(st.tClick), opt(st.tPurchase),
              closed = false)
          }
        })
  }

  /** Streaming twin of the batch KMV distinct sketch
    * (`sketch_uniques_hourly` / `Sketches.kmvDistinct`): per time
    * bucket, `mapGroupsWithState` keeps the ≤k smallest DISTINCT
    * portable hashes — k longs of state whatever the bucket's
    * cardinality, the property that makes "uniques per window over an
    * unbounded stream" answerable at all. The k-min set of a union is
    * fold-order-free, so the streaming estimate equals the batch
    * estimate on the same events under ANY arrival order; hashes are
    * computed in the DataFrame with the SAME column expression the
    * batch sketch uses (`Sketches.portableHash`), not re-implemented
    * JVM-side. Event-time timeout emits a final `closed` row per
    * bucket once the watermark passes its idle horizon.
    * Input needs (user_id LONG, ts TIMESTAMP).
    */
  def kmvUniquesStream(events: DataFrame, k: Int = graft.ops.Sketches.DefaultK,
                       watermarkDelay: String = "30 minutes",
                       idleMinutes: Int = 120): Dataset[KmvRow] = {
    val idleMs = idleMinutes * 60000L
    implicit val outEnc = Encoders.product[KmvRow]
    implicit val stEnc = Encoders.product[KmvState]
    implicit val keyEnc = Encoders.scalaLong
    implicit val rowEnc = Encoders.tuple(Encoders.TIMESTAMP, Encoders.scalaLong,
      Encoders.TIMESTAMP)
    // watermark the RAW event time, not the truncated bucket — a
    // bucket-column watermark would treat a minutes-late event from
    // the previous hour as up-to-an-hour late and silently drop it,
    // breaking the batch-equality contract under mild disorder. The
    // watermarked ts column rides along: event-time timeout requires
    // it in the grouped input.
    events
      .select(col("ts").cast("timestamp").as("ts"),
        graft.ops.Sketches.portableHash(col("user_id").cast("string")).as("h"))
      .withWatermark("ts", watermarkDelay)
      .select(date_trunc("hour", col("ts")).as("bucket"), col("h"), col("ts"))
      .as[(java.sql.Timestamp, Long, java.sql.Timestamp)]
      .groupByKey(_._1.getTime)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout())(
        (bucketMs: Long, rows: Iterator[(java.sql.Timestamp, Long, java.sql.Timestamp)],
         state: GroupState[KmvState]) => {
          import graft.ops.Sketches.kmvEstimate
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            KmvRow(bucketMs, kmvEstimate(st.mins, k), closed = true)
          } else {
            val st = state.getOption.getOrElse(KmvState(Seq.empty))
            // merge: fold each hash into a k-capped ordered set — the
            // same result as the batch k-min over all hashes seen so
            // far, in O(k) memory even for a hot bucket's micro-batch
            val acc = scala.collection.mutable.TreeSet.empty[Long]
            acc ++= st.mins
            rows.foreach { r =>
              val h = r._2
              if (acc.size < k) acc += h
              else if (h < acc.last) { acc += h; if (acc.size > k) acc -= acc.last }
            }
            val merged = acc.toSeq
            state.update(KmvState(merged))
            // a bucket's events all share its truncated hour, so the
            // idle horizon is bucket start + idle — no per-event max
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(math.max(bucketMs + idleMs, wm + 1))
            KmvRow(bucketMs, kmvEstimate(merged, k), closed = false)
          }
        })
  }

  /** Streaming KMV sketch MAINTAINER per group (the mergeable half of
    * the theta-sketch family): folds each micro-batch's element
    * hashes into the group's ≤k smallest — O(k) state per group
    * forever, any batch split, any order — and emits the group's
    * current sketch each trigger (update mode). Downstream set
    * algebra (overlap/Jaccard across groups,
    * [[graft.ops.Sketches.overlapEstimate]]) runs on the emitted
    * sketches alone: the streaming corpus-overlap monitor costs k
    * longs per source, never a distinct-join. The fold is the same
    * k-min rule as the batch `kmvDistinct`/`kmvOverlap`, over the
    * same portable hash — batch equality is the spec's contract.
    * Input needs (group STRING-castable, elem STRING-castable).
    */
  def kmvSketchStream(elems: DataFrame,
                      k: Int = graft.ops.Sketches.DefaultK): Dataset[SketchRow] = {
    implicit val outEnc = Encoders.product[SketchRow]
    implicit val stEnc = Encoders.product[KmvState]
    implicit val keyEnc = Encoders.STRING
    implicit val rowEnc = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    elems
      .select(col("group").cast("string").as("g"),
        graft.ops.Sketches.portableHash(col("elem").cast("string")).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
        (g: String, rows: Iterator[(String, Long)], state: GroupState[KmvState]) => {
          val acc = scala.collection.mutable.TreeSet.empty[Long]
          acc ++= state.getOption.map(_.mins).getOrElse(Seq.empty)
          rows.foreach { r =>
            val h = r._2
            if (acc.size < k) acc += h
            else if (h < acc.last) { acc += h; if (acc.size > k) acc -= acc.last }
          }
          val merged = acc.toSeq
          state.update(KmvState(merged))
          SketchRow(g, merged)
        })
  }

  /** Gap-based sessionization with CUSTOM state
    * (`flatMapGroupsWithState`): per user, events extend the open
    * session while gaps stay under `gapMinutes`; a larger gap closes
    * and emits the session, and event-time timeout flushes open
    * sessions once the watermark passes their horizon. State is one
    * small record per active user — bounded by the watermark, not by
    * history. Input needs columns (user_id LONG, ts TIMESTAMP).
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int,
                       watermarkDelay: String = "30 minutes"): Dataset[ClosedSession] = {
    val gapMs = gapMinutes * 60000L
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val rowEnc = Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP)
    implicit val keyEnc = Encoders.scalaLong

    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (userId: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[OpenSession]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(s.userId, s.startMs, s.endMs, s.nEvents))
          } else {
            // Interval merge, not a left-to-right fold against endMs:
            // allowed-late events may precede the open session, and a
            // fold's `t - endMs <= gap` test (negative for early
            // events) would absorb arbitrarily-old events without
            // moving startMs. Treating the open session as one
            // interval among the batch's instants and merging in
            // sorted order reproduces batch sessionization: an early
            // event within gap of the session start EXTENDS the start;
            // one beyond it forms (and immediately closes) its own
            // earlier session.
            val ivs = (state.getOption.map(s => (s.startMs, s.endMs, s.nEvents)).toList
              ++ rows.map { r => val t = r._2.getTime; (t, t, 1L) })
              .sortBy(iv => (iv._1, iv._2))
            if (ivs.isEmpty) Iterator.empty
            else {
            val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
            ivs.foreach { iv =>
              if (merged.nonEmpty && iv._1 - merged.last._2 <= gapMs) {
                val last = merged.last
                merged(merged.size - 1) =
                  (last._1, math.max(last._2, iv._2), last._3 + iv._3)
              } else merged += iv
            }
            // all but the latest interval are closed by a gap; the
            // latest stays open awaiting more events or timeout
            val closed = merged.init.map(iv => ClosedSession(userId, iv._1, iv._2, iv._3))
            val s = OpenSession(userId, merged.last._1, merged.last._2, merged.last._3)
            state.update(s)
            // clamp: an allowed-late event can open a session whose
            // horizon is already behind the watermark, and
            // setTimeoutTimestamp rejects past timestamps
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(math.max(s.endMs + gapMs, wm + 1))
            closed.iterator
            }
          }
        })
  }
}
