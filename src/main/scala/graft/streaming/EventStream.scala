package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming twins of the batch event operators (SURVEY §2
  * block C / H): same semantics as [[graft.queries.Events]], expressed
  * over unbounded input with watermarks and stateful timeouts.
  *
  * Scale: state is keyed by user_id and bounded by the watermark — the
  * store grows with *active* users only, and partitions by the grouping
  * key across executors exactly like the batch shuffle.
  */
object EventStream {

  /** Typed event for the stateful path. `event_id` is the same-timestamp
    * tie-break the batch twin e2 orders by; sources without ids may
    * leave the default (ties then carry equal ts, where session
    * membership and the exact scaled-long sum are order-independent). */
  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double,
                event_id: Long = 0L)

  /** Open-session state carried between micro-batches. `sumE4` is the
    * value sum as a scaled long (×10⁴) — the same DECIMAL(18,4)
    * arithmetic the batch twin uses, so the two never diverge by
    * float-addition order across micro-batch boundaries. */
  case class SessionState(startUs: Long, lastUs: Long, n: Long, sumE4: Long)

  /** Double → exact ×10⁴ long, matching Spark's cast(value AS
    * DECIMAL(18,4)) (canonical double repr, HALF_UP at scale 4).
    * NaN/Infinity/out-of-range contribute 0 — the batch cast NULLs
    * them and decimal SUM skips nulls, so mixed sessions stay
    * identical; only an ALL-invalid session diverges (batch null vs
    * stream 0.0), which beats one malformed record killing the
    * whole StreamingQuery. */
  private def e4Of(v: Double): Long =
    // 1e14 = the DECIMAL(18,4) integer-digit bound (14 digits): the
    // batch cast NULLs |v| >= 1e14, so the stream must zero exactly
    // there too — the wider longValueExact bound (9e14) would let
    // [1e14, 9e14) values into sum_value that batch e1/e2 drop
    if (v.isNaN || v.isInfinite || math.abs(v) >= 1e14) 0L
    else java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .movePointRight(4).longValueExact()

  /** Current event-time watermark in ms, `Long.MinValue` before the
    * engine has computed one. The raw getter returns 0 then, which
    * would read as "watermark at the epoch" and prematurely ripen
    * pre-epoch state — every stateful operator below goes through
    * this ONE sentinel. */
  private def wmMs(state: GroupState[_]): Long =
    state.getCurrentWatermarkMs() match {
      case 0L => Long.MinValue
      case w  => w
    }

  /** Arm an event-time timeout safely: the engine requires a strictly
    * positive timestamp strictly beyond the current watermark —
    * pre-epoch event times (legal in this file, usOf is exact there)
    * would otherwise throw and kill the query. Clamping only EARLIES
    * the wake-up, never delays it. */
  private def armTimeout(state: GroupState[_], atMs: Long): Unit =
    state.setTimeoutTimestamp(
      math.max(atMs, math.max(1L, state.getCurrentWatermarkMs() + 1L)))

  /** Timestamp → epoch µs at FULL microsecond precision: getTime
    * carries only millis, the sub-millisecond part lives in getNanos.
    * The batch twins compare `unix_micros`, so truncating here would
    * fork the semantics. floorDiv, not `/`: getNanos is always in
    * [0, 1e9), so for pre-epoch timestamps a truncating divide would
    * pair a toward-zero second with a positive sub-second and land a
    * whole second high. Shared by every stateful operator below. */
  private def usOf(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** The batch family's exact money sum (cast to DECIMAL(18,4) BEFORE
    * summing, rounded back to a display double) — ONE definition for
    * the three windowed aggregations, mirroring Events.dec. */
  private def exactSumValue: org.apache.spark.sql.Column =
    round(sum(col("value").cast(org.apache.spark.sql.types.DataTypes
      .createDecimalType(18, 4))).cast("double"), 4).as("sum_value")

  /** Emitted (closed) session. */
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
                        n_events: Long, sum_value: Double)

  /** Session-conf knob the e39 watermark audit feeds: when set (by
    * [[planWatermark]] or an operator), the event aggregations whose
    * caller did not pick an explicit delay use it instead of the
    * built-in [[DefaultAggWatermark]]. This closes the audit→knob
    * loop: e39 computes the drop-rate decision table, this is the
    * `withWatermark` argument it exists to choose. */
  val WatermarkDelayKey = "spark.graft.watermarkDelay"

  /** The built-in delay of the e1/e24 streaming twins — the sentinel
    * [[resolvedWatermark]] replaces when [[WatermarkDelayKey]] is
    * configured. */
  val DefaultAggWatermark = "2 hours"

  /** e39 → the knob: runs the watermark-delay decision table over the
    * batch corpus at `dir`, picks the recommended delay (smallest
    * candidate whose measured drop rate meets `budgetE6`), writes it
    * to [[WatermarkDelayKey]] and returns it as a `withWatermark`
    * interval string. Fails loudly when NO candidate meets the budget
    * — silently picking the largest would under-deliver the budget the
    * caller asked for. */
  def planWatermark(spark: org.apache.spark.sql.SparkSession, dir: String,
                    budgetE6: Long = 10000L): String = {
    val rec = graft.queries.Events.e39WatermarkPlan(spark, dir, budgetE6)
      .filter(col("recommended") === 1L)
      .select(col("delay_s")).collect()
    require(rec.nonEmpty, s"no candidate watermark delay meets drop budget $budgetE6/1e6")
    val delay = s"${rec.head.getLong(0)} seconds"
    spark.conf.set(WatermarkDelayKey, delay)
    delay
  }

  /** Explicit argument beats the conf; the conf beats the built-in
    * default. `None` (the parameter default) is the only value that
    * defers — an explicit caller string ALWAYS wins, even one that
    * happens to equal [[DefaultAggWatermark]] (the old String-sentinel
    * design silently overrode exactly that caller). */
  private def resolvedWatermark(events: DataFrame, watermark: Option[String]): String =
    watermark.getOrElse(
      events.sparkSession.conf.getOption(WatermarkDelayKey)
        .filter(_.nonEmpty).getOrElse(DefaultAggWatermark))

  /** Streaming twin of e1: tumbling 1-hour counts per event type.
    * Works on any DataFrame with (ts: timestamp, event_type, value) —
    * batch or streaming — the plan is identical, which is the point.
    * The default (None) delay defers to [[WatermarkDelayKey]] when
    * set, then to [[DefaultAggWatermark]]. */
  def windowedAgg(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val in = if (events.isStreaming)
      events.withWatermark("ts", resolvedWatermark(events, watermark)) else events
    // decimal-exact sum, same as the batch twin e1 — identical results
    // under any partitioning / trigger pattern
    in.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), exactSumValue)
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Streaming twin of e24: HOPPING 1-hour windows every 15 minutes
    * per event type — [[windowedAgg]] with overlap (each event lands
    * in 4 windows). Same plan batch or streaming; under streaming a
    * window is emitted in append mode once the watermark passes its
    * end, state bounded to open windows × event types. */
  def hoppingAgg(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val in = if (events.isStreaming)
      events.withWatermark("ts", resolvedWatermark(events, watermark)) else events
    in.groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), exactSumValue)
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Streaming twin of e14: the NATIVE session_window aggregation —
    * the same declarative plan in batch and streaming, which is the
    * point (vs [[sessionize]], whose hand-rolled state exists for
    * custom semantics the built-in can't express). The engine merges
    * session windows inside the aggregation layer; under streaming a
    * session is emitted in append mode once the watermark passes its
    * close (start + gap past the last event), with state bounded the
    * same way. Output follows e14's convention: last_us = end − gap
    * (the last EVENT time, not the window close). */
  def sessionWindowAgg(events: DataFrame, gapMinutes: Int = 30,
                       watermark: String = "1 minute"): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val in = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    in.groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), exactSumValue)
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        (unix_micros(col("sw.end")) - gapUs).as("last_us"),
        col("n_events"), col("sum_value"))
  }

  /** All of a user's not-yet-sealed sessions, sorted by start. A
    * session stays here — even after a later event closes it on the
    * timeline — until the WATERMARK passes lastUs+gap, because until
    * then an admissible late event can still extend it or BRIDGE it
    * into a neighbor. State is bounded by (watermark delay / gap)
    * sessions per active key. */
  case class SessionsState(sessions: Seq[SessionState])

  /** Streaming twin of e2: gap-based sessionization via
    * flatMapGroupsWithState with event-time timeout. Sessions are
    * EMITTED ONLY WHEN SEALED — when the watermark passes lastUs+gap —
    * never merely because a later event arrived past the gap: an
    * in-watermark late event may still extend a timeline-closed
    * session or bridge two of them (emitting early would make the
    * output depend on micro-batch slicing and diverge from batch e2;
    * Spark's own session_window append mode holds output the same
    * way). Each invocation treats state sessions as pre-merged
    * intervals, folds the batch's events in as singletons, and
    * re-runs the sorted interval-gap merge — exactly the batch
    * definition of a session (connected components of the ≤gap chain),
    * so a replay and the live stream agree bit-for-bit. */
  def sessionize(events: Dataset[Ev], gapMinutes: Int = 30,
                 watermark: String = "1 minute"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    val fn: (Long, Iterator[Ev], GroupState[SessionsState]) => Iterator[SessionOut] =
      (userId, it, state) => {
        val existing = state.getOption.map(_.sessions.toList).getOrElse(Nil)
        // (ts, event_id) — the batch twin's exact ordering
        val incoming = it.toArray.sortBy(e => (usOf(e.ts), e.event_id))
          .map(e => { val ts = usOf(e.ts); SessionState(ts, ts, 1, e4Of(e.value)) })
        val merged = (existing ++ incoming).sortBy(s => (s.startUs, s.lastUs))
          .foldLeft(List.empty[SessionState]) {
            case (h :: t, s) if s.startUs - h.lastUs <= gapUs =>
              SessionState(h.startUs, math.max(h.lastUs, s.lastUs),
                h.n + s.n, h.sumE4 + s.sumE4) :: t
            case (acc, s) => s :: acc
          }.reverse
        // sealed = no admissible event (ts beyond the watermark) can
        // reach it anymore; wmMs is the pre-batch watermark, which only
        // DELAYS sealing — never emits something still reachable
        val wmUs = wmMs(state) match {
          case Long.MinValue => Long.MinValue
          case w             => w * 1000L
        }
        val (ripe, kept) = merged.partition(s =>
          wmUs != Long.MinValue && s.lastUs + gapUs <= wmUs)
        if (kept.isEmpty) state.remove()
        else {
          state.update(SessionsState(kept))
          // wake when the earliest kept session seals (ceil to ms)
          armTimeout(state,
            Math.floorDiv(kept.map(_.lastUs).min + gapUs + 999L, 1000L))
        }
        ripe.iterator.map(s => SessionOut(userId, s.startUs, s.lastUs, s.n,
          java.math.BigDecimal.valueOf(s.sumE4, 4).doubleValue))
      }

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Parquet-directory streaming source for the events schema — the
    * ingest path a production deployment tails (file source is
    * exactly-once, scales by adding files/partitions). Expects
    * standard micro/milli timestamp columns; for files carrying
    * TIMESTAMP(NANOS) (like this repo's generated testdata) set
    * `nanos = true` to read the raw longs and truncate to micros —
    * the streaming mirror of `Tables.events`' normalization. */
  def readEventStream(spark: SparkSession, dir: String, nanos: Boolean = false): DataFrame =
    if (nanos)
      spark.readStream
        .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
        .parquet(dir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else
      spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
        .parquet(dir)

  /** Typed event carrying the funnel stage. */
  case class FEv(user_id: Long, ts: java.sql.Timestamp, event_type: String)

  /** Funnel stage progress per user (µs epochs; -1 = not reached).
    * `done` keeps completed funnels parked (instead of removing state)
    * so a later view can't open a duplicate funnel for the user —
    * batch e3 reports exactly one funnel per user. */
  // Long.MinValue = stage not reached (a -1/"negative" sentinel would
  // collide with legitimate pre-epoch timestamps, which usOf keeps exact)
  case class FunnelState(viewUs: Long = Long.MinValue,
                         clickUs: Long = Long.MinValue, done: Boolean = false)

  /** One completed funnel stage. */
  case class StageOut(user_id: Long, stage: String, ts_us: Long)

  /** Streaming twin of e3: ordered funnel view → click → purchase with
    * FIRST-COMPLETION semantics — a stage is emitted the first time it
    * completes in order, and never retracted (Append mode can't
    * retract; the batch e3 computes exact minima over all data, so the
    * two agree whenever events arrive in order — the documented
    * divergence for late stage-1 events is inherent to streaming
    * funnels). State is dropped once the funnel completes; incomplete
    * funnels are evicted by the event-time timeout. */
  def funnelStream(events: Dataset[FEv], watermark: String = "1 minute",
                   idleTimeoutMinutes: Int = 120): Dataset[StageOut] = {
    import events.sparkSession.implicits._

    // same-timestamp ties processed in FUNNEL order (view before click
    // before purchase) — the batch twin's >= comparisons are inclusive,
    // so a click sharing the first view's timestamp must count
    val stageOrder = Map("view" -> 0, "click" -> 1, "purchase" -> 2).withDefaultValue(3)

    val fn: (Long, Iterator[FEv], GroupState[FunnelState]) => Iterator[StageOut] =
      (userId, it, state) => {
        if (state.hasTimedOut) {
          // idle PARTIAL funnels evict; a COMPLETED funnel is kept
          // forever and never re-armed — dropping it would let the
          // user's next view open a duplicate funnel, breaking the
          // one-funnel-per-user contract batch e3 guarantees. The
          // done state is 17 bytes: remembering completion is the
          // guarantee's inherent minimum state.
          if (!state.get.done) state.remove()
          Iterator.empty
        } else {
          var s = state.getOption.getOrElse(FunnelState())
          val out = List.newBuilder[StageOut]
          it.toArray.sortBy(e => (usOf(e.ts), stageOrder(e.event_type))).foreach { e =>
            val ts = usOf(e.ts)
            e.event_type match {
              case _ if s.done =>
              case "view" if s.viewUs == Long.MinValue =>
                s = s.copy(viewUs = ts); out += StageOut(userId, "view", ts)
              case "click" if s.clickUs == Long.MinValue &&
                  s.viewUs != Long.MinValue && ts >= s.viewUs =>
                s = s.copy(clickUs = ts); out += StageOut(userId, "click", ts)
              case "purchase" if s.clickUs != Long.MinValue && ts >= s.clickUs =>
                out += StageOut(userId, "purchase", ts); s = s.copy(done = true)
              case _ =>
            }
          }
          state.update(s)
          // idle eviction for partial funnels only; armTimeout clamps
          // past the watermark and 0 (a fresh key's batch of only
          // non-matching events would otherwise anchor below it)
          if (!s.done) {
            val anchorMs = math.max(
              math.max(s.viewUs, s.clickUs) / 1000L,
              state.getCurrentWatermarkMs())
            armTimeout(state, anchorMs + idleTimeoutMinutes * 60L * 1000L)
          }
          out.result().iterator
        }
      }

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Gap-fill input row (event_type keyed). */
  case class GEv(event_type: String, ts: java.sql.Timestamp, value: Double)

  /** Completed hour emitted by [[gapFillStream]] — including explicit
    * zero rows for silent hours. */
  case class GapOut(event_type: String, hour_us: Long, n_events: Long, sum_value: Double)

  /** Per-type gap-fill state: open hour buckets (hour µs → (count,
    * ×10⁴ sum)) + the next hour to emit + consecutive silent hours. */
  case class GapState(pending: Map[Long, (Long, Long)], nextHourUs: Long, silent: Int)

  /** Streaming twin of e10: per event type, the COMPLETE hourly
    * series — when the watermark passes the end of an hour, that
    * hour is emitted even if no event arrived in it (count 0).
    * Anchoring difference vs batch e10 (documented, not a bug — the
    * sesForecastStream convention): e10 zero-fills every type from
    * the GLOBAL min hour (it sees the whole corpus); the stream
    * cannot know the global min, so each type's series starts at its
    * own first event hour — a type that starts late emits no leading
    * zeros. A
    * plain streaming groupBy(window) can never emit the empty slots;
    * this is the stateful-timer shape that can: state per type holds
    * the open hour buckets, and each invocation (data or event-time
    * timeout) flushes every hour the watermark has completed,
    * zero-filling the holes in between.
    *
    * State is bounded two ways: the watermark caps how many hours
    * can be open (late data beyond it is dropped by the engine), and
    * `maxSilentHours` caps EVERY zero run — trailing silence drops
    * the state entirely (series ended; resumes fresh at the next
    * event), and a silence followed by more data (a real outage, or
    * one bad-clock event stamped years ahead) emits at most the cap
    * of zeros before the frontier jumps to the next data hour. Either
    * way a gap longer than the cap is NOT back-filled, and no single
    * invocation can flood the output. */
  private val HourUs = 3600L * 1000000L

  /** One shared gap-fill micro-batch step — ingest this batch's events
    * into the per-type hour buckets, then flush every hour the
    * watermark has completed, zero-filling holes. Returns the emitted
    * (hour_us, n, sumE4) rows in hour order plus the next state (None
    * = series ended, remove state). Factored out of [[gapFillStream]]
    * so the running-stats anomaly twin ([[anomalyStream]]) can NEVER
    * drift from its gap semantics.
    *
    * Ingest: the frontier initializes from the batch MINIMUM
    * (iterator order is arbitrary — seeding it from the first-seen
    * event would silently drop same-batch events in earlier hours).
    * Once initialized, rows below the frontier normally exist only
    * for already-emitted hours, which the engine's watermark filter
    * drops before they reach us. The one exception is a capped-gap
    * frontier JUMP (below): the jump target is the next hour with
    * data, which can sit ahead of the watermark, and until the
    * watermark catches up a genuinely non-late event in an hour
    * between the two is dropped HERE rather than by the lateness
    * filter. That window is at most the watermark delay and sits
    * inside a gap the cap has already declared not-back-fillable, so
    * the drop is accepted (documented no-back-fill policy).
    *
    * Flush: every zero RUN is capped at maxSilentHours, and the cap
    * must live inside the loop (a single watermark jump flushes the
    * whole backlog in one pass; a post-loop check would run after the
    * flood). A capped run with NO future data drops the state (series
    * ended; resumes fresh). A capped run WITH future data — one
    * bad-clock event would otherwise force zero-fill all the way to
    * it — jumps the frontier to the next hour that has data; the
    * remainder of that gap is deliberately not back-filled. */
  private def gapFillStep(evs: Array[GEv], st0: GapState, wmUs: Long,
                          maxSilentHours: Int): (List[(Long, Long, Long)], Option[GapState]) = {
    var st = st0
    if (st.nextHourUs == Long.MinValue && evs.nonEmpty)
      st = st.copy(nextHourUs = evs.map(e => usOf(e.ts) / HourUs * HourUs).min)
    evs.foreach { e =>
      val h = usOf(e.ts) / HourUs * HourUs
      if (h >= st.nextHourUs) {
        val (n, s) = st.pending.getOrElse(h, (0L, 0L))
        st = st.copy(pending = st.pending.updated(h, (n + 1, s + e4Of(e.value))))
      }
    }
    val out = List.newBuilder[(Long, Long, Long)]
    var capped = false
    while (!capped && st.nextHourUs != Long.MinValue &&
        wmUs != Long.MinValue && st.nextHourUs + HourUs <= wmUs) {
      val h = st.nextHourUs
      val (n, sumE4) = st.pending.getOrElse(h, (0L, 0L))
      val silent = if (n == 0) st.silent + 1 else 0
      if (silent > maxSilentHours) {
        if (st.pending.isEmpty) capped = true
        else st = GapState(st.pending, st.pending.keys.min, 0)
      } else {
        out += ((h, n, sumE4))
        st = GapState(st.pending - h, h + HourUs, silent)
      }
    }
    (out.result(), if (capped) None else Some(st))
  }

  def gapFillStream(events: Dataset[GEv], watermark: String = "1 minute",
                    maxSilentHours: Int = 48): Dataset[GapOut] = {
    import events.sparkSession.implicits._

    val fn: (String, Iterator[GEv], GroupState[GapState]) => Iterator[GapOut] =
      (eventType, it, state) => {
        val wmUs = wmMs(state) match {
          case Long.MinValue => Long.MinValue
          case w             => w * 1000L
        }
        val st0 = state.getOption.getOrElse(GapState(Map.empty, Long.MinValue, 0))
        val (hours, next) = gapFillStep(it.toArray, st0, wmUs, maxSilentHours)
        next match {
          case None => state.remove()
          case Some(st) =>
            state.update(st)
            // fire when the next open hour completes (guaranteed past
            // the current watermark by the flush loop's exit condition)
            if (st.nextHourUs != Long.MinValue)
              armTimeout(state, (st.nextHourUs + HourUs) / 1000L)
        }
        hours.iterator.map { case (h, n, sumE4) =>
          GapOut(eventType, h, n, java.math.BigDecimal.valueOf(sumE4, 4).doubleValue)
        }
      }

    events.withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Flagged hour emitted by [[anomalyStream]]: the gap-filled count
    * plus the prefix-stats anomaly verdict (n_prior = hours the stats
    * were computed over). */
  case class AnomOut(event_type: String, hour_us: Long, n_events: Long,
                     n_prior: Long, is_anomaly: Boolean)

  /** Per-type anomaly state: the gap-fill buckets + exact running
    * prefix stats over every emitted hour. `q` (Σx²) is carried as a
    * decimal string — an unbounded exact integer that still encodes
    * as flat state (Σx² overflows a long once hourly counts reach
    * ~3×10⁹ over enough hours; the audit must not silently wrap
    * there). `s` (Σx) stays a long: it is the type's total event
    * count, which a long fits by definition. */
  case class AnomState(gap: GapState, n: Long, s: Long, q: String)

  /** Streaming twin of e12: ONLINE hourly anomaly detection over the
    * gap-filled series. Each completed hour (including the explicit
    * zero hours — a silent hour IS the anomaly a plain streaming
    * groupBy(window) can never emit) is tested against the running
    * statistics of all PREVIOUSLY emitted hours of its type:
    *     (n·x − S)² > 4·(n·Q − S²)      (z = 2, population σ)
    * in exact BigInt arithmetic — the same cross-multiplied integer
    * z-test as batch e12, with one deliberate semantic difference:
    * e12 is the retrospective audit (global stats over the whole
    * series), this is the real-time detector (prefix stats — a
    * streaming operator cannot see the future). Hours with fewer than
    * 2 prior hours are never flagged (no variance to test against).
    *
    * Gap semantics are BY CONSTRUCTION identical to gapFillStream's
    * (shared [[gapFillStep]]); when a capped silence drops the series
    * the stats reset with it — detection resumes fresh, exactly like
    * the fill. One stateful operator, not a chain: Structured
    * Streaming does not support stacking flatMapGroupsWithState, so
    * the fill and the stats advance in the same state update. */
  def anomalyStream(events: Dataset[GEv], watermark: String = "1 minute",
                    maxSilentHours: Int = 48): Dataset[AnomOut] = {
    import events.sparkSession.implicits._

    val fn: (String, Iterator[GEv], GroupState[AnomState]) => Iterator[AnomOut] =
      (eventType, it, state) => {
        val wmUs = wmMs(state) match {
          case Long.MinValue => Long.MinValue
          case w             => w * 1000L
        }
        val st0 = state.getOption.getOrElse(
          AnomState(GapState(Map.empty, Long.MinValue, 0), 0L, 0L, "0"))
        val (hours, gapNext) = gapFillStep(it.toArray, st0.gap, wmUs, maxSilentHours)
        var n = st0.n
        var s = BigInt(st0.s)
        var q = BigInt(st0.q)
        val out = hours.map { case (h, x, _) =>
          val dev = BigInt(n) * x - s
          val flag = n >= 2 && dev * dev > 4 * (BigInt(n) * q - s * s)
          val res = AnomOut(eventType, h, x, n, flag)
          n += 1; s += x; q += BigInt(x) * x
          res
        }
        gapNext match {
          case None => state.remove() // series ended — stats reset with it
          case Some(g) =>
            state.update(AnomState(g, n, s.toLong, q.toString))
            if (g.nextHourUs != Long.MinValue)
              armTimeout(state, (g.nextHourUs + HourUs) / 1000L)
        }
        out.iterator
      }

    events.withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Closed burst run emitted by [[burstStream]] (e38's unit). */
  case class BurstOut(event_type: String, run_start_us: Long, run_end_us: Long,
                      n_hours: Long, peak: Long, total: Long)

  /** Per-type burst state: the gap-fill buckets + the trailing window
    * of the last ≤24 emitted hourly counts (oldest first) + the open
    * run (runStartUs = Long.MinValue when none). Bounded by
    * construction: 24 longs + 4 run fields per type. */
  case class BurstState(gap: GapState, window: List[Long], runStartUs: Long,
                        runEndUs: Long, peak: Long, total: Long)

  /** Streaming twin of e38: ONLINE sustained-burst monitoring over the
    * gap-filled hourly series. Each completed hour (zeros included —
    * a silent hour must BREAK a run and depress the trailing mean,
    * which a plain streaming groupBy(window) cannot express) is
    * tested against the trailing ≤24 emitted hours of its type:
    *     x · pn · 100 > factorE2 · Σprev   (pn ≥ minPrev)
    * — exactly batch e38's cross-multiplied integer test (batch's
    * ROWS BETWEEN -24 AND -1 over the complete grid IS this window,
    * because the gap-filled grid has one row per hour). Consecutive
    * flagged hours accumulate into an open run (start/end/peak/
    * volume); the first non-flagged hour CLOSES the run and emits it
    * — so a run is published one hour after it ends, the earliest a
    * correct episode boundary can be known. A capped-silence series
    * drop closes and emits any open run (the series ended; the
    * episode is over by definition).
    *
    * Gap semantics shared with [[gapFillStream]] (same
    * [[gapFillStep]]); fill, trailing test and run accounting advance
    * in ONE state update (stacked flatMapGroupsWithState is
    * unsupported). State is bounded: gap buckets + 24 counts + one
    * open run per type. */
  def burstStream(events: Dataset[GEv], watermark: String = "1 minute",
                  maxSilentHours: Int = 48, factorE2: Long = 150L,
                  minPrev: Int = 6): Dataset[BurstOut] = {
    import events.sparkSession.implicits._

    val fn: (String, Iterator[GEv], GroupState[BurstState]) => Iterator[BurstOut] =
      (eventType, it, state) => {
        val wmUs = wmMs(state) match {
          case Long.MinValue => Long.MinValue
          case w             => w * 1000L
        }
        val st0 = state.getOption.getOrElse(BurstState(
          GapState(Map.empty, Long.MinValue, 0), Nil, Long.MinValue, 0L, 0L, 0L))
        val (hours, gapNext) = gapFillStep(it.toArray, st0.gap, wmUs, maxSilentHours)
        var window = st0.window
        var (rs, re, pk, tot) = (st0.runStartUs, st0.runEndUs, st0.peak, st0.total)
        val out = List.newBuilder[BurstOut]
        def close(): Unit = if (rs != Long.MinValue) {
          out += BurstOut(eventType, rs, re, (re - rs) / HourUs + 1, pk, tot)
          rs = Long.MinValue; re = 0L; pk = 0L; tot = 0L
        }
        hours.foreach { case (h, x, _) =>
          val pn = window.length.toLong
          val flagged = pn >= minPrev && x * pn * 100L > factorE2 * window.sum
          if (flagged) {
            if (rs == Long.MinValue) rs = h
            re = h; pk = math.max(pk, x); tot += x
          } else close()
          window = (window :+ x).takeRight(24)
        }
        gapNext match {
          case None => close(); state.remove() // series ended — episode over
          case Some(g) =>
            state.update(BurstState(g, window, rs, re, pk, tot))
            if (g.nextHourUs != Long.MinValue)
              armTimeout(state, (g.nextHourUs + HourUs) / 1000L)
        }
        out.result().iterator
      }

    events.withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Count–min-sketch counter grid — ONE plan for batch and stream
    * (the windowedAgg principle): per event, d (row, slot) pairs
    * explode and aggregate to the d×w grid. On a stream this is a
    * plain streaming aggregation whose ENTIRE state is the grid —
    * ≤ d·w rows forever, the sketch's fixed-size guarantee expressed
    * as the state bound (no watermark needed: the state can't grow).
    * The batch twin e13 builds its grid through this same function,
    * so stream and batch grids are bit-identical on the same data.
    * Hashes are [[graft.functions.DetHash]] md5 — deterministic
    * across engines, runs, and replays. */
  def cmsGrid(events: DataFrame, w: Int = 64, d: Int = 4): DataFrame = {
    val slots = (0 until d).map { i =>
      struct(lit(i).as("i"),
        (graft.functions.DetHash.md5Long60Col(
          concat(lit(s"cms:$i:"), col("user_id").cast("string"))) % w).as("j"))
    }
    events.select(explode(array(slots: _*)).as("s"))
      .select(col("s.i").as("i"), col("s.j").as("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
  }

  /** Per-hour distinct-user KMV sketch on a stream — the
    * [[graft.functions.KmvMinsAgg]] native aggregate running as
    * streaming state: each open hour window holds ≤ k longs, the
    * bounded-buffer property doing double duty as the streaming
    * state bound (the cardinality dashboards HLL usually serves,
    * but deterministic and replay-stable). Works identically on a
    * batch frame — the parity spec pins it. */
  def kmvDistinctStream(events: DataFrame, k: Int = 64,
                        watermark: Option[String] = None): DataFrame = {
    val in = if (events.isStreaming)
      events.withWatermark("ts", resolvedWatermark(events, watermark)) else events
    in.select(window(col("ts"), "1 hour").as("w"),
        graft.functions.DetHash.md5Long60Col(col("user_id").cast("string")).as("h"))
      .groupBy(col("w"))
      .agg(graft.functions.SketchFunctions.kmvMins(col("h"), k).as("mins"))
      .select(col("w.start").as("hour"), size(col("mins")).as("n_distinct_capped"),
        col("mins"))
  }

  /** Streaming exact dedup — at-least-once sources (Kafka replays,
    * file re-lists) deduped to exactly-once semantics on an id column.
    * `dropDuplicatesWithinWatermark` bounds the dedup state by event
    * time: state for ids older than the watermark is evicted, so the
    * store can't grow without bound (plain dropDuplicates on a stream
    * would). The d-block twin is d1/d6; this is their unbounded form. */
  def dedupStream(events: DataFrame, idCols: Seq[String],
                  watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Stream-stream interval join — the unbounded twin of the e6/e7
    * temporal correlation: every right event within `[left.ts,
    * left.ts + window]` of a same-key left event. Watermarks on BOTH
    * sides + the time-bound join condition let Spark evict join state
    * (an unbounded stream-stream join without them grows state
    * forever and is rejected in append mode). Works on batch frames
    * too — identical plan semantics, which the spec exploits. */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
                         windowMinutes: Int, watermark: String = "1 hour"): DataFrame = {
    val l = (if (left.isStreaming) left.withWatermark("ts", watermark) else left).alias("l")
    val r = (if (right.isStreaming) right.withWatermark("ts", watermark) else right).alias("r")
    l.join(r,
      expr(s"l.$key = r.$key AND r.ts >= l.ts AND r.ts <= l.ts + interval $windowMinutes minutes"))
  }

  /** Tagged union row for [[asofJoinStream]]: side "L" = the probing
    * stream (e6's purchases), "R" = the reference stream (clicks). */
  case class AsofIn(key: Long, ts: java.sql.Timestamp, id: Long, side: String)

  /** One as-of match: the left row plus the latest right row at or
    * before it (None when no right row precedes it — e6's LEFT join). */
  case class AsofOut(key: Long, left_id: Long, left_us: Long,
                     asof_right_id: Option[Long], right_us: Option[Long])

  /** Per-key as-of state. The crucial bound: right rows at or below
    * the watermark are COMPACTED to the single best (latest ts, then
    * highest id) — any future left row's timestamp is above the
    * watermark, so every older right row is dominated by that best and
    * can never win again. State is therefore O(1) per key plus only
    * the in-flight rows inside the watermark window. */
  case class AsofState(bestUs: Long, bestId: Long, hasBest: Boolean,
                       rights: List[(Long, Long)], lefts: List[(Long, Long)])

  /** Stream-stream AS-OF join — the unbounded twin of e6
    * ([[graft.operators.AsOf.asofJoin]]): every left event paired with
    * the latest right event at or before it, per key.
    *
    * Spark has interval stream-stream joins but no as-of (an as-of
    * needs unbounded lookback, which the join-state eviction model
    * can't express), so this is `flatMapGroupsWithState` over the
    * tagged union of both streams: a left row emits exactly when the
    * watermark passes its timestamp (all eligible right rows have then
    * arrived — later ones are above it, earlier ones are either
    * buffered or compacted into the carried best). Ties break to the
    * highest right id at equal ts, matching the batch operator's
    * `rightTieBreak` on e6's per-(user, ts) max-id dedup — so raw
    * (undeduped) right streams produce identical matches. Emission is
    * ts-then-id ordered within a flush for determinism; output is
    * append-mode, each left row exactly once (StreamingSpec pins
    * batch parity on real sf data plus the no-premature-emit and
    * late-row regressions).
    *
    * Both inputs need (key: long, ts: timestamp, id: long) columns.
    * At scale this partitions by key like every stateful operator
    * here; per-key state is one compacted best + the watermark-window
    * buffer, evicted by the same event-time timeout that flushes
    * quiet keys when OTHER keys advance the watermark. */
  def asofJoinStream(left: DataFrame, right: DataFrame,
                     watermark: String = "1 hour"): Dataset[AsofOut] = {
    import left.sparkSession.implicits._
    val tagged = left.select(col("key"), col("ts"), col("id"), lit("L").as("side"))
      .unionByName(right.select(col("key"), col("ts"), col("id"), lit("R").as("side")))
      .as[AsofIn]

    val fn: (Long, Iterator[AsofIn], GroupState[AsofState]) => Iterator[AsofOut] =
      (key, it, state) => {
        // 0 is the engine's "no watermark yet" sentinel — treat it as
        // -infinity, or pre-epoch left rows (lus < 0) would count as
        // ripe on arrival and flush before their rights can arrive
        val wmUs = state.getCurrentWatermarkMs() match {
          case 0L => Long.MinValue
          case ms => ms * 1000L
        }
        var st = state.getOption.getOrElse(AsofState(0L, 0L, false, Nil, Nil))
        val evs = it.toArray
        val rights = st.rights ++ evs.filter(_.side == "R").map(e => (usOf(e.ts), e.id))
        val lefts = st.lefts ++ evs.filter(_.side == "L").map(e => (usOf(e.ts), e.id))
        def better(a: (Long, Long), b: (Long, Long)): Boolean =
          b._1 > a._1 || (b._1 == a._1 && b._2 > a._2)
        // flush every left row the watermark has passed, in (ts, id)
        // order; candidates are the carried best (ts ≤ previous
        // watermark ≤ this row's ts — still eligible) + buffered
        // rights at or before the row
        val (ripe, pendingLefts) = lefts.partition(_._1 <= wmUs)
        val out = ripe.sortBy(identity).map { case (lus, lid) =>
          val carried = if (st.hasBest) List((st.bestUs, st.bestId)) else Nil
          val m = (carried ++ rights.filter(_._1 <= lus))
            .reduceOption((a, b) => if (better(a, b)) b else a)
          AsofOut(key, lid, lus, m.map(_._2), m.map(_._1))
        }
        // compact rights the watermark has passed into the best
        val (oldRights, keepRights) = rights.partition(_._1 <= wmUs)
        oldRights.foreach { c =>
          if (!st.hasBest || better((st.bestUs, st.bestId), c))
            st = st.copy(bestUs = c._1, bestId = c._2, hasBest = true)
        }
        st = st.copy(rights = keepRights, lefts = pendingLefts)
        state.update(st)
        // wake when the watermark passes the oldest pending left (so
        // quiet keys still flush) OR the newest buffered right (so a
        // key that then goes silent still compacts its rights list to
        // the O(1) best instead of holding a window's worth forever);
        // armTimeout clamps past the watermark and 0 — a pre-epoch
        // timestamp would otherwise throw and kill the query
        val wake = (pendingLefts.map(_._1 / 1000L + 1) ++
          (if (keepRights.nonEmpty) Seq(keepRights.map(_._1).max / 1000L + 1) else Nil))
        if (wake.nonEmpty) armTimeout(state, wake.min)
        out.iterator
      }

    tagged.withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  case class TEv(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                 event_type: String)

  case class TransOut(user_id: Long, from_type: String, to_type: String,
                      from_us: Long)

  /** Per-user state: events not yet ripe (watermark hasn't passed)
    * plus the last FLUSHED event — the bridge that pairs with the
    * next flush's first event. */
  case class TransState(pending: List[(Long, Long, String)],
                        bridge: Option[(Long, Long, String)])

  /** e15's streaming twin — ONLINE sequence featurization: the
    * (from → to) transition stream a live behavior model consumes
    * (counts-by-pair downstream reproduce e15's matrix, parity
    * spec-pinned). `lead` doesn't exist on a stream, and a naive
    * pair-on-arrival would mis-order late events; instead each user
    * buffers events until the watermark passes them, then flushes in
    * (ts, event_id) order, pairing consecutively — the last flushed
    * event is kept as the bridge to the next flush, so transitions
    * are emitted exactly once each, in order, despite out-of-order
    * arrival.
    *
    * State per user = the ≤watermark-window pending buffer + ONE
    * bridge tuple — bounded by event-time eviction like every
    * stateful operator here; a quiet user's buffer is flushed by the
    * event-time timeout when other keys advance the watermark. */
  def transitionStream(events: Dataset[TEv], watermark: String = "1 minute")
  : Dataset[TransOut] = {
    import events.sparkSession.implicits._
    val fn: (Long, Iterator[TEv], GroupState[TransState]) => Iterator[TransOut] =
      (user, it, state) => {
        val wmUs = state.getCurrentWatermarkMs() match {
          case 0L => Long.MinValue // engine's "no watermark yet" sentinel
          case ms => ms * 1000L
        }
        val st = state.getOption.getOrElse(TransState(Nil, None))
        val all = st.pending ++
          it.map(e => (usOf(e.ts), e.event_id, e.event_type))
        val (ripe, pending) = all.partition(_._1 <= wmUs)
        val flushed = ripe.sortBy(e => (e._1, e._2))
        val chain = st.bridge.toList ++ flushed
        val out = chain.zip(chain.drop(1)).map { case (a, b) =>
          TransOut(user, a._3, b._3, a._1)
        }
        state.update(TransState(pending, chain.lastOption))
        if (pending.nonEmpty)
          armTimeout(state, pending.map(_._1).min / 1000L + 1)
        out.iterator
      }
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  case class TriOut(user_id: Long, t1: String, t2: String, t3: String,
                    start_us: Long)

  /** Per-user state for [[trigramStream]]: the pending buffer plus the
    * last TWO flushed events — the window context a 3-gram needs
    * across flush boundaries (order-k sequence mining keeps k-1
    * bridge events; transitionStream is the k=2 case). */
  case class Tri3State(pending: List[(Long, Long, String)],
                       bridge: List[(Long, Long, String)])

  /** e19's streaming twin — ONLINE 3-step path featurization: emits
    * every consecutive event-type trigram per user exactly once, in
    * (ts, event_id) order, despite out-of-order arrival (counts-by-
    * path downstream reproduce e19's table before its top-k, parity
    * spec-pinned). Same flush discipline as [[transitionStream]]:
    * buffer until the watermark passes, flush sorted, slide a
    * 3-window over bridge++flushed — a window needs ≥1 flushed event
    * (the 2-event bridge alone can't form one), so nothing re-emits.
    *
    * State per user = the watermark-bounded pending buffer + TWO
    * bridge tuples; event-time timeout flushes quiet users. */
  def trigramStream(events: Dataset[TEv], watermark: String = "1 minute")
  : Dataset[TriOut] = {
    import events.sparkSession.implicits._
    val fn: (Long, Iterator[TEv], GroupState[Tri3State]) => Iterator[TriOut] =
      (user, it, state) => {
        val wmUs = state.getCurrentWatermarkMs() match {
          case 0L => Long.MinValue
          case ms => ms * 1000L
        }
        val st = state.getOption.getOrElse(Tri3State(Nil, Nil))
        val all = st.pending ++
          it.map(e => (usOf(e.ts), e.event_id, e.event_type))
        val (ripe, pending) = all.partition(_._1 <= wmUs)
        val flushed = ripe.sortBy(e => (e._1, e._2))
        val chain = st.bridge ++ flushed
        val out =
          if (flushed.isEmpty) Nil
          else chain.sliding(3).filter(_.lengthCompare(3) == 0)
            .map(w => TriOut(user, w(0)._3, w(1)._3, w(2)._3, w(0)._1))
            .toList
        state.update(Tri3State(pending.toList, chain.takeRight(2).toList))
        if (pending.nonEmpty)
          armTimeout(state, pending.map(_._1).min / 1000L + 1)
        out.iterator
      }
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  case class DisOut(user_id: Long, n_events: Long, n_late: Long,
                    max_disorder_us: Long)

  /** Per-user state for [[disorderStream]]: O(1) — the running max
    * event time plus three counters. */
  case class DisState(prevMax: Long, n: Long, late: Long, maxD: Long)

  /** e20's streaming twin — the ONLINE watermark-health monitor: per
    * user, running counts of late-arriving events (event time older
    * than one already seen) and the worst disorder, updated every
    * micro-batch. This is the operational signal for re-validating a
    * deployed `withWatermark` delay: once max_disorder_us grows past
    * the configured delay, the pipeline is silently dropping events.
    * Unlike the buffering twins there is NO watermark and no pending
    * buffer — arrival order IS the measured subject. Events consume
    * in the planted arrival order (e20's md5 ingest-delay model,
    * recomputed per event via the shared DetHash; a real deployment
    * drops the jitter and trusts its ingest order), sorted within
    * each micro-batch and chained across batches by the O(1)
    * running-max state. Emits one snapshot per user per batch; the
    * last snapshot equals e20's batch row when batch boundaries
    * respect arrival order (parity spec-pinned). State is O(1) per
    * user and — deliberately — never evicted: the monitor's value is
    * the all-time worst disorder; a deployment that must bound the
    * key space adds a ProcessingTimeTimeout that flushes retired
    * users' final snapshots. */
  def disorderStream(events: Dataset[TEv]): Dataset[DisOut] = {
    import events.sparkSession.implicits._
    val fn: (Long, Iterator[TEv], GroupState[DisState]) => Iterator[DisOut] =
      (user, it, state) => {
        val st = state.getOption.getOrElse(DisState(Long.MinValue, 0L, 0L, 0L))
        var pm = st.prevMax; var n = st.n; var late = st.late; var maxD = st.maxD
        val evs = it.toList.map { e =>
          val ts = usOf(e.ts)
          (ts + graft.functions.DetHash.md5Long60(e.event_id.toString) % 21600000000L,
            e.event_id, ts)
        }.sortBy(x => (x._1, x._2))
        evs.foreach { case (_, _, ts) =>
          n += 1
          if (pm != Long.MinValue && ts < pm) { late += 1; maxD = math.max(maxD, pm - ts) }
          pm = math.max(pm, ts)
        }
        state.update(DisState(pm, n, late, maxD))
        if (evs.isEmpty) Iterator.empty
        else Iterator.single(DisOut(user, n, late, maxD))
      }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming→merge bridge: every micro-batch is upserted into a
    * parquet target with keep-latest semantics (the reference's
    * `ON DUPLICATE KEY UPDATE` loop, reference person-users.js:307,
    * applied continuously). foreachBatch gives the batch DataFrame to
    * the SAME MergeOps.upsertLatest used by m8 — one code path for
    * batch and streaming merges. Idempotent per micro-batch (the
    * checkpoint replays a batch into the same keyed snapshot).
    *
    * Crash-safety: staging is renamed in with the previous snapshot
    * parked at `__prev` FIRST, so no moment exists where all copies
    * are gone; if the target is missing on recovery, `__prev` is
    * read. Renames are checked. Note each batch rewrites the full
    * snapshot — fine for dimension-sized targets (the reference's
    * metadata tables); for fact-sized targets partition the snapshot
    * and rewrite only touched buckets, or use a merge-capable format.
    */
  def upsertSink(events: DataFrame, targetPath: String, checkpoint: String,
                 keyCols: Seq[String], versionCol: String, tieBreak: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val existing = graft.sources.AtomicSnapshot
          .readCurrent(spark, targetPath).getOrElse(batch.limit(0))
        val merged = graft.merge.MergeOps.upsertLatest(
          existing.unionByName(batch), keyCols, versionCol, tieBreak)
        graft.sources.AtomicSnapshot.publish(merged, targetPath)
        ()
      }
      .start()

  /** Streaming CDC APPLY — [[upsertSink]]'s missing half: a change
    * stream carrying DELETES (op column, tombstone rows) continuously
    * materialized onto the parquet snapshot via the SAME
    * [[graft.merge.MergeOps.cdcApply]] as batch m29 — one code path,
    * and the one thing a keep-latest sink can never do (a deleted
    * key must LEAVE the snapshot, not keep its last version).
    *
    * Replay-idempotent without a sink log, by cdcApply's own
    * semantics: re-applying a committed batch upserts identical
    * values, and a replayed tombstone meets a snapshot that no longer
    * holds the key — the dropped unseen-key case — so the snapshot
    * converges (spec-pinned with a stale-checkpoint replay). The
    * snapshot publish is [[graft.sources.AtomicSnapshot]], same
    * crash-safety notes as upsertSink. The `outcome` audit column is
    * not persisted — the snapshot holds live rows only. */
  def cdcSink(changes: DataFrame, targetPath: String, checkpoint: String,
              keyCols: Seq[String], seqCols: Seq[String], opCol: String,
              deleteOp: String = "d")
  : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val snapCols = batch.columns.filterNot(seqCols.contains)
          .filterNot(_ == opCol).toSeq
        val base = graft.sources.AtomicSnapshot
          .readCurrent(spark, targetPath)
          .getOrElse(batch.select(snapCols.map(org.apache.spark.sql.functions.col): _*)
            .limit(0))
        val next = graft.merge.MergeOps
          .cdcApply(base, batch, keyCols, seqCols, opCol, deleteOp)
          .filter(org.apache.spark.sql.functions.col("outcome") =!= "deleted")
          .drop("outcome")
        graft.sources.AtomicSnapshot.publish(next, targetPath)
        ()
      }
      .start()

  /** Streaming merge into a LIVE JDBC DESTINATION — the reference's
    * actual deployment target (it merges into a running MySQL;
    * [[upsertSink]] publishes parquet snapshots instead). Each
    * micro-batch runs [[graft.sources.JdbcUpsert]]: keep-latest
    * collapse, then per-partition transactional probe/update/insert
    * batches against the destination table (keys = its primary key).
    * Restart contract: the upsert only replaces on newer-or-equal
    * (version, tieBreak), so a replayed micro-batch after a crash
    * re-writes identical values and the table CONVERGES to the batch
    * answer — idempotence stands in for a transactional sink log
    * exactly as in upsertSink's snapshot path (kill/replay
    * spec-pinned on live Derby in StreamingSpec). */
  def jdbcUpsertSink(events: DataFrame, url: String, table: String,
                     checkpoint: String, keyCols: Seq[String],
                     versionCol: String, tieBreak: String,
                     batchSize: Int = 500)
  : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.JdbcUpsert.upsert(
          batch, url, table, keyCols, versionCol, tieBreak, batchSize)
        ()
      }
      .start()

  /** Typed event for the per-type daily forecast path. */
  case class FcEv(event_type: String, ts: java.sql.Timestamp)

  /** Forecast state: `nextDay` = the oldest UNCLOSED epoch-day,
    * `window` = the trailing ≤32 CLOSED daily counts oldest→newest,
    * `open` = counts for days the watermark hasn't passed yet. The
    * open map is bounded by the watermark lag in days; the window by
    * the 32-day cap — total state per event type is a few hundred
    * bytes regardless of stream length. */
  case class SesState(nextDay: Long, window: Seq[Long], open: Map[Long, Long])

  /** One closed day's emission: the exact SES forecast as of `day`. */
  case class SesOut(event_type: String, day: Long, n_days: Int, x: Long,
                    ses_e6: Long)

  /** e31's ONLINE twin: per event type, an exact α=½ SES forecast
    * emitted as each epoch-day CLOSES (watermark passes its end), over
    * the same trailing ≤32-day zero-filled window and the same
    * closed-form integer arithmetic — 2^(n−1)·s_n = x₁ + Σ 2^(t−2)·xₜ
    * via BigInt, so a batch replay and the live stream emit
    * bit-identical forecasts (float EWMA state would drift with
    * micro-batch boundaries). Silent days zero-fill exactly like the
    * batch spine; a silent stretch LONGER than the window resets the
    * state and resumes fresh at the next active day (gapFillStream's
    * cap convention — one far-future event cannot zero-flood, and an
    * all-zero window forecasts 0 anyway).
    *
    * Anchoring difference vs batch e31 (documented, not a bug): the
    * batch operator anchors every type's window at the GLOBAL day
    * range (it can see the whole corpus); the stream cannot know the
    * global min, so each type's spine starts at its own first event
    * day. On data where every type is active from day one — and on
    * every closed day thereafter — the final emissions coincide with
    * the batch answer exactly (the parity spec pins this). */
  def sesForecastStream(events: Dataset[FcEv], watermark: String = "1 day",
                        maxWindow: Int = 32): Dataset[SesOut] = {
    import events.sparkSession.implicits._
    val dayUs = 86400000000L
    val dayMs = 86400000L
    def sesE6(window: Seq[Long]): Long = {
      val p = window.zipWithIndex.map { case (x, i) =>
        if (i == 0) BigInt(x) else BigInt(x) << (i - 1)
      }.sum
      val den = BigInt(1) << (window.length - 1)
      ((2 * (p * 1000000) + den) / (2 * den)).toLong
    }
    val fn: (String, Iterator[FcEv], GroupState[SesState]) => Iterator[SesOut] =
      (etype, it, state) => {
        val st = state.getOption.getOrElse(SesState(-1L, Vector.empty, Map.empty))
        var open = st.open
        it.foreach { e =>
          val d = usOf(e.ts) / dayUs
          // no back-fill past the frontier (gapFillStep's guard): a
          // straggler for an already-closed/skipped day would sit in
          // `open` forever (emission removes exactly nextDay) and,
          // after a cap reset, re-seed the series BEHIND days already
          // emitted — out-of-order duplicate-era rows
          if (st.nextDay < 0L || d >= st.nextDay)
            open = open.updated(d, open.getOrElse(d, 0L) + 1L)
        }
        var nextDay =
          if (st.nextDay >= 0L) st.nextDay
          else if (open.nonEmpty) open.keys.min
          else -1L
        var window = st.window
        val out = Vector.newBuilder[SesOut]
        if (nextDay >= 0L) {
          val wmMs = state.getCurrentWatermarkMs()
          while (nextDay >= 0L && (nextDay + 1L) * dayMs <= wmMs) {
            // cap: a silent stretch longer than the window resets the
            // state — skip straight to the next active day instead of
            // emitting maxWindow zero rows per silent month
            val activeAhead = open.keys.filter(_ >= nextDay)
            if (open.getOrElse(nextDay, 0L) == 0L && window.forall(_ == 0L) &&
                (activeAhead.isEmpty || activeAhead.min - nextDay > maxWindow)) {
              window = Vector.empty
              nextDay = if (activeAhead.isEmpty) -1L else activeAhead.min
            } else {
              val x = open.getOrElse(nextDay, 0L)
              open = open.removed(nextDay)
              window = (window :+ x).takeRight(maxWindow)
              out += SesOut(etype, nextDay, window.length, x, sesE6(window))
              nextDay += 1L
            }
          }
        }
        state.update(SesState(nextDay, window, open))
        if (nextDay >= 0L) armTimeout(state, (nextDay + 1L) * dayMs)
        out.result().iterator
      }
    events.withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
