package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** True Structured-Streaming surface (SURVEY §2.8): the batch surrogates in
  * graft.ops.Streaming carry the oracle checks; these operators carry the
  * semantics a batch oracle cannot express — watermarks, late-data drops,
  * exactly-once dedup under re-delivery, and custom keyed state. Exercised
  * end-to-end with MemoryStream in StreamingSuite.
  *
  * 100-TB note: every operator here keys its state by (window × key) or
  * user — state-store partitioning is the shuffle partitioning, so state
  * scales with keys, not events; watermarks bound state retention.
  */
object Streams {

  /** Watermarked tumbling-window counts/sums per event_type. Append mode
    * emits a window only once the watermark passes its end; rows later
    * than the watermark are dropped. */
  def tumblingCounts(events: DataFrame, tsCol: String, watermark: String,
      windowLen: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding windows (2× overlap) with the same watermark semantics. */
  def slidingCounts(events: DataFrame, tsCol: String, watermark: String,
      windowLen: String, slide: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("n"))

  /** Built-in session windows over a watermarked stream. */
  def sessionCounts(events: DataFrame, tsCol: String, watermark: String,
      gap: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Exactly-once surrogate under at-least-once delivery: duplicates of a
    * key arriving within the watermark are suppressed; state for a key is
    * dropped once the watermark passes it. */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
      watermark: String, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Stream-stream interval join: left rows match right rows of the same
    * `key` with `rightTs` in [leftTs - interval, leftTs). Both sides are
    * watermarked and the time-range condition is what BOUNDS the join
    * state — Spark buffers each side only until the watermark passes the
    * interval, so state scales with in-flight time span × key arrival
    * rate, never with stream length. Inner-join rows emit as soon as
    * both sides arrive. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, watermark: String,
      interval: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r, expr(
      s"""l.$key = r.$key AND
         |r.$rightTs >= l.$leftTs - INTERVAL $interval AND
         |r.$rightTs < l.$leftTs""".stripMargin))
  }

  case class PEvent(user_id: Long, event_id: Long, event_type: String,
      cents: Long, ts_us: java.sql.Timestamp, us: Long)
  case class PState(start: Long, last: Long, n: Long, cents: Long)
  case class PSession(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, sum_cents: Long, reason: String)

  /** Custom keyed state with a business rule the built-in session_window
    * cannot express: a 'purchase' event CLOSES its session immediately
    * (end = the purchase's own timestamp, emitted in the same micro-batch),
    * while non-purchase sessions close on a gap >= gapUs — either in-batch
    * when the next event arrives, or via event-time timeout once the
    * watermark strictly passes last + gap (Spark fires EventTimeTimeout
    * only at timeout < watermark; pinned empirically, see the scored
    * oracle's `< wm_ms` mirror in graft.ops.Streaming).
    *
    * Determinism: in-batch events are folded in (us, event_id) order and
    * money is carried as exact integer cents, so emission content is
    * independent of arrival order within a batch and of partial-agg merge
    * order. 100-TB note: PERSISTED state is 4 longs per open session key —
    * it scales with concurrent users, never stream length; the state store
    * partitions on user_id (the groupByKey shuffle), and the watermark
    * bounds retention. The in-batch fold, however, buffers one user's
    * events for the CURRENT micro-batch (the sortBy) — per-batch memory is
    * O(events-per-user-per-batch), so bounded micro-batches are assumed;
    * under AvailableNow single-batch replays, maxFilesPerTrigger (or
    * equivalent admission control) is what keeps that bound.
    */
  /** The purchase-session state machine shared by the fMGWS and
    * transformWithState implementations: fold a batch's events in
    * (us, event_id) order over the optional open-session state, return
    * (sessions closed in-batch, still-open state). Keeping ONE fold is
    * what makes the two API spellings row-identical by construction. */
  private def foldPurchase(user: Long, evs: Seq[PEvent], init: Option[PState],
      gapUs: Long): (List[PSession], Option[PState]) = {
    val out = List.newBuilder[PSession]
    var cur = init
    evs.foreach { e =>
      cur = cur match {
        case Some(s) if e.us - s.last < gapUs =>
          val s2 = PState(s.start, e.us, s.n + 1, s.cents + e.cents)
          if (e.event_type == "purchase") {
            out += PSession(user, s2.start, s2.last, s2.n, s2.cents, "purchase")
            None
          } else Some(s2)
        case Some(s) =>
          out += PSession(user, s.start, s.last + gapUs, s.n, s.cents, "gap")
          if (e.event_type == "purchase") {
            out += PSession(user, e.us, e.us, 1, e.cents, "purchase")
            None
          } else Some(PState(e.us, e.us, 1, e.cents))
        case None =>
          if (e.event_type == "purchase") {
            out += PSession(user, e.us, e.us, 1, e.cents, "purchase")
            None
          } else Some(PState(e.us, e.us, 1, e.cents))
      }
    }
    (out.result(), cur)
  }

  def purchaseSessions(events: Dataset[PEvent], gapUs: Long): Dataset[PSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PState, PSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, it, state: GroupState[PState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(PSession(user, s.start, s.last + gapUs, s.n, s.cents, "timeout"))
          } else {
            val evs = it.toSeq.sortBy(e => (e.us, e.event_id))
            val (closed, cur) = foldPurchase(user, evs, state.getOption, gapUs)
            cur match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp((s.last + gapUs) / 1000) // µs → ms
              case None => if (state.exists) state.remove()
            }
            closed.iterator
          }
      }
  }

  /** Spark-4 successor-API twin of [[purchaseSessions]]: identical
    * semantics on `transformWithState` (StatefulProcessor + named
    * ValueState + explicit event-time timers) — the API that replaces
    * flatMapGroupsWithState with composite/TTL state and first-class
    * timers. Mechanical differences only: state lives in a named
    * ValueState, the gap timeout is a timer deleted/re-registered as
    * the session advances, and expiry arrives in handleExpiredTimer.
    * The in-batch fold is [[foldPurchase]], shared with the fMGWS form;
    * StreamingSuite drives both through the same batches and asserts
    * row equality. Requires the RocksDB state store provider (the
    * backing store transformWithState mandates). */
  final class PurchaseSessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, PEvent, PSession] {
    @transient private var state: ValueState[PState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState("session", Encoders.product[PState], TTLConfig.NONE)

    private def timerMs(s: PState): Long = (s.last + gapUs) / 1000 // µs → ms

    override def handleInputRows(user: Long, rows: Iterator[PEvent],
        tv: TimerValues): Iterator[PSession] = {
      val evs = rows.toSeq.sortBy(e => (e.us, e.event_id))
      val prev = if (state.exists()) Some(state.get()) else None
      prev.foreach(s => getHandle.deleteTimer(timerMs(s)))
      val (closed, cur) = foldPurchase(user, evs, prev, gapUs)
      cur match {
        case Some(s) => state.update(s); getHandle.registerTimer(timerMs(s))
        case None => state.clear()
      }
      closed.iterator
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[PSession] = {
      // a stale timer (session advanced in the same batch) never matches
      // the live state's own expiry; only the registered timer fires
      if (state.exists()) {
        val s = state.get()
        if (timerMs(s) == info.getExpiryTimeInMs) {
          state.clear()
          Iterator(PSession(user, s.start, s.last + gapUs, s.n, s.cents, "timeout"))
        } else Iterator.empty
      } else Iterator.empty
    }
  }

  def purchaseSessionsTws(events: Dataset[PEvent], gapUs: Long): Dataset[PSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new PurchaseSessionProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n: Long,
      sum_value: Double)

  /** Custom keyed state (the KeyValueGroupedDataset surface): re-implements
    * gap-based sessions with flatMapGroupsWithState + event-time timeout —
    * the extension point for session semantics the built-in
    * session_window cannot express (e.g. value-dependent gaps, emitting
    * only on session close). Emits a session when the watermark-driven
    * timeout fires. */
  def customSessions(events: Dataset[SessionEvent], gapMs: Long,
      watermark: String): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.start * 1000, (s.last + gapMs) * 1000, s.n, s.sum))
          } else {
            // batch-sort for deterministic in-batch order; cross-batch
            // order is guaranteed by the watermark
            val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.value))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            evs.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last < gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= SessionOut(user, s.start * 1000, (s.last + gapMs) * 1000, s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  // ---- streaming z-score (the events_anomaly_zscore fold, stateful) -------

  case class ZEvent(user_id: Long, event_id: Long, us: Long, cents: Long,
      ts_us: java.sql.Timestamp)
  case class ZObs(us: Long, event_id: Long, cents: Long)
  case class ZWin(obs: Seq[ZObs])
  case class ZScoreOut(user_id: Long, event_id: Long, us: Long, zscore: Double)

  /** The exact-integer trailing-window z-score from the scored batch
    * operator (graft.ops.Pipeline events_anomaly_zscore), run as keyed
    * streaming state on `transformWithState`: per user the state is the
    * last ≤ `window − 1` observations (us, event_id, cents) — O(window)
    * longs per key, carried across micro-batches — and each arriving
    * event scores against state + itself with the identical integer
    * moments, so stream and batch emit bit-identical doubles. In-batch
    * events fold in (us, event_id) order; cross-batch correctness
    * assumes event-time-ordered batch boundaries (the usual replay /
    * ingestion-time contract — a watermark-buffered reorder stage is
    * the production front-end otherwise, as StreamingSuite notes). */
  final class ZScoreProcessor(window: Int, minN: Int)
      extends StatefulProcessor[Long, ZEvent, ZScoreOut] {
    @transient private var state: ValueState[ZWin] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState("zwin", Encoders.product[ZWin], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[ZEvent],
        tv: TimerValues): Iterator[ZScoreOut] = {
      var hist: Seq[ZObs] =
        if (state.exists()) state.get().obs else Seq.empty
      val out = Seq.newBuilder[ZScoreOut]
      val sorted = rows.toSeq.sortBy(e => (e.us, e.event_id))
      // The event-time-ordered batch-boundary contract (scaladoc above)
      // is enforced, not assumed: an event sorting at or below the newest
      // retained observation would silently produce z-scores that diverge
      // from the batch operator — kill the query loudly instead. hist is
      // kept in fold order, so its last element is the retained max.
      for (newest <- hist.lastOption; first <- sorted.headOption)
        require(Ordering[(Long, Long)].gt(
            (first.us, first.event_id), (newest.us, newest.event_id)),
          s"ZScoreProcessor: out-of-order input for user=$user: event " +
            s"(us=${first.us}, event_id=${first.event_id}) does not follow " +
            s"retained state max (us=${newest.us}, event_id=${newest.event_id}); " +
            "add a watermark-buffered reorder stage upstream")
      sorted.foreach { e =>
        val win = (hist :+ ZObs(e.us, e.event_id, e.cents)).takeRight(window)
        val n = win.length.toLong
        val sx = win.iterator.map(_.cents).sum
        val sx2 = win.iterator.map(o => o.cents * o.cents).sum
        if (n >= minN && n * sx2 > sx * sx) {
          val z = (n * e.cents - sx).toDouble / math.sqrt((n * sx2 - sx * sx).toDouble)
          out += ZScoreOut(user, e.event_id, e.us, math.floor(z * 1e6 + 0.5) / 1e6)
        }
        hist = win.takeRight(window - 1)
      }
      state.update(ZWin(hist))
      out.result().iterator
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[ZScoreOut] = Iterator.empty
  }

  /** 24-row trailing window, min 8 observations — the scored batch
    * operator's parameters. */
  def zscoreStream(events: Dataset[ZEvent]): Dataset[ZScoreOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new ZScoreProcessor(24, 8),
        TimeMode.None(), OutputMode.Append())
  }
}
