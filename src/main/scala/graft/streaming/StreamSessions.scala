package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming gap sessionization — the Structured Streaming counterpart of
 * `graft.events.EventOps.sessionize/sessionSummary`, with the SAME gap
 * semantics (a new session starts when the gap STRICTLY exceeds `gapUs`;
 * a gap of exactly `gapUs` stays in-session — which is why this is
 * `flatMapGroupsWithState` and not Spark's built-in `session_window`,
 * whose half-open `[start, last+gap)` windows break at `>= gap`).
 *
 * State is ONE open session per key (five longs + a small type set —
 * the event-type domain, not the event count), sharded by the stream's
 * groupBy hash partitioning; `EventTimeTimeout` closes and emits a
 * session once the watermark passes `last + gap`, so idle keys hold no
 * state forever and results are emitted without waiting for the next
 * event of that key.
 *
 * Ordering: rows are sorted by (event time, tie id) WITHIN each
 * micro-batch group invocation; cross-batch reordering is bounded by the
 * caller's watermark delay (the standard Structured Streaming contract —
 * an event arriving in a later batch but timestamped before the previous
 * batch's maximum is assigned greedily, exactly like every
 * sessionization-with-state example in the Spark docs). The batch
 * operator remains the ground truth; `StreamSessionsSpec` pins
 * batch/stream agreement on in-order feeds.
 *
 * Money is carried as exact integer cents (pre-converted by the caller's
 * projection) so streaming accumulation is fold-order-free, matching the
 * batch DECIMAL(18,2) sum.
 *
 * Identity caveat: `session_seq` numbers sessions within one span of
 * per-key state — closing a session via timeout EVICTS the key's state
 * (that is what bounds the store on unbounded key domains), so a key
 * that returns after an idle eviction restarts at seq 1. The STABLE
 * session identity downstream consumers should key on is
 * `(key, start_us)`, which is unique and batch-agreeing regardless of
 * evictions; `session_seq` only totals batch semantics while state
 * lives (and always in the single-batch/test shape).
 */
object StreamSessions {

  /** Input row shape (public: codegen'd projections instantiate it). */
  final case class SessEvent(key: String, us: Long, tie: Long, cents: Long,
                             tp: String, et: java.sql.Timestamp)

  /** Open-session state. */
  final case class SessState(startUs: Long, lastUs: Long, n: Long,
                             sumCents: Long, types: Set[String],
                             seq: Long)

  /** A closed session. */
  final case class Session(key: String, session_seq: Long, n_events: Long,
                           start_us: Long, end_us: Long, duration_us: Long,
                           sum_cents: Long, n_types: Long)

  private def close(key: String, s: SessState): Session =
    Session(key, s.seq, s.n, s.startUs, s.lastUs, s.lastUs - s.startUs,
      s.sumCents, s.types.size.toLong)

  /**
   * `df` must carry (keyCol string-castable, tsCol timestamp, tieCol long,
   * centsCol long, typeCol string) and SHOULD have a watermark on `tsCol`
   * when streaming (drives the event-time timeout that closes sessions).
   * Emits one row per CLOSED session, in append mode.
   */
  def closedSessions(df: DataFrame, keyCol: String, tsCol: String,
                     tieCol: String, centsCol: String, typeCol: String,
                     gapUs: Long): Dataset[Session] = {
    implicit val keyEnc = Encoders.STRING
    implicit val evEnc = Encoders.product[SessEvent]
    implicit val stEnc = Encoders.product[SessState]
    implicit val outEnc = Encoders.product[Session]
    val events = df.select(
      col(keyCol).cast("string").as("key"),
      unix_micros(col(tsCol).cast("timestamp")).as("us"),
      col(tieCol).cast("long").as("tie"),
      col(centsCol).cast("long").as("cents"),
      col(typeCol).cast("string").as("tp"),
      // the watermark is attribute metadata on the event-time column —
      // it must survive the projection for EventTimeTimeout to resolve
      col(tsCol).as("et")).as[SessEvent]
    events.groupByKey(_.key)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, rows, state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(key, _))
            state.remove()
            out.iterator
          } else {
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            // far-past stragglers (more than a gap before the carried
            // open session's start) CHAIN here within the batch: under
            // batch semantics consecutive stragglers within gapUs of
            // each other are ONE session, not per-event singletons.
            // Chain sessions carry seq 0 (out-of-band; stable identity
            // stays (key, start_us)). Sorted input means stragglers are
            // a prefix relative to the carried state, so the chain only
            // lives while `cur` is the previous batch's session.
            var strag: Option[SessState] = None
            rows.toSeq.sortBy(e => (e.us, e.tie)).foreach { e =>
              cur match {
                case Some(s) if e.us < s.startUs - gapUs =>
                  strag match {
                    case Some(ss) if e.us - ss.lastUs <= gapUs =>
                      strag = Some(SessState(ss.startUs,
                        math.max(ss.lastUs, e.us), ss.n + 1,
                        ss.sumCents + e.cents, ss.types + e.tp, 0L))
                    case _ =>
                      strag.foreach(ss => closed += close(key, ss))
                      strag = Some(SessState(e.us, e.us, 1L, e.cents,
                        Set(e.tp), 0L))
                  }
                case Some(s) if e.us - s.lastUs <= gapUs =>
                  // late in-gap events (cross-batch, inside watermark)
                  // extend BOTH bounds, matching the batch rollup
                  val newStart = math.min(s.startUs, e.us)
                  strag match {
                    case Some(ss) if newStart - ss.lastUs <= gapUs =>
                      // an in-gap event extended the open session DOWN to
                      // within a gap of the straggler chain — under batch
                      // semantics the whole chain merges into the session
                      cur = Some(SessState(math.min(ss.startUs, newStart),
                        math.max(s.lastUs, e.us), s.n + ss.n + 1,
                        s.sumCents + ss.sumCents + e.cents,
                        s.types ++ ss.types + e.tp, s.seq))
                      strag = None
                    case _ =>
                      cur = Some(SessState(newStart,
                        math.max(s.lastUs, e.us),
                        s.n + 1, s.sumCents + e.cents, s.types + e.tp,
                        s.seq))
                  }
                case Some(s) =>
                  closed += close(key, s)
                  cur = Some(SessState(e.us, e.us, 1L, e.cents, Set(e.tp),
                    s.seq + 1))
                case None =>
                  cur = Some(SessState(e.us, e.us, 1L, e.cents, Set(e.tp),
                    1L))
              }
            }
            // a chain still pending at batch end is emitted now — it is
            // already far behind the watermark (cross-batch merging with
            // a LATER straggler batch remains the documented deviation)
            strag.foreach(ss => closed += close(key, ss))
            cur.foreach { s =>
              // close via watermark once no in-gap event can still arrive
              // (guarded: batch execution has no watermark and throws on
              // the timeout APIs — there, open sessions simply stay open)
              val wm = scala.util.Try(state.getCurrentWatermarkMs())
                .toOption.filter(_ >= 0L)
              val closeAtMs = (s.lastUs + gapUs) / 1000L + 1L
              wm match {
                case Some(w) if closeAtMs <= w =>
                  // already past the watermark: no event can extend it —
                  // emit now (setTimeoutTimestamp would reject the past)
                  closed += close(key, s)
                  state.remove()
                case Some(_) =>
                  state.update(s)
                  state.setTimeoutTimestamp(closeAtMs)
                case None =>
                  state.update(s)
              }
            }
            closed.result().iterator
          }
      }
  }
}
