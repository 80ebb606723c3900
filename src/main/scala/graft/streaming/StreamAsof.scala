package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming AS-OF join — the Structured Streaming counterpart of
 * `graft.events.EventOps.asofJoin` (backward direction): each left event
 * is enriched with the LATEST right event of the same key with
 * `rightTs <= leftTs` (equal timestamps match), within an optional
 * tolerance.
 *
 * Correctness argument (the watermark IS the join barrier): a left event
 * at time L is emitted only once the watermark passes L. At that point
 * no right event with `ts <= L` can still arrive (it would be behind the
 * watermark), so the buffered rights are COMPLETE below L and the match
 * is final — the streaming answer equals the batch answer on any feed
 * whose lateness respects the watermark delay, which `StreamAsofSpec`
 * pins against `EventOps.asofJoin`.
 *
 * State per key is bounded by the same barrier: pending left events live
 * only until the watermark passes them, and buffered rights below the
 * watermark collapse to the single LATEST one (anything older can never
 * be "the latest at-or-before" a left event that is itself above the
 * watermark). Rights above the watermark are kept as-is. An
 * `EventTimeTimeout` flushes pending lefts of idle keys.
 *
 * Null JOIN KEYS never match (SQL ASOF semantics, same as the batch
 * operator): null-key RIGHT rows are dropped by the input projection;
 * null-key LEFT rows cannot be grouped statefully and must be handled by
 * the caller (emit unmatched or drop) — documented deviation from the
 * batch operator, which carries them through unmatched.
 *
 * Payload is a single string column (the pattern generalizes to any
 * struct by pre-serializing; the batch operator stays the generic form).
 */
object StreamAsof {

  /** Input row (side 0 = right, 1 = left; `id` is the left row id). */
  final case class AsofEvent(key: String, us: Long, side: Int,
                             payload: String, id: Long,
                             et: java.sql.Timestamp)

  /** rights: (ts, payload) buffer; lefts: (ts, id) pending emission. */
  final case class AsofState(rights: List[(Long, String)],
                             lefts: List[(Long, Long)])

  /** One enriched left event; payload/lag null when unmatched. */
  final case class AsofOut(key: String, id: Long, left_us: Long,
                           payload: Option[String],
                           asof_lag_us: Option[Long])

  def enrich(left: DataFrame, right: DataFrame, keyCol: String,
             leftTsCol: String, rightTsCol: String, leftIdCol: String,
             payloadCol: String,
             toleranceUs: Option[Long] = None): Dataset[AsofOut] = {
    implicit val keyEnc = Encoders.STRING
    implicit val evEnc = Encoders.product[AsofEvent]
    implicit val stEnc = Encoders.product[AsofState]
    implicit val outEnc = Encoders.product[AsofOut]
    val l = left
      // null-key / null-ts left rows cannot be statefully grouped or
      // time-sealed — dropped here (the batch operator carries them
      // through unmatched; documented deviation)
      .where(col(keyCol).isNotNull && col(leftTsCol).isNotNull)
      .select(
        col(keyCol).cast("string").as("key"),
        unix_micros(col(leftTsCol).cast("timestamp")).as("us"),
        lit(1).as("side"),
        lit(null).cast("string").as("payload"),
        col(leftIdCol).cast("long").as("id"),
        col(leftTsCol).as("et"))
    val r = right
      .where(col(keyCol).isNotNull && col(rightTsCol).isNotNull)
      .select(
        col(keyCol).cast("string").as("key"),
        unix_micros(col(rightTsCol).cast("timestamp")).as("us"),
        lit(0).as("side"),
        col(payloadCol).cast("string").as("payload"),
        lit(-1L).as("id"),
        col(rightTsCol).as("et"))
    l.unionByName(r).as[AsofEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsofState, AsofOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, rows, state: GroupState[AsofState]) =>
          val st0 = state.getOption.getOrElse(AsofState(Nil, Nil))
          var rights = st0.rights
          var lefts = st0.lefts
          if (!state.hasTimedOut) rows.foreach { e =>
            if (e.side == 0) rights = (e.us, e.payload) :: rights
            else lefts = (e.us, e.id) :: lefts
          }
          val wmUs = scala.util.Try(state.getCurrentWatermarkMs())
            .toOption.filter(_ >= 0L).map(_ * 1000L)
          val out = Seq.newBuilder[AsofOut]
          wmUs match {
            case Some(w) =>
              // final (watermark-sealed) lefts: rights below them are
              // complete, emit in event-time order for determinism
              val (ready, pending) = lefts.partition(_._1 <= w)
              ready.sortBy(x => (x._1, x._2)).foreach { case (lu, id) =>
                val m = rights.filter(_._1 <= lu) match {
                  case Nil => None
                  case rs => Some(rs.maxBy(r0 => (r0._1, r0._2)))
                }
                val ok = m.exists(r0 =>
                  toleranceUs.forall(t => lu - r0._1 <= t))
                out += AsofOut(key, id, lu,
                  if (ok) m.map(_._2) else None,
                  if (ok) m.map(lu - _._1) else None)
              }
              lefts = pending
              // prune rights: all sealed rights collapse to the latest
              val (sealedR, liveR) = rights.partition(_._1 <= w)
              rights =
                if (sealedR.isEmpty) liveR
                else sealedR.maxBy(r0 => (r0._1, r0._2)) :: liveR
            case None => // batch execution: no barrier, nothing emits
          }
          if (lefts.isEmpty && rights.isEmpty) state.remove()
          else {
            state.update(AsofState(rights, lefts))
            // wake when the watermark passes the earliest pending left
            // (setTimeoutTimestamp rejects the past — clamp above wm).
            // A key with only a sealed right sets no timeout: that right
            // must be RETAINED as the potential match for future lefts
            // (the inherent state floor of any temporal join), and a
            // future left's arrival itself wakes the group.
            if (lefts.nonEmpty) wmUs.foreach { w =>
              state.setTimeoutTimestamp(
                math.max(lefts.map(_._1).min / 1000L + 1L, w / 1000L + 1L))
            }
          }
          out.result().iterator
      }
  }
}
