package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.compile.ModelValidator
import graft.spec.ModelSpec

/**
 * Custom stateful streaming checks via `KeyValueGroupedDataset
 * .flatMapGroupsWithState` — the engine's "model-level invariants across a
 * stream" operator.
 *
 * Reference anchor: pydantic plugins observe per-call success/error events
 * (`on_success`/`on_error`, `pydantic/plugin/__init__.py:76-186`); a
 * streaming pipeline needs those events AGGREGATED per key with state —
 * e.g. "alert when a source's consecutive-invalid streak exceeds k" —
 * which no stateless projection or windowed agg can express.
 *
 * Scale: state is one small case class per distinct key, sharded by the
 * stream's groupBy hash partitioning; processing-time timeout evicts idle
 * keys so state is bounded.
 */
object StatefulChecks {

  /** Per-key violation-streak state. */
  final case class StreakState(streak: Long, totalRows: Long, totalInvalid: Long)

  /** Emitted alert when a key's consecutive-invalid streak reaches the
   * threshold (emitted once per crossing, then again every crossing after
   * a reset). */
  final case class StreakAlert(key: String, streak: Long, totalRows: Long,
                               totalInvalid: Long)

  /** Internal row shape (public: codegen'd projections instantiate it). */
  final case class KeyedVerdict(key: String, valid: Boolean)

  /**
   * Alert stream: groups the validated stream by `keyCol` and tracks the
   * consecutive-invalid streak per key in GroupState. Works on batch
   * Datasets too (Spark runs the same function with no state carryover —
   * used by the spec for deterministic assertions plus a true streaming
   * test via MemoryStream).
   */
  /** `idleTimeout = Some(d)` evicts keys idle for d (bounds state on
   * unbounded key domains) at the cost of the engine running no-data
   * micro-batches to evaluate timeouts; None = NoTimeout (state grows with
   * distinct keys — fine when the key domain is bounded, and the query
   * only runs batches when data arrives). */
  def invalidStreakAlerts(stream: DataFrame, model: ModelSpec, keyCol: String,
                          threshold: Long,
                          idleTimeout: Option[String] = None): Dataset[StreakAlert] = {
    val spark = stream.sparkSession
    implicit val keyEnc = Encoders.STRING
    implicit val kvEnc = Encoders.product[KeyedVerdict]
    implicit val stEnc = Encoders.product[StreakState]
    implicit val outEnc = Encoders.product[StreakAlert]
    val verdicts = ModelValidator.plan(stream, model)
      .select(col(keyCol).cast("string").as("key"),
        col(ModelValidator.VALID).as("valid"))
      .as[KeyedVerdict]
    val timeoutConf = if (idleTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    verdicts
      .groupByKey(_.key)
      .flatMapGroupsWithState[StreakState, StreakAlert](
        OutputMode.Append(), timeoutConf) {
        case (key, rows, state: GroupState[StreakState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(StreakState(0L, 0L, 0L))
            val alerts = Iterator.newBuilder[StreakAlert]
            rows.foreach { r =>
              val streak = if (r.valid) 0L else s.streak + 1
              s = StreakState(streak, s.totalRows + 1,
                s.totalInvalid + (if (r.valid) 0 else 1))
              if (streak == threshold)
                alerts += StreakAlert(key, streak, s.totalRows, s.totalInvalid)
            }
            state.update(s)
            idleTimeout.foreach(state.setTimeoutDuration)
            alerts.result().iterator
          }
      }
  }
}
