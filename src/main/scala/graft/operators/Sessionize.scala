package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization — the log-analytics primitive the
  * reference's event tables invite (tailpipe's whole domain is
  * timestamped log rows; grouping them into visits/incidents by
  * inactivity gap is the first query every log pipeline writes).
  * The streaming sibling lives in
  * [[graft.streaming.StreamIngest.sessionize]]; this is the batch
  * form over an already-collected table. Beyond-reference.
  *
  * Semantics: events of one `userCol` ordered by (`tsCol`, `ordCol`)
  * start a new session when the gap to the previous event is
  * STRICTLY greater than `gapSeconds`. Session ids are 1-based per
  * user in time order — deterministic, so re-running tags the same
  * sessions (the same reproducibility contract as [[Sampling]]).
  *
  * Scale shape: both windows share one `partitionBy(user)` sort — a
  * single shuffle by user, parallel across users, never a global
  * sort. Per-user state is the user's own event count: no
  * degenerate-partition risk beyond a genuinely pathological single
  * user, which is a data-model problem, not a plan problem (and the
  * hot-user case is exactly what the streaming form's state eviction
  * handles). The rollup is an ordinary map-side-combined aggregate on
  * (user, session).
  *
  * Exactness: gap comparison in integer microseconds; duration is a
  * microsecond difference divided by 1e6 — one IEEE division on an
  * exact integer, bit-identical on any engine unrounded.
  */
object Sessionize {

  /** `unix_micros` over a column that may be TIMESTAMP_NTZ (Spark 4
    * reads tz-less parquet `timestamp[us]` — every driver-generated
    * events table — as NTZ, and `unix_micros` accepts only LTZ). The
    * session runs in UTC, so the NTZ→LTZ cast reads naive-as-UTC,
    * matching the oracle; on an LTZ input the cast is a no-op Catalyst
    * folds away.
    */
  private[graft] def micros(c: Column): Column =
    unix_micros(c.cast("timestamp"))

  /** Per-event session assignment: input columns plus `session_id`. */
  def assign(
      events: DataFrame, userCol: String, tsCol: String,
      ordCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"sessionize: gap must be positive, got $gapSeconds")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(ordCol))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull ||
      micros(col(tsCol)) - micros(prev) > gapSeconds * 1000000L,
      1L).otherwise(0L)
    events.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: (user, session_id, start, end, n_events,
    * duration_s, per-value aggregates from `valueCol`).
    */
  def sessions(
      events: DataFrame, userCol: String, tsCol: String,
      ordCol: String, valueCol: String, gapSeconds: Long): DataFrame = {
    val assigned = assign(events, userCol, tsCol, ordCol, gapSeconds)
    assigned.groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        // no round: the µs difference is an exact integer and /1e6 is
        // ONE IEEE division — bit-identical on any engine, while a 4dp
        // round would hit exact decimal .5 ties (µs durations have 6
        // decimal digits) where HALF_UP engines disagree
        ((micros(max(col(tsCol))) - micros(min(col(tsCol))))
          .cast("double") / lit(1000000.0)).as("duration_s"),
        round(sum(col(valueCol)), 4).as("sum_value"))
  }
}
