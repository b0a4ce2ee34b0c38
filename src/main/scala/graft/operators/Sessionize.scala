package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same user belong to
  * one session while the inter-event gap stays at or under `gap`; a larger
  * gap opens a new session. The classic log-analytics primitive the
  * reference's event tables imply but never materialize (its chat history
  * is one implicit session per user — `main.py:70-80` fetches a flat
  * ordered history); re-expressed here as the standard two-window Spark
  * shape.
  *
  * Scale: ONE shuffle — both window functions (the lag and the running
  * sum) share the same partitioning and ordering, so Catalyst plans a
  * single Exchange(user) + Sort carrying two Window nodes back to back,
  * and the follow-up per-session aggregation groups on (user, session_seq)
  * whose clustering is already satisfied by the user-hash partitioning
  * (no second Exchange — pinned by the q65 plan-shape test). Timestamps
  * are unit-agnostic longs: callers pass `gap` in the column's own units
  * (epoch-nanos for the events table, ms for the streaming twin's specs).
  */
object Sessionize {

  /** Adds a 1-based per-user `session_seq` to `events`. A session break is
    * `ts - prev_ts > gap` (strictly greater: an arrival exactly `gap`
    * after its predecessor extends the session — mirrored by the streaming
    * twin's close condition, [[graft.streaming.StatefulOps.streamingSessionize]]).
    * `tieCol` breaks equal-timestamp ordering so the assignment is total
    * and reproducible.
    */
  def assignSessions(
      events: DataFrame, userCol: String, tsCol: String, tieCol: String,
      gap: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("_prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("_is_new",
        when(col("_prev_ts").isNull || col(tsCol) - col("_prev_ts") > gap, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("_is_new"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .drop("_prev_ts", "_is_new")
  }

  /** Per-session rollup: event count, start timestamp, duration (same units
    * as `tsCol`) and 2-dp value total, keyed (user, session_seq).
    */
  def sessionSummary(
      events: DataFrame, userCol: String, tsCol: String, tieCol: String,
      valueCol: String, gap: Long): DataFrame =
    assignSessions(events, userCol, tsCol, tieCol, gap)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        (max(col(tsCol)) - min(col(tsCol))).as("dur"),
        round(sum(col(valueCol)), 2).as("total_value"))
}
