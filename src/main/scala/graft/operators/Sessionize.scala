package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization of an event stream: a session is a maximal run
  * of one user's events with inter-event gaps ≤ `gapMinutes`.
  *
  * Classic gap-and-island: flag events whose gap from the previous
  * event exceeds the threshold, cumulative-sum the flags to number the
  * sessions, aggregate per session. Both windows partition by user_id —
  * the plan is a single hash shuffle on user_id reused by both window
  * steps and the final groupBy (Catalyst recognizes the shared
  * partitioning; no second shuffle). Scale: per-user data must fit a
  * partition's sort buffer — true for any real user at 100 TB (events
  * per user ≪ partition size); a pathological single hot user would be
  * handled by a session-window groupBy
  * (`session_window(ts, gap)`) which this mirrors.
  *
  * The same semantics under Structured Streaming lives in
  * [[graft.streaming.EventStream.streamingSessions]] (state-store based).
  */
object Sessionize {

  /** Per-EVENT session tagging: the input rows with a 1-based-per-user
    * `session_id` column appended (gap-and-island over the
    * (ts, event_id)-total order). The building block [[sessions]] and
    * sequence-assembly consumers (n94) share, so the island logic
    * cannot drift between them. */
  def tagged(events: DataFrame, tsCol: String, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col(tsCol), col("event_id"))
    val gapS = gapMinutes * 60L
    events
      .withColumn("graft__prev", lag(col(tsCol), 1).over(byUser))
      .withColumn(
        "graft__new",
        when(
          col("graft__prev").isNull ||
            unix_timestamp(col(tsCol)) - unix_timestamp(col("graft__prev")) > gapS,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("graft__new")).over(byUser))
      .drop("graft__prev", "graft__new")
  }

  /** Per-session rollup: (user_id, session_id, session_start,
    * session_end, n_events, span_s). session_id is 1-based per user. */
  def sessions(events: DataFrame, tsCol: String, gapMinutes: Int): DataFrame =
    tagged(events, tsCol, gapMinutes)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
          .as("span_s"))
}
