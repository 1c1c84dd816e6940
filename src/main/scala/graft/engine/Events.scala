package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series batch analytics over the `events` table (SURVEY.md section
  * 2.10: the reference models time relationally — calendar join, no streams —
  * so the idiomatic stand-in for stream processing is tumbling-window batch
  * aggregation plus gap-based sessionization, both oracle-expressible).
  *
  * Both operators are single-shuffle: the bucket agg shuffles on
  * (bucket, event_type) with map-side partial aggregation; sessionization
  * shuffles once on user_id and computes the session ids inside each
  * partition — the 100 TB-safe shape (no global sort, no driver loop).
  */
object Events {

  /** Tumbling-window aggregation: one row per (hour bucket, event_type).
    * Uses the built-in `window()` generator — the same Catalyst path a
    * Structured Streaming tumbling agg would take in micro-batch mode.
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .groupBy(
        window(col("ts"), "1 hour").getField("start").as("bucket"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        Exact.sumD(col("value"), scale = 6).as("sum_value"))

  /** Gap-based sessionization: a new session starts when a user is idle for
    * more than `gapSeconds`. Classic lag + conditional cumulative-sum over a
    * per-user window; the equivalent of Structured Streaming's
    * `session_window` expressed as a batch plan.
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val byTime = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // Microsecond precision on both sides of the gap compare — seconds-level
    // casts truncate and would disagree with a fractional-second oracle.
    val prevTs = lag(unix_micros(col("ts")), 1).over(byTime)
    val isNew = when(
      prevTs.isNull || (unix_micros(col("ts")) - prevTs) > gapSeconds * 1000000L,
      1L).otherwise(0L)
    events
      .withColumn("session_seq",
        sum(isNew).over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        Exact.sumD(col("value"), scale = 6).as("sum_value"))
  }
}
