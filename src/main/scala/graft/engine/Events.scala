package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Typed-row shape for [[Events.sessionizeTyped]] (top level: the encoder's
  * generated code instantiates by name).
  */
case class RawEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** One closed session from [[Events.sessionizeTyped]]. */
case class TypedSession(user_id: Long, session_seq: Long,
    session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
    n_events: Long)

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

  /** Typed twin of [[sessionize]] on the `Dataset[T]` API:
    * `groupByKey(_.user_id).flatMapGroups` walks each user's events in
    * (ts, event_id) order and emits a session per idle gap — the imperative
    * per-group logic the typed API exists for, with the case-class encoder
    * keeping field access compile-checked. Same shuffle contract as the
    * window form (one exchange on the key); the group sort is in-memory, so
    * this variant assumes bounded per-user event counts (true for session
    * data; the window form or streaming flatMapGroupsWithState cover the
    * unbounded case). Identical rows to [[sessionize]] minus the decimal
    * sum (typed aggregation of decimals re-enters untyped territory).
    */
  def sessionizeTyped(events: DataFrame, gapSeconds: Long = 1800L): Dataset[TypedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select("event_id", "ts", "user_id", "event_type", "value")
      .as[RawEvent]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid: Long, it: Iterator[RawEvent]) =>
        val evs = it.toArray.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
        val out = scala.collection.mutable.ArrayBuffer.empty[TypedSession]
        var seq = 0L
        var start: java.sql.Timestamp = null
        var end: java.sql.Timestamp = null
        var n = 0L
        // floorDiv, not /: truncation-toward-zero misplaces pre-1970
        // timestamps by up to a second vs unix_micros' floor semantics
        def micros(t: java.sql.Timestamp): Long =
          Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
        evs.foreach { e =>
          if (start == null || micros(e.ts) - micros(end) > gapSeconds * 1000000L) {
            if (start != null) out += TypedSession(uid, seq, start, end, n)
            seq += 1L; start = e.ts; end = e.ts; n = 1L
          } else {
            end = e.ts; n += 1L
          }
        }
        if (start != null) out += TypedSession(uid, seq, start, end, n)
        out.iterator
      }
  }
}
