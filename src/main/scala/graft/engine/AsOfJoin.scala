package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the standard event-time enrichment operator (attach
  * to each left row the latest right row at-or-before it, per key). The
  * reference's surface has no temporal joins (SURVEY.md section 2.3 lists
  * every join; all are equi-joins), but an event pipeline over the shared
  * `events` table needs one, and it is the canonical example of an operator
  * Spark lacks as a built-in (the brief's "as-of join" case).
  *
  * Implementation: union-and-window, NOT a range join.
  *   - tag left rows side=1 and right rows side=0 on a common (key, time)
  *     spine;
  *   - one window per key ordered by (time, side, tieBreak) carries the
  *     right payload forward with last(_, ignoreNulls);
  *   - keep side=1 rows: each left row sees exactly the latest right row
  *     with rightTime <= leftTime (right sorts before left at equal times,
  *     so the join is backward-INCLUSIVE, matching DuckDB/pandas ASOF).
  *
  * Scale: one shuffle on the key plus a per-partition sort — the same cost
  * shape as sessionization, independent of match fan-out. The naive
  * formulation (theta-join on time ranges, then per-left-row argmax) builds
  * O(left x right) intermediate pairs per key and collapses them again; this
  * form never materializes a pair. Determinism: (time, side, tieBreak) must
  * be a total order — pass a unique tieBreak (e.g. the event id).
  */
object AsOfJoin {

  /** For each `left` row, the right columns `rightVals` of the single right
    * row with the greatest `rightTime` <= `leftTime` in the same `key`
    * group (null when no right row precedes). `tieBreak` must exist on both
    * sides and make (time, tieBreak) unique; `rightVals` must not collide
    * with left column names. Output: all left columns, then `rightVals`.
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, tieBreak: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightVals.forall(v => !leftCols.contains(v)),
      s"right value columns ${rightVals.mkString(",")} must not collide with left columns")
    val l = left.select(
      Seq(col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
        col(tieBreak).as("__tb"))
        ++ leftCols.map(c => col(c).as(s"__l_$c"))
        ++ rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right.select(
      Seq(col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
        col(tieBreak).as("__tb"))
        ++ leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c"))
        ++ rightVals.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(Seq(col("__side"))
        ++ leftCols.map(c => col(s"__l_$c"))
        ++ rightVals.map(c => last(col(s"__r_$c"), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++ rightVals.map(col): _*)
  }

  /** [[asofBackward]] with a match-window bound — the pandas `merge_asof`
    * `tolerance` semantics: a preceding right row more than
    * `maxStalenessUs` microseconds older than the probe time counts as NO
    * match, so every right value column (and the matched right time,
    * exposed as `matchedTimeCol`) nulls out. Both time columns must be
    * timestamps. The bound is a post-window projection on the already-
    * joined rows — same one-shuffle cost as the unbounded join, never a
    * second join or a range join.
    */
  def asofBackwardWithin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, tieBreak: String,
      rightVals: Seq[String], maxStalenessUs: Long,
      matchedTimeCol: String): DataFrame = {
    val joined = asofBackward(left,
      right.withColumn(matchedTimeCol, col(rightTime)),
      key, leftTime, rightTime, tieBreak, rightVals :+ matchedTimeCol)
    val withFlag = joined.withColumn("__fresh",
      unix_micros(col(leftTime)) - unix_micros(col(matchedTimeCol))
        <= maxStalenessUs)
    (rightVals :+ matchedTimeCol)
      .foldLeft(withFlag)((d, c) => d.withColumn(c, when(col("__fresh"), col(c))))
      .drop("__fresh")
  }

  /** Forward as-of join: for each `left` row, the EARLIEST right row with
    * `rightTime` >= `leftTime` in the same key group (null when none
    * follows) — "next event after" enrichment (next purchase after a click,
    * next error after a deploy). Mirror of [[asofBackward]]: left sorts
    * BEFORE right at equal times (forward-inclusive) and the first
    * following right payload is pulled back with first(_, ignoreNulls)
    * over the (currentRow, unboundedFollowing) frame. Same one-shuffle
    * cost shape.
    */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, tieBreak: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightVals.forall(v => !leftCols.contains(v)),
      s"right value columns ${rightVals.mkString(",")} must not collide with left columns")
    val l = left.select(
      Seq(col(key).as("__k"), col(leftTime).as("__t"), lit(0).as("__side"),
        col(tieBreak).as("__tb"))
        ++ leftCols.map(c => col(c).as(s"__l_$c"))
        ++ rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right.select(
      Seq(col(key).as("__k"), col(rightTime).as("__t"), lit(1).as("__side"),
        col(tieBreak).as("__tb"))
        ++ leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c"))
        ++ rightVals.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r)
      .select(Seq(col("__side"))
        ++ leftCols.map(c => col(s"__l_$c"))
        ++ rightVals.map(c => first(col(s"__r_$c"), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 0)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++ rightVals.map(col): _*)
  }
}
