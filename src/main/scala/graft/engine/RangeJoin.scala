package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — the second temporal/interval operator
  * Spark lacks as a first-class built-in (next to [[AsOfJoin]]). A plain
  * `points.join(intervals, lo <= p && p < hi)` has no equi-key, so Spark
  * plans a broadcast nested loop: every point tests EVERY interval —
  * O(|P| x |I|) compares, and with a non-broadcastable interval side the
  * plan degrades to a cartesian product. That is the canonical range-join
  * scale trap.
  *
  * The bucketed form turns the theta join into an equi-join: pick a fixed
  * `step`, bucket points by floor(p/step), explode each interval to one row
  * per bucket it covers (floor(lo/step)..floor(hi/step) — bounded by
  * ceil(span/step)+1 rows), join on the bucket id, and re-check the exact
  * predicate as a residual filter. Completeness: lo <= p < hi implies
  * floor(lo/step) <= floor(p/step) <= floor(hi/step) (floor is monotone), so
  * every matching pair shares the point's bucket; a pair is produced at most
  * once because a point lives in exactly one bucket. Cost: one shuffle per
  * side on the bucket key, compares only within co-bucketed pairs. Choose
  * `step` near the median interval span so the explode factor stays ~2.
  */
object RangeJoin {

  /** All (point, interval) pairs with lo <= point < hi (half-open), as an
    * equi-join on the derived bucket id. Output: every `points` column then
    * every `intervals` column; column names must be disjoint.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String, step: Double): DataFrame = {
    require(step > 0, "step must be positive")
    val pCols = points.columns.toSeq
    val iCols = intervals.columns.toSeq
    require(pCols.intersect(iCols).isEmpty,
      s"point/interval columns must be disjoint, both have: ${pCols.intersect(iCols).mkString(",")}")
    val p = points.withColumn("__bucket", floor(col(pointCol) / step).cast("long"))
    val i = intervals
      .withColumn("__bucket",
        explode(sequence(floor(col(loCol) / step).cast("long"),
          floor(col(hiCol) / step).cast("long"))))
    p.join(i, Seq("__bucket"))
      .filter(col(loCol) <= col(pointCol) && col(pointCol) < col(hiCol))
      .select((pCols ++ iCols).map(col): _*)
  }

  /** The naive theta-join formulation (broadcast nested loop). Correct for a
    * SMALL interval side only — kept as the reference implementation the
    * bucketed form is verified against, and as the right plan when the
    * interval side genuinely fits in a broadcast.
    */
  def pointInIntervalNaive(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String): DataFrame =
    points.join(broadcast(intervals),
      col(loCol) <= col(pointCol) && col(pointCol) < col(hiCol))
}
