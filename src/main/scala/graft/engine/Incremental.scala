package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (mergeable) aggregation state — the materialized-view
  * pattern: keep a small per-key state table, aggregate only the new delta,
  * and MERGE states instead of rescanning history. Correct because the
  * state is (count, exact decimal sum): both are associative/commutative,
  * so any partition of the input into batches merges to bit-identical
  * totals (q85 asserts merged-vs-full equality through the oracle). At
  * 100 TB this turns a daily full-table aggregate into a delta-sized job.
  */
object Incremental {

  /** Per-key partial state: row count + exact decimal sum of `valueCol`. */
  def sumCountState(df: DataFrame, keys: Seq[String], valueCol: String,
      scale: Int = 6): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(s"decimal(24,$scale)")).as("sum_state"))

  /** Merge any number of partial states (exact — decimal addition is
    * associative). Output carries the same (keys, n, sum_state) shape, so
    * merges compose.
    */
  def mergeStates(states: Seq[DataFrame], keys: Seq[String], scale: Int = 6): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_state")).cast(s"decimal(24,$scale)").as("sum_state"))
}
