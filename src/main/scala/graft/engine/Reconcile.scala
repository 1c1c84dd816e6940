package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed source-vs-target reconciliation: the full-outer diff report every
  * warehouse load validates with (did the refresh add / remove / change
  * rows?). One full-outer shuffle join on the key; the class expression is
  * pure projection work. Null-safe equality (`<=>`) classifies NULL-valued
  * columns correctly on both sides.
  */
object Reconcile {

  /** (key, diff_class) for every key present on either side:
    * 'added' (target only), 'removed' (source only), 'changed' (both, any
    * compare column differs), 'unchanged'.
    */
  def diffByKey(source: DataFrame, target: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    val s = source.select(
      (col(key) +: compareCols.map(c => col(c).as(s"__s_$c"))): _*)
      .withColumn("__in_s", lit(true))
    val t = target.select(
      (col(key) +: compareCols.map(c => col(c).as(s"__t_$c"))): _*)
      .withColumn("__in_t", lit(true))
    // empty compareCols = key-presence diff only ('changed' impossible)
    val anyDiff = compareCols
      .map(c => !(col(s"__s_$c") <=> col(s"__t_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    s.join(t, Seq(key), "full_outer")
      .select(col(key),
        when(col("__in_s").isNull, "added")
          .when(col("__in_t").isNull, "removed")
          .when(anyDiff, "changed")
          .otherwise("unchanged").as("diff_class"))
  }
}
