package graft.engine

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic dense surrogate-key assignment (SURVEY.md section 2.5 W1 +
  * section 4 hazard 1).
  *
  * The reference keys dimensions with `row_number().over(Window.orderBy(k))
  * + offset` (final_dim_load.py:153, :172-173) — an UNPARTITIONED window that
  * funnels every row through one task. Both semantics are exposed here:
  * `surrogateKeys` is the faithful small-dimension form; `surrogateKeysScalable`
  * produces the identical output via range-partition + local sort +
  * zipWithIndex, which never materializes the dataset on one task and is the
  * form that survives a 1000-executor, 100 TB dimension build. Output equality
  * holds whenever the order key is unique (enforced nowhere — same as the
  * reference — but asserted in the spec).
  */
object Keys {

  /** Reference-faithful: global row_number + offset. Single-task sort. */
  def surrogateKeys(df: DataFrame, orderCol: String, keyName: String,
      offset: Long = 0L): DataFrame =
    df.withColumn(keyName,
      row_number().over(Window.orderBy(col(orderCol))).cast(LongType) + offset)

  /** Scale-safe equivalent: range partition by the order key (so partition i
    * holds strictly smaller keys than partition i+1), sort locally, then
    * zipWithIndex assigns global ranks with only a per-partition-count pass.
    */
  def surrogateKeysScalable(df: DataFrame, orderCol: String, keyName: String,
      offset: Long = 0L, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, col(orderCol)).sortWithinPartitions(orderCol)
    val schema = sorted.schema.add(keyName, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L + offset))
    }
    spark.createDataFrame(rdd, schema)
  }
}
