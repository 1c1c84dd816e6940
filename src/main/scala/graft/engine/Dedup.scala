package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md section 2.4, A2-A3, generalized).
  *
  * Exact dedup is a hash aggregate: it shuffles once on the dedup key and
  * map-side-combines first, so it scales linearly — the pattern to keep at
  * 100 TB. Near-duplicate (MinHash/SimHash) dedup lives in graft.ext.
  */
object Dedup {

  /** A2 whole-row dedup (final_dim_load.py:68): hash aggregate on all cols. */
  def dropAllDuplicates(df: DataFrame): DataFrame = df.dropDuplicates()

  /** A3 distinct key set (final_dim_load.py:137): projection then distinct,
    * so the shuffle carries only the key columns.
    */
  def distinctKeys(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*).distinct()

  /** Keep exactly one row per key, chosen by a total order (deterministic —
    * unlike dropDuplicates(keys), which keeps an arbitrary row). One shuffle
    * on the key, local sort per group; no global sort.
    */
  def keepFirstByKey(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame =
    keepFirstByKeyOrdered(df, keys, order.map(col))

  /** [[keepFirstByKey]] with arbitrary ordering expressions — e.g. keep the
    * LONGEST document per content fingerprint (`n_chars.desc`, id asc as the
    * deterministic tie-break), the standard keep-best dedup policy.
    */
  def keepFirstByKeyOrdered(df: DataFrame, keys: Seq[String],
      order: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
