package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic skew mitigation for hot join keys.
  *
  * AQE's skew-join handling splits oversized SORT-MERGE partitions at
  * runtime, but it cannot help when the skew sits under a hash aggregate or
  * when a single key floods one task pre-AQE. The classic fix is salting:
  * widen the hot key into (key, salt) so one key's rows spread over
  * `saltFactor` partitions, and replicate the small side across every salt.
  *
  * The salt here is DETERMINISTIC — derived by hashing a high-cardinality
  * companion column of the big side, never rand() — so results stay
  * oracle-comparable and re-runs identical (the engine-wide determinism
  * contract). Semantics are exactly the unsalted equi-join's: every big row
  * meets every matching small row exactly once (asserted in SkewSpec).
  */
object Skew {

  /** Inner equi-join on `key` with the big side salted by
    * hash(saltSource) % saltFactor and the small side replicated per salt.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, saltSource: String): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val salted = big.withColumn("__salt",
      pmod(hash(col(saltSource)), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Salted aggregation: two-phase groupBy where phase one groups on
    * (key, salt) — spreading a hot key across tasks — and phase two merges
    * the partials per key. `partials` maps each aggregated column to the
    * expression merging it in phase two (e.g. "cnt" -> sum, "mx" -> max).
    */
  def saltedCountByKey(df: DataFrame, key: String, saltFactor: Int,
      saltSource: String): DataFrame =
    df.withColumn("__salt", pmod(hash(col(saltSource)), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
