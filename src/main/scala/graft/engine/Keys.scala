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
    * Drops to the RDD API (deserializes rows, exits codegen) — kept as the
    * measured-faster default; see [[surrogateKeysScalableCatalyst]] for the
    * pure-Catalyst form and the bench notes on both.
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

  /** Pure-Catalyst two-phase form (same output, given a unique order key):
    * range-partition, materialize the partition id, rank locally with a
    * PARTITIONED window (no single-task funnel), and add per-partition
    * offsets computed from a tiny count-by-pid aggregate joined back by
    * broadcast. Costs one extra hash shuffle (the window re-clusters by pid)
    * but never leaves Catalyst/codegen and needs no row deserialization —
    * preferable when downstream operators benefit from staying in Tungsten.
    *
    * CORRECTNESS CAVEAT: both branches reference `repartitionByRange`,
    * whose boundaries are SAMPLED per execution — the form is only correct
    * when AQE reuses the exchange across the two branches (it does for
    * simple scans; observed NOT to for a union-of-windows input, which is
    * why [[globalRunningSum]] uses the RDD shuffle-reuse shape). Keep
    * inputs to this form simple, or prefer [[surrogateKeysScalable]].
    */
  def surrogateKeysScalableCatalyst(df: DataFrame, orderCol: String,
      keyName: String, offset: Long = 0L, partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // pid materialized via Project (nondeterministic exprs are legal there);
    // both consumers below share ONE range exchange via ReuseExchange.
    val ranged = df.repartitionByRange(n, col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val offsets = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__poff",
        coalesce(
          sum(col("__cnt")).over(
            Window.orderBy(col("__pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__poff"))
    val localRank = row_number().over(
      Window.partitionBy(col("__pid")).orderBy(col(orderCol)))
    ranged
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(keyName,
        (localRank.cast(LongType) + col("__poff") + lit(offset)).cast(LongType))
      .drop("__pid", "__poff")
  }

  /** Scalable global prefix sum: `sumName` = running total of `valueCol`
    * (LongType) in `orderCol` order, INCLUDING the current row. The naive
    * form is an unpartitioned running-sum window (single-task funnel, same
    * hazard as surrogate keys).
    *
    * Implementation deliberately mirrors [[surrogateKeysScalable]]'s RDD
    * shape, NOT the pure-Catalyst two-exchange form: range-partition +
    * local sort ONCE, then two jobs over the SAME materialized shuffle —
    * a per-partition-total pass and the prefix-offset map. RDD shuffle
    * files are computed once and reused across the jobs, so the sampled
    * range boundaries cannot differ between the phases. A DataFrame
    * two-branch formulation (offsets aggregate + pid-window over two
    * evaluations of `repartitionByRange`) is only correct when AQE reuses
    * the exchange — and for complex inputs (a union of windowed subplans,
    * q95) that reuse does NOT fire, silently splitting the two branches
    * onto DIFFERENTLY-SAMPLED partitionings with garbage offsets.
    */
  def globalRunningSum(df: DataFrame, orderCol: String, valueCol: String,
      sumName: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions else spark.sessionState.conf.numShufflePartitions
    require(df.schema(valueCol).dataType == LongType,
      s"globalRunningSum needs a LongType $valueCol")
    val sorted = df.repartitionByRange(n, col(orderCol)).sortWithinPartitions(orderCol)
    val schema = sorted.schema.add(sumName, LongType, nullable = false)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L; it.foreach(r => s += r.getLong(vIdx)); Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { r => acc += r.getLong(vIdx); Row.fromSeq(r.toSeq :+ acc) }
    }
    spark.createDataFrame(out, schema)
  }
}
