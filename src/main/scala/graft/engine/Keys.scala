package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Row}
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
      offset: Long = 0L, partitions: Int = 0): DataFrame =
    rankByScalable(df, Seq(col(orderCol)), keyName, offset, partitions)

  /** Multi-column generalization of [[surrogateKeysScalable]]: assigns the
    * global 1-based rank under an arbitrary sort-order list (e.g.
    * `Seq(col("rev").desc, col("k"))`) with the same range-partition +
    * local-sort + zipWithIndex shape — no single-task window, ever. The
    * order must be a TOTAL order (include a unique tie-break column) for
    * the rank to be deterministic.
    */
  def rankByScalable(df: DataFrame, order: Seq[Column], keyName: String,
      offset: Long = 0L, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, order: _*).sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(keyName, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L + offset))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** SQL `ntile(k)` bucket (1-based) computed from a global rank and the
    * total row count — the explicit form of the ntile size rule: the first
    * `n mod k` buckets get `floor(n/k)+1` rows, the rest `floor(n/k)`.
    * Lets equi-depth bucketing ride [[rankByScalable]]'s two-phase rank
    * instead of an unpartitioned window. Requires n >= k (q = 0 otherwise
    * divides by zero — same domain ntile itself degenerates on).
    */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    val q = floor(n / k)
    val r = n % k
    (when(rank <= r * (q + 1), floor((rank - 1) / (q + 1)))
      .otherwise(r + floor((rank - r * (q + 1) - 1) / q)) + 1).cast("int")
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
      sumName: String, partitions: Int = 0): DataFrame =
    globalRunningSumBy(df, Seq(col(orderCol)), valueCol, sumName, partitions)

  /** Multi-column-order form of [[globalRunningSum]] (e.g. a running total
    * in `(revenue DESC, key)` order for Pareto shares). Same RDD
    * shuffle-reuse shape; the order must be total for determinism. The
    * value stays LongType — decimal running sums scale to long first
    * (scale-2 money → cents), which keeps the accumulation associative-
    * exact and overflow-safe to ~9e16 cents.
    */
  def globalRunningSumBy(df: DataFrame, order: Seq[Column], valueCol: String,
      sumName: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions else spark.sessionState.conf.numShufflePartitions
    require(df.schema(valueCol).dataType == LongType,
      s"globalRunningSum needs a LongType $valueCol")
    val sorted = df.repartitionByRange(n, order: _*).sortWithinPartitions(order: _*)
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

  /** Two-phase EXCLUSIVE global prefix max: `maxName` = max of `valueCol`
    * (LongType, non-null) over all rows STRICTLY BEFORE the current row in
    * `order` — null for the global first row. The scale-safe replacement
    * for `max(...).over(Window.orderBy(...).rowsBetween(unboundedPreceding,
    * -1))`, which funnels the whole frame through one task. Same RDD
    * shuffle-reuse shape as [[globalRunningSum]]: range-partition + local
    * sort once, a per-partition-max pass, then exclusive per-partition
    * prefix offsets. The order must be total for determinism.
    */
  def globalPrefixMaxBy(df: DataFrame, order: Seq[Column], valueCol: String,
      maxName: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions else spark.sessionState.conf.numShufflePartitions
    require(df.schema(valueCol).dataType == LongType,
      s"globalPrefixMaxBy needs a LongType $valueCol")
    val sorted = df.repartitionByRange(n, order: _*).sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(maxName, LongType, nullable = true)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    val partMaxes: Array[Option[Long]] = rdd.mapPartitionsWithIndex { (i, it) =>
      var m = Long.MinValue; var any = false
      it.foreach { r => any = true; val v = r.getLong(vIdx); if (v > m) m = v }
      Iterator((i, if (any) Some(m) else None))
    }.collect().sortBy(_._1).map(_._2)
    // offsets(i) = max over partitions < i (None when no prior rows exist)
    val offsets: Array[Option[Long]] = partMaxes.scanLeft(Option.empty[Long]) {
      case (Some(a), Some(c)) => Some(math.max(a, c))
      case (a, c)             => a.orElse(c)
    }.init
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { r =>
        val emit: Any = acc.map(Long.box).orNull
        val v = r.getLong(vIdx)
        acc = Some(acc.fold(v)(a => math.max(a, v)))
        Row.fromSeq(r.toSeq :+ emit)
      }
    }
    spark.createDataFrame(out, schema)
  }
}
