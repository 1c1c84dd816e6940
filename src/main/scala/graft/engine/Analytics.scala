package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped-aggregation / window / sort / set-op layer.
  *
  * The reference touches aggregation only as global max / dropDuplicates /
  * distinct / count (SURVEY.md section 2.4) and windows only as an
  * unpartitioned row_number (section 2.5); this module is the declared
  * generalization (SURVEY.md section 7, M6): full groupBy().agg(), partitioned
  * windows with frames, top-k, set ops — all Catalyst built-ins, all
  * whole-stage-codegen friendly.
  */
object Analytics {

  /** TPC-H Q1-shaped pricing summary: scan -> filter -> grouped agg -> sort.
    * Filter and the two grouping columns are the only columns read, so the
    * parquet scan prunes to 7 of 11 columns and pushes the shipdate predicate
    * down (verify with .explain: PushedFilters + ReadSchema).
    */
  def pricingSummary(lineitem: DataFrame, cutoff: String): DataFrame = {
    val ext = col("l_extendedprice").cast("decimal(18,2)")
    val disc = col("l_discount").cast("decimal(18,2)")
    val tax = col("l_tax").cast("decimal(18,2)")
    // Intermediate casts pin decimal widths below both engines' 38-digit cap
    // so the arithmetic is exact (no precision-loss rounding) in Spark AND in
    // the DuckDB oracle. True scales: disc_price 4, charge 6 — preserved.
    val discPrice = (ext * (lit(1) - disc)).cast("decimal(24,4)")
    val charge = discPrice * (lit(1) + tax).cast("decimal(6,2)")
    lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit(cutoff)))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Exact.sumD(col("l_quantity")).as("sum_qty"),
        Exact.sumD(col("l_extendedprice")).as("sum_base_price"),
        Exact.sumProductD(discPrice).as("sum_disc_price"),
        Exact.sumProductD(charge).as("sum_charge"),
        Exact.avgD(col("l_quantity")).as("avg_qty"),
        Exact.avgD(col("l_extendedprice")).as("avg_price"),
        Exact.avgD(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Section 2.6 top-k: global sort + limit. Catalyst plans this as
    * TakeOrderedAndProject — per-partition heaps then a k-row merge on the
    * driver, NOT a full sort; exactly what you want at 100 TB. Order columns
    * must be a total order for determinism (callers add a key tiebreak).
    */
  def topK(df: DataFrame, k: Int, order: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** A1/A4 global aggregates as a single-row frame (the reference collects
    * these as driver-side watermarks; as a query it is one partial+final agg).
    */
  def globalStats(orders: DataFrame): DataFrame =
    orders.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("o_custkey")).as("n_customers"),
      min(col("o_orderdate")).as("first_order"),
      max(col("o_orderdate")).as("last_order"),
      Exact.sumD(col("o_totalprice")).as("total_sales"))

  /** Section 2.5 generalized: partitioned windows with ranking, offsets and
    * a running frame, all over one shuffle on the partition key.
    */
  def customerOrderWindows(orders: DataFrame): DataFrame = {
    val byTime = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
      row_number().over(byTime).as("order_seq"),
      rank().over(byPrice).as("price_rank"),
      dense_rank().over(byPrice).as("price_dense_rank"),
      lag(col("o_totalprice"), 1).over(byTime).as("prev_price"),
      lead(col("o_totalprice"), 1).over(byTime).as("next_price"),
      sum(col("o_totalprice").cast("decimal(18,2)"))
        .over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double").as("running_spend"))
  }
}
