package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join layer (SURVEY.md section 2.3, J1-J11).
  *
  * The reference's join surface: equi inner joins, left_anti for new-key /
  * unchanged-key detection (final_dim_load.py:131-135), explicit broadcast
  * hints on dimension joins (final_fact_load.py:62, :99, :111), one composite
  * decimal-key join (lat/long decimal(10,6), final_fact_load.py:112-113), and
  * a distinct-key overlap guard (final_fact_load.py:47-58).
  *
  * Scale notes: dimension joins are broadcast by construction (no shuffle of
  * the fact side); the fact-to-fact join (lineitem-orders analog of J11)
  * shuffles on the join key once and AQE handles skew. Nothing here caches
  * or re-evaluates — the reference's triple-evaluation guard pattern is NOT
  * reproduced in benchmarked paths (BASELINE.md).
  */
object StarJoin {

  /** J10: inner join with an explicit broadcast hint on the dimension. */
  def broadcastDimJoin(fact: DataFrame, dim: DataFrame, cond: Column): DataFrame =
    fact.join(broadcast(dim), cond, "inner")

  /** J2/J6: rows of `incoming` whose key is absent from `existing`. */
  def newKeys(incoming: DataFrame, existing: DataFrame, key: String): DataFrame =
    incoming.join(existing.select(key), Seq(key), "left_anti")

  /** Left-semi: rows of `df` whose key exists in `other` (EXISTS). */
  def existingKeys(df: DataFrame, other: DataFrame, key: String): DataFrame =
    df.join(other.select(key), Seq(key), "left_semi")

  /** J9 sanity probe: count of overlapping distinct keys. The reference
    * exit(1)s when zero (final_fact_load.py:56-58); callers decide.
    */
  def keyOverlapCount(a: DataFrame, aKey: String, b: DataFrame, bKey: String): Long =
    a.select(col(aKey)).distinct()
      .join(b.select(col(bKey)).distinct(), col(aKey) === col(bKey), "inner")
      .count()

  /** Banding when-chain (final_fact_load.py:137-141): thresholds are upper
    * bounds checked in order, final label is the otherwise-branch.
    */
  def band(c: Column, cuts: Seq[(Double, String)], beyond: String): Column =
    cuts.foldLeft(Option.empty[Column]) { case (acc, (cut, label)) =>
      Some(acc.map(_.when(c <= cut, label)).getOrElse(when(c <= cut, label)))
    }.map(_.otherwise(beyond)).getOrElse(lit(beyond))

  /** Star-schema fact assembly (final_fact_load.py:60-143 re-expressed over
    * the test star schema). Stage shape mirrors the reference:
    * broadcast dim joins (part, supplier, nation, region, customer), ONE
    * shuffle join fact-to-fact (lineitem-orders, the J11 "no hint" analog),
    * and a composite decimal-key dimension join (distinct (discount,tax)
    * pairs with surrogate ids — the dim_location lat/long pattern,
    * final_fact_load.py:112-113). The fact key is deterministic
    * (orderkey*100+linenumber), NOT monotonically_increasing_id — the
    * reference's id is partitioning-dependent and can't be oracle-compared
    * (SURVEY.md section 4 hazard 2).
    */
  def assembleStarFact(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame, part: DataFrame, supplier: DataFrame): DataFrame = {
    val disc6 = col("l_discount").cast("decimal(10,6)")
    val tax6 = col("l_tax").cast("decimal(10,6)")
    // dim_location analog: distinct composite decimal key + dense surrogate.
    // Cardinality is bounded (discount x tax grid), so the global window is
    // safe at any fact size.
    val dimDiscTax = lineitem
      .select(disc6.as("disc"), tax6.as("tax")).distinct()
      .withColumn("disc_tax_id",
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col("disc"), col("tax"))))

    val ext = col("l_extendedprice").cast("decimal(18,2)")
    val ldisc = col("l_discount").cast("decimal(18,2)")

    // Broadcast hints ONLY on bounded dimensions (nation: 25 rows, region: 5,
    // dimDiscTax: discount x tax grid). part/customer/supplier scale linearly
    // with the data (150k x sf customers) — a forced broadcast of those OOMs
    // at the 100 TB design point; AQE picks broadcast-vs-shuffle for them at
    // runtime from actual sizes (the reference's own autoBroadcastJoinThreshold
    // mechanism, final_fact_load.py:9).
    // C4 hash pre-partitioning (final_fact_load.py:44): spread the fact by
    // its join key up front, then put the l_orderkey equi-join FIRST so it
    // reuses that partitioning (Catalyst sees HashPartitioning(l_orderkey)
    // already satisfied and shuffles only the orders side). Skew is smoothed
    // before the join instead of inside it; all joins are inner, so the
    // reorder is semantics-free.
    // Explicit N: repartition(col) with no count is eligible for AQE
    // size-based coalescing, which would fold the byte-modest fact shuffle
    // down and serialize the whole join chain behind it.
    val li = lineitem.repartition(
      lineitem.sparkSession.sessionState.conf.numShufflePartitions, col("l_orderkey"))
    val stage1 = li.join(orders, col("l_orderkey") === col("o_orderkey"), "inner")
    val stage2 = stage1.join(part, col("l_partkey") === col("p_partkey"), "inner")
    val stage3 = stage2
      .join(customer, col("o_custkey") === col("c_custkey"), "inner")
      .join(supplier, col("l_suppkey") === col("s_suppkey"), "inner")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"), "inner")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"), "inner")
    val stage4 = stage3.join(broadcast(dimDiscTax),
      disc6 === col("disc") && tax6 === col("tax"), "inner")

    stage4.select(
      (col("l_orderkey") * 100 + col("l_linenumber")).as("fact_id"),
      col("l_orderkey"), col("l_linenumber"),
      col("p_brand"), col("s_name"), col("c_mktsegment"),
      col("n_name").as("supp_nation"), col("r_name").as("supp_region"),
      col("disc_tax_id"),
      round(ext * (lit(1) - ldisc), 2).cast("double").as("revenue"),
      band(col("l_quantity"), Seq(7.0 -> "short", 30.0 -> "medium"), "long").as("qty_band"),
      (col("l_returnflag") === "R").as("is_returned"))
  }
}
