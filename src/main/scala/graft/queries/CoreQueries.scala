package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.engine._

/** Core relational operator queries (SURVEY.md section 2 coverage). */
object CoreQueries {

  /** Scratch space for queries that exercise write paths (CSV ingest, sink
    * roundtrip). Keyed by the sf dir name so concurrent SFs don't collide.
    */
  private def scratch(dir: String, tag: String): String =
    s"/tmp/graft_scratch/${new java.io.File(dir).getName}_$tag"

  val qs: Seq[Q] = Seq(
    Q(
      "q01_pricing_summary",
      (s, dir) => Analytics.pricingSummary(Tables.lineitem(s, dir), "1999-06-01 00:00:00"),
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(24,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,2))) AS DOUBLE) AS sum_base_price,
               CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,4))), 2) AS DOUBLE) AS sum_disc_price,
               CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,4)) * CAST(1 + CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(6,2))), 2) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(24,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(24,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1999-06-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """.stripMargin.trim)),

    // S1 CSV scan + P2 cast-normalize: write nation out as header CSV, read
    // it back with the reference's RFC-4180 options (all columns land as
    // string), assert types via one cast projection, prove lossless ingest.
    Q(
      "q02_csv_ingest",
      (s, dir) => {
        val tmp = scratch(dir, "csv_nation")
        Tables.nation(s, dir).write.mode("overwrite").option("header", "true").csv(tmp)
        val raw = Sources.csv(s, tmp)
        Cleaning.castNormalize(
            Sources.requireColumns(raw, Seq("n_nationkey", "n_name", "n_regionkey")),
            Map("n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType))
          .select("n_nationkey", "n_name", "n_regionkey")
          .orderBy("n_nationkey")
      },
      Some("""
        SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey
      """.trim)),

    // 2.8 money cleaner + both boolean decoders. The dirty inputs are
    // synthesized deterministically ("$99,010.00"-style strings, t/true/f/F/
    // NULL flags) so the oracle can reproduce them byte-for-byte.
    Q(
      "q03_money_clean",
      (s, dir) => {
        val cents = (col("p_retailprice").cast("decimal(10,2)") * 100).cast("decimal(12,2)")
        val ip = cents.cast("string")
        val dirty = concat(
          lit("$"),
          when(length(ip) > 6,
            concat(ip.substr(lit(1), length(ip) - 6), lit(","), ip.substr(length(ip) - 5, lit(6))))
            .otherwise(ip))
        val flagStr = element_at(
          array(lit("t"), lit("true"), lit("f"), lit("F"), lit(null).cast("string")),
          (col("p_size") % 5 + 1).cast("int"))
        Tables.part(s, dir)
          .select(
            col("p_partkey"),
            dirty.as("price_dirty"),
            Cleaning.cleanPrice(dirty).as("price_clean"),
            Cleaning.decodeBooleanStrict(flagStr).as("flag_strict"),
            Cleaning.decodeBooleanLax(flagStr).as("flag_lax"))
          .orderBy("p_partkey")
      },
      Some("""
        WITH d AS (
          SELECT p_partkey, p_size,
                 CAST(CAST(p_retailprice AS DECIMAL(10,2)) * 100 AS DECIMAL(12,2)) AS cents
          FROM part
        ), d2 AS (
          SELECT p_partkey, p_size,
                 '$' || CASE WHEN length(CAST(cents AS VARCHAR)) > 6
                        THEN substr(CAST(cents AS VARCHAR), 1, length(CAST(cents AS VARCHAR)) - 6)
                             || ',' || substr(CAST(cents AS VARCHAR), length(CAST(cents AS VARCHAR)) - 5, 6)
                        ELSE CAST(cents AS VARCHAR) END AS price_dirty,
                 (['t','true','f','F',NULL])[p_size % 5 + 1] AS f
          FROM d
        )
        SELECT p_partkey, price_dirty,
               CAST(regexp_replace(price_dirty, '[$,]', '', 'g') AS DECIMAL(10,2)) AS price_clean,
               lower(f) IN ('t','true') AS flag_strict,
               CASE WHEN f = 't' THEN true WHEN f = 'f' THEN false ELSE true END AS flag_lax
        FROM d2 ORDER BY p_partkey
      """.trim)),

    // P10 na.fill + P11 negative clamp over deterministically dirtied customer.
    Q(
      "q04_nafill_clamp",
      (s, dir) => {
        val dirty = Tables.customer(s, dir).select(
          col("c_custkey"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_filled"),
          nullif(col("c_nationkey"), lit(3)).as("nat_filled"),
          col("c_acctbal").as("bal_clamped"))
        Cleaning.clampNegatives(
            Cleaning.fillDefaults(dirty, stringCols = Seq("seg_filled"), numericCols = Seq("nat_filled")),
            Seq("bal_clamped"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey,
               COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'N/A') AS seg_filled,
               COALESCE(NULLIF(c_nationkey, 3), 0) AS nat_filled,
               CASE WHEN c_acctbal < 0 THEN 0 ELSE c_acctbal END AS bal_clamped
        FROM customer ORDER BY c_custkey
      """.trim)),

    // S3/S4/C5: parquet sink with maxRecordsPerFile, then read-back (the
    // reference's write-then-readback lineage truncation).
    Q(
      "q05_sink_roundtrip",
      (s, dir) => {
        val subset = Tables.orders(s, dir)
          .filter(col("o_orderkey") % 7 === 0)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        Sinks.writeAndReadBack(s, subset, scratch(dir, "sink_orders"), maxRecordsPerFile = 5000L)
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderkey % 7 = 0 ORDER BY o_orderkey
      """.trim)),

    // A3 distinct key set: shuffle carries only the projected keys.
    Q(
      "q06_distinct_pairs",
      (s, dir) => Dedup.distinctKeys(Tables.orders(s, dir), Seq("o_custkey", "o_orderstatus"))
        .orderBy("o_custkey", "o_orderstatus"),
      Some("""
        SELECT DISTINCT o_custkey, o_orderstatus FROM orders ORDER BY o_custkey, o_orderstatus
      """.trim)),

    // Deterministic keep-first dedup: one row per customer = earliest order.
    Q(
      "q07_dedup_keep_first",
      (s, dir) => Dedup.keepFirstByKey(
          Tables.orders(s, dir).select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
          keys = Seq("o_custkey"), order = Seq("o_orderdate", "o_orderkey"))
        .orderBy("o_custkey"),
      Some("""
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM orders
        QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
        ORDER BY o_custkey
      """.trim)),

    // W1 surrogate keys, scale-safe two-phase form (range partition + local
    // sort + zipWithIndex) — output provably equals the reference's
    // unpartitioned row_number + offset.
    Q(
      "q08_surrogate_keys",
      (s, dir) => Keys.surrogateKeysScalable(
          Tables.customer(s, dir).select("c_custkey", "c_name"),
          orderCol = "c_custkey", keyName = "customer_sk", offset = 1000L)
        .orderBy("c_custkey"),
      Some("""
        SELECT c_custkey, c_name,
               row_number() OVER (ORDER BY c_custkey) + 1000 AS customer_sk
        FROM customer ORDER BY c_custkey
      """.trim)),

    // S6 date spine + calendar attributes (dim_date analog, 731 rows).
    Q(
      "q09_date_dim",
      (s, dir) => DateDim.build(s, "2019-01-01", "2020-12-31").orderBy("date_id"),
      Some("""
        WITH spine AS (
          SELECT CAST(unnest(generate_series(DATE '2019-01-01', DATE '2020-12-31', INTERVAL 1 DAY)) AS DATE) AS date_id
        )
        SELECT date_id,
               CAST(year(date_id) AS INTEGER) AS year,
               CAST(quarter(date_id) AS INTEGER) AS quarter,
               CAST(month(date_id) AS INTEGER) AS month,
               CAST(weekofyear(date_id) AS INTEGER) AS week_of_year,
               CAST(day(date_id) AS INTEGER) AS day_of_month,
               CAST(dayofweek(date_id) + 1 AS INTEGER) AS day_of_week,
               CASE dayofweek(date_id) WHEN 0 THEN 'Sunday' WHEN 1 THEN 'Monday'
                    WHEN 2 THEN 'Tuesday' WHEN 3 THEN 'Wednesday' WHEN 4 THEN 'Thursday'
                    WHEN 5 THEN 'Friday' ELSE 'Saturday' END AS day_name,
               dayofweek(date_id) IN (0, 6) AS is_weekend
        FROM spine ORDER BY date_id
      """.trim))
  )
}
