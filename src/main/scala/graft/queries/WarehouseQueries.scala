package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Warehouse-integration wave: CDC log compaction, exact monetary
  * allocation, late-arriving-dimension handling, and snapshot-history
  * compaction — the load-side operators a lakehouse runs between ingestion
  * and publish. Same exactness discipline as the rest of the registry:
  * integer/decimal arithmetic end-to-end (money moves as cents in longs),
  * windows only over per-key frames bounded by the data model (lines per
  * order, snapshots per key), never over the whole table.
  */
object WarehouseQueries {

  /** Spark fragment: o_totalprice (a 2-decimal value carried as double) as
    * exact integer cents. The decimal(18,2) cast recovers the true 2-decimal
    * value (correctly-rounded), so *100 is exact and the long is the cent
    * count — the same per-row path the DuckDB oracles state.
    */
  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast("decimal(18,2)") * 100).cast("long")

  /** DuckDB fragment for [[cents]]. */
  private def duckCents(c: String) =
    s"CAST(CAST($c AS DECIMAL(18,2)) * 100 AS BIGINT)"

  val qs: Seq[Q] = Seq(

    // CDC net-effect collapse (Debezium-style log compaction before a
    // warehouse MERGE): an ordered op log (I/U/D per key, seq-stamped) is
    // collapsed to ONE net action per key against the base snapshot —
    // insert-then-delete cancels to nothing, update-to-same-value is a
    // noop, the final payload is the last write. Collapsing BEFORE the
    // merge is the scale move: the expensive keyed upsert touches each key
    // once however chatty the log was. Per-key last-write picks ride
    // max_by over a unique seq (one hash aggregate, map-side partial);
    // the base comparison is one full-outer join on the key.
    //
    // Fixture: base = orders with o_orderkey % 10 != 0; the log replays
    // four deterministic waves over orders (update %7, delete %13, insert
    // %10, second update %21) so keys hit every depth: multi-op keys
    // (21 = 7*3 updates twice; 91 = 7*13 update-then-delete), ghost keys
    // (inserted %10 then deleted %130), and value-identical updates are
    // all present. Output = every touched key with its net action and
    // final payload (null when the net effect is a delete or ghost).
    Q(
      "q294_cdc_collapse",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), cents(col("o_totalprice")).as("__c"))
        val base = o.filter(col("o_orderkey") % 10 =!= 0)
        val ops =
          o.filter(col("o_orderkey") % 7 === 0)
            .select(col("o_orderkey"), lit(1L).as("seq"), lit("U").as("op"),
              (col("__c") + 100L).as("val"))
          .unionByName(o.filter(col("o_orderkey") % 13 === 0)
            .select(col("o_orderkey"), lit(2L).as("seq"), lit("D").as("op"),
              lit(null).cast("long").as("val")))
          .unionByName(o.filter(col("o_orderkey") % 10 === 0)
            .select(col("o_orderkey"), lit(3L).as("seq"), lit("I").as("op"),
              col("__c").as("val")))
          .unionByName(o.filter(col("o_orderkey") % 21 === 0)
            .select(col("o_orderkey"), lit(4L).as("seq"), lit("U").as("op"),
              col("__c").as("val")))
        val last = ops.groupBy("o_orderkey")
          .agg(max_by(col("op"), col("seq")).as("last_op"),
            max_by(col("val"), col("seq")).as("last_val"))
        last.join(base.withColumnRenamed("__c", "base_val"),
            Seq("o_orderkey"), "left")
          .select(col("o_orderkey"),
            when(col("base_val").isNull && col("last_op") === "D", "noop_ghost")
              .when(col("base_val").isNull, "insert")
              .when(col("last_op") === "D", "delete")
              .when(col("last_val") === col("base_val"), "noop")
              .otherwise("update").as("net_action"),
            when(col("last_op") === "D", lit(null).cast("long"))
              .otherwise(col("last_val")).as("final_cents"))
          .orderBy("o_orderkey")
      },
      Some(s"""
        WITH o AS (
          SELECT o_orderkey, ${duckCents("o_totalprice")} AS c FROM orders
        ), base AS (
          SELECT o_orderkey, c AS base_val FROM o WHERE o_orderkey % 10 <> 0
        ), ops AS (
          SELECT o_orderkey, 1 AS seq, 'U' AS op, c + 100 AS val
          FROM o WHERE o_orderkey % 7 = 0
          UNION ALL
          SELECT o_orderkey, 2, 'D', NULL FROM o WHERE o_orderkey % 13 = 0
          UNION ALL
          SELECT o_orderkey, 3, 'I', c FROM o WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT o_orderkey, 4, 'U', c FROM o WHERE o_orderkey % 21 = 0
        ), last AS (
          SELECT o_orderkey, arg_max(op, seq) AS last_op,
                 arg_max(val, seq) AS last_val
          FROM ops GROUP BY o_orderkey
        )
        SELECT last.o_orderkey,
               CASE WHEN base_val IS NULL AND last_op = 'D' THEN 'noop_ghost'
                    WHEN base_val IS NULL THEN 'insert'
                    WHEN last_op = 'D' THEN 'delete'
                    WHEN last_val = base_val THEN 'noop'
                    ELSE 'update' END AS net_action,
               CAST(CASE WHEN last_op = 'D' THEN NULL ELSE last_val END
                 AS BIGINT) AS final_cents
        FROM last LEFT JOIN base ON last.o_orderkey = base.o_orderkey
        ORDER BY last.o_orderkey
      """.trim)),

    // Largest-remainder proration — exact integer allocation of an
    // order-level rebate across its lineitems, the invoice/ledger operator
    // where "multiply by the ratio and round" silently creates or destroys
    // cents. Floor shares are integer division (rebate*w_i div W), and the
    // leftover cents (rebate - sum of floors, provably < n_lines) go to the
    // lines with the LARGEST division remainders, tie-broken by line
    // number — so per-order allocations always sum to the rebate exactly,
    // pinned by the emitted exact_total flag (1 for every order, by
    // construction AND by oracle). The remainder ranking is a per-order
    // window — a frame bounded at 7 lines by the data model, never a
    // corpus-scale sort.
    Q(
      "q295_proration",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            cents(col("l_extendedprice")).as("w"))
        val order = li.groupBy("l_orderkey")
          .agg(sum(col("w")).as("bigw"), count(lit(1)).as("n_lines"))
          .select(col("l_orderkey"), col("bigw").cast("long").as("wsum"),
            col("n_lines"))
          // rebate: 5% of the order's line total, floored to the cent —
          // integer div end-to-end, no double division anywhere
          .withColumn("rebate", expr("(wsum * 5) div 100"))
        val shared = li.join(order, "l_orderkey")
          .withColumn("base", expr("(rebate * w) div wsum"))
          .withColumn("rem", expr("(rebate * w) % wsum"))
        val byOrder = Window.partitionBy("l_orderkey")
        val ranked = shared
          .withColumn("deficit", (col("rebate") - sum(col("base")).over(byOrder)))
          // (l_orderkey, l_linenumber) is NOT unique in this data, so the
          // remainder rank adds w: remaining ties are then bit-identical
          // rows, and which physical twin takes the +1 cent cannot change
          // the output multiset.
          .withColumn("r", row_number().over(
            byOrder.orderBy(col("rem").desc, col("l_linenumber"), col("w"))))
          .withColumn("alloc_cents",
            (col("base") + when(col("r") <= col("deficit"), 1L).otherwise(0L))
              .cast("long"))
        ranked
          .withColumn("exact_total",
            when(sum(col("alloc_cents")).over(byOrder) === col("rebate"), 1L)
              .otherwise(0L))
          .select(col("l_orderkey"), col("l_linenumber"), col("alloc_cents"),
            col("exact_total"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some(s"""
        WITH li AS (
          SELECT l_orderkey, l_linenumber, ${duckCents("l_extendedprice")} AS w
          FROM lineitem
        ), ord AS (
          SELECT l_orderkey, CAST(SUM(w) AS BIGINT) AS wsum,
                 CAST(SUM(w) * 5 // 100 AS BIGINT) AS rebate
          FROM li GROUP BY l_orderkey
        ), shared AS (
          SELECT li.l_orderkey, l_linenumber, w, wsum, rebate,
                 rebate * w // wsum AS base, rebate * w % wsum AS rem
          FROM li JOIN ord ON li.l_orderkey = ord.l_orderkey
        ), ranked AS (
          SELECT *,
                 rebate - SUM(base) OVER (PARTITION BY l_orderkey) AS deficit,
                 row_number() OVER (PARTITION BY l_orderkey
                   ORDER BY rem DESC, l_linenumber, w) AS r
          FROM shared
        ), alloc AS (
          SELECT l_orderkey, l_linenumber, rebate,
                 CAST(base + CASE WHEN r <= deficit THEN 1 ELSE 0 END AS BIGINT)
                   AS alloc_cents
          FROM ranked
        )
        SELECT l_orderkey, l_linenumber, alloc_cents,
               CAST(CASE WHEN SUM(alloc_cents) OVER (PARTITION BY l_orderkey)
                 = rebate THEN 1 ELSE 0 END AS BIGINT) AS exact_total
        FROM alloc ORDER BY l_orderkey, l_linenumber
      """.trim)),

    // Late-arriving dimension (inferred members): facts can reference
    // dimension keys the dim load hasn't delivered yet; the warehouse
    // answer is to MANUFACTURE placeholder rows for the missing keys
    // (flagged inferred, attributes defaulted) so the fact join never
    // drops revenue, then overwrite them when the real rows land. The
    // fixture withholds every 17th customer from the dim; the query mines
    // the missing keys from the facts (distinct + left_anti — one
    // aggregate, one join), publishes dim ∪ inferred, re-joins the facts,
    // and emits the member_type rollup. unresolved_after counts fact rows
    // that STILL drop on the repaired dim — pinned 0 by the oracle, which
    // is the whole point of the pattern.
    Q(
      "q296_inferred_members",
      (s, dir) => {
        val facts = Tables.orders(s, dir)
          .select(col("o_custkey"), cents(col("o_totalprice")).as("__c"))
        val dim = Tables.customer(s, dir)
          .filter(col("c_custkey") % 17 =!= 0)
          .select(col("c_custkey"), lit(0L).as("inferred"))
        val missing = facts.select(col("o_custkey").as("c_custkey")).distinct()
          .join(dim, Seq("c_custkey"), "left_anti")
          .select(col("c_custkey"), lit(1L).as("inferred"))
        val dim2 = dim.unionByName(missing)
        val joined = facts.join(dim2, facts("o_custkey") === dim2("c_custkey"), "left")
        joined
          .groupBy(when(col("inferred") === 1L, "inferred").otherwise("regular")
            .as("member_type"))
          .agg(countDistinct(col("c_custkey")).as("n_customers"),
            count(lit(1)).as("n_orders"),
            sum(col("__c")).cast("long").as("revenue_cents"),
            sum(when(col("c_custkey").isNull, 1L).otherwise(0L))
              .as("unresolved_after"))
          .orderBy("member_type")
      },
      Some(s"""
        WITH facts AS (
          SELECT o_custkey, ${duckCents("o_totalprice")} AS c FROM orders
        ), dim AS (
          SELECT c_custkey, 0 AS inferred FROM customer WHERE c_custkey % 17 <> 0
        ), missing AS (
          SELECT DISTINCT o_custkey AS c_custkey, 1 AS inferred FROM facts
          WHERE o_custkey NOT IN (SELECT c_custkey FROM dim)
        ), dim2 AS (
          SELECT * FROM dim UNION ALL SELECT * FROM missing
        )
        SELECT CASE WHEN inferred = 1 THEN 'inferred' ELSE 'regular' END
                 AS member_type,
               CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(c) AS BIGINT) AS revenue_cents,
               CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS unresolved_after
        FROM facts LEFT JOIN dim2 ON o_custkey = c_custkey
        GROUP BY 1 ORDER BY member_type
      """.trim)),

    // Snapshot-to-SCD2 compaction: the OTHER way history arrives — not as
    // change deltas (q17's merge) but as full daily snapshots, which must
    // be collapsed into validity ranges by dropping the days where nothing
    // changed. Runs-of-equal-value become [valid_from, valid_to) intervals
    // via the change-flag + running-island-count idiom; every window is
    // per-key over at most 4 snapshot rows (bounded by the snapshot count,
    // not the table), so the shape survives any customer count. The
    // fixture changes each key's balance once (day k%3+1) and every 11th
    // key a second time (day 3), so single-range, two-range, and
    // three-range keys all exist; is_current marks the open range.
    Q(
      "q297_snapshot_scd2",
      (s, dir) => {
        val base = Tables.customer(s, dir)
          .select(col("c_custkey"), cents(col("c_acctbal")).as("b0"))
        val snaps = base.select(col("c_custkey"), col("b0"),
            explode(sequence(lit(0), lit(3))).as("snap_day"))
          .withColumn("attr_cents",
            col("b0")
              + when(col("snap_day") >= pmod(col("c_custkey"), lit(3)) + 1, 100L)
                .otherwise(0L)
              + when(col("c_custkey") % 11 === 0 && col("snap_day") >= 3, 50L)
                .otherwise(0L))
          .drop("b0")
        val byKey = Window.partitionBy("c_custkey").orderBy("snap_day")
        snaps
          .withColumn("changed",
            when(lag(col("attr_cents"), 1).over(byKey).isNull ||
              lag(col("attr_cents"), 1).over(byKey) =!= col("attr_cents"), 1L)
              .otherwise(0L))
          .withColumn("range_id",
            sum(col("changed")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("c_custkey", "range_id")
          .agg(min(col("snap_day")).as("valid_from"),
            max(col("snap_day")).as("last_day"),
            min(col("attr_cents")).as("attr_cents"))
          .withColumn("valid_to",
            when(col("last_day") === 3, lit(null).cast("long"))
              .otherwise(col("last_day") + 1))
          .withColumn("is_current",
            when(col("valid_to").isNull, 1L).otherwise(0L))
          .select(col("c_custkey"), col("valid_from").cast("long").as("valid_from"),
            col("valid_to"), col("attr_cents"), col("is_current"))
          .orderBy("c_custkey", "valid_from")
      },
      Some(s"""
        WITH snaps AS (
          SELECT c_custkey,
                 ${duckCents("c_acctbal")}
                   + CASE WHEN d >= (c_custkey % 3) + 1 THEN 100 ELSE 0 END
                   + CASE WHEN c_custkey % 11 = 0 AND d >= 3 THEN 50 ELSE 0 END
                   AS attr_cents,
                 d AS snap_day
          FROM customer, generate_series(0, 3) AS t(d)
        ), flagged AS (
          SELECT *,
                 CASE WHEN lag(attr_cents) OVER w IS NULL
                        OR lag(attr_cents) OVER w <> attr_cents
                      THEN 1 ELSE 0 END AS changed
          FROM snaps
          WINDOW w AS (PARTITION BY c_custkey ORDER BY snap_day)
        ), ranged AS (
          SELECT *, SUM(changed) OVER (PARTITION BY c_custkey ORDER BY snap_day
                      ROWS UNBOUNDED PRECEDING) AS range_id
          FROM flagged
        )
        SELECT c_custkey,
               CAST(MIN(snap_day) AS BIGINT) AS valid_from,
               CAST(CASE WHEN MAX(snap_day) = 3 THEN NULL
                         ELSE MAX(snap_day) + 1 END AS BIGINT) AS valid_to,
               CAST(MIN(attr_cents) AS BIGINT) AS attr_cents,
               CAST(CASE WHEN MAX(snap_day) = 3 THEN 1 ELSE 0 END AS BIGINT)
                 AS is_current
        FROM ranged GROUP BY c_custkey, range_id
        ORDER BY c_custkey, valid_from
      """.trim)),

    // Small-files compaction gate (S11, previously spec-only): land orders
    // as 24 deliberately-small parquet files, compact the directory to 3
    // via the temp-write + rename swap (never overwriting a directory
    // being lazily read), and emit BOTH the file counts and the full
    // content summary of the read-back. The file counts are deterministic
    // (round-robin repartition leaves no empty file at any sf; the
    // compactor writes exactly targetFiles), so the oracle pins them as
    // literals while the content columns prove the rewrite lost nothing.
    Q(
      "q298_compaction_gate",
      (s, dir) => {
        import graft.engine.{Scratch, Sinks}
        val path = Scratch.dir(s, dir, "compact_gate")
        def nFiles: Long = {
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet")).toLong
        }
        Tables.orders(s, dir)
          .select(col("o_orderkey"), cents(col("o_totalprice")).as("__c"))
          .repartition(24)
          .write.mode("overwrite").parquet(path)
        val before = nFiles
        Sinks.compactParquet(s, path, targetFiles = 3)
        val after = nFiles
        s.read.parquet(path)
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("o_orderkey")).as("n_keys"),
            sum(col("__c")).cast("long").as("revenue_cents"))
          .select(lit(before).as("files_before"), lit(after).as("files_after"),
            col("n_rows"), col("n_keys"), col("revenue_cents"))
      },
      Some(s"""
        SELECT CAST(24 AS BIGINT) AS files_before, CAST(3 AS BIGINT) AS files_after,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
               CAST(SUM(${duckCents("o_totalprice")}) AS BIGINT) AS revenue_cents
        FROM orders
      """.trim)),

    // Dynamic partition overwrite gate (S13, previously spec-only): a
    // priority-partitioned orders table gets ONE partition reprocessed
    // (every amount bumped 7 cents) through partitionOverwriteMode=dynamic
    // — the incremental-pipeline staple. The read-back rollup proves the
    // sibling partitions survived untouched (static overwrite would have
    // dropped them: n_rows collapses and every non-patched row vanishes)
    // and the patched partition carries exactly the bumped values; the
    // oracle restates the final table per-partition from the raw orders.
    Q(
      "q299_dynamic_overwrite_gate",
      (s, dir) => {
        import graft.engine.{Scratch, Sinks}
        val path = Scratch.dir(s, dir, "dynover_gate")
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority"),
            cents(col("o_totalprice")).as("amount_cents"))
        Sinks.writePartitioned(o, path, Seq("o_orderpriority"))
        val patch = o.filter(col("o_orderpriority") === "3-MEDIUM")
          .withColumn("amount_cents", col("amount_cents") + 7L)
        Sinks.overwritePartitionsDynamic(patch, path, Seq("o_orderpriority"))
        s.read.parquet(path)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("amount_cents")).cast("long").as("total_cents"))
          .orderBy("o_orderpriority")
      },
      Some(s"""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(${duckCents("o_totalprice")}
                 + CASE WHEN o_orderpriority = '3-MEDIUM' THEN 7 ELSE 0 END)
                 AS BIGINT) AS total_cents
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
      """.trim)),

    // Range-clustered write gate (S12, previously spec-only): lineitem
    // clustered by l_orderkey into 8 range-partitioned sorted files, then
    // audited from the read-back's hidden _metadata.file_path: per-file
    // [min, max] key ranges must be PAIRWISE DISJOINT — the property that
    // lets parquet footer stats skip whole files for range predicates at
    // 100 TB. Disjointness is deterministic even though the sampled range
    // boundaries are not (equal keys land in one partition, so ranges can
    // touch but never interleave); file names stay internal — only the
    // aggregate verdict row is emitted, so the oracle can pin it.
    Q(
      "q300_range_cluster_gate",
      (s, dir) => {
        import graft.engine.{Scratch, Sinks}
        val path = Scratch.dir(s, dir, "rangeclust_gate")
        val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey"))
        Sinks.writeRangeClustered(li, path, "l_orderkey", numFiles = 8)
        val back = s.read.parquet(path)
        val files = back
          .groupBy(col("_metadata.file_path").as("f"))
          .agg(min(col("l_orderkey")).as("lo"), max(col("l_orderkey")).as("hi"),
            count(lit(1)).as("n"))
        val fileStats = files.agg(count(lit(1)).as("n_files"),
          sum(col("n")).as("n_rows"))
        val overlaps = files.as("a")
          .join(files.as("b"), col("a.f") < col("b.f"))
          .filter(col("a.lo") <= col("b.hi") && col("b.lo") <= col("a.hi"))
          .agg(count(lit(1)).as("overlap_pairs"))
        val keys = back.agg(countDistinct(col("l_orderkey")).as("n_keys"))
        fileStats.crossJoin(broadcast(overlaps)).crossJoin(broadcast(keys))
          .select(col("n_files"), col("overlap_pairs"),
            col("n_rows").cast("long").as("n_rows"), col("n_keys"))
      },
      Some("""
        SELECT CAST(8 AS BIGINT) AS n_files, CAST(0 AS BIGINT) AS overlap_pairs,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_keys
        FROM lineitem
      """.trim)),

    // Business-day arithmetic: order due dates 5 business days out,
    // skipping weekends and a fixed holiday list — the calendar operator
    // every SLA/settlement pipeline needs and naive date_add gets wrong.
    // The trick is the BUSINESS-DAY INDEX on the date spine (bidx(d) =
    // business days on or before d): due(d, 5) is simply the business day
    // whose index is bidx(d)+5 — correct whether d itself is a business
    // day or not, with no iterative skipping. The spine's running index is
    // an unpartitioned window over a CALENDAR-BOUNDED frame (~2.4k rows at
    // any data scale — whitelisted in the registry window sweep alongside
    // q10's decode dim); both joins broadcast the tiny calendar.
    Q(
      "q301_business_days",
      (s, dir) => {
        val spine = graft.engine.DateDim
          .dateSpine(s, "1995-01-01", "2001-08-31")
        val isHoliday = date_format(col("date_id"), "MM-dd")
          .isin("07-04", "12-25")
        val isBday = !dayofweek(col("date_id")).isin(1, 7) && !isHoliday
        val cal = spine
          .withColumn("is_bday", when(isBday, 1L).otherwise(0L))
          .withColumn("bidx", sum(col("is_bday")).over(
            Window.orderBy("date_id")
              .rowsBetween(Window.unboundedPreceding, 0)))
        val bdays = cal.filter(col("is_bday") === 1L)
          .select(col("bidx").as("target_idx"), col("date_id").as("due_date"))
        Tables.orders(s, dir)
          .select(col("o_orderkey"), to_date(col("o_orderdate")).as("order_date"))
          .join(broadcast(cal.select(col("date_id"), col("bidx"))),
            col("order_date") === col("date_id"))
          .withColumn("target_idx", col("bidx") + 5L)
          .join(broadcast(bdays), "target_idx")
          .select(col("o_orderkey"), col("order_date"), col("due_date"))
          .orderBy("o_orderkey")
      },
      Some("""
        WITH spine AS (
          SELECT CAST(unnest(generate_series(DATE '1995-01-01',
                   DATE '2001-08-31', INTERVAL 1 DAY)) AS DATE) AS d
        ), cal AS (
          SELECT d,
                 CASE WHEN dayofweek(d) IN (0, 6)
                        OR strftime(d, '%m-%d') IN ('07-04', '12-25')
                      THEN 0 ELSE 1 END AS is_bday
          FROM spine
        ), idx AS (
          SELECT d, is_bday,
                 SUM(is_bday) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS bidx
          FROM cal
        ), bdays AS (
          SELECT bidx AS target_idx, d AS due_date FROM idx WHERE is_bday = 1
        )
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date, due_date
        FROM orders
        JOIN idx ON CAST(o_orderdate AS DATE) = idx.d
        JOIN bdays ON idx.bidx + 5 = bdays.target_idx
        ORDER BY o_orderkey
      """.trim))
  )
}
