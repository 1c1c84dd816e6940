package graft.queries

import graft.Tables
import graft.engine._

/** Core relational operator queries (SURVEY.md section 2 coverage). */
object CoreQueries {

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
      """.stripMargin.trim))
  )
}
