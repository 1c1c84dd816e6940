package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables

/** The window-rank-filter -> heap-top-k optimizer rewrite (TopKRankRewrite,
  * installed session-wide by GraftFunctions.ensureRegistered).
  */
class TopKRankRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def ranked(k: Int): DataFrame =
    Tables.orders(spark, sf0001)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rank", row_number().over(
        Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rank") <= k)

  private def withRewriteOff[A](body: => A): A = {
    spark.conf.set("spark.graft.topkRewrite.enabled", "false")
    try body finally spark.conf.unset("spark.graft.topkRewrite.enabled")
  }

  test("rank <= k is rewritten to TopKPerKeyExec: no Window, no Sort") {
    val physical = ranked(3).queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerKey ["), physical)
    assert(!physical.contains("Window "), s"window must be rewritten away:\n$physical")
    assert(!physical.contains("Sort ["), s"heap top-k must not sort:\n$physical")
    assert(!physical.contains("WindowGroupLimit"),
      s"group-limit pre-pass must be stripped (it re-sorts):\n$physical")
  }

  test("rewritten results match the plain window plan") {
    val got = ranked(3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val want = withRewriteOff {
      ranked(3).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    }
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("rank = k keeps the equality filter on top of the heap node") {
    val eq = Tables.orders(spark, sf0001)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rank", row_number().over(
        Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rank") === 2)
    val physical = eq.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerKey ["), physical)
    val got = eq.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = withRewriteOff {
      eq.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got === want)
    assert(eq.collect().forall(_.getInt(3) == 2))
  }

  test("non-rewritable shapes keep the window") {
    val base = Tables.orders(spark, sf0001)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    // dense_rank has tie semantics a k-heap cannot reproduce
    val dense = base.withColumn("rank", dense_rank().over(
        Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rank") <= 3)
    assert(dense.queryExecution.executedPlan.toString.contains("Window "))
    // a lower bound is not a top-k
    val lower = base.withColumn("rank", row_number().over(
        Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rank") > 3)
    assert(lower.queryExecution.executedPlan.toString.contains("Window "))
  }

  test("downstream projections over the preserved rank attribute resolve") {
    val out = ranked(2)
      .groupBy("rank").agg(count(lit(1)).as("n"))
      .orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.map(_._1).toSeq === Seq(1, 2))
    assert(out.forall(_._2 > 0))
  }
}
