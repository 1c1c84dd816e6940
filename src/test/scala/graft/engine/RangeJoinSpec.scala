package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed range join equals the naive theta join on real data") {
    val pts = Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_acctbal").cast("double").as("bal"))
    val ivs = Tables.supplier(spark, sf0001).select(col("s_suppkey"),
      (col("s_acctbal").cast("double") - 25.0).as("lo"),
      (col("s_acctbal").cast("double") + 25.0).as("hi"))
    val bucketed = RangeJoin.pointInInterval(pts, ivs, "bal", "lo", "hi", step = 50.0)
    val naive = RangeJoin.pointInIntervalNaive(pts, ivs, "bal", "lo", "hi")
      .select(bucketed.columns.map(col): _*)
    assert(bucketed.except(naive).count() === 0)
    assert(naive.except(bucketed).count() === 0)
    assert(bucketed.count() > 0, "fixture should produce at least one match")
  }

  test("half-open boundaries and multi-bucket intervals") {
    val pts = Seq((1L, 0.0), (2L, 10.0), (3L, 9.999), (4L, -5.0)).toDF("pid", "v")
    // interval [0, 10) spans buckets at step=3; [-10, 0) catches the negative
    val ivs = Seq((100L, 0.0, 10.0), (200L, -10.0, 0.0)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(pts, ivs, "v", "lo", "hi", step = 3.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // v=0.0 is IN [0,10) and NOT in [-10,0) (half-open); v=10.0 is out
    assert(out === Set((1L, 100L), (3L, 100L), (4L, 200L)))
  }
}
