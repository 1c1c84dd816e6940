package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables

class SkewSpec extends SparkSpec {

  test("saltedEquiJoin returns exactly the unsalted join's rows") {
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_partkey", "l_quantity")
    val o = Tables.orders(spark, sf0001)
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .select("l_orderkey", "o_orderstatus")
    val plain = li.join(o, Seq("l_orderkey"), "inner")
    val salted = Skew.saltedEquiJoin(li, o, "l_orderkey",
      saltFactor = 7, saltSource = "l_partkey")
    assert(salted.count() === plain.count())
    assert(salted.select(plain.columns.map(col): _*).except(plain).count() === 0)
    assert(plain.except(salted.select(plain.columns.map(col): _*)).count() === 0)
  }

  test("saltedCountByKey equals the direct grouped count") {
    val li = Tables.lineitem(spark, sf0001)
    val direct = li.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    val salted = Skew.saltedCountByKey(li, "l_orderkey",
      saltFactor = 5, saltSource = "l_partkey")
    assert(salted.except(direct).count() === 0)
    assert(direct.except(salted).count() === 0)
  }
}
