package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("cleanPrice strips $ and , and casts decimal(10,2)") {
    val df = Seq("$1,234.56", "901.00", "$12.5", null).toDF("p")
      .select(Cleaning.cleanPrice(col("p")).as("v"))
    val got = df.collect().map(r => Option(r.get(0)).map(_.toString).orNull)
    assert(got.toSeq == Seq("1234.56", "901.00", "12.50", null))
    assert(df.schema("v").dataType == DecimalType(10, 2))
  }

  test("boolean decoders: strict vs lax divergence is preserved") {
    val df = Seq("t", "true", "TRUE", "f", "F", "x", null).toDF("f").select(
      col("f"),
      Cleaning.decodeBooleanStrict(col("f")).as("strict"),
      Cleaning.decodeBooleanLax(col("f")).as("lax"))
    val rows = df.collect().map(r => (r.getString(0), Option(r.get(1)), r.getBoolean(2))).toSeq
    assert(rows == Seq(
      ("t", Some(true), true),
      ("true", Some(true), true),
      ("TRUE", Some(true), true),   // strict lowercases; lax does not match 'TRUE' -> default true
      ("f", Some(false), false),
      ("F", Some(false), true),     // divergence: lax only recognizes lowercase 'f'
      ("x", Some(false), true),     // divergence: unknown -> false vs default-true
      (null, None, true)))          // divergence: null -> null vs default-true
  }

  test("clampNegatives zeroes negatives, leaves others, single projection") {
    val df = Seq((-5, 3.5), (2, -0.1)).toDF("a", "b")
    val got = Cleaning.clampNegatives(df, Seq("a", "b")).collect().toSeq
    assert(got == Seq(Row(0, 3.5), Row(2, 0.0)))
  }

  test("fillDefaults dispatches by type") {
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("n", IntegerType), StructField("b", BooleanType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(null, null, null), Row("x", 1, true)), schema)
    val got = Cleaning.fillDefaults(df, Seq("s"), Seq("n"), Seq("b")).collect().toSeq
    assert(got == Seq(Row("N/A", 0, false), Row("x", 1, true)))
  }

  test("castNormalize casts mapped columns, passes others through") {
    val df = Seq(("1", "a", "2.5")).toDF("i", "s", "d")
    val got = Cleaning.castNormalize(df, Map("i" -> IntegerType, "d" -> DoubleType))
    assert(got.schema.map(_.dataType) == Seq(IntegerType, StringType, DoubleType))
    assert(got.collect().head == Row(1, "a", 2.5))
  }

  test("imputePrice and adjustedOrBase") {
    val df = Seq((null.asInstanceOf[String], null.asInstanceOf[String]), ("12.00", null), ("12.00", "15.00"))
      .toDF("p", "a")
      .select(
        Cleaning.imputePrice(col("p").cast("decimal(10,2)"), new java.math.BigDecimal("100.00")).as("price"),
        Cleaning.adjustedOrBase(col("a").cast("decimal(10,2)"), col("p").cast("decimal(10,2)")).as("adj"))
    val got = df.collect().map(r => (r.get(0).toString, Option(r.get(1)).map(_.toString))).toSeq
    assert(got == Seq(("100.00", None), ("12.00", Some("12.00")), ("12.00", Some("15.00"))))
  }

  test("normalizeText lowers, trims, collapses whitespace") {
    val got = Seq("  A  b\t c ").toDF("t")
      .select(Cleaning.normalizeText(col("t"))).collect().head.getString(0)
    assert(got == "a b c")
  }
}
