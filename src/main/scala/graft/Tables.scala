package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the harness test tables (TESTDATA.md): one parquet file per
  * table under a scale-factor directory. Mirrors the reference's
  * path-addressed table model (csv_to_parquet.py:13-19 reads path constants;
  * final_dim_load.py:31-33 reads silver parquet back) but parameterized —
  * no hardcoded bucket paths.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  /** events.ts is INT64 TIMESTAMP(NANOS) parquet, which Spark 4 refuses to
    * read as a timestamp. Read it as raw nanos (legacy conf, set at session
    * construction in Bench/Verify/specs — NOT mutated here, so co-running
    * queries never see a reader flip the conf under them) and convert with
    * integer division — nanos-since-epoch (~1.7e18) exceeds double's 53-bit
    * mantissa, so float math here would corrupt timestamps. Truncation to
    * micros matches DuckDB's own ns->us narrowing.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "set spark.sql.legacy.parquet.nanosAsLong=true at session construction to read events")
    read(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
