package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source readers (SURVEY.md section 2.1, S1-S2).
  *
  * The reference ingests CSV header-aware, multi-line, RFC-4180 quote-escaped
  * (csv_to_parquet.py:22-27) with every column landing as string, then asserts
  * types via cast (Cleaning.castNormalize). `csv` reproduces that read; at
  * scale prefer `csvWithSchema` — an explicit StructType skips the
  * header-probe job AND lets the reader parse directly into typed columns
  * (one less projection; malformed rows surface at scan time).
  */
object Sources {

  val csvOptions: Map[String, String] = Map(
    "header" -> "true",
    "multiLine" -> "true",
    "quote" -> "\"",
    "escape" -> "\"")

  /** Reference-faithful read: all columns StringType (no inferSchema).
    * SCALE CAVEAT: `multiLine=true` makes each CSV file non-splittable (a
    * record may span a newline, so Spark assigns one task per FILE). Fine for
    * many modest files; for few huge files use [[csvSplittable]] and
    * pre-clean embedded newlines upstream.
    */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.options(csvOptions).csv(path)

  /** Scale-preferred read: parse straight into the declared schema. */
  def csvWithSchema(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.options(csvOptions).schema(schema).csv(path)

  /** Splittable variant (multiLine off): records cannot span lines, so large
    * files are split into many tasks — the 100 TB ingestion path when the
    * producer guarantees newline-free fields.
    */
  def csvSplittable(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.options(csvOptions - "multiLine").schema(schema).csv(path)

  /** Permissive typed read with corrupt-record capture: rows that fail to
    * parse into `schema` land whole in `_corrupt_record` (other columns
    * null) instead of killing the job — the quarantine pattern for dirty
    * feeds at scale (count/route the bad rows, never FAILFAST a 100 TB
    * load). Spark requires the corrupt column declared in the read schema;
    * filtering on it alone also requires a materialization barrier
    * (`cache`) per the Spark docs — callers splitting good/bad should
    * cache the returned frame first.
    */
  val CorruptCol = "_corrupt_record"
  def csvPermissive(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.options(csvOptions - "multiLine")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(schema.add(CorruptCol, org.apache.spark.sql.types.StringType))
      .csv(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSON-lines read with a declared schema. Schema-first for the same
    * reasons as [[csvWithSchema]] — inference costs a full extra pass over
    * the data (prohibitive at scale) and may widen types run-to-run; a
    * declared StructType parses in one pass into stable types. One JSON
    * object per line keeps files splittable (the multiLine option has the
    * same one-task-per-file hazard as CSV).
    */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Schema-evolution read: union the schemas of all files in the directory
    * (columns absent in older files surface as nulls). Off by default in
    * Spark because footer-merging costs a pass over file metadata — turn it
    * on per-read exactly where a table has actually evolved.
    */
  def parquetMergedSchema(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Schema validation probe (final_dim_load.py:97-101): fail fast with the
    * full missing-column list instead of a mid-job analysis error.
    */
  def requireColumns(df: DataFrame, required: Seq[String]): DataFrame = {
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing required columns: ${missing.mkString(", ")}")
    df
  }
}
