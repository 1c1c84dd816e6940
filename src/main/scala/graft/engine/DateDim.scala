package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generated date dimension (SURVEY.md section 2.1 S6 + final_dim_load.py:464-485).
  *
  * The spine is the reference's one SQL-string entry point —
  * `explode(sequence(to_date(start), to_date(end), interval 1 day))` — kept
  * as spark.sql for parser-path parity. Attribute derivation is the 7-way
  * when-chain day-name decode and the isin(1,7) weekend flag, verbatim
  * semantics (final_dim_load.py:470-484).
  */
object DateDim {

  def dateSpine(spark: SparkSession, start: String, end: String): DataFrame =
    spark.sql(
      s"SELECT explode(sequence(to_date('$start'), to_date('$end'), interval 1 day)) AS date_id")

  def withCalendarAttributes(spine: DataFrame): DataFrame = {
    val d = col("date_id")
    val dow = dayofweek(d)
    spine.select(
      d,
      year(d).as("year"),
      quarter(d).as("quarter"),
      month(d).as("month"),
      weekofyear(d).as("week_of_year"),
      dayofmonth(d).as("day_of_month"),
      dow.as("day_of_week"),
      when(dow === 1, "Sunday")
        .when(dow === 2, "Monday")
        .when(dow === 3, "Tuesday")
        .when(dow === 4, "Wednesday")
        .when(dow === 5, "Thursday")
        .when(dow === 6, "Friday")
        .otherwise("Saturday").as("day_name"),
      dow.isin(1, 7).as("is_weekend"))
  }

  def build(spark: SparkSession, start: String, end: String): DataFrame =
    withCalendarAttributes(dateSpine(spark, start, end))
}
