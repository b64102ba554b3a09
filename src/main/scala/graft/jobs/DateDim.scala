package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The date dimension — generated, not imported: the reference ships a
  * 7,670-row CSV (2025-01-02 → 2046-01-01,
  * `staging/date_dim_without_quarter.csv`, import at
  * `staging/import_date_dim.py:13-32`); we derive the same 10 columns
  * from a date range with `sequence` + built-in date functions (one
  * narrow task, no input file).
  */
object DateDim {

  def generate(spark: SparkSession,
      start: String = "2025-01-02", end: String = "2046-01-01"): DataFrame = {
    val days = spark.range(1)
      .select(explode(sequence(
        to_date(lit(start)), to_date(lit(end)), expr("interval 1 day"))).as("full_date"))
    days.select(
      // date_sk = days since start + 1: dense, deterministic (the
      // reference's AUTO_INCREMENT over an ordered insert)
      (datediff(col("full_date"), to_date(lit(start))) + 1).cast("long").as("date_sk"),
      col("full_date"),
      datediff(col("full_date"), to_date(lit("2005-01-01"))).as("day_since_2005"),
      (months_between(col("full_date"), to_date(lit("2005-01-01"))).cast("int"))
        .as("month_since_2005"),
      date_format(col("full_date"), "EEEE").as("day_of_week"),
      date_format(col("full_date"), "MMMM").as("calendar_month"),
      year(col("full_date")).as("calendar_year"),
      date_format(col("full_date"), "yyyy-MM").as("calendar_year_month"),
      dayofmonth(col("full_date")).as("day_of_month"),
      weekofyear(col("full_date")).as("week_of_year"))
  }
}
