package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The warehouse date dimension — generated, not imported.
  *
  * Column set and value semantics match the reference warehouse table
  * exactly (`loadtowh/create_warehouse_db.sql:31-43` DDL + its 7,670-row
  * seed block `:48-7717`, 2025-01-02 → 2046-01-01):
  *
  *   - `day_since_month_start` — equals day-of-month in every seed row
  *     (checked at month boundaries and 2028-02-29). NOTE the reference's
  *     re-import script (`staging/import_date_dim.py:20-29`) would map the
  *     CSV's `day_since_2005` counter into this slot instead — an
  *     inconsistency between their seed and their importer; we match the
  *     seed, i.e. the data a warehouse user actually queries.
  *   - `day_of_week_calendar` / `calendar_month_name` — English day and
  *     month names (CSV `day_of_week` / `calendar_month` renamed by the
  *     import, matching the seed values).
  *   - `week_of_year` — Sunday-start week number with days before the
  *     year's first Sunday in week 0 (strftime `%U`; CSV column
  *     `week_of_year_sunday`), stored as an unpadded STRING because the
  *     warehouse column is varchar: '0', '1', …, '52'.
  *   - `is_holiday` — constant '0' in all 7,670 seed rows (varchar).
  *   - `day_type` — 'Weekend' for Saturday/Sunday else 'Weekday'.
  *
  * We derive all of it from a date range with `sequence` + built-in date
  * functions — one narrow task, no input file, no UDFs.
  */
object DateDim {

  /** strftime-`%U` week number: `floor((doy0 + 7 - wday) / 7)` with
    * 0-based day-of-year and Sunday=0 weekday. Spark's `dayofyear` is
    * 1-based and `dayofweek` is 1=Sunday, so the two offsets cancel to
    * `(dayofyear + 7 - dayofweek) div 7`.
    */
  private def weekOfYearSunday(d: Column): Column =
    floor((dayofyear(d) + lit(7) - dayofweek(d)) / lit(7)).cast("int")

  def generate(spark: SparkSession,
      start: String = "2025-01-02", end: String = "2046-01-01"): DataFrame = {
    val days = spark.range(1)
      .select(explode(sequence(
        to_date(lit(start)), to_date(lit(end)), expr("interval 1 day"))).as("full_date"))
    val d = col("full_date")
    days.select(
      // date_sk = days since start + 1: dense, deterministic (the
      // reference's AUTO_INCREMENT over an ordered insert)
      (datediff(d, to_date(lit(start))) + 1).cast("long").as("date_sk"),
      d,
      dayofmonth(d).as("day_since_month_start"),
      date_format(d, "EEEE").as("day_of_week_calendar"),
      date_format(d, "MMMM").as("calendar_month_name"),
      dayofmonth(d).as("day_of_month"),
      dayofyear(d).as("day_of_year"),
      weekOfYearSunday(d).cast("string").as("week_of_year"),
      lit("0").as("is_holiday"),
      when(dayofweek(d).isin(1, 7), lit("Weekend"))
        .otherwise(lit("Weekday")).as("day_type"))
  }

  /** The reference's re-import path for the dimension (S14): read the
    * staging CSV and project/rename exactly the 10 warehouse columns the
    * reference importer inserts (`staging/import_date_dim.py:20-29`):
    * `date_sk, full_date, day_since_2005→day_since_month_start,
    * day_of_week→day_of_week_calendar, calendar_month→calendar_month_name,
    * day_of_month, day_of_year, year_week_sunday→week_of_year,
    * holiday→is_holiday, day_type`. Extra CSV columns (the source file
    * carries ~18) are dropped by the projection, exactly as the
    * importer's column list drops them.
    *
    * Same output schema as [[generate]] and differential-tested equal to
    * it on a seed-shaped CSV (DateDimSpec) — consistent with the seed
    * data, where the `day_since_month_start` slot holds day-of-month
    * values (so the source CSV's `day_since_2005` column, which fed the
    * seed through this very projection, holds day-of-month despite its
    * name — see the header note). [[generate]] is strictly more useful
    * (no input file); this exists for toolchain parity.
    */
  def importCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)
      .select(
        col("date_sk").cast("long").as("date_sk"),
        to_date(col("full_date")).as("full_date"),
        col("day_since_2005").cast("int").as("day_since_month_start"),
        col("day_of_week").as("day_of_week_calendar"),
        col("calendar_month").as("calendar_month_name"),
        col("day_of_month").cast("int").as("day_of_month"),
        col("day_of_year").cast("int").as("day_of_year"),
        col("year_week_sunday").as("week_of_year"),
        col("holiday").as("is_holiday"),
        col("day_type"))
}
