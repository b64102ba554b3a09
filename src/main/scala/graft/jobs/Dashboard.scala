package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dashboard data layer (`datamart/app.py:48-60`): one
  * (group, value) frame per mart table, ready for a chart renderer.
  * The reference's Flask/Plotly rendering is presentation, not engine —
  * the engine's contract ends at these frames (S15: mart reads +
  * driver-side collect).
  */
object Dashboard {

  /** The four reference charts (`config.xml:86-123`). */
  val Charts: Seq[(String, String, String)] = Seq(
    ("agg_job_by_company", "company_name", "total_jobs"),
    ("agg_job_by_location", "location", "total_jobs"),
    ("agg_job_by_salary", "salary", "total_jobs"),
    ("agg_job_by_experience", "experience_required", "total_jobs"),
  )

  /** Chart frames keyed by mart name; `topN` keeps the payload
    * driver-safe (TakeOrderedAndProject — never a full collect of an
    * unbounded mart).
    */
  def chartData(spark: SparkSession, martDir: String, topN: Int = 20): Map[String, DataFrame] =
    Charts.map { case (table, groupCol, valueCol) =>
      table -> spark.read.parquet(s"$martDir/$table")
        .select(col(groupCol), col(valueCol))
        .orderBy(col(valueCol).desc, col(groupCol))
        .limit(topN)
    }.toMap

  /** CUBE mart over the event stream: every (event_type × day)
    * combination PLUS each dimension's subtotals and the grand total
    * in one pass — Spark's `cube` plans a single scan + Expand
    * (factor 4 = the grouping-set count), so subtotals cost one
    * aggregate, not four queries. `grouping_id` labels which
    * dimensions a row aggregates over (0 = detail cell, 3 = grand
    * total), `n_users` is exact distinct per cell — NOT additive
    * across cells, which is precisely why the cube materializes every
    * subtotal instead of letting the dashboard roll detail rows up.
    */
  def cubeDaily(events: DataFrame): DataFrame =
    events.withColumn("day", to_date(col("ts")))
      .cube(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 2).as("sum_value"),
        // grouping_id only resolves INSIDE the cube's aggregate list
        grouping_id().cast("int").as("gid"))

  /** Pivot mart: one row per day, one count column per event type —
    * the wide frame a chart consumes directly. `types` is EXPLICIT
    * (the pivot values embed in the plan, no extra distinct-scan job,
    * and the output schema is stable when a type is absent that day —
    * its column is 0, not missing).
    */
  def pivotDaily(events: DataFrame, types: Seq[String]): DataFrame =
    events.withColumn("day", to_date(col("ts")))
      .groupBy(col("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      // a type with no events that day pivots to NULL (its aggregate
      // never ran); the mart contract is a dense 0
      .na.fill(0L, types)
}
