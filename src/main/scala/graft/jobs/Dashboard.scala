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
}
