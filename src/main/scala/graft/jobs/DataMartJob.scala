package graft.jobs

import graft.control.Audit
import graft.operators.AggSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Data-mart build (`datamart/load_to_dm.py:104-168`): for each
  * config-driven spec, aggregate the *active* fact rows and overwrite
  * the mart table (the reference drops/recreates). Per-mart audit rows
  * mirror `load_to_dm_log`.
  */
object DataMartJob {

  /** The reference's four marts (`config.xml:86-123`), names verbatim. */
  val ReferenceSpecs: Seq[AggSpec] = Seq(
    AggSpec("agg_job_by_company", Seq("company_name"), Seq("COUNT(*) AS total_jobs")),
    AggSpec("agg_job_by_location", Seq("location"), Seq("COUNT(*) AS total_jobs")),
    AggSpec("agg_job_by_salary", Seq("salary"), Seq("COUNT(*) AS total_jobs")),
    AggSpec("agg_job_by_experience", Seq("experience_required"), Seq("COUNT(*) AS total_jobs")),
  )

  def run(spark: SparkSession, warehouseDir: String, martDir: String,
      audit: Audit, date: String,
      specs: Seq[AggSpec] = ReferenceSpecs): Map[String, Long] = {
    val day = java.sql.Date.valueOf(date)
    // read through Zone so its crash-recovery probe runs first (same
    // self-heal contract WarehouseLoadJob relies on — ADVICE r01)
    val fact = graft.sources.Zone.readIfExists(spark, warehouseDir)
      .getOrElse(sys.error(
        s"warehouse table missing at $warehouseDir — run WarehouseLoadJob first"))
      // marts aggregate current versions only (P7 sentinel filter —
      // the shared constant, not a re-hardcoded literal that could drift)
      .filter(col("expired") === to_date(lit(graft.operators.Scd2Merge.Sentinel)))
    specs.map { spec =>
      val n = audit.bracket(s"load_to_dm_${spec.name}", day) {
        val out = s"$martDir/${spec.name}"
        spec.run(fact).write.mode("overwrite").parquet(out)
        // count what was written, not a second run of the aggregate
        spark.read.parquet(out).count()
      }
      spec.name -> n
    }.toMap
  }
}
