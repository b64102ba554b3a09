package graft.control

import graft.model.Schemas
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import java.sql.{Date, Timestamp}

/** Control plane: audit trail + gates, the Spark re-expression of the
  * reference's `db_control` (`extract/create_control_db_v5.sql`,
  * `loadtowh/create_config_loadtowh.sql`). Every job writes
  * Running→Success/Failed rows with row counts; downstream jobs gate on
  * them (J3) and skip already-succeeded logical dates (A5).
  *
  * Storage is an append-only parquet directory; log_id is a
  * timestamp-derived long (uniqueness per (process, date, attempt) is
  * what the reference actually relies on, not density).
  */
final class Audit(spark: SparkSession, auditDir: String, clock: () => Timestamp) {

  private def emptyLog: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Schemas.auditLog)

  def log(): DataFrame =
    if (graft.sources.Zone.exists(spark, auditDir))
      spark.read.schema(Schemas.auditLog).parquet(auditDir)
    else emptyLog

  // log_id = ms clock · 10⁵ + unbounded in-process sequence: appends in
  // the same millisecond (bracket's Running→Success with a fast or
  // frozen injected clock) still order deterministically and never wrap.
  // Uniqueness contract: within one Audit writer (the per-pipeline
  // driver); cross-writer rows disambiguate by (process_name, log_id) —
  // latestRuns/recentFailures tie-break per process, so that's the
  // granularity that matters.
  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  def append(processName: String, executionDate: Date, status: String,
      rowsProcessed: Option[Long], startTime: Timestamp,
      errorMessage: Option[String] = None): Unit = {
    val end = clock()
    val row = Row(
      end.getTime * 100000L + seq.getAndIncrement(),
      processName, executionDate, status,
      rowsProcessed.map(Long.box).orNull, startTime, end,
      // generated column duration_seconds (F11,
      // `create_control_db_v5.sql:47`): computed at write
      Long.box((end.getTime - startTime.getTime) / 1000L),
      errorMessage.orNull)
    spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(row), 1), Schemas.auditLog)
      .write.mode("append").parquet(auditDir)
  }

  /** Readiness gate (J3): `is_process_done_procedure` —
    * `EXISTS(… WHERE LOWER(status)='success' AND execution_date=d)`
    * (`create_config_loadtowh.sql:56-64`).
    */
  def isProcessDone(processName: String, executionDate: Date): Boolean =
    !log()
      .filter(col("process_name") === processName &&
        lower(col("status")) === "success" &&
        col("execution_date") === lit(executionDate))
      .isEmpty

  /** Idempotence check (A5): skip if this logical date already
    * succeeded (`run_all_scrapers.sh:37-44`).
    */
  def alreadySucceeded(processName: String, executionDate: Date): Boolean =
    isProcessDone(processName, executionDate)

  /** Run `body` bracketed by Running→Success/Failed audit rows; returns
    * the row count on success, rethrows on failure (the reference's
    * wrapper semantics: DB status outranks exit code).
    */
  def bracket(processName: String, executionDate: Date)(body: => Long): Long = {
    val start = clock()
    append(processName, executionDate, "Running", None, start)
    try {
      val n = body
      append(processName, executionDate, "Success", Some(n), start)
      n
    } catch {
      case e: Throwable =>
        append(processName, executionDate, "Failed", None, start,
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(500)))
        throw e
    }
  }

  /** The five monitoring views (`create_control_db_v5.sql:98-161`),
    * generalized: per-process stats with conditional aggs (A2).
    */
  def processStats(): DataFrame =
    log().groupBy(col("process_name"))
      .agg(
        count(lit(1)).as("total_runs"),
        sum(when(lower(col("status")) === "success", 1).otherwise(0)).as("successful_runs"),
        sum(when(lower(col("status")) === "failed", 1).otherwise(0)).as("failed_runs"),
        round(avg(col("rows_processed")), 0).as("avg_rows"),
        max(col("execution_date")).as("last_run_date"))
      .orderBy(col("process_name"))

  /** Recent failures view (O2 + F4). */
  def recentFailures(limit: Int = 5): DataFrame =
    log().filter(lower(col("status")) === "failed")
      .orderBy(col("end_time").desc, col("log_id").desc)
      .limit(limit)
      .select(col("process_name"), col("execution_date"),
        substring(col("error_message"), 1, 80).as("error_snippet"))

  /** Daily pipeline summary — the `v_daily_summary` shape
    * (`create_control_db_v5.sql:151-161`): per execution date, distinct
    * processes plus success/fail counts. The reference writes this with
    * correlated scalar subqueries; pre-aggregation is the decorrelated
    * plan Catalyst would produce anyway (SURVEY.md §2.4 A4).
    */
  def dailySummary(): DataFrame =
    log().groupBy(col("execution_date"))
      .agg(
        countDistinct(col("process_name")).as("n_processes"),
        sum(when(lower(col("status")) === "success", 1).otherwise(0)).as("n_success"),
        sum(when(lower(col("status")) === "failed", 1).otherwise(0)).as("n_failed"),
        max(col("end_time")).as("last_activity"))
      .orderBy(col("execution_date").desc)

  /** Retention GC (`extract/cleanup_old_logs.sh:11` — 30-day window):
    * drop audit rows older than `retentionDays` before `asOf`. Rewrite
    * via a temp dir (parquet can't overwrite in place from itself).
    */
  def expireOldLogs(retentionDays: Int, asOf: Date): Unit = {
    val cutoff = new Date(asOf.getTime - retentionDays * 86400000L)
    graft.sources.Zone.overwriteInPlace(spark,
      log().filter(col("execution_date") >= lit(cutoff)), auditDir)
  }

  /** Latest run per process — the per-key Top-1 the reference does with
    * `ORDER BY log_id DESC LIMIT 1` scoped by key (SURVEY.md §2.5).
    */
  def latestRuns(): DataFrame =
    graft.operators.LatestPerKey(log(), Seq("process_name"),
      Seq(col("end_time").desc, col("log_id").desc))
      .select(col("process_name"), col("execution_date"), col("status"),
        col("rows_processed"), col("duration_seconds"))
      .orderBy(col("process_name"))
}
