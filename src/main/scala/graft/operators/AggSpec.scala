package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr, sum}

/** Config-driven aggregate builder — the reference's data-mart layer
  * (`datamart/load_to_dm.py:104-157` driven by `config.xml:86-123`,
  * SURVEY.md §2.4 A1): each spec is a GROUP BY column plus metric
  * strings like `"COUNT(*) AS total_jobs"`. Metrics are parsed with
  * `expr(...)`, so arbitrary SQL aggregates stay declarative and fully
  * Catalyst-optimized (partial aggregation, codegen) — no interpreter of
  * our own.
  */
final case class AggSpec(name: String, groupBy: Seq[String], metrics: Seq[String]) {
  def run(df: DataFrame): DataFrame = {
    val aggs = metrics.map(expr)
    df.groupBy(groupBy.map(df.col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Output column name of each metric (the `AS` alias — the same
    * `" AS "` split the reference does at `load_to_dm.py:130,142`).
    */
  def metricNames: Seq[String] = metrics.map { m =>
    val i = m.toUpperCase.lastIndexOf(" AS ")
    require(i >= 0, s"metric '$m' needs an AS alias for incremental merge")
    m.substring(i + 4).trim
  }

  /** True when every metric is decomposable by addition (COUNT/SUM) —
    * the precondition for [[incrementalUpdate]].
    */
  def isAdditive: Boolean = metrics.forall { m =>
    val u = m.trim.toUpperCase
    u.startsWith("COUNT(") || u.startsWith("SUM(")
  }

  /** Incremental mart maintenance: fold a day's delta into the existing
    * aggregate WITHOUT rescanning the fact — `old ⊎ agg(delta)`, summing
    * each metric per group. Valid only for additive metrics (COUNT/SUM
    * — a COUNT is a SUM of partial counts); AVG/MIN/MAX/DISTINCT need
    * either stored auxiliary sums or a sketch ([[HllSketch]] for
    * distinct). At 100 TB this is the difference between a nightly
    * full-fact scan and a delta-sized job: `incremental(incremental(
    * init, d1), d2) == run(all)` exactly (spec + property).
    */
  def incrementalUpdate(oldAgg: DataFrame, delta: DataFrame): DataFrame = {
    require(isAdditive,
      s"spec '$name' has non-additive metrics ${metrics.mkString(", ")} — " +
        "incremental merge would be wrong; recompute or use a sketch")
    val merged = oldAgg.unionByName(run(delta))
    val sums = metricNames.map(n => sum(col(n)).as(n))
    merged.groupBy(groupBy.map(col): _*).agg(sums.head, sums.tail: _*)
  }

  /** Incremental maintenance WITH retractions — the SCD2-mart case:
    * a day both adds active rows and expires old ones, so the delta is
    * (added, removed), applied as `old ⊎ agg(added) ⊖ agg(removed)`
    * (removed metrics negated — classic incremental view maintenance).
    * Groups whose row count reaches zero DROP from the mart, matching
    * a full recompute (which requires a `COUNT(...)` metric to define
    * existence — enforced).
    */
  def incrementalUpdateWithRetractions(oldAgg: DataFrame, added: DataFrame,
      removed: DataFrame): DataFrame = {
    require(isAdditive,
      s"spec '$name' has non-additive metrics — cannot maintain incrementally")
    // existence proxy must be a true ROW count: COUNT(col) skips NULLs,
    // so a group whose rows are all NULL in that column would be
    // wrongly dropped as empty
    val countIdx = metrics.indexWhere { m =>
      val u = m.trim.toUpperCase.replaceAll("\\s", "")
      u.startsWith("COUNT(*)") || u.startsWith("COUNT(1)")
    }
    require(countIdx >= 0,
      s"spec '$name' needs a COUNT(*) (or COUNT(1)) metric to decide group " +
        "existence under retraction — COUNT(col) skips NULLs and is not a row count")
    val countName = metricNames(countIdx)
    val negatedRemovals = {
      val r = run(removed)
      r.select(groupBy.map(col) ++ metricNames.map(n => (-col(n)).as(n)): _*)
    }
    val sums = metricNames.map(n => sum(col(n)).as(n))
    oldAgg.unionByName(run(added)).unionByName(negatedRemovals)
      .groupBy(groupBy.map(col): _*).agg(sums.head, sums.tail: _*)
      .filter(col(countName) > 0)
  }
}
