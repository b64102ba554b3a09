package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

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
}

