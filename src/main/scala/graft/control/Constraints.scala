package graft.control

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative integrity checks — the Spark stand-ins for the
  * reference's MySQL-enforced constraints (SURVEY.md §1.2): ENUM
  * domains (`status ENUM('Success','Failed','Running')`), VARCHAR
  * length caps, UNIQUE keys, NOT NULL. Parquet enforces none of these,
  * so pipelines assert them explicitly (one aggregate scan per call —
  * run them in tests and at zone boundaries, not per row).
  *
  * Each check returns the violation count (0 = constraint holds).
  */
object Constraints {

  /** ENUM-style domain check. */
  def domainViolations(df: DataFrame, column: String, allowed: Seq[String]): Long =
    df.filter(col(column).isNotNull && !col(column).isin(allowed: _*)).count()

  /** VARCHAR(n)-style length cap. */
  def lengthViolations(df: DataFrame, column: String, maxLen: Int): Long =
    df.filter(length(col(column)) > maxLen).count()

  /** UNIQUE key check (one aggregate, not a self-join). */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): Long =
    df.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1).count()

  /** NOT NULL check. */
  def nullViolations(df: DataFrame, column: String): Long =
    df.filter(col(column).isNull).count()

  /** FK containment: child keys not present in the parent (the
    * reference's `job.date_id REFERENCES date_dim.date_sk`, checked
    * rather than enforced — SURVEY.md §2.3 J6).
    */
  def fkViolations(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): Long =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey)),
        col(childKey) === col(parentKey), "left_anti")
      .count()

  // ---- single-pass expectations ------------------------------------------

  /** A named violation predicate (true ⇒ the row violates the rule). */
  final case class Rule(name: String, violated: Column)

  def notNull(column: String): Rule =
    Rule(s"null_$column", col(column).isNull)
  def inDomain(column: String, allowed: Seq[String]): Rule =
    Rule(s"domain_$column", col(column).isNotNull && !col(column).isin(allowed: _*))
  def maxLength(column: String, n: Int): Rule =
    Rule(s"len_$column", length(col(column)) > n)
  def nonNegative(column: String): Rule =
    Rule(s"neg_$column", col(column) < 0)
  def inRange(column: String, lo: Double, hi: Double): Rule =
    Rule(s"range_$column", col(column).isNotNull && (col(column) < lo || col(column) > hi))

  /** All row-level rules in ONE aggregate scan: a row with `n_rows`
    * plus one violation-count column per rule. The per-check methods
    * above cost one scan each — fine in tests, wrong at a 100 TB zone
    * boundary, where the nightly quality gate should be a single pass
    * (key-level checks — unique/FK — need their own shuffles and stay
    * separate).
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "report needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size, "rule names must be unique")
    val aggs = rules.map(r => sum(when(r.violated, 1L).otherwise(0L)).as(r.name))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }
}
