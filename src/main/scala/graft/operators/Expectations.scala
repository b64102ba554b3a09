package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate — the Deequ/dbt-tests capability a
  * warehouse load needs before anything downstream trusts a batch:
  * a config-driven list of constraints evaluated against a DataFrame
  * into one auditable report `(check, column, checked, violations,
  * status)`.
  *
  * Execution shape (the 100 TB property): every ROW-LOCAL constraint
  * (not-null, accepted-values, range, regex, row-count) folds into ONE
  * aggregate over ONE scan — per-check conditional counters, map-side
  * combined, exactly the q130 Profile discipline — then unpivots from
  * the single aggregate row via a literal explode. Only constraints
  * that are irreducibly non-local add work: `Unique` adds one
  * hash aggregate on its key columns, `ForeignKey` one left-anti join
  * against the (broadcastable) reference side. Nothing collects more
  * than the one report row per check.
  *
  * Violation semantics (documented, not clever): NULLs violate only
  * `NotNull` — `AcceptedValues`/`InRange`/`MatchesRegex` skip NULLs
  * (pair them with a `NotNull` when absence is itself a defect), so
  * each check reports one failure mode. `checked` is the number of
  * rows the check actually examined (non-null rows for the skippers,
  * key rows for Unique/ForeignKey, total rows otherwise).
  */
object Expectations {

  sealed trait Check
  /** NULL in `column` is a violation. */
  case class NotNull(column: String) extends Check
  /** Non-null value outside `values` is a violation. */
  case class AcceptedValues(column: String, values: Seq[String]) extends Check
  /** Non-null value outside `[lo, hi]` (inclusive, compared on the
    * column's native numeric type cast to double) is a violation.
    */
  case class InRange(column: String, lo: Double, hi: Double) extends Check
  /** Non-null value not fully matching `pattern` (Java regex,
    * anchored by the caller) is a violation.
    */
  case class MatchesRegex(column: String, pattern: String) extends Check
  /** Total row count outside `[lo, hi]` fails (violations = 1). */
  case class RowCountBetween(lo: Long, hi: Long) extends Check
  /** Rows participating in a duplicated key are violations: a key
    * seen n > 1 times contributes n. One aggregate on the key.
    */
  case class Unique(columns: Seq[String]) extends Check
  /** Non-null `column` values with no match in `refColumn` of `ref`
    * are violations (the unenforced-FK audit — J6's dangling-key
    * check). One join; broadcast-sized reference sides broadcast.
    */
  case class ForeignKey(column: String, ref: DataFrame, refColumn: String)
      extends Check

  private def checkName(c: Check): String = c match {
    case _: NotNull => "not_null"
    case _: AcceptedValues => "accepted_values"
    case _: InRange => "in_range"
    case _: MatchesRegex => "matches_regex"
    case _: RowCountBetween => "row_count_between"
    case _: Unique => "unique"
    case _: ForeignKey => "foreign_key"
  }

  private def checkColumn(c: Check): String = c match {
    case NotNull(col) => col
    case AcceptedValues(col, _) => col
    case InRange(col, _, _) => col
    case MatchesRegex(col, _) => col
    case RowCountBetween(_, _) => "*"
    case Unique(cols) => cols.mkString(",")
    case ForeignKey(col, _, _) => col
  }

  /** Evaluate all checks; returns one report row per check:
    * `(check, column, checked, violations, status)` ordered by
    * (check, column). Deterministic — safe to hash-compare.
    */
  def evaluate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val spark = df.sparkSession
    import spark.implicits._

    val rowLocal = checks.filter {
      case _: Unique | _: ForeignKey => false
      case _ => true
    }
    // one scan, one aggregate row: per row-local check a (checked,
    // violations) counter pair
    val scalarReports: Seq[DataFrame] =
      if (rowLocal.isEmpty) Seq.empty
      else {
        val aggs: Seq[Column] = rowLocal.zipWithIndex.flatMap { case (c, i) =>
          val (checked, violated): (Column, Column) = c match {
            case NotNull(cl) =>
              (lit(1L), when(col(cl).isNull, 1L).otherwise(0L))
            case AcceptedValues(cl, vs) =>
              (when(col(cl).isNotNull, 1L).otherwise(0L),
                when(col(cl).isNotNull && !col(cl).cast("string").isin(vs: _*), 1L)
                  .otherwise(0L))
            case InRange(cl, lo, hi) =>
              val v = col(cl).cast("double")
              (when(v.isNotNull, 1L).otherwise(0L),
                when(v.isNotNull && (v < lo || v > hi), 1L).otherwise(0L))
            case MatchesRegex(cl, p) =>
              (when(col(cl).isNotNull, 1L).otherwise(0L),
                when(col(cl).isNotNull && !col(cl).rlike(p), 1L).otherwise(0L))
            case RowCountBetween(_, _) => (lit(1L), lit(0L))
            case other => throw new IllegalStateException(s"non-local: $other")
          }
          Seq(sum(checked).as(s"__c$i"), sum(violated).as(s"__v$i"))
        }
        val row = df.agg(aggs.head, aggs.tail: _*)
        Seq(row).map { r =>
          // unpivot the single aggregate row: one literal struct per check
          val entries = rowLocal.zipWithIndex.map { case (c, i) =>
            val violations = c match {
              case RowCountBetween(lo, hi) =>
                // sum over zero rows is NULL — an empty batch must FAIL
                // a lo >= 1 bound, not slip through as NULL-compares-false
                val n = coalesce(col(s"__c$i"), lit(0L))
                when(n < lo || n > hi, 1L).otherwise(0L)
              case _ => col(s"__v$i")
            }
            struct(lit(checkName(c)).as("check"),
              lit(checkColumn(c)).as("column"),
              coalesce(col(s"__c$i"), lit(0L)).as("checked"),
              coalesce(violations, lit(0L)).as("violations"))
          }
          r.select(explode(array(entries: _*)).as("e"))
            .select(col("e.check"), col("e.column"), col("e.checked"),
              col("e.violations"))
        }
      }

    val uniqueReports = checks.collect { case Unique(cols) =>
      df.groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as("__n"))
        .agg(coalesce(sum(col("__n")), lit(0L)).as("checked"),
          coalesce(sum(when(col("__n") > 1, col("__n")).otherwise(0L)), lit(0L))
            .as("violations"))
        .select(lit("unique").as("check"), lit(cols.mkString(",")).as("column"),
          col("checked"), col("violations"))
    }

    val fkReports = checks.collect { case ForeignKey(cl, ref, refCol) =>
      val vals = df.filter(col(cl).isNotNull).select(col(cl).as("__fk"))
      val missing = vals.join(
          ref.select(col(refCol).as("__fk")).distinct(), Seq("__fk"), "left_anti")
        .agg(coalesce(count(lit(1)), lit(0L)).as("violations"))
      val total = vals.agg(count(lit(1)).as("checked"))
      total.crossJoin(missing)
        .select(lit("foreign_key").as("check"), lit(cl).as("column"),
          col("checked"), col("violations"))
    }

    (scalarReports ++ uniqueReports ++ fkReports)
      .reduce(_ unionByName _)
      .withColumn("status",
        when(col("violations") === 0L, lit("pass")).otherwise(lit("fail")))
      .orderBy(col("check"), col("column"))
  }

  /** `evaluate` gating form: throw (fail the batch) when any check
    * fails — the warehouse-load gate. Returns the report when green so
    * callers can persist the audit trail.
    */
  def assertAll(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val report = evaluate(df, checks)
    val failed = report.filter(col("status") === "fail")
      .select(col("check"), col("column"), col("violations")).collect()
    require(failed.isEmpty,
      "expectations failed: " + failed.map(r =>
        s"${r.getString(0)}(${r.getString(1)})=${r.getLong(2)}").mkString(", "))
    report
  }

  /** Compact string form for config-driven suites (the AggSpec
    * pattern): `"not_null:col"`, `"accepted_values:col:a|b|c"`,
    * `"in_range:col:lo:hi"`, `"matches_regex:col:pattern"`,
    * `"row_count_between:lo:hi"`, `"unique:col1|col2"`. (ForeignKey
    * needs a second DataFrame, so it stays programmatic.)
    */
  def parse(spec: String): Check = spec.split(":", -1).toList match {
    case "not_null" :: c :: Nil => NotNull(c)
    case "accepted_values" :: c :: vs :: Nil =>
      AcceptedValues(c, vs.split('|').toSeq)
    case "in_range" :: c :: lo :: hi :: Nil =>
      InRange(c, lo.toDouble, hi.toDouble)
    case "matches_regex" :: c :: rest if rest.nonEmpty =>
      MatchesRegex(c, rest.mkString(":"))
    case "row_count_between" :: lo :: hi :: Nil =>
      RowCountBetween(lo.toLong, hi.toLong)
    case "unique" :: cs :: Nil => Unique(cs.split('|').toSeq)
    case _ => throw new IllegalArgumentException(s"bad check spec: $spec")
  }
}
