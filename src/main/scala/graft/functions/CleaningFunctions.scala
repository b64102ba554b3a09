package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar cleaning functions from the reference's staging layer, built as
  * native Catalyst expression trees (whole-stage-codegen-friendly — no UDFs,
  * SURVEY.md §2.8/§2.11).
  *
  * Reference semantics: `staging/staging_transformer_v2.py:53-75`.
  */
object CleaningFunctions {

  /** Vietnamese salary parser (F1, `staging_transformer_v2.py:53-62`).
    *
    * Reference rules, applied to `lower(text)` with `,` and `.` stripped:
    *   - null/empty or contains "thỏa thuận" (negotiable) → (0, 0)
    *   - "tới N"  (up to)    → (0, N·10⁶)
    *   - "trên N" (above)    → (N·10⁶, 0)
    *   - two numbers "N - M" → (N·10⁶, M·10⁶)
    *   - anything else       → (0, 0)
    *
    * Returns `struct(min_salary_vnd: Long, max_salary_vnd: Long)` — the one
    * nested type the model warrants (SURVEY.md §1.2).
    */
  def parseSalary(c: Column): Column = {
    val t  = lower(regexp_replace(c, "[,.]", ""))
    val n1 = regexp_extract(t, "(\\d+)", 1)
    val n2 = regexp_extract(t, "\\d+\\D+?(\\d+)", 1)
    val m  = lit(1000000L)
    val num1 = n1.cast("long") * m
    val num2 = n2.cast("long") * m
    val zero = lit(0L)
    val minV = when(c.isNull || t.contains("thỏa thuận"), zero)
      .when(t.contains("tới") && n1 =!= "", zero)
      .when(t.contains("trên") && n1 =!= "", num1)
      .when(n2 =!= "", num1)
      .otherwise(zero)
    val maxV = when(c.isNull || t.contains("thỏa thuận"), zero)
      .when(t.contains("tới") && n1 =!= "", num1)
      .when(t.contains("trên") && n1 =!= "", zero)
      .when(n2 =!= "", num2)
      .otherwise(zero)
    struct(minV.as("min_salary_vnd"), maxV.as("max_salary_vnd"))
  }

  /** Relative posted-date parser (F2, `staging_transformer_v2.py:64-75`).
    *
    * "hôm qua" (yesterday) → base-1; "N ngày trước" (N days ago) → base-N;
    * "N tuần trước" (N weeks ago) → base-7N; otherwise base. A marker with
    * no digits yields NULL (the reference raises; SURVEY.md §7.4 documents
    * the corrected behavior).
    */
  def postedDate(postedTime: Column, extractedDate: Column): Column = {
    val s = lower(postedTime)
    val digits = regexp_extract(s, "(\\d+)", 1)
    // ANSI mode is on (Spark 4 default): cast('') throws, so gate the
    // cast on digit presence; no digits → NULL delta → NULL date
    val n = when(digits =!= "", digits).otherwise(lit(null)).cast("int")
    val delta = when(s.contains("hôm qua"), lit(1))
      .when(s.contains("ngày trước"), n)
      .when(s.contains("tuần trước"), n * 7)
      .otherwise(lit(0))
    // try_to_date: unparsable base (reference: strptime except → None)
    date_sub(call_function("try_to_date", extractedDate), delta)
  }

  /** Scrape-field cleaning (F6, `topcv_scraper_v5.py:111-119`): trim +
    * collapse internal whitespace + strip a leading marker word.
    */
  def cleanRawField(c: Column, stripPrefix: String = ""): Column = {
    val stripped =
      if (stripPrefix.isEmpty) c
      else regexp_replace(c, "^\\s*" + java.util.regex.Pattern.quote(stripPrefix), "")
    trim(regexp_replace(stripped, "\\s+", " "))
  }

  /** Per-field default on null/empty (F19, `topcv_scraper_v5.py:100-121`). */
  def withDefault(c: Column, default: String): Column =
    when(c.isNull || trim(c) === "", lit(default)).otherwise(c)

  /** MD5 content fingerprint (F21 — declared `file_md5` capability,
    * `extract/create_control_db_v5.sql:42`). Lower-case hex, matches both
    * MySQL's MD5() and DuckDB's md5().
    */
  def md5Fingerprint(c: Column): Column = md5(c.cast("binary"))
}
