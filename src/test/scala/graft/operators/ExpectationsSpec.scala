package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  private def report(checks: Seq[Check], rows: Seq[(java.lang.Long, String)]) =
    evaluate(rows.toDF("k", "v"), checks)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .toSeq

  test("NULL-skip semantics: only not_null counts NULLs; the skippers " +
      "shrink `checked` instead") {
    val rows = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, null), (3L, "zz"), (null, "a"))
    assert(report(Seq(NotNull("v")), rows) ==
      Seq(("not_null", "v", 4L, 1L, "fail")))
    assert(report(Seq(AcceptedValues("v", Seq("a"))), rows) ==
      Seq(("accepted_values", "v", 3L, 1L, "fail"))) // null skipped, zz fails
    assert(report(Seq(MatchesRegex("v", "^[a-y]+$")), rows) ==
      Seq(("matches_regex", "v", 3L, 1L, "fail")))
    assert(report(Seq(InRange("k", 1.0, 2.0)), rows) ==
      Seq(("in_range", "k", 3L, 1L, "fail")))
  }

  test("unique counts ALL rows of a duplicated key; row_count bounds; " +
      "empty input reports zeros, never NULLs") {
    val rows = Seq[(java.lang.Long, String)](
      (1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"))
    assert(report(Seq(Unique(Seq("k"))), rows) ==
      Seq(("unique", "k", 4L, 3L, "fail")))
    assert(report(Seq(RowCountBetween(5L, 10L)), rows) ==
      Seq(("row_count_between", "*", 4L, 1L, "fail")))
    assert(report(Seq(RowCountBetween(1L, 10L)), rows) ==
      Seq(("row_count_between", "*", 4L, 0L, "pass")))
    val empty = report(
      Seq(NotNull("v"), Unique(Seq("k")), RowCountBetween(1L, 10L)),
      Seq.empty)
    assert(empty == Seq(
      ("not_null", "v", 0L, 0L, "pass"),
      ("row_count_between", "*", 0L, 1L, "fail"),
      ("unique", "k", 0L, 0L, "pass")))
  }

  test("foreign_key: dangling non-null keys only; null FKs are " +
      "not_null's job") {
    val facts = Seq[(java.lang.Long, String)](
      (1L, "x"), (2L, "x"), (9L, "x"), (null, "x")).toDF("k", "v")
    val dim = Seq(1L, 2L, 3L).toDF("id")
    val got = evaluate(facts, Seq(ForeignKey("k", dim, "id")))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got == Seq(("foreign_key", 3L, 1L, "fail")))
  }

  test("assertAll throws on failure naming the check, passes through " +
      "when green; parse round-trips the config DSL") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assertAll(df, Seq(NotNull("k"), Unique(Seq("k"))))
    val e = intercept[IllegalArgumentException] {
      assertAll(df, Seq(AcceptedValues("v", Seq("a"))))
    }
    assert(e.getMessage.contains("accepted_values(v)=1"))

    assert(parse("not_null:c") == NotNull("c"))
    assert(parse("accepted_values:c:a|b") == AcceptedValues("c", Seq("a", "b")))
    assert(parse("in_range:c:0:10.5") == InRange("c", 0.0, 10.5))
    assert(parse("matches_regex:c:^x:y$") == MatchesRegex("c", "^x:y$"))
    assert(parse("row_count_between:1:99") == RowCountBetween(1L, 99L))
    assert(parse("unique:a|b") == Unique(Seq("a", "b")))
    intercept[IllegalArgumentException](parse("nope:c"))
  }

  test("row-local checks fold into ONE aggregate (single scan), " +
      "mixed suite keeps deterministic order") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val plan = evaluate(df, Seq(NotNull("k"), NotNull("v"),
        InRange("k", 0, 9), RowCountBetween(1, 9)))
      .queryExecution.executedPlan.toString
    // one scan of the input for all four row-local checks
    assert("LocalTableScan|Scan ExistingRDD".r.findAllIn(plan).size <= 1 ||
      plan.split("LocalTableScan").length <= 2,
      s"row-local checks must share one scan:\n$plan")
    val dim = Seq(1L).toDF("id")
    val rep = evaluate(df, Seq(Unique(Seq("k")), NotNull("k"),
      ForeignKey("k", dim, "id"), RowCountBetween(1, 9)))
    assert(rep.select("check").as[String].collect().toSeq ==
      Seq("foreign_key", "not_null", "row_count_between", "unique"))
  }
}
