package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** F1/F2 corpus from FIXTURES.md: every grammar branch, diacritics,
  * garbage, null (reference semantics at
  * `staging/staging_transformer_v2.py:53-75`).
  */
class CleaningFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def parse(s: String): (Long, Long) = {
    val r = Seq(Option(s)).toDF("salary")
      .select(CleaningFunctions.parseSalary(col("salary")).as("p"))
      .select("p.min_salary_vnd", "p.max_salary_vnd").head()
    (r.getLong(0), r.getLong(1))
  }

  test("salary: negotiable → (0,0)") {
    assert(parse("Thỏa thuận") == (0L, 0L))
    assert(parse("thỏa thuận lương") == (0L, 0L))
  }
  test("salary: 'tới N' → (0, N·1e6)") {
    assert(parse("Tới 25 triệu") == (0L, 25000000L))
  }
  test("salary: 'trên N' → (N·1e6, 0)") {
    assert(parse("Trên 30 triệu") == (30000000L, 0L))
  }
  test("salary: range 'N - M'") {
    assert(parse("15 - 20 triệu") == (15000000L, 20000000L))
  }
  test("salary: thousand separators stripped before digit scan") {
    assert(parse("1,200 - 1,800 USD") == (1200000000L, 1800000000L))
    assert(parse("1.200 - 1.800 USD") == (1200000000L, 1800000000L))
  }
  test("salary: single number without marker → (0,0) (reference quirk)") {
    assert(parse("25 triệu") == (0L, 0L))
  }
  test("salary: garbage and null → (0,0)") {
    assert(parse("lương hấp dẫn") == (0L, 0L))
    assert(parse(null) == (0L, 0L))
    assert(parse("") == (0L, 0L))
  }

  private def posted(s: String, base: String): Option[java.sql.Date] = {
    val r = Seq((Option(s), base)).toDF("p", "d")
      .select(CleaningFunctions.postedDate(col("p"), col("d")).as("pd")).head()
    Option(r.getAs[java.sql.Date](0))
  }

  test("posted: hôm qua → base-1") {
    assert(posted("Đăng hôm qua", "2025-11-24").contains(java.sql.Date.valueOf("2025-11-23")))
  }
  test("posted: N ngày trước") {
    assert(posted("3 ngày trước", "2025-11-24").contains(java.sql.Date.valueOf("2025-11-21")))
  }
  test("posted: N tuần trước → 7N") {
    assert(posted("2 tuần trước", "2025-11-24").contains(java.sql.Date.valueOf("2025-11-10")))
  }
  test("posted: unparsable → base date (delta 0)") {
    assert(posted("vừa xong", "2025-11-24").contains(java.sql.Date.valueOf("2025-11-24")))
  }
  test("posted: marker without digits → null (corrected vs reference crash)") {
    assert(posted("ngày trước", "2025-11-24").isEmpty)
  }
  test("posted: invalid base date → null") {
    assert(posted("hôm qua", "not-a-date").isEmpty)
  }

  test("withDefault fills null/blank; cleanRawField collapses whitespace") {
    val r = Seq((null: String, "  Đăng   3 ngày trước  ")).toDF("a", "b")
      .select(
        CleaningFunctions.withDefault(col("a"), "Không yêu cầu").as("a"),
        CleaningFunctions.cleanRawField(col("b"), stripPrefix = "Đăng").as("b"))
      .head()
    assert(r == Row("Không yêu cầu", "3 ngày trước"))
  }

  test("md5 fingerprint matches known digest") {
    val r = Seq("abc").toDF("t")
      .select(CleaningFunctions.md5Fingerprint(col("t"))).head().getString(0)
    assert(r == "900150983cd24fb0d6963f7d28e17f72")
  }
}
