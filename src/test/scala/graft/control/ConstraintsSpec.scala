package graft.control

import graft.SparkSpec

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("Success", "a@x.com", 10.0),
    ("Running", null, -1.0),
    ("Bogus", "this-is-a-very-long-value", 5.0),
    (null, "b", 99999.0)
  ).toDF("status", "contact", "amount")

  test("single-pass report counts every rule from one scan") {
    val out = Constraints.report(df, Seq(
      Constraints.notNull("status"),
      Constraints.inDomain("status", Seq("Success", "Failed", "Running")),
      Constraints.maxLength("contact", 10),
      Constraints.nonNegative("amount"),
      Constraints.inRange("amount", 0.0, 1000.0))).head
    assert(out.getAs[Long]("n_rows") == 4)
    assert(out.getAs[Long]("null_status") == 1)
    assert(out.getAs[Long]("domain_status") == 1) // 'Bogus'; NULL not a domain violation
    assert(out.getAs[Long]("len_contact") == 1)
    assert(out.getAs[Long]("neg_amount") == 1)
    assert(out.getAs[Long]("range_amount") == 2) // -1 and 99999
  }

  test("report matches the per-check methods") {
    assert(Constraints.report(df, Seq(Constraints.notNull("contact")))
      .head.getAs[Long]("null_contact") == Constraints.nullViolations(df, "contact"))
    assert(Constraints.report(df,
        Seq(Constraints.inDomain("status", Seq("Success", "Failed", "Running"))))
      .head.getAs[Long]("domain_status") ==
      Constraints.domainViolations(df, "status", Seq("Success", "Failed", "Running")))
  }

  test("duplicate rule names rejected") {
    intercept[IllegalArgumentException] {
      Constraints.report(df, Seq(Constraints.notNull("status"), Constraints.notNull("status")))
    }
  }
}
