package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.redactPii(col("t"))).as[String].head()

  private def counts(s: String): (Int, Int, Int) =
    Seq(s).toDF("t").select(
      TextFunctions.piiCount(col("t"), "email"),
      TextFunctions.piiCount(col("t"), "phone"),
      TextFunctions.piiCount(col("t"), "ip"))
      .as[(Int, Int, Int)].head()

  test("redacts emails, phones, ips; leaves clean text alone") {
    assert(redact("mail a.b+c@foo-bar.org now") == "mail <EMAIL> now")
    assert(redact("call 555-123-4567 twice 555-000-9999") ==
      "call <PHONE> twice <PHONE>")
    assert(redact("host 10.0.0.1 and 192.168.1.255") == "host <IP> and <IP>")
    assert(redact("no pii here, just words.") == "no pii here, just words.")
  }

  test("counts match occurrences per kind") {
    assert(counts("x@y.io or z@w.dev, 555-111-2222, 1.2.3.4") == (2, 1, 1))
    assert(counts("nothing") == (0, 0, 0))
  }

  test("phone/ip boundaries: longer digit runs do not match") {
    assert(counts("5555-123-45678")._2 == 0) // \b guards both ends
    assert(redact("v1.2.3.4000 stays") == "v1.2.3.4000 stays")
  }
}
