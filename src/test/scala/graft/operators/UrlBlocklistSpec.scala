package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlBlocklistSpec extends SparkSpec {
  import spark.implicits._

  private val blocked = Seq("example.com", "ads.tracker.net", "b.com")
    .toDF("domain")

  private val rows = Seq(
    (1L, "example.com"),           // exact match
    (2L, "a.b.example.com"),       // subdomain of a blocked registrable domain
    (3L, "ample.com"),             // suffix must be LABEL-aligned: not blocked
    (4L, "tracker.net"),           // parent of a blocked subdomain: not blocked
    (5L, "x.ads.tracker.net"),     // under the blocked subdomain
    (6L, "safe.org"),
    (7L, ""),                      // empty host can't match
    (8L, null.asInstanceOf[String]),
    (9L, "a.b.com"),               // under b.com — and NOT a match for example.com
  ).toDF("id", "host")

  test("mark: label-aligned suffix semantics, empty/NULL hosts pass") {
    val out = UrlBlocklist.mark(rows, "id", "host", blocked)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(r.fieldIndex("blocked")),
         r.getString(r.fieldIndex("matched_domain")))).toMap
    assert(out(1L) == ((true, "example.com")))
    assert(out(2L) == ((true, "example.com")))
    assert(out(3L) == ((false, null)))
    assert(out(4L) == ((false, null)))
    assert(out(5L) == ((true, "ads.tracker.net")))
    assert(out(6L) == ((false, null)))
    assert(out(7L) == ((false, null)))
    assert(out(8L) == ((false, null)))
    assert(out(9L) == ((true, "b.com")))
  }

  test("host normalization: case-variant and trailing-dot FQDN forms still match") {
    val variants = Seq(
      (1L, "EXAMPLE.com"),           // DNS is case-insensitive
      (2L, "a.Example.COM"),         // mixed case, subdomain
      (3L, "example.com."),          // FQDN root form names the same host
      (4L, "A.B.EXAMPLE.COM."),      // both at once
      (5L, "safe.org."),             // normalization must not create matches
    ).toDF("id", "host")
    val out = UrlBlocklist.mark(variants, "id", "host", blocked)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(r.fieldIndex("blocked")),
         r.getString(r.fieldIndex("matched_domain")))).toMap
    assert(out(1L) == ((true, "example.com")))
    assert(out(2L) == ((true, "example.com")))
    assert(out(3L) == ((true, "example.com")))
    assert(out(4L) == ((true, "example.com")))
    assert(out(5L) == ((false, null)))
  }

  test("multiple matching suffixes: lexicographically smallest wins, deterministically") {
    val bl = Seq("a.b.com", "b.com").toDF("domain")
    val out = UrlBlocklist.mark(Seq((1L, "x.a.b.com")).toDF("id", "host"),
        "id", "host", bl).head()
    assert(out.getAs[String]("matched_domain") == "a.b.com")
  }

  test("filter drops blocked rows and only those, keeping original columns") {
    val kept = UrlBlocklist.filter(rows, "id", "host", blocked)
    assert(kept.columns.toSeq == Seq("id", "host"))
    assert(kept.select("id").as[Long].collect().toSet == Set(3L, 4L, 6L, 7L, 8L))
  }
}
