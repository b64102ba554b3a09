package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD2 state machine (SURVEY.md §2.10 / §7.4): new key, changed attr,
  * unchanged, NULL-attr change under corrected vs legacy semantics,
  * exactly-one-active-per-key invariant, idempotent replay.
  */
class Scd2MergeSpec extends SparkSpec {
  import spark.implicits._

  private val sentinel = java.sql.Date.valueOf("9999-12-31")

  private def cur(rows: (String, String, String)*): DataFrame =
    rows.toSeq.toDF("k", "attr", "exp")
      .select(col("k"), col("attr"), to_date(col("exp")).as("expired"))

  private def inc(rows: (String, String)*): DataFrame =
    rows.toSeq.toDF("k", "attr")

  private def merge(c: DataFrame, i: DataFrame, legacy: Boolean = false): DataFrame =
    Scd2Merge(c, i, Seq("k"), Seq("attr"), "expired", lit("2026-01-01"),
      legacyNullChange = legacy)

  test("changed attribute expires old version and inserts new active one") {
    val out = merge(
      cur(("a", "v1", "9999-12-31")),
      inc(("a", "v2")))
      .orderBy("expired").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("attr") == "v1" &&
      out(0).getAs[java.sql.Date]("expired") == java.sql.Date.valueOf("2026-01-01"))
    assert(out(1).getAs[String]("attr") == "v2" &&
      out(1).getAs[java.sql.Date]("expired") == sentinel)
  }

  test("unchanged row passes through untouched; history is preserved") {
    val out = merge(
      cur(("a", "v1", "9999-12-31"), ("a", "v0", "2025-06-01")),
      inc(("a", "v1"))).collect()
    assert(out.length == 2)
    assert(out.count(_.getAs[java.sql.Date]("expired") == sentinel) == 1)
  }

  test("new key inserts active; absent key untouched") {
    val out = merge(
      cur(("a", "v1", "9999-12-31")),
      inc(("b", "w1")))
    assert(out.count() == 2)
    assert(out.filter($"k" === "b" && $"expired" === sentinel).count() == 1)
    assert(out.filter($"k" === "a" && $"expired" === sentinel).count() == 1)
  }

  test("NULL-attr change: corrected semantics expire, legacy (MySQL <>) do not") {
    val c = cur(("a", null, "9999-12-31"))
    val i = inc(("a", "now-set"))
    assert(merge(c, i).count() == 2)               // corrected: expired + new
    val legacy = merge(c, i, legacy = true).collect()
    assert(legacy.length == 1 && legacy(0).getAs[String]("attr") == null) // invisible
  }

  test("NULL natural key: expires/matches like any other value (no re-insert loop)") {
    // a usingColumns (plain-equality) join would neither expire nor
    // match NULL keys — every load would add another active row
    val c = cur((null, "v1", "9999-12-31"))
    val unchanged = merge(c, inc((null, "v1"))).collect()
    assert(unchanged.length == 1 &&
      unchanged(0).getAs[java.sql.Date]("expired") == sentinel,
      "unchanged NULL-key row must pass through once, not duplicate")
    val changed = merge(c, inc((null, "v2"))).orderBy("expired").collect()
    assert(changed.length == 2)
    assert(changed(0).getAs[String]("attr") == "v1" &&
      changed(0).getAs[java.sql.Date]("expired") != sentinel)
    assert(changed(1).getAs[String]("attr") == "v2" &&
      changed(1).getAs[java.sql.Date]("expired") == sentinel)
  }

  test("singlePass == composed apply on every state-machine case (incl. NULL keys, legacy mode)") {
    val c = cur(
      ("a", "v1", "9999-12-31"),       // changed → expire + insert
      ("b", "v1", "9999-12-31"),       // unchanged
      ("c", "v1", "9999-12-31"),       // active only
      ("a", "v0", "2025-06-01"),       // history
      (null, "v1", "9999-12-31"))      // NULL key, changed
    val i = inc(("a", "v2"), ("b", "v1"), ("d", "w1"), (null, "v9"))
    for (legacy <- Seq(false, true)) {
      val composed = merge(c, i, legacy)
      val single = Scd2Merge.singlePass(c, i, Seq("k"), Seq("attr"), "expired",
        lit("2026-01-01"), legacyNullChange = legacy)
      assert(single.exceptAll(composed).isEmpty && composed.exceptAll(single).isEmpty,
        s"legacy=$legacy mismatch")
    }
    // NULL-attr change under both semantics
    val cn = cur(("x", null, "9999-12-31"))
    val in = inc(("x", "now-set"))
    for (legacy <- Seq(false, true)) {
      val composed = merge(cn, in, legacy)
      val single = Scd2Merge.singlePass(cn, in, Seq("k"), Seq("attr"), "expired",
        lit("2026-01-01"), legacyNullChange = legacy)
      assert(single.exceptAll(composed).isEmpty && composed.exceptAll(single).isEmpty)
    }
  }

  test("invariant: at most one active version per key after arbitrary merge") {
    val c = cur(("a", "v1", "9999-12-31"), ("a", "v0", "2024-01-01"),
      ("b", "x", "9999-12-31"), ("c", "y", "9999-12-31"))
    val i = inc(("a", "v2"), ("b", "x"), ("d", "z"))
    val out = merge(c, i)
    val actives = out.filter($"expired" === sentinel)
      .groupBy("k").count().filter($"count" > 1)
    assert(actives.isEmpty)
  }

  test("replay of the same batch is a fixed point (idempotence)") {
    val c = cur(("a", "v1", "9999-12-31"), ("b", "x", "9999-12-31"))
    val i = inc(("a", "v2"), ("b", "x"), ("d", "z"))
    val once  = merge(c, i)
    val twice = merge(once, i)
    assert(twice.count() == once.count())
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("surrogate key continuation: dense, deterministic, preserves existing") {
    val df = Seq((Some(10L), "b"), (Some(7L), "a"), (None, "z"), (None, "y"))
      .toDF("sk", "k")
    val out = Scd2Merge.assignSurrogateKeys(df, "sk", Seq("k"))
      .orderBy("sk").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(7L, 10L, 11L, 12L))
    assert(out(2).getString(1) == "y" && out(3).getString(1) == "z") // ordered by key
  }
}
