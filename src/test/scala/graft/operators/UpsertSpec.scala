package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column-selective upsert (U3): only refreshCols change on conflict
  * (`staging_transformer_v2.py:139-143` — 4 of 9 columns refresh).
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("conflict refreshes only the declared columns") {
    val existing = Seq(("j1", "old-title", "old-loc", 1)).toDF("id", "title", "loc", "v")
    val incoming = Seq(("j1", "new-title", "new-loc", 2)).toDF("id", "title", "loc", "v")
    val out = Upsert(existing, incoming, "id", Seq("title"), Seq(col("v"))).head()
    assert(out.getAs[String]("title") == "new-title") // refreshed
    assert(out.getAs[String]("loc") == "old-loc")     // kept
    assert(out.getAs[Int]("v") == 1)                  // kept
  }

  test("new keys insert whole; missing keys keep existing row") {
    val existing = Seq(("j1", "t1", 1)).toDF("id", "title", "v")
    val incoming = Seq(("j2", "t2", 2)).toDF("id", "title", "v")
    val out = Upsert(existing, incoming, "id", Seq("title"), Seq(col("v")))
      .orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("title") == "t1" && out(0).getAs[Int]("v") == 1)
    assert(out(1).getAs[String]("title") == "t2" && out(1).getAs[Int]("v") == 2)
  }

  test("NULL key rows: matched null-safely, refreshed and preserved correctly") {
    // presence must come from side markers, not key-null checks — a
    // stored NULL key is a real row, not a missed join
    val existing = Seq((Option.empty[String], "old-t", 1), (Some("k1"), "t1", 1))
      .toDF("id", "title", "v")
    val incoming = Seq((Option.empty[String], "new-t", 2))
      .toDF("id", "title", "v")
    val out = Upsert(existing, incoming, "id", Seq("title"), Seq(col("v")))
      .orderBy("id").collect()
    assert(out.length == 2)
    val nullRow = out.find(_.isNullAt(0)).get
    assert(nullRow.getAs[String]("title") == "new-t", "refresh col takes incoming")
    assert(nullRow.getAs[Int]("v") == 1, "non-refresh col keeps existing")
    val k1 = out.find(!_.isNullAt(0)).get
    assert(k1.getAs[String]("title") == "t1" && k1.getAs[Int]("v") == 1,
      "unmatched existing row untouched")
  }

  test("duplicate keys in one batch: last writer (by order) wins") {
    val existing = Seq(("j1", "t0", 0)).toDF("id", "title", "seq")
    val incoming = Seq(("j1", "first", 1), ("j1", "second", 2)).toDF("id", "title", "seq")
    val out = Upsert(existing, incoming, "id", Seq("title"), Seq(col("seq").desc)).head()
    assert(out.getAs[String]("title") == "second")
  }
}
