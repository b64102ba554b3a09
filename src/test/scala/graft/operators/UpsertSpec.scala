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

  test("duplicate keys in one batch: last writer (by order) wins") {
    val existing = Seq(("j1", "t0", 0)).toDF("id", "title", "seq")
    val incoming = Seq(("j1", "first", 1), ("j1", "second", 2)).toDF("id", "title", "seq")
    val out = Upsert(existing, incoming, "id", Seq("title"), Seq(col("seq").desc)).head()
    assert(out.getAs[String]("title") == "second")
  }
}
