package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZoneSpec extends SparkSpec {
  import spark.implicits._

  test("JDBC sink: append batches, truncate-then-load, parallel read-back (embedded derby)") {
    // derby ships with Spark (metastore dependency) — an in-process
    // relational endpoint with zero extra dependencies
    val url = s"jdbc:derby:${tmpDir("jdbczone")}/db;create=true"
    val day1 = Seq((1L, "a", 100L), (2L, "b", 200L)).toDF("id", "name", "amount")
    val day2 = Seq((3L, "c", 300L)).toDF("id", "name", "amount")

    // S7: batch insert, two appends accumulate
    Zone.writeJdbc(day1, url, "staged", mode = "append")
    Zone.writeJdbc(day2, url, "staged", mode = "append")
    val back = Zone.readJdbc(spark, url, "staged")
    assert(back.count() == 3)
    assert(back.as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a", 100L), (2L, "b", 200L), (3L, "c", 300L)))

    // S8: truncate-then-load replaces rows, keeps the table usable
    Zone.writeJdbc(day2, url, "staged", mode = "overwrite", truncate = true)
    assert(Zone.readJdbc(spark, url, "staged").count() == 1)

    // partitioned read: parallel range scans over id, same rows
    // (Spark floors the stride, so the realized partition count can be
    // below the requested 3 — parallelism >1 is the contract)
    Zone.writeJdbc(day1, url, "staged", mode = "append")
    val ranged = Zone.readJdbc(spark, url, "staged",
      partitionColumn = Some(("id", 1L, 3L, 3)))
    assert(ranged.rdd.getNumPartitions > 1)
    assert(ranged.count() == 3)
  }

  test("JDBC upsert: conflict refreshes only declared columns; new keys insert (derby MERGE)") {
    val url = s"jdbc:derby:${tmpDir("jdbcupsert")}/db;create=true"
    val existing = Seq(("j1", "old-title", "old-loc", 1L), ("j2", "t2", "l2", 1L))
      .toDF("id", "title", "loc", "v")
    Zone.writeJdbc(existing, url, "jobs", mode = "append")

    // duplicate key in one batch: last writer by incomingOrder wins
    // (the load-bearing dedup — MERGE errors on a doubly-matched row)
    val batch = Seq(
      ("j1", "mid-title", "new-loc", 2L),
      ("j1", "new-title", "new-loc", 3L),
      ("j3", "t3", "l3", 1L),
    ).toDF("id", "title", "loc", "v")
    Zone.writeJdbcUpsert(batch, url, "jobs", "id",
      refreshCols = Seq("title", "v"), incomingOrder = Seq(col("v").desc))

    val back = Zone.readJdbc(spark, url, "jobs")
      .as[(String, String, String, Long)].collect()
      .map { case (id, t, l, v) => id -> ((t, l, v)) }.toMap
    assert(back("j1") == (("new-title", "old-loc", 3L)),
      "refresh cols take incoming, others keep existing")
    assert(back("j2") == (("t2", "l2", 1L)), "unmatched existing row untouched")
    assert(back("j3") == (("t3", "l3", 1L)), "new key inserts whole")

    // replaying the same batch is idempotent; staging table is gone
    Zone.writeJdbcUpsert(batch, url, "jobs", "id",
      refreshCols = Seq("title", "v"), incomingOrder = Seq(col("v").desc))
    assert(Zone.readJdbc(spark, url, "jobs")
      .as[(String, String, String, Long)].collect()
      .map { case (id, t, l, v) => id -> ((t, l, v)) }.toMap == back)
    val ex = intercept[Exception] { Zone.readJdbc(spark, url, "jobs__stage").collect() }
    assert(ex.getMessage.toLowerCase.contains("jobs__stage"))
  }

  test("compact: many small files collapse to the target count, content identical") {
    val dir = tmpDir("compactzone")
    val df = (1 to 10000).map(i => (i.toLong, s"row_$i")).toDF("id", "v")
    df.repartition(40).write.mode("overwrite").parquet(dir)
    def files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 40)

    val before = spark.read.parquet(dir)
    val beforeRows = before.collect().map(_.toString).sorted
    val n = Zone.compact(spark, dir, targetBytes = 512L * 1024)
    assert(n < 40, s"still $n files")
    val after = spark.read.parquet(dir).collect().map(_.toString).sorted
    assert(after.sameElements(beforeRows))
    // idempotent: already compact → no-op, same count
    assert(Zone.compact(spark, dir, targetBytes = 512L * 1024) == n)
  }

  test("compactPartitioned: leaf partitions compact independently, partition values survive") {
    val dir = tmpDir("compactpart")
    val df = (1 to 6000).map(i => (i.toLong, s"s${i % 2}", s"d${i % 3}", s"row_$i"))
      .toDF("id", "source", "date", "v")
    df.repartition(10).write.mode("overwrite")
      .partitionBy("source", "date").parquet(dir)
    val before = spark.read.parquet(dir).collect().map(_.toString).sorted

    val (touched, rewritten) = Zone.compactPartitioned(spark, dir, targetBytes = 10L * 1024 * 1024)
    assert(touched == 6)       // 2 sources × 3 dates
    assert(rewritten == 6)     // every leaf had 10 small files
    val after = spark.read.parquet(dir)
    assert(after.collect().map(_.toString).sorted.sameElements(before))
    // partition columns still come from the directory layout
    assert(after.select("source").distinct().count() == 2)
    assert(after.select("date").distinct().count() == 3)
  }

  test("snapshots: pinned versions stay bit-identical while publishing continues") {
    val root = tmpDir("snaps")
    val v1 = Zone.writeSnapshot(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root)
    val v2 = Zone.writeSnapshot(spark, Seq((1L, "a2"), (3L, "c")).toDF("id", "v"), root)
    assert(v1 == 1L && v2 == 2L)
    assert(Zone.snapshotVersions(spark, root) == Seq(1L, 2L))
    // latest = v2; pinned v1 unchanged by the later publish
    assert(Zone.readSnapshot(spark, root).orderBy("id")
      .collect().map(_.getString(1)).toSeq == Seq("a2", "c"))
    assert(Zone.readSnapshot(spark, root, Some(1L)).orderBy("id")
      .collect().map(_.getString(1)).toSeq == Seq("a", "b"))
  }

  test("snapshots: retention drops oldest, keeps newest; missing pin throws") {
    val root = tmpDir("snapgc")
    (1 to 4).foreach(i => Zone.writeSnapshot(spark,
      Seq((i.toLong, s"d$i")).toDF("id", "v"), root))
    val dropped = Zone.expireSnapshots(spark, root, keep = 2)
    assert(dropped == Seq(1L, 2L))
    assert(Zone.snapshotVersions(spark, root) == Seq(3L, 4L))
    intercept[IllegalArgumentException] {
      Zone.readSnapshot(spark, root, Some(1L))
    }
    // new publishes continue the version line (no id reuse after GC)
    assert(Zone.writeSnapshot(spark, Seq((9L, "z")).toDF("id", "v"), root) == 5L)
  }
}
