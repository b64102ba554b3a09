package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val eventRows = Seq(
    // user 1: two sessions separated by > 30 min
    (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
    (2L, ts("2024-01-01 10:10:00"), 1L, "click", 2.0),
    (3L, ts("2024-01-01 11:30:00"), 1L, "view", 3.0),
    // user 2: one session
    (4L, ts("2024-01-01 10:05:00"), 2L, "view", 4.0),
    (5L, ts("2024-01-01 10:20:00"), 2L, "purchase", 5.0),
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("batch sessionization: gaps-and-islands matches hand-computed sessions") {
    val out = EventStream.sessionizeBatch(eventRows, gapMinutes = 30)
      .orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    val s1 = out(0) // user 1 first session
    assert(s1.getAs[Long]("n_events") == 2 && s1.getAs[Double]("total_value") == 3.0)
    assert(s1.getAs[Timestamp]("session_end") == ts("2024-01-01 10:10:00"))
    val s2 = out(1)
    assert(s2.getAs[Long]("n_events") == 1 &&
      s2.getAs[Timestamp]("session_start") == ts("2024-01-01 11:30:00"))
    assert(out(2).getAs[Long]("user_id") == 2L)
  }

  test("streaming: hourly windowed agg with watermark over file source (AvailableNow)") {
    val base = tmpDir("stream")
    val inDir = s"$base/in"
    eventRows.write.parquet(inDir)
    // a far-future row pushes the watermark so all real windows emit
    Seq((99L, ts("2024-01-03 00:00:00"), 9L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(inDir)

    val agg = EventStream.hourlyAgg(EventStream.readEvents(spark, inDir))
    val q = EventStream.runAvailableNow(agg, s"$base/out", s"$base/ckpt")
    q.awaitTermination()

    val out = spark.read.parquet(s"$base/out")
    val tenToEleven = out.filter($"hour_start" === ts("2024-01-01 10:00:00"))
      .agg(sum($"n_events")).head().getLong(0)
    assert(tenToEleven == 4L)

    // streaming result == batch twin (same plan shape) for emitted windows
    val batch = eventRows
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value"))
      .select($"window.start".as("hour_start"), $"event_type", $"n_events", $"sum_value")
    assert(out
      .join(batch, Seq("hour_start", "event_type", "n_events", "sum_value"), "left_anti")
      .filter($"hour_start" < ts("2024-01-02 00:00:00")).isEmpty)
  }

  test("late event within watermark merges into the session, never regresses its end") {
    val base = tmpDir("late")
    val inDir = s"$base/in"
    // round 1: a session 10:00–10:20 for user 1
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
      (2L, ts("2024-01-01 10:20:00"), 1L, "view", 2.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value").write.parquet(inDir)
    def runOnce(): Unit = {
      // file sink (not memory): recovery across the two rounds needs a
      // checkpoint-compatible sink
      val q = EventStream.runAvailableNow(
        EventStream.sessionize(spark, EventStream.readEvents(spark, inDir)).toDF(),
        s"$base/out", s"$base/ckpt")
      q.awaitTermination()
    }
    runOnce()
    // round 2: a LATE event inside the session (10:05) arrives in a
    // later micro-batch, plus a sentinel that closes everything
    Seq(
      (3L, ts("2024-01-01 10:05:00"), 1L, "view", 4.0),
      (99L, ts("2024-01-03 00:00:00"), 9L, "view", 0.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(inDir)
    runOnce()
    val sess = spark.read.parquet(s"$base/out").filter($"user_id" === 1L).collect()
    assert(sess.length == 1, s"one session expected, got ${sess.length}")
    assert(sess(0).getAs[Timestamp]("session_start") == ts("2024-01-01 10:00:00"))
    assert(sess(0).getAs[Timestamp]("session_end") == ts("2024-01-01 10:20:00"),
      "late event must not regress session_end")
    assert(sess(0).getAs[Long]("n_events") == 3 &&
      sess(0).getAs[Double]("total_value") == 7.0)
  }

  test("streaming dedup: first occurrence survives, later duplicates drop, state bounded by watermark") {
    val base = tmpDir("dedupstream")
    val inDir = s"$base/in"
    // documents arriving as a stream: doc digest = dedup key
    val docs = Seq(
      (1L, ts("2024-01-01 10:00:00"), "alpha content"),
      (2L, ts("2024-01-01 10:05:00"), "beta content"),
      (3L, ts("2024-01-01 10:07:00"), "alpha content"), // dup of 1, within watermark
      (4L, ts("2024-01-01 12:00:00"), "gamma content"),
    ).toDF("doc_id", "ts", "text")
    docs.write.parquet(inDir)

    val stream = spark.readStream
      .schema(docs.schema)
      .parquet(inDir)
      .withColumn("digest", md5($"text"))
    val deduped = EventStream.dedupStream(stream, Seq("digest"), "ts", "1 hour")
    val q = EventStream.runAvailableNow(deduped, s"$base/out", s"$base/ckpt")
    q.awaitTermination()

    val out = spark.read.parquet(s"$base/out")
    // exactly one survivor per distinct digest (which of 1/3 represents
    // the 'alpha' group is arrival order within the micro-batch — the
    // operator's contract is one representative, not a canonical pick)
    assert(out.count() == 3)
    assert(out.select("digest").distinct().count() == 3)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(2L) && ids.contains(4L))
    assert(ids.contains(1L) ^ ids.contains(3L))
  }

  test("foreachBatch upsert sink: stream merges into the table column-selectively") {
    val base = tmpDir("upsertsink")
    val tableDir = s"$base/table"
    // existing table: key 1 with attrs (a=old, b=keep)
    Seq((1L, ts("2024-01-01 09:00:00"), "old_a", "keep_b"))
      .toDF("k", "ts", "a", "b").write.parquet(tableDir)
    // stream: refresh of key 1 (a only) + new key 2 + same-batch dup of 2
    val inDir = s"$base/in"
    Seq(
      (1L, ts("2024-01-01 10:00:00"), "new_a", "ignored_b"),
      (2L, ts("2024-01-01 10:01:00"), "first_a", "first_b"),
      (2L, ts("2024-01-01 10:02:00"), "last_a", "last_b"),
    ).toDF("k", "ts", "a", "b").write.parquet(inDir)

    val stream = spark.readStream
      .schema(spark.read.parquet(inDir).schema).parquet(inDir)
    val q = EventStream.runUpsert(spark, stream, tableDir, s"$base/ckpt",
      key = "k", refreshCols = Seq("a"), orderCol = "ts")
    q.awaitTermination()

    val out = spark.read.parquet(tableDir).orderBy("k").collect()
    assert(out.length == 2)
    // key 1: a refreshed, b kept (column-selective)
    assert(out(0).getAs[String]("a") == "new_a" && out(0).getAs[String]("b") == "keep_b")
    // key 2: inserted whole, last writer in the batch wins
    assert(out(1).getAs[String]("a") == "last_a" && out(1).getAs[String]("b") == "last_b")
  }

  test("stream-static enrichment joins a broadcast dimension per micro-batch") {
    val base = tmpDir("enrich")
    val inDir = s"$base/in"
    eventRows.write.parquet(inDir)
    val userDim = Seq((1L, "gold"), (2L, "silver")).toDF("dim_user_id", "tier")
    val enriched = EventStream.enrich(
      EventStream.readEvents(spark, inDir), userDim, "user_id", "dim_user_id")
    val q = enriched.writeStream
      .outputMode("append").format("memory").queryName("enriched")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.sql("SELECT user_id, tier, count(*) n FROM enriched GROUP BY 1,2")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out((1L, "gold")) == 3L && out((2L, "silver")) == 2L)
  }

  test("streaming sessionization via flatMapGroupsWithState emits closed sessions") {
    val base = tmpDir("sessions")
    val inDir = s"$base/in"
    eventRows.write.parquet(inDir)
    Seq((99L, ts("2024-01-03 00:00:00"), 9L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(inDir)

    val sessions = EventStream.sessionize(spark, EventStream.readEvents(spark, inDir))
    val q = sessions.writeStream
      .outputMode("append").format("memory").queryName("sess")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.sql("SELECT * FROM sess WHERE user_id < 9")
      .orderBy("user_id", "session_start").collect()
    assert(got.length == 3, s"expected 3 closed sessions, got ${got.length}")
    assert(got(0).getAs[Long]("n_events") == 2)
    assert(got(2).getAs[Long]("user_id") == 2L &&
      got(2).getAs[Double]("total_value") == 9.0)
  }

  test("stream-stream interval join matches the q61 batch twin exactly") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      (2L, ts("2024-01-01 10:05:00"), 1L, "click", 0.0), // joins view 1 (300s)
      (3L, ts("2024-01-01 10:20:00"), 1L, "click", 0.0), // 20 min after → no view
      (4L, ts("2024-01-01 09:59:00"), 2L, "view", 0.0),
      (5L, ts("2024-01-01 10:03:00"), 2L, "view", 0.0),
      (6L, ts("2024-01-01 10:06:00"), 2L, "click", 0.0) // joins BOTH views of user 2
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val base = tmpDir("ssjoin")
    val inDir = s"$base/in"
    rows.write.parquet(inDir)

    val ev = EventStream.readEvents(spark, inDir)
    val joined = EventStream.clickViewJoin(
      ev.filter($"event_type" === "click"), ev.filter($"event_type" === "view"))
    val q = joined.writeStream
      .outputMode("append").format("memory").queryName("ssj")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.sql("SELECT click_id, view_id, micros_between FROM ssj")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == Set(
      (2L, 1L, 300L * 1000000),
      (6L, 4L, 420L * 1000000),
      (6L, 5L, 180L * 1000000)))
  }
}
