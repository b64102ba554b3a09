package graft.streaming

import graft.SparkSpec
import graft.operators.HllSketch
import org.apache.spark.sql.functions._

class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed sketch == one-shot batch sketch; idempotent under replay") {
    val base = tmpDir("sketchstream")
    val in = s"$base/in"
    // two "days" of events arriving as separate files, overlapping users
    val day1 = (1 to 3000).map(i => ("g" + (i % 2), (i % 700).toLong))
    val day2 = (1 to 3000).map(i => ("g" + (i % 2), (i % 1100 + 300).toLong))
    day1.toDF("g", "user").repartition(2).write.parquet(in)
    day2.toDF("g", "user").repartition(2).write.mode("append").parquet(in)

    val stream = spark.readStream
      .schema("g STRING, user BIGINT")
      .option("maxFilesPerTrigger", 1) // several micro-batches, not one
      .parquet(in)
    val q = SketchStream.runHllMaintenance(spark, stream, Seq("g"), "user",
      s"$base/sketch", s"$base/ckpt")
    q.awaitTermination()

    val all = (day1 ++ day2).toDF("g", "user")
    val direct = HllSketch.approxCountDistinct(all, Seq("g"), "user")
      .orderBy("g").collect().toSeq
    val streamed = SketchStream.estimates(spark, s"$base/sketch", Seq("g"))
      .orderBy("g").collect().toSeq
    assert(streamed == direct)

    // replay: re-merging one day's sketch changes nothing (max idempotence)
    val replayed = HllSketch.merge(
      graft.sources.Zone.readIfExists(spark, s"$base/sketch").get,
      HllSketch.registers(day1.toDF("g", "user"), Seq("g"), "user"))(Seq("g"))
    val after = HllSketch.estimate(replayed, Seq("g")).orderBy("g").collect().toSeq
    assert(after == direct)
  }

  test("count-min maintenance: batch-partitioned cells; replay rewrites, never adds") {
    import graft.operators.CountMin
    val base = tmpDir("cmstream")
    val in = s"$base/in"
    val day1 = (1 to 2000).map(i => ("g", (i % 300).toLong))
    val day2 = (1 to 2000).map(i => ("g", (i % 500).toLong))
    day1.toDF("g", "k").repartition(1).write.parquet(in)
    day2.toDF("g", "k").repartition(1).write.mode("append").parquet(in)

    val stream = spark.readStream.schema("g STRING, k BIGINT")
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = SketchStream.runCountMinMaintenance(spark, stream, Seq("g"), "k",
      s"$base/cm", s"$base/ckpt")
    q.awaitTermination()

    val all = (day1 ++ day2).toDF("g", "k")
    val folded = SketchStream.countMinCells(spark, s"$base/cm", Seq("g"))
    val direct = CountMin.sketch(all, Seq("g"), "k")
    assert(folded.orderBy("row", "bucket").collect().toSeq ==
      direct.orderBy("row", "bucket").collect().toSeq)

    // replay of a batch = overwrite of its partition → store unchanged
    // (rebuild batch 0's cell table from collected rows — a replayed
    // micro-batch produces identical deterministic content)
    val b0 = spark.read.parquet(s"$base/cm/batch=0")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSeq
    b0.toDF("g", "row", "bucket", "cell_count")
      .write.mode("overwrite").parquet(s"$base/cm/batch=0")
    val after = SketchStream.countMinCells(spark, s"$base/cm", Seq("g"))
    assert(after.orderBy("row", "bucket").collect().toSeq ==
      direct.orderBy("row", "bucket").collect().toSeq)
  }

  test("generic additive maintenance: streaming quantile histogram == batch") {
    import graft.operators.QuantileHistogram
    val base = tmpDir("qhstream")
    val in = s"$base/in"
    (1 to 4000).map(i => ("g", (i % 1000).toLong)).toDF("g", "v")
      .repartition(1).write.parquet(in)
    (1 to 4000).map(i => ("g", (i % 700 + 300).toLong)).toDF("g", "v")
      .repartition(1).write.mode("append").parquet(in)

    val stream = spark.readStream.schema("g STRING, v BIGINT")
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = SketchStream.runAdditiveMaintenance(stream, s"$base/qh", s"$base/ckpt")(
      QuantileHistogram.histogram(_, Seq("g"), col("v"), width = 10L))
    q.awaitTermination()

    val folded = SketchStream.foldAdditive(spark, s"$base/qh", Seq("g", "bucket"), "n")
    val all = ((1 to 4000).map(i => ("g", (i % 1000).toLong)) ++
      (1 to 4000).map(i => ("g", (i % 700 + 300).toLong))).toDF("g", "v")
    val direct = QuantileHistogram.histogram(all, Seq("g"), col("v"), 10L)
    assert(folded.orderBy("bucket").collect().toSeq ==
      direct.orderBy("bucket").collect().toSeq)
    val sq = QuantileHistogram.quantiles(folded, Seq("g"), 10L, Seq(50, 99)).head
    val dq = QuantileHistogram.quantiles(direct, Seq("g"), 10L, Seq(50, 99)).head
    assert(sq == dq)
  }
}
