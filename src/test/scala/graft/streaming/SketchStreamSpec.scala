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
}
