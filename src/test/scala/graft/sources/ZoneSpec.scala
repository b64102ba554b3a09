package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZoneSpec extends SparkSpec {
  import spark.implicits._

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
}
