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
}
