package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileHistogramSpec extends SparkSpec {
  import spark.implicits._

  test("width 1 degenerates to exact discrete quantiles") {
    val df = (1 to 100).map(v => ("g", v.toLong)).toDF("g", "v")
    val h = QuantileHistogram.histogram(df, Seq("g"), col("v"), width = 1L)
    val out = QuantileHistogram.quantiles(h, Seq("g"), width = 1L,
      qsPercent = Seq(50, 95, 99)).head
    // percentile_disc convention: smallest value with cum >= ceil(q%·n)
    assert(out.getAs[Long]("p50_lo") == 50L)
    assert(out.getAs[Long]("p95_lo") == 95L)
    assert(out.getAs[Long]("p99_lo") == 99L)
    assert(out.getAs[Long]("n_rows") == 100L)
  }

  test("partition histograms sum to the whole; quantiles match") {
    val a = (1 to 500).map(v => ("g", v.toLong)).toDF("g", "v")
    val b = (300 to 900).map(v => ("g", v.toLong)).toDF("g", "v")
    val merged = QuantileHistogram.histogram(a, Seq("g"), col("v"), 10L)
      .unionByName(QuantileHistogram.histogram(b, Seq("g"), col("v"), 10L))
      .groupBy("g", "bucket").agg(sum("n").as("n"))
    val whole = QuantileHistogram.histogram(a.union(b), Seq("g"), col("v"), 10L)
    assert(merged.orderBy("bucket").collect().toSeq ==
      whole.orderBy("bucket").collect().toSeq)
    val qm = QuantileHistogram.quantiles(merged, Seq("g"), 10L, Seq(50)).head
    val qw = QuantileHistogram.quantiles(whole, Seq("g"), 10L, Seq(50)).head
    assert(qm.getAs[Long]("p50_lo") == qw.getAs[Long]("p50_lo"))
  }

  test("single-row group: every quantile is that row's bucket") {
    val df = Seq(("g", 777L)).toDF("g", "v")
    val h = QuantileHistogram.histogram(df, Seq("g"), col("v"), 100L)
    val out = QuantileHistogram.quantiles(h, Seq("g"), 100L, Seq(1, 50, 100)).head
    assert(out.getAs[Long]("p1_lo") == 700L)
    assert(out.getAs[Long]("p100_lo") == 700L)
  }
}
