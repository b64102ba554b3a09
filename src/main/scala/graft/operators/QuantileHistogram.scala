package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile estimation from a fixed-width integer histogram —
  * the third member of the portable sketch family (cardinality =
  * [[HllSketch]], frequency = [[CountMin]], quantiles = this). Exact
  * `percentile_disc` (q42) needs the values; a histogram of integer
  * bucket counts is a fixed-size, cell-wise ADDITIVE summary — daily
  * partitions roll up by summing buckets, and any quantile is then
  * answered to ±width/2 without touching the data again. Every number
  * involved (bucket indices, counts, cumulative ranks, targets) is an
  * integer, so estimates are engine-exact (the DuckDB oracle recomputes
  * them bit-for-bit) — unlike t-digest/KLL blobs, which buy tighter
  * error with engine-specific state.
  */
object QuantileHistogram {

  /** The histogram: per (groupCols, bucket) counts of
    * `floor(valueCents / width)`. One partial+final aggregate; merge =
    * cell-wise sum (same contract as [[CountMin.merge]]).
    */
  def histogram(df: DataFrame, groupCols: Seq[String], valueCents: Column,
      width: Long): DataFrame = {
    require(width >= 1, s"bucket width must be >= 1, got $width")
    df.filter(valueCents.isNotNull)
      .select(groupCols.map(col) :+ floor(valueCents / lit(width)).cast("long").as("bucket"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Quantile estimates per group: for each q (in percent, integer —
    * float q would make the rank target engine-dependent), the lower
    * bound of the first bucket whose cumulative count reaches
    * `ceil(q% · total)` — the discrete-quantile convention, so with
    * width 1 this degenerates to exact `percentile_disc`. Output:
    * groupCols ++ (`p<q>_lo` per q, `n_rows`).
    */
  def quantiles(hist: DataFrame, groupCols: Seq[String], width: Long,
      qsPercent: Seq[Int]): DataFrame = {
    require(qsPercent.nonEmpty && qsPercent.forall(q => q >= 1 && q <= 100),
      s"quantiles must be integer percents in [1,100]: $qsPercent")
    val wCum = Window.partitionBy(groupCols.map(col): _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val cum = hist
      .withColumn("cum", sum(col("n")).over(wCum))
      .withColumn("total", sum(col("n")).over(wAll))
    // ceil(q%·total) in pure integers: (total·q + 99) div 100 — via
    // floor() because Column./ is double division (exact below 2^53,
    // floor recovers the integer quotient)
    val aggs = qsPercent.map { q =>
      min(when(col("cum") >= floor((col("total") * q + 99) / lit(100L)).cast("long"),
        col("bucket") * width)).as(s"p${q}_lo")
    } :+ max(col("total")).as("n_rows")
    cum.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
