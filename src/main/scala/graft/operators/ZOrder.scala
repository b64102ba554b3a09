package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data
  * skipping: interleave the bits of k range-normalized columns and lay
  * the data out sorted by the interleaved value. Rows close on the
  * Z-curve are close in EVERY dimension, so parquet row-group/file
  * min-max stats become tight bounding boxes on all k columns at once
  * — a scan with predicates on any subset of them skips most files.
  * Sorting by a single column gives perfect pruning on that column and
  * none on the others; Z-ordering trades a little of the first for a
  * lot of the rest (the standard lakehouse layout trick, e.g. Delta's
  * OPTIMIZE ZORDER BY).
  *
  * Layout-only: values are untouched, ordering is deterministic, and
  * the normalization bounds come from one tiny min/max aggregate. Not
  * worth it below ~one file per distinct predicate region, or for
  * monotonically-queried single columns (plain sort wins there).
  */
object ZOrder {

  private val Bits = 16 // per-dimension resolution: 2^16 cells per axis

  /** The Morton value of `cols` (2 or 3 numeric columns), each
    * range-normalized to [0, 2^16) with the given (driver-side) bounds.
    * Pure codegen'd integer expression — rides the scan.
    */
  def zValue(cols: Seq[(Column, Double, Double)]): Column = {
    require(cols.size >= 2 && cols.size <= 3, "zValue interleaves 2 or 3 columns")
    val k = cols.size
    val normalized = cols.map { case (c, lo, hi) =>
      val span = math.max(hi - lo, Double.MinPositiveValue)
      least(greatest(((c.cast("double") - lit(lo)) / lit(span) * lit((1 << Bits) - 1))
        .cast("long"), lit(0L)), lit(((1 << Bits) - 1).toLong))
    }
    (0 until Bits).flatMap { bit =>
      normalized.zipWithIndex.map { case (n, dim) =>
        shiftleft(shiftright(n, bit).bitwiseAND(lit(1L)), bit * k + dim)
      }
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Rewrite `df` into `nFiles` files clustered on the Z-curve of
    * `cols`: one bounds aggregate, then range-repartition + in-file
    * sort by the Morton value. The written data is byte-identical row
    * content — only the LAYOUT (and therefore the per-file min/max
    * stats readers prune on) changes.
    */
  def writeZOrdered(df: DataFrame, cols: Seq[String], dir: String,
      nFiles: Int): Unit = {
    val aggs = cols.flatMap(c => Seq(min(col(c).cast("double")).as(s"lo_$c"),
      max(col(c).cast("double")).as(s"hi_$c")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    val withBounds = cols.map { c =>
      require(!bounds.isNullAt(bounds.fieldIndex(s"lo_$c")),
        s"cannot z-order on '$c': no non-null rows to derive bounds from")
      val (lo, hi) = (bounds.getAs[Double](s"lo_$c"), bounds.getAs[Double](s"hi_$c"))
      // a single NaN poisons min/max; failing here beats an ANSI cast
      // error on every row deep inside the write job
      require(!lo.isNaN && !hi.isNaN, s"cannot z-order on '$c': NaN values present")
      (col(c), lo, hi)
    }
    df.withColumn("__z", zValue(withBounds))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }
}
