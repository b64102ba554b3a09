package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def filesTouched(dir: String, pred: org.apache.spark.sql.Column): Long =
    spark.read.parquet(dir).filter(pred)
      .select(input_file_name()).distinct().count()

  test("z-order prunes single-dimension predicates that x-sort cannot") {
    // two independent dimensions — the case single-column sort can't serve:
    // an x-sorted layout answers y-only predicates by touching EVERY file
    // (each spans the full y range); z-ordered boxes tile both axes, so a
    // narrow y band intersects only its row of the grid
    val rows = (0 until 20000).map { i =>
      (((i * 2654435761L) % 1009L), ((i * 40503L + 7) % 997L))
    }
    val df = rows.toDF("x", "y")
    val base = tmpDir("zorder")
    df.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.parquet(s"$base/by_x")
    ZOrder.writeZOrdered(df, Seq("x", "y"), s"$base/by_z", nFiles = 16)

    val yBand = $"y".between(100, 199) // ~10% of the y range
    val xTouched = filesTouched(s"$base/by_x", yBand)
    val zTouched = filesTouched(s"$base/by_z", yBand)
    assert(xTouched == 16L, s"x-sorted layout should touch all files, got $xTouched")
    assert(zTouched <= 8L, s"z-order should touch at most half the files, got $zTouched")

    // and x predicates still prune on the z layout (no dimension is abandoned)
    val xBand = $"x".between(0, 99)
    assert(filesTouched(s"$base/by_z", xBand) <= 8L)

    // layout-only: identical multiset of rows
    val a = spark.read.parquet(s"$base/by_z").as[(Long, Long)].collect().sorted
    assert(a.toSeq == rows.sorted.toSeq)
  }

  test("morton interleave: known bit patterns") {
    // x=0b11, y=0b00 over [0,3] normalized to 16-bit: low 2 bits of x land
    // at even positions after scaling by 65535/3... use exact corner values
    val df = Seq((0.0, 0.0), (3.0, 3.0)).toDF("x", "y")
    val z = df.select(ZOrder.zValue(Seq(
      (col("x"), 0.0, 3.0), (col("y"), 0.0, 3.0))).as("z"))
      .as[Long].collect().sorted
    assert(z(0) == 0L) // both mins → all zero bits
    assert(z(1) == (1L << 32) - 1) // both maxes → all 32 bits set
  }

  test("rejects wrong arity") {
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq((col("x"), 0.0, 1.0)))
    }
  }
}
