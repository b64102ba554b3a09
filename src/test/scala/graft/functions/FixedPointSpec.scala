package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FixedPointSpec extends SparkSpec {
  import spark.implicits._

  private def p2(xs: Seq[Long]): Seq[Long] =
    xs.toDF("x").select(FixedPoint.pow2fp($"x").as("y"))
      .as[Long].collect().toSeq

  test("pow2fp: exact powers of two at integer inputs") {
    val ints = (0 to 40).map(_ * 1024L)
    assert(p2(ints) == (0 to 40).map(i => 1024L << i))
  }

  test("pow2fp: relative error vs math.pow under 2^-20 across the " +
      "fractional domain; monotone non-decreasing") {
    val xs = (0L to 40960L by 97L) ++ Seq(1L, 1023L, 40959L, 40960L)
    val ys = p2(xs.sorted)
    for ((x, y) <- xs.sorted.zip(ys)) {
      val exact = math.pow(2.0, x / 1024.0) * 1024.0
      assert(y <= exact + 1, s"pow2fp($x)=$y above true $exact")
      // error budget: ≤ 2 Q10 output ulps (the final floors) plus a
      // 10·2^-30 multiplicative term — each of the ten Q30 constant
      // multiplications floors away at most 2^-30 relative
      assert(exact - y <= 2.0 + exact * 10.0 / (1L << 30).toDouble,
        s"pow2fp($x)=$y too far below $exact")
    }
    assert(ys == ys.sorted, "must be monotone")
  }

  test("pow2fp clamps its documented domain instead of wrapping") {
    assert(p2(Seq(-5L, 0L)) == Seq(1024L, 1024L))
    assert(p2(Seq(40960L, 99999L)) == Seq(1024L << 40, 1024L << 40))
  }

  test("pow2fp propagates NULL (least/greatest would silently clamp it " +
      "to the max output)") {
    val r = Seq[Option[Long]](Some(1024L), None).toDF("x")
      .select(FixedPoint.pow2fp($"x").as("y")).collect()
    assert(r(0).getLong(0) == 2048L && r(1).isNullAt(0))
  }
}
