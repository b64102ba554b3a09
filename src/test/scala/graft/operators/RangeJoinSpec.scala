package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    (0, 0.0, 5.0),    // narrower than one chunk
    (1, 5.0, 25.0),   // spans several chunks
    (2, 25.0, 26.0),
    (3, 30.0, 40.0),  // gap before it: points in [26,30) match nothing
    (4, 35.0, 50.0),  // overlaps band 3: points in [35,40) match both
  ).toDF("iv_id", "lo", "hi")

  private val points = (0 until 600).map(i => (i.toLong, i * 0.1)).toDF("pid", "p")

  test("chunk-bucketed == naive inequality join, incl. overlaps, gaps, boundaries") {
    val fast = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", chunkWidth = 7.0)
      .select("pid", "iv_id")
    val naive = points.join(intervals, $"lo" <= $"p" && $"p" < $"hi")
      .select("pid", "iv_id")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    assert(fast.count() == naive.count())
    // half-open semantics at an exact boundary: p = 5.0 is in [5,25) not [0,5)
    val at5 = fast.filter($"pid" === 50L).select("iv_id").as[Int].collect().toSet
    assert(at5 == Set(1))
  }

  test("plan: hash join on the chunk id, no nested-loop product") {
    val out = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", chunkWidth = 7.0)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("degenerate inputs: null/empty/inverted intervals and null points drop") {
    val iv = Seq(
      (0, Some(1.0), Some(2.0)),
      (1, None, Some(9.0)),
      (2, Some(3.0), None),
      (3, Some(8.0), Some(8.0)), // empty [8,8)
      (4, Some(9.0), Some(4.0)), // inverted
    ).toDF("iv_id", "lo", "hi")
    val pts = Seq(Some(1.5), None).toDF("p").withColumn("pid", lit(1L))
    val out = RangeJoin.pointInInterval(pts, "p", iv, "lo", "hi", 2.0)
    assert(out.select("iv_id").as[Int].collect().toSeq == Seq(0))
  }
}
