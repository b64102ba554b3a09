package graft.operators

import graft.SparkSpec

class AggSpecSpec extends SparkSpec {
  import spark.implicits._

  private val spec = AggSpec("t", Seq("g"),
    Seq("COUNT(*) AS n", "SUM(v) AS sum_v"))

  test("incremental updates over deltas == one full recompute, exactly") {
    // integer metric values so the equality is exact (double sums would
    // only match to the ulp)
    val init = Seq(("a", 1L), ("b", 2L)).toDF("g", "v")
    val d1 = Seq(("a", 10L), ("c", 5L)).toDF("g", "v")
    val d2 = Seq(("b", 7L), ("c", 1L), ("a", 2L)).toDF("g", "v")
    val incremental = spec.incrementalUpdate(
      spec.incrementalUpdate(spec.run(init), d1), d2)
    val full = spec.run(init.union(d1).union(d2))
    assert(incremental.orderBy("g").collect().toSeq ==
      full.orderBy("g").collect().toSeq)
  }

  test("new groups appear, untouched groups keep their values") {
    val out = spec.incrementalUpdate(
        spec.run(Seq(("a", 1L)).toDF("g", "v")),
        Seq(("z", 9L)).toDF("g", "v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("a" -> ((1L, 1L)), "z" -> ((1L, 9L))))
  }

  test("retractions: expired rows subtract; emptied groups vanish — == full recompute") {
    val day0 = Seq(("a", 1L), ("a", 2L), ("b", 5L)).toDF("g", "v")
    // day 1: add one 'a' and one new 'c'; expire BOTH original 'b' and one 'a'
    val added = Seq(("a", 7L), ("c", 9L)).toDF("g", "v")
    val removed = Seq(("b", 5L), ("a", 1L)).toDF("g", "v")
    val incremental = spec.incrementalUpdateWithRetractions(
      spec.run(day0), added, removed)
    val survivors = Seq(("a", 2L), ("a", 7L), ("c", 9L)).toDF("g", "v")
    val full = spec.run(survivors)
    assert(incremental.orderBy("g").collect().toSeq ==
      full.orderBy("g").collect().toSeq)
    // 'b' is GONE, not a zero row
    assert(incremental.filter($"g" === "b").count() == 0)
  }

  test("retractions require a COUNT metric for existence") {
    val sumOnly = AggSpec("t", Seq("g"), Seq("SUM(v) AS s"))
    intercept[IllegalArgumentException] {
      sumOnly.incrementalUpdateWithRetractions(
        sumOnly.run(Seq(("a", 1L)).toDF("g", "v")),
        Seq(("a", 2L)).toDF("g", "v"), Seq(("a", 1L)).toDF("g", "v"))
    }
  }

  test("non-additive metrics refused") {
    val bad = AggSpec("t", Seq("g"), Seq("AVG(v) AS avg_v"))
    intercept[IllegalArgumentException] {
      bad.incrementalUpdate(bad.run(Seq(("a", 1L)).toDF("g", "v")),
        Seq(("a", 2L)).toDF("g", "v"))
    }
  }

  test("metric names parse the AS alias case-insensitively") {
    assert(AggSpec("t", Seq("g"), Seq("count(*) as total", "SUM(x) AS s"))
      .metricNames == Seq("total", "s"))
  }
}
