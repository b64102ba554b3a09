package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  private val K = 256

  test("small sets are EXACT: fewer than k distinct keys → est == exact " +
      "count, kth_hash NULL; duplicates collapse") {
    val df = (1 to 100).flatMap(i => Seq(("g", s"key$i"), ("g", s"key$i")))
      .toDF("g", "v")
    val r = ThetaSketch.estimate(
      ThetaSketch.sketch(df, Seq("g"), "v", K), Seq("g"), K).head()
    assert(r.getLong(1) == 100L)    // n_retained
    assert(r.isNullAt(2))           // kth_hash
    assert(r.getLong(3) == 100L)    // est == exact
  }

  test("estimate accuracy: 20k distinct keys within the KMV error " +
      "envelope at k=256; estimate is partitioning-invariant") {
    val df = (1 to 20000).map(i => ("g", s"user-$i")).toDF("g", "v")
    def est(parts: Int) = ThetaSketch.estimate(
      ThetaSketch.sketch(df.repartition(parts), Seq("g"), "v", K),
      Seq("g"), K).head().getLong(3)
    val e = est(4)
    // standard error ≈ 1/sqrt(k−2) ≈ 6.3%; assert a 4σ envelope
    assert(math.abs(e - 20000.0) / 20000.0 < 0.25, s"est $e vs 20000")
    assert(est(13) == e)
  }

  test("merge of daily parts == sketch of the whole (canonical state; " +
      "no error growth on merge)") {
    val df = (1 to 5000).map(i => ("g", s"k$i")).toDF("g", "v")
    val parts = (0 to 2).map(p =>
      ThetaSketch.sketch(df.filter(pmod(xxhash64($"v"), lit(3)) === p),
        Seq("g"), "v", K))
    val merged = ThetaSketch.merge(parts: _*)(Seq("g"), K)
      .orderBy($"h").collect().map(_.getLong(1)).toSeq
    val whole = ThetaSketch.sketch(df, Seq("g"), "v", K)
      .orderBy($"h").collect().map(_.getLong(1)).toSeq
    assert(merged == whole)
  }

  test("intersection: exact on fully-retained sets; overlap envelope on " +
      "large sets; disjoint sets read zero") {
    // exact regime: both sides + union under k
    val a = (1 to 120).map(i => ("p", s"k$i")).toDF("p", "v")
    val b = (81 to 200).map(i => ("p", s"k$i")).toDF("p", "v")
    val r = ThetaSketch.intersect(
      ThetaSketch.sketch(a, Seq("p"), "v", K),
      ThetaSketch.sketch(b, Seq("p"), "v", K), Seq("p"), K).head()
    assert(r.getLong(1) == 40L)     // n_common exact
    assert(r.getLong(2) == 200L)    // est_union exact
    assert(r.getLong(3) == 40L)     // est_intersection exact
    assert(r.getLong(4) == 80L)     // est_only_a exact (1..80)
    assert(r.getLong(5) == 80L)     // est_only_b exact (121..200)
    assert(r.getLong(6) == 200000L) // jaccard 0.2 exactly
    // estimated regime: 10k ∪ 10k with 5k overlap (15k distinct)
    val bigA = (1 to 10000).map(i => ("p", s"u$i")).toDF("p", "v")
    val bigB = (5001 to 15000).map(i => ("p", s"u$i")).toDF("p", "v")
    val rb = ThetaSketch.intersect(
      ThetaSketch.sketch(bigA, Seq("p"), "v", K),
      ThetaSketch.sketch(bigB, Seq("p"), "v", K), Seq("p"), K).head()
    assert(math.abs(rb.getLong(2) - 15000.0) / 15000.0 < 0.25,
      s"union est ${rb.getLong(2)}")
    assert(math.abs(rb.getLong(3) - 5000.0) / 5000.0 < 0.35,
      s"intersection est ${rb.getLong(3)}")
    assert(math.abs(rb.getLong(4) - 5000.0) / 5000.0 < 0.35,
      s"only-a est ${rb.getLong(4)}")
    // the three legs tile the union (within integer-div truncation)
    assert(math.abs(rb.getLong(3) + rb.getLong(4) + rb.getLong(5)
      - rb.getLong(2)) <= 3)
    // disjoint
    val rd = ThetaSketch.intersect(
      ThetaSketch.sketch(bigA, Seq("p"), "v", K),
      ThetaSketch.sketch((20001 to 30000).map(i => ("p", s"u$i")).toDF("p", "v"),
        Seq("p"), "v", K), Seq("p"), K).head()
    assert(rd.getLong(3) == 0L && rd.getLong(6) == 0L)
  }

  test("aggregator state is canonical: any split/merge tree equals the " +
      "one-pass bottom-k") {
    val agg = new ThetaSketch.BottomKAgg(8)
    val hs = Seq(50L, 10L, 99L, 10L, 3L, 77L, 42L, 8L, 15L, 63L, 3L, 1L)
    val onePass = hs.foldLeft(agg.zero)(agg.reduce).toSeq
    assert(onePass == hs.distinct.sorted.take(8))
    for (cut <- 1 until hs.length) {
      val (x, y) = hs.splitAt(cut)
      val m = agg.merge(x.foldLeft(agg.zero)(agg.reduce),
        y.foldLeft(agg.zero)(agg.reduce)).toSeq
      assert(m == onePass, s"cut $cut")
      val m2 = agg.merge(y.foldLeft(agg.zero)(agg.reduce),
        x.foldLeft(agg.zero)(agg.reduce)).toSeq
      assert(m2 == onePass, s"cut $cut reversed")
    }
  }
}
