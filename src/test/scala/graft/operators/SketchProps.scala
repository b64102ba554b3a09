package graft.operators

import graft.TestSpark
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants of the mergeable sketch family
  * ([[HllSketch]], [[CountMin]]) over generated datasets:
  *  - HLL merge is commutative and idempotent; merged partitions give
  *    exactly the whole-data sketch (the pre-aggregation contract);
  *  - HLL estimate stays within the p=8 error envelope;
  *  - Count-Min never under-counts (est ≥ exact, the one-sided bound);
  *  - Count-Min partition merge is exact cell-wise addition.
  */
object SketchProps extends Properties("Sketches") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.init()
  import spark.implicits._

  // values with repeats and a skewed head; size bounded for wall-clock
  private val dataGen: Gen[List[Int]] = for {
    n <- Gen.choose(50, 2000)
    xs <- Gen.listOfN(n, Gen.frequency(
      3 -> Gen.const(7),                    // hot key
      7 -> Gen.choose(0, 500)))
  } yield xs

  property("hll: split-merge == whole; merge idempotent; bound holds") =
    forAll(dataGen, Gen.choose(1, 10)) { (xs, cut) =>
      val df = xs.map(("g", _)).toDF("g", "v")
      val (a, b) = xs.splitAt(xs.length * cut / 11)
      val sa = HllSketch.registers(a.map(("g", _)).toDF("g", "v"), Seq("g"), "v")
      val sb = HllSketch.registers(b.map(("g", _)).toDF("g", "v"), Seq("g"), "v")
      val merged = HllSketch.merge(sa, sb)(Seq("g"))
      val whole = HllSketch.registers(df, Seq("g"), "v")
      val mergedRows = merged.orderBy("register").collect().toSeq
      val sameAsWhole = mergedRows == whole.orderBy("register").collect().toSeq
      val idem = HllSketch.merge(merged, sa)(Seq("g"))
        .orderBy("register").collect().toSeq == mergedRows
      val est = HllSketch.estimate(merged, Seq("g")).head.getAs[Long]("estimate")
      val exact = xs.distinct.size
      val inBound = math.abs(est - exact).toDouble / math.max(exact, 1) < 0.3
      sameAsWhole && idem && inBound
    }

  property("countmin: est >= exact for every key; split-merge == whole") =
    forAll(dataGen) { xs =>
      val df = xs.map(x => Tuple1(x.toLong)).toDF("k")
      val sk = CountMin.sketch(df, Seq.empty, "k")
      val est = CountMin.estimate(sk, df.distinct(), Seq.empty, "k")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
      val upper = exact.forall { case (k, n) => est(k.toLong) >= n }
      val (a, b) = xs.splitAt(xs.length / 2)
      val merged = CountMin.merge(
        CountMin.sketch(a.map(x => Tuple1(x.toLong)).toDF("k"), Seq.empty, "k"),
        CountMin.sketch(b.map(x => Tuple1(x.toLong)).toDF("k"), Seq.empty, "k"))(Seq.empty)
      val same = merged.orderBy("row", "bucket").collect().toSeq ==
        sk.orderBy("row", "bucket").collect().toSeq
      upper && same
    }
}
