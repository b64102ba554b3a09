package graft.operators

import graft.TestSpark
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants of the portable Bloom filter over
  * generated key sets and arbitrary split points:
  *  - NO FALSE NEGATIVES — every inserted key probes member under any
  *    partitioning of the build (the soundness contract
  *    decontamination rests on);
  *  - split-merge == whole-data filter BIT-FOR-BIT, and re-ORing a
  *    part is a no-op (associativity + commutativity + idempotence —
  *    the replay-safety algebra);
  *  - disjoint value spaces stay (probabilistically) apart: the FP
  *    count over a disjoint probe set respects a loose multiple of
  *    the analytic bound.
  */
object PortableBloomProps extends Properties("PortableBloom") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private val dataGen: Gen[List[Int]] = for {
    n <- Gen.choose(20, 1200)
    xs <- Gen.listOfN(n, Gen.choose(0, 5000))
  } yield xs

  property("split-merge == whole bit-for-bit; re-OR idempotent; no false negatives") =
    forAll(dataGen, Gen.choose(1, 10)) { (xs, cut) =>
      val df = xs.map(i => s"k:$i").toDF("k")
      val (a, b) = xs.splitAt(xs.length * cut / 11)
      val sa = PortableBloom.sketch(a.map(i => s"k:$i").toDF("k"), Seq.empty, "k")
      val sb = PortableBloom.sketch(b.map(i => s"k:$i").toDF("k"), Seq.empty, "k")
      val merged = PortableBloom.merge(sa, sb)(Seq.empty)
      val whole = PortableBloom.sketch(df, Seq.empty, "k")
      val mergedRows = merged.orderBy("word").collect().toSeq
      val sameAsWhole = mergedRows == whole.orderBy("word").collect().toSeq
      val idem = PortableBloom.merge(merged, sb)(Seq.empty)
        .orderBy("word").collect().toSeq == mergedRows
      val words = PortableBloom.collectWords(merged)
      val noFalseNeg = df.filter(!PortableBloom.probe(words)($"k")).count() == 0L
      sameAsWhole && idem && noFalseNeg
    }

  property("disjoint probes: FP rate respects a loose analytic multiple") =
    forAll(dataGen) { xs =>
      val words = PortableBloom.collectWords(
        PortableBloom.sketch(xs.map(i => s"k:$i").toDF("k"), Seq.empty, "k"))
      val probes = (1 to 3000).map(i => s"other:$i").toDF("k")
      val fp = probes.filter(PortableBloom.probe(words)($"k")).count()
      val kD = PortableBloom.DefaultK.toDouble
      val n = xs.distinct.size
      val bound = math.pow(1.0 - math.exp(-kD * n / PortableBloom.DefaultM), kD)
      // generous multiple + additive slack for tiny n (0 expected FPs)
      fp.toDouble / 3000 <= bound * 4 + 0.003
    }
}
