package graft.operators

import graft.functions.AuditableHash
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants of [[QuantileSketch]] — pure
  * Aggregator-level checks (no Spark session needed, so hundreds of
  * generated cases run in milliseconds):
  *
  *  - **Canonical form**: any split of the input into parts, in any
  *    order, reduced independently and merged in any tree shape,
  *    finishes to the identical sketch as one sequential pass —
  *    the property that makes the sketch partitioning-proof and
  *    oracle-hash-matchable (q167).
  *  - **Rollup**: re-aggregating FINISHED part-sketches
  *    ([[QuantileSketch.MergeAgg]]) equals sketching the whole input —
  *    the daily→monthly contract.
  *  - **Rank error**: every p50/p90/p99 estimate's true rank is within
  *    the sampling bound ε·n + 1 with ε = 2.5/√m (DKW/Hoeffding at
  *    δ ≪ 1e-5; the md5 coins are fixed, so a pass is reproducible,
  *    not flaky).
  */
object QuantileSketchProps extends Properties("QuantileSketch") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val K = 64 // small cap so generated data actually compacts

  /** (key, value) rows: values skewed + heavy ties, keys unique. */
  private val rowsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 800)
    vs <- Gen.listOfN(n, Gen.frequency(
      2 -> Gen.const(42L),           // heavy tie
      5 -> Gen.choose(0L, 1000L),
      3 -> Gen.choose(0L, 100000000L)))
  } yield vs.zipWithIndex.map { case (v, i) =>
    AuditableHash.h60(s"row:$i") -> v
  }

  private def sketch(rows: Seq[(Long, Long)]): QuantileSketch.QSketch = {
    val a = new QuantileSketch.Agg(K)
    a.finish(rows.foldLeft(a.zero)(a.reduce))
  }

  private def key(s: QuantileSketch.QSketch) =
    (s.n, s.level, s.hashes.toSeq, s.values.toSeq)

  property("canonical: split anywhere, merge any way == one pass") =
    forAll(rowsGen, Gen.choose(2, 7), Gen.long) { (rows, parts, seed) =>
      val a = new QuantileSketch.Agg(K)
      // deterministic pseudo-shuffle + split from the seed
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(rows)
      val chunks = shuffled.grouped(math.max(1, rows.size / parts)).toList
      val bufs = chunks.map(c => c.foldLeft(a.zero)(a.reduce))
      // left fold merge AND right fold merge must both equal one pass
      val left = a.finish(bufs.reduce(a.merge))
      val right = a.finish(
        chunks.map(c => c.foldLeft(a.zero)(a.reduce)).reduceRight(a.merge))
      key(left) == key(sketch(rows)) && key(right) == key(sketch(rows))
    }

  property("rollup: MergeAgg over finished part-sketches == whole") =
    forAll(rowsGen, Gen.choose(2, 5)) { (rows, parts) =>
      val m = new QuantileSketch.MergeAgg(K)
      val partSketches = rows.grouped(math.max(1, rows.size / parts))
        .map(sketch).toList
      val rolled = m.finish(partSketches.foldLeft(m.zero)(m.reduce))
      key(rolled) == key(sketch(rows))
    }

  property("ladder canonical: split anywhere, merge any way == one pass, " +
      "and the finished sample is <= k") =
    forAll(rowsGen, Gen.choose(2, 7), Gen.long) { (rows, parts, seed) =>
      val a = new QuantileSketch.LadderAgg(16, 3) // tiny so cascades fire
      def one(rs: Seq[(Long, Long)]) =
        a.finish(rs.foldLeft(a.zero)(a.reduce))
      def k(s: QuantileSketch.LSketch) =
        (s.n, s.level, s.rounds, s.hashes.toSeq, s.values.toSeq)
      val rnd = new scala.util.Random(seed)
      val chunks = rnd.shuffle(rows)
        .grouped(math.max(1, rows.size / math.max(1, parts))).toList
      // fresh buffers per fold: merge mutates its left argument in place
      def bufs = chunks.map(c => c.foldLeft(a.zero)(a.reduce))
      val left = a.finish(bufs.reduce(a.merge))
      val right = a.finish(bufs.reduceRight(a.merge))
      val whole = one(rows)
      whole.hashes.length <= 16 &&
        k(left) == k(whole) && k(right) == k(whole)
    }

  property("ladder rollup: LadderMergeAgg over finished part-sketches at " +
      "the buffer capacity == LadderAgg over the whole input") =
    forAll(rowsGen, Gen.choose(2, 5)) { (rows, parts) =>
      val buf = new QuantileSketch.Agg(16 << 3) // the ladder's buffer
      def part(rs: Seq[(Long, Long)]) =
        buf.finish(rs.foldLeft(buf.zero)(buf.reduce))
      val lm = new QuantileSketch.LadderMergeAgg(16, 3)
      val rolled = lm.finish(rows.grouped(math.max(1, rows.size / parts))
        .map(part).foldLeft(lm.zero)(lm.reduce))
      val lad = new QuantileSketch.LadderAgg(16, 3)
      val whole = lad.finish(rows.foldLeft(lad.zero)(lad.reduce))
      def k(s: QuantileSketch.LSketch) =
        (s.n, s.level, s.rounds, s.hashes.toSeq, s.values.toSeq)
      k(rolled) == k(whole)
    }

  property("ladder sample stays value-sorted and a subset of the buffer " +
      "sample (cascade only drops, never invents)") =
    forAll(rowsGen) { rows =>
      val lad = new QuantileSketch.LadderAgg(16, 3)
      val buf = new QuantileSketch.Agg(16 << 3) // the ladder's buffer alone
      val ls = lad.finish(rows.foldLeft(lad.zero)(lad.reduce))
      val bs = buf.finish(rows.foldLeft(buf.zero)(buf.reduce))
      val bufPairs = bs.hashes.zip(bs.values).toSet
      ls.hashes.zip(ls.values).forall(bufPairs.contains) &&
        ls.values.toSeq == ls.values.toSeq.sorted &&
        ls.level == bs.level && ls.n == bs.n
    }

  property("rank error within the sampling bound at every q") =
    forAll(rowsGen) { rows =>
      val sk = sketch(rows)
      val sorted = rows.map(_._2).sorted
      val n = sorted.size
      val m = sk.values.length
      m == 0 || Seq(50, 90, 99).forall { q =>
        val rank = (m.toLong * q + 99) / 100 // ceil, 1-based
        val est = sk.values(rank.toInt - 1)
        // true rank band of est among the full data (ties give a band)
        val lo = sorted.indexWhere(_ == est) + 1
        val hi = sorted.lastIndexWhere(_ == est) + 1
        val target = (n.toLong * q + 99) / 100
        val eps = 2.5 / math.sqrt(m.toDouble)
        val slack = math.ceil(eps * n).toLong + 1
        target >= lo - slack && target <= hi + slack
      }
    }
}
