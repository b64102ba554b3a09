package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** Mergeable quantile sketch as a typed [[Aggregator]] — the rollup-able
  * percentile path beside the exact sort (q157) and the fixed-width
  * [[QuantileHistogram]]. Exact per-group percentiles need a full
  * per-group shuffle+sort and cannot be combined across partitions or
  * days; this sketch is a bounded-size state whose merge is associative
  * and commutative, so daily sketches roll up into monthly percentiles
  * without rescanning the fact — the same pre-aggregation contract as
  * [[HllSketch]] (cardinality) and [[CountMin]] (frequency).
  *
  * **Construction: deterministic level sampling** — the bottom
  * (sampler) layer of the KLL family (Karnin–Lang–Liberty, FOCS'16),
  * with the coin flips derived from data instead of an RNG: a row with
  * unique key `key` survives at sampling level ℓ iff its
  * [[graft.functions.AuditableHash.h60]] has ≥ ℓ leading zero bits
  * (within 60-bit width), i.e. with probability 2^−ℓ. The sketch keeps
  * the smallest level `L` at which ≤ k rows survive, plus those rows'
  * `(hash, value)` pairs. This buys the three properties the repo's
  * sketch discipline demands and a classic KLL/t-digest blob cannot
  * give:
  *
  *  - **Canonical**: the state is a pure function of the input
  *    MULTISET — any insertion order, any partitioning, any merge tree
  *    produces the identical `(L, sample)` (QuantileSketchProps pins
  *    it). A stock KLL compactor or t-digest centroid set depends on
  *    stream order, so two runs of the same query could hash
  *    differently.
  *  - **Auditable**: every stage (md5-derived hash, leading-zero
  *    level, suffix counts, order statistics) is exact integer
  *    arithmetic an ANSI SQL engine re-derives bit-for-bit — the q62
  *    register-table pattern; q167 is the DuckDB-hash-matched proof.
  *  - **Mergeable with no error growth on merge**: merged state =
  *    state of the union multiset, exactly — unlike t-digest, whose
  *    merges compound centroid error.
  *
  * The price is the error rate: a level sample of m ≈ k retained rows
  * estimates every rank to ±ε·n with ε = O(√(ln(1/δ)/m)) (the DKW /
  * Hoeffding sampling bound) — ~2.5%·n at k = 4096 — versus KLL's
  * O(log²(1/ε)/ε) space for the same ε. For warehouse percentile
  * rollups (p50/p90/p99 dashboards) the sampling bound is ample, and
  * the determinism is what makes the result a number a regulator (or
  * this repo's oracle gate) can re-derive. QuantileSketchSpec asserts
  * the realized rank error against the exact q157 answers.
  *
  * Degenerate input note: the inclusion coin is the ROW KEY's hash, so
  * rows sharing a key rise or fall together — keys must be (near-)
  * unique per row (a primary key / doc_id), or duplicates correlate
  * and widen ε.
  *
  * Scale shape: one partial+final typed aggregate — map-side state is
  * ≤ k pairs per group per task, shuffle carries one buffer per
  * (group, task), and the post-shuffle row count is bounded by groups,
  * not data. No sort, no window.
  */
object QuantileSketch {

  /** Retention cap: the finished sample holds ≤ k pairs. */
  val DefaultK = 1024

  /** Sampling level of a 60-bit hash: the number of leading zero bits
    * within 60-bit width (h = 0 → 60). P(level ≥ ℓ) = 2^−ℓ for a
    * uniform h.
    */
  def levelOf(h: Long): Int = 60 - (64 - java.lang.Long.numberOfLeadingZeros(h))

  /** Aggregation buffer. `hashes`/`values` are pair-aligned with
    * capacity k+1; only the first `size` slots are live (the encoder
    * ships the full capacity at shuffle — 2·(k+1)·8 bytes, the bounded
    * state the design promises).
    */
  final case class Buf(var n: Long, var level: Int, var size: Int,
      hashes: Array[Long], values: Array[Long])

  /** Finished sketch: exact row count, final sampling level, and the
    * retained pairs sorted by (value, hash) — a canonical layout, so
    * equal multisets give byte-equal sketches.
    */
  final case class QSketch(n: Long, level: Int,
      hashes: Array[Long], values: Array[Long])

  /** Drop retained pairs below the buffer's current level, in place. */
  private def filterInPlace(b: Buf): Unit = {
    var w = 0
    var r = 0
    while (r < b.size) {
      if (levelOf(b.hashes(r)) >= b.level) {
        b.hashes(w) = b.hashes(r); b.values(w) = b.values(r); w += 1
      }
      r += 1
    }
    b.size = w
  }

  /** Raise the buffer to `lvl`, evicting pairs below it — evict even
    * when the buffer is not over capacity: a merge that adopts the
    * higher side's level but keeps its own lower-level pairs would no
    * longer be the canonical state of the union multiset (the
    * QuantileSketchProps shrinker found exactly that).
    */
  private def raiseTo(b: Buf, lvl: Int): Unit =
    if (lvl > b.level) { b.level = lvl; filterInPlace(b) }

  /** Raise the buffer's level until ≤ k pairs remain. Terminates:
    * every pair's level is < 61, so at most 61 raises empty the buffer.
    */
  private def compact(b: Buf, k: Int): Unit =
    while (b.size > k) { b.level += 1; filterInPlace(b) }

  private def append(b: Buf, k: Int, h: Long, v: Long): Unit =
    if (levelOf(h) >= b.level) {
      b.hashes(b.size) = h; b.values(b.size) = v; b.size += 1
      if (b.size > k) compact(b, k)
    }

  private def finishBuf(b: Buf): QSketch = {
    val idx = Array.range(0, b.size).sortBy(i => (b.values(i), b.hashes(i)))
    QSketch(b.n, b.level, idx.map(b.hashes), idx.map(b.values))
  }

  private def emptyBuf(k: Int): Buf =
    Buf(0L, 0, 0, new Array[Long](k + 1), new Array[Long](k + 1))

  /** Fold a finished sketch into a buffer at capacity `cap` — the ONE
    * reduce body [[MergeAgg]] and [[LadderMergeAgg]] share (a future
    * merge-mechanics fix must not have to land in two places: the q184
    * gate row depends on them staying identical).
    */
  private def reduceSketch(b: Buf, cap: Int, sk: QSketch): Buf = {
    b.n += sk.n
    raiseTo(b, sk.level)
    var i = 0
    while (i < sk.hashes.length) {
      append(b, cap, sk.hashes(i), sk.values(i)); i += 1
    }
    b
  }

  private def mergeBufs(k: Int, b1: Buf, b2: Buf): Buf = {
    b1.n += b2.n
    raiseTo(b1, b2.level)
    var i = 0
    while (i < b2.size) { append(b1, k, b2.hashes(i), b2.values(i)); i += 1 }
    b1
  }

  /** The sketch-building aggregator over `(h60(rowKey), value)` rows.
    * Use via `functions.udaf(new QuantileSketch.Agg(k), Encoders.tuple(
    * Encoders.scalaLong, Encoders.scalaLong))`.
    */
  final class Agg(k: Int = DefaultK)
      extends Aggregator[(Long, Long), Buf, QSketch] {
    require(k >= 16, s"k must be >= 16, got $k")
    override def zero: Buf = emptyBuf(k)
    override def reduce(b: Buf, in: (Long, Long)): Buf = {
      b.n += 1
      append(b, k, in._1, in._2)
      b
    }
    override def merge(b1: Buf, b2: Buf): Buf = mergeBufs(k, b1, b2)
    override def finish(b: Buf): QSketch = finishBuf(b)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[QSketch] = Encoders.product[QSketch]
  }

  /** Re-aggregation of STORED sketches (the rollup path: daily sketch
    * tables → monthly percentiles with no fact rescan). Merging is the
    * union-multiset state exactly, so
    * `MergeAgg(day sketches) == Agg(whole period)` —
    * QuantileSketchProps pins it.
    *
    * Column use: a case-class input encoder flattens into one argument
    * per field, so invoke the udaf with the struct's fields —
    * `f($"sk.n", $"sk.level", $"sk.hashes", $"sk.values")`.
    */
  final class MergeAgg(k: Int = DefaultK)
      extends Aggregator[QSketch, Buf, QSketch] {
    override def zero: Buf = emptyBuf(k)
    override def reduce(b: Buf, sk: QSketch): Buf = reduceSketch(b, k, sk)
    override def merge(b1: Buf, b2: Buf): Buf = mergeBufs(k, b1, b2)
    override def finish(b: Buf): QSketch = finishBuf(b)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[QSketch] = Encoders.product[QSketch]
  }

  /** Finished LADDERED sketch ([[LadderAgg]]): exact row count, the
    * hash-sampling level of the buffer, the number of compactor rounds
    * applied at finish, and the retained pairs sorted by (value, hash).
    * A distinct type from [[QSketch]] ON PURPOSE: a laddered sketch is
    * a terminal compression — feeding it back through [[MergeAgg]]
    * (which re-filters by hash level) would silently treat
    * compaction survivors as a hash sample and skew every estimate, so
    * the field shape makes that misuse a type error. Roll up with
    * [[Agg]]/[[MergeAgg]] states; compact with the ladder LAST.
    */
  final case class LSketch(n: Long, level: Int, rounds: Int,
      hashes: Array[Long], values: Array[Long])

  /** Deterministic compactor cascade — the KLL-style top layer over an
    * already-canonical (value, hash)-sorted sample: while more than `k`
    * pairs remain, keep every other pair in value order, the odd/even
    * choice decided by a hash-coin that is a PURE FUNCTION of the
    * round's retained set (parity of the bit-count of the XOR of its
    * hashes). Each round halves the sample and costs at most one
    * sample-unit of rank error per query point, so the cascade's total
    * rank error is ≤ (2^rounds − 1) buffer-units — O(n/k) after the
    * buffer's own sampling error — while a plain level sample of the
    * same FINAL size pays the full O(n/√k) sampling bound. Determinism
    * is the repo's sketch discipline: no RNG, so the identical input
    * multiset cascades identically on any engine (the q177 oracle
    * unrolls these rounds as SQL CTEs and hash-matches).
    */
  private def cascade(s: QSketch, k: Int): LSketch = {
    var hs = s.hashes
    var vs = s.values
    var rounds = 0
    while (hs.length > k) {
      var x = 0L
      var i = 0
      while (i < hs.length) { x ^= hs(i); i += 1 }
      // coin = 1 keeps odd 1-based positions (ceil half), 0 keeps even
      val coin = java.lang.Long.bitCount(x) & 1
      val m = (hs.length + coin) / 2
      val nh = new Array[Long](m)
      val nv = new Array[Long](m)
      var w = 0
      i = 1 - coin
      while (i < hs.length) { nh(w) = hs(i); nv(w) = vs(i); w += 1; i += 2 }
      hs = nh; vs = nv; rounds += 1
    }
    LSketch(s.n, s.level, rounds, hs, vs)
  }

  /** Laddered quantile sketch: the [[Agg]] hash-sampler run at buffer
    * capacity `k·2^levels`, cascade-compacted down to ≤ k pairs at
    * finish. The aggregation STATE is the plain canonical level sample
    * (so Spark's partial-aggregation merge tree stays exactly the
    * [[Agg]] merge — canonical, partitioning-proof), and `finish` is a
    * pure function of that state, so the finished sketch is a pure
    * function of the input multiset end to end.
    *
    * Why: at equal PERSISTED size k, the plain sampler's rank error is
    * the sampling bound ε = O(1/√k), while the ladder pays the (much
    * smaller) sampling error of its 2^levels-larger buffer plus a
    * deterministic ≤ (2^levels − 1) buffer-units of compaction error —
    * ε ≈ O(1/√(k·2^levels) + 1/k), the KLL trade (Karnin–Lang–Liberty
    * FOCS'16) with hash-coins in place of RNG compaction choices.
    * QuantileSketchSpec measures the realized error of both at equal
    * final size against the exact sort. The price is the transient
    * buffer (2·(k·2^levels + 1)·8 bytes per group per task) and that
    * the OUTPUT is terminal (see [[LSketch]]): rollups merge [[Agg]]
    * states or stored [[QSketch]]s via [[MergeAgg]], and apply the
    * ladder only at the final read.
    */
  final class LadderAgg(k: Int = 256, levels: Int = 4)
      extends Aggregator[(Long, Long), Buf, LSketch] {
    require(k >= 16, s"k must be >= 16, got $k")
    require(levels >= 1 && levels <= 12,
      s"levels must be in [1,12], got $levels")
    private val cap = k << levels
    override def zero: Buf = emptyBuf(cap)
    override def reduce(b: Buf, in: (Long, Long)): Buf = {
      b.n += 1
      append(b, cap, in._1, in._2)
      b
    }
    override def merge(b1: Buf, b2: Buf): Buf = mergeBufs(cap, b1, b2)
    override def finish(b: Buf): LSketch = cascade(finishBuf(b), k)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[LSketch] = Encoders.product[LSketch]
  }

  /** Rollup + ladder in one read: re-aggregate STORED [[QSketch]]s
    * (daily/monthly mergeable states, the [[MergeAgg]] mechanics at
    * buffer capacity `k·2^levels`) and cascade-compact the merged
    * state at finish. This is how the terminal [[LadderAgg]] composes
    * with the rollup discipline: persist mergeable [[Agg]] states at
    * the buffer capacity, roll them up canonically forever, and pay
    * the compaction only at the final read — `LadderMergeAgg(part
    * sketches of Agg(k·2^levels)) == LadderAgg(whole input)` exactly
    * (canonical merge; QuantileSketchProps pins it, and q184 proves it
    * through the driver gate against q177's oracle).
    */
  final class LadderMergeAgg(k: Int = 256, levels: Int = 4)
      extends Aggregator[QSketch, Buf, LSketch] {
    require(k >= 16, s"k must be >= 16, got $k")
    require(levels >= 1 && levels <= 12,
      s"levels must be in [1,12], got $levels")
    private val cap = k << levels
    override def zero: Buf = emptyBuf(cap)
    override def reduce(b: Buf, sk: QSketch): Buf = reduceSketch(b, cap, sk)
    override def merge(b1: Buf, b2: Buf): Buf = mergeBufs(cap, b1, b2)
    override def finish(b: Buf): LSketch = cascade(finishBuf(b), k)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[LSketch] = Encoders.product[LSketch]
  }

  // ---- column-side readers of a finished sketch struct -------------------

  /** The q-percent estimate from a sketch column: the sample's
    * `ceil(q%·m)`-th order statistic (values are value-sorted in the
    * struct) — with width-1 sampling (level 0) this degenerates to
    * exact `percentile_disc`. Integer ranks only, the
    * [[QuantileHistogram.quantiles]] convention. NULL when the sample
    * is empty.
    */
  def estimate(sketch: Column, qPercent: Int): Column = {
    require(qPercent >= 1 && qPercent <= 100,
      s"q must be an integer percent in [1,100], got $qPercent")
    val vs = sketch.getField("values")
    val m = size(vs)
    // ceil via integer floor((m·q + 99)/100); m ≤ k < 2^21 so the double
    // division under floor() is exact
    val rank = floor((m.cast("long") * qPercent + lit(99L)) / lit(100L))
      .cast("int")
    when(m > 0, element_at(vs, rank))
  }

  /** Order-free digest of the retained sample — XOR of the pair
    * hashes. Two engines that retained the same sample agree on it
    * regardless of layout; q167 hash-checks it against DuckDB.
    */
  def sampleXor(sketch: Column): Column =
    aggregate(sketch.getField("hashes"), lit(0L), (acc, h) => acc.bitwiseXOR(h))
}
