package graft.operators

import graft.functions.AuditableHash
import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bottom-k (KMV / theta) distinct sketch — the SET-OPERATION member of
  * the portable sketch family: [[HllSketch]] answers "how many
  * distinct", this answers "how many distinct IN COMMON" (audience
  * overlap, cross-table dedup rates, Jaccard between day partitions)
  * — the query HLL fundamentally cannot serve (its registers lose the
  * identities). Classic KMV (Bar-Yossef et al. 2002 / the Theta-sketch
  * framework): keep the k smallest distinct [[AuditableHash.h60]]
  * values of the keys; the k-th smallest hash estimates density
  * (`θ = h_k / 2^60`), so `distinct ≈ (k−1)·2^60 / h_k`, and any set
  * expression evaluates over the retained hash SETS before the one
  * terminal division.
  *
  * The repo's sketch discipline, same as q62/q167: the retained state
  * is a pure function of the input SET (k smallest distinct hashes —
  * order-free, duplicate-free by construction), md5-derived hashes the
  * oracle recomputes, and every estimator is exact integer arithmetic
  * (`(k−1)·2^60` in decimal(38,0) ↔ HUGEINT; one integer DIV at the
  * end) — so sketches, estimates, and intersections are
  * DuckDB-hash-matched (q171/q172), partitioning-proof, and mergeable
  * with no error growth (merged state = state of the union set,
  * exactly — the [[QuantileSketch]] canonical-merge contract).
  *
  * Table form: one `(group…, h)` row per retained hash — persistable,
  * additive across daily parts via [[merge]] (re-aggregate, trim), the
  * [[HllSketch.registers]] layout discipline. Standard error of the
  * distinct estimate ≈ 1/√(k−2) (~6% at k = 256); intersections add
  * the union-θ resolution floor (an intersection far smaller than
  * union/k reads 0 — document-sized truth, ThetaSketchSpec asserts the
  * envelope against exact counts).
  */
object ThetaSketch {

  /** 2^60 — the h60 hash domain size (θ denominator). */
  val Domain: Long = 1L << 60

  /** Bottom-k distinct-longs aggregator: buffer = sorted array of the
    * ≤ k smallest distinct values seen. Canonical (a pure function of
    * the input set), so any partial-aggregation tree yields the
    * identical state.
    */
  final class BottomKAgg(k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 2, s"k must be >= 2, got $k")

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already retained
      else {
        val ins = -pos - 1
        if (buf.length >= k && ins >= k) buf // not smaller than the k-th
        else {
          val n = math.min(buf.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // sorted-merge with dedup, trimmed to k
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val take =
          if (i >= a.length) { j += 1; b(j - 1) }
          else if (j >= b.length) { i += 1; a(i - 1) }
          else if (a(i) < b(j)) { i += 1; a(i - 1) }
          else if (b(j) < a(i)) { j += 1; b(j - 1) }
          else { i += 1; j += 1; a(i - 1) }
        out(o) = take; o += 1
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  private def bottomK(df: DataFrame, groupCols: Seq[String], hCol: Column,
      k: Int): DataFrame = {
    val agg = udaf(new BottomKAgg(k), ExpressionEncoder[Long]())
    df.select(groupCols.map(col) :+ hCol.as("__h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col("__h")).as("__bk"))
      .select(groupCols.map(col) :+ explode(col("__bk")).as("h"): _*)
  }

  /** The sketch as rows: per group, the k smallest distinct
    * `h60(value)` — `(groupCols…, h)`. One partial+final typed
    * aggregate (map-side state ≤ k longs per group per task); NULL
    * values are skipped.
    */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 256): DataFrame =
    bottomK(df.filter(col(valueCol).isNotNull), groupCols,
      AuditableHash.h60(col(valueCol)), k)

  /** Merge sketch tables (e.g. daily parts of the same key space):
    * re-run the bottom-k over the unioned hash rows — merged state =
    * sketch of the unioned input, exactly (ThetaSketchSpec).
    */
  def merge(parts: DataFrame*)(groupCols: Seq[String], k: Int = 256): DataFrame = {
    require(parts.nonEmpty, "nothing to merge")
    bottomK(parts.reduce(_ unionByName _), groupCols, col("h"), k)
  }

  /** Distinct estimate per group: `(groupCols…, n_retained, kth_hash,
    * est_distinct)`. A group with fewer than k retained hashes saw
    * fewer than k distinct keys — the estimate is that EXACT count
    * (`kth_hash` NULL); at k retained, `est = (k−1)·2^60 DIV h_k`
    * (decimal(38,0) numerator — `(k−1)·2^60` passes signed-64 at
    * k > 8).
    */
  def estimate(sk: DataFrame, groupCols: Seq[String],
      k: Int = 256): DataFrame =
    sk.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_retained"), max(col("h")).as("__kth"))
      .select(groupCols.map(col) ++ Seq(
        col("n_retained"),
        when(col("n_retained") >= k, col("__kth")).as("kth_hash"),
        when(col("n_retained") < k, col("n_retained"))
          // floor of the positive decimal quotient == integer DIV ==
          // DuckDB's `//` — unambiguous on both engines
          .otherwise(floor(lit(k - 1).cast("decimal(38,0)") *
            lit(Domain).cast("decimal(38,0)") /
            col("__kth").cast("decimal(38,0)")).cast("long"))
          .as("est_distinct")): _*)

  /** Set-operation estimates between the sketches of two key sets
    * (same k), per group: `(groupCols…, n_common, est_union,
    * est_intersection, est_only_a, est_only_b, jaccard_fp)`. The union
    * sketch is the bottom-k of the hash union; `n_common` counts
    * retained union hashes present in BOTH sides (the standard theta
    * intersection), and the difference legs count one-sided retained
    * hashes the same way; each estimate is `count·est_union DIV k'`
    * and `jaccard_fp = n_common·10^6 DIV k'` with k' = the union's
    * retained count (= min(k, |A∪B| distinct) — small sets stay
    * exact, and the three estimates always sum to ≈ est_union).
    */
  def intersect(skA: DataFrame, skB: DataFrame, groupCols: Seq[String],
      k: Int = 256): DataFrame = {
    // each side feeds the union build AND a membership join, and the
    // union feeds the membership aggregate AND its own estimate —
    // checkpoint all three (≤ k rows per group each) so a caller
    // passing un-materialized sketch pipelines computes each ONCE
    val cols = groupCols :+ "h"
    val a = skA.select(cols.map(col): _*).localCheckpoint(eager = true)
    val b = skB.select(cols.map(col): _*).localCheckpoint(eager = true)
    val u = merge(a, b)(groupCols, k).localCheckpoint(eager = true)
    val both = u
      .join(a.withColumn("__ina", lit(1)), cols, "left")
      .join(b.withColumn("__inb", lit(1)), cols, "left")
    val est = estimate(u, groupCols, k)
      .select(groupCols.map(col) :+ col("est_distinct").as("est_union"): _*)
    both.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__ku"),
        sum(when(col("__ina") === 1 && col("__inb") === 1, 1L).otherwise(0L))
          .as("n_common"),
        sum(when(col("__ina") === 1 && col("__inb").isNull, 1L).otherwise(0L))
          .as("__onlya"),
        sum(when(col("__ina").isNull && col("__inb") === 1, 1L).otherwise(0L))
          .as("__onlyb"))
      .join(est, groupCols)
      .select(groupCols.map(col) ++ Seq(
        col("n_common"),
        col("est_union"),
        // count·est_union in decimal(38,0), NOT long: est_union can
        // approach (k−1)·2^60/h_k, so the long product overflows
        // signed-64 once the union cardinality nears 2^63/k (~10^16 at
        // k=256) — the same headroom discipline as estimate()'s
        // numerator (and the oracle's HUGEINT). floor of the positive
        // decimal quotient == integer DIV on both engines.
        scaledRatio("n_common", "est_union").as("est_intersection"),
        scaledRatio("__onlya", "est_union").as("est_only_a"),
        scaledRatio("__onlyb", "est_union").as("est_only_b"),
        expr("n_common * CAST(1000000 AS BIGINT) DIV __ku").as("jaccard_fp")): _*)
  }

  /** `count·scale DIV __ku` with the product carried in decimal(38,0)
    * (count ≤ k keeps the quotient's 32 integer digits ample). */
  private def scaledRatio(cnt: String, scale: String): Column =
    floor(col(cnt).cast("decimal(38,0)") * col(scale).cast("decimal(38,0)") /
      col("__ku").cast("decimal(38,0)")).cast("long")
}
