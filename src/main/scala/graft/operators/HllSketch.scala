package graft.operators

import graft.functions.AuditableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable HyperLogLog: approximate distinct counting whose sketch is
  * an engine-neutral *table* of integer register maxima, not an opaque
  * binary blob. Spark's own `approx_count_distinct` (Flajolet et al.'s
  * HLL++ with Spark-specific xxhash64 and bias tables) is the right
  * default inside one query; this operator exists for the two things a
  * blob sketch can't give a 100 TB warehouse:
  *
  *   - **Mergeable pre-aggregation across jobs**: register tables are
  *     plain rows — `merge` is `max` per (group, register), so daily
  *     sketches roll up into monthly/period distinct counts without
  *     rescanning the fact (the data-mart pattern for COUNT(DISTINCT),
  *     which is otherwise non-rollup-able: SURVEY.md §2.4 A3's scale
  *     switch, `extract/create_control_db_v5.sql:154`).
  *   - **Auditability**: every stage — hash, register index, rank, the
  *     fixed-point register sum — is exact integer arithmetic on the
  *     md5-derived [[AuditableHash]], reproducible bit-for-bit by any
  *     ANSI SQL engine (the DuckDB oracle recomputes the full estimate,
  *     q62). A distinct-count a regulator can re-derive beats one they
  *     must trust.
  *
  * Estimator layout (classic HLL, Flajolet–Fuchs–Gandouet–Meunier '07):
  * h = h60(v) (60 bits); register j = h mod m (m = 2^p registers);
  * remaining w = h div m (60−p bits); rank ρ = (60−p) − bitlen(w) + 1 =
  * leading zeros + 1, where bitlen is exact via `length(bin(w))` in
  * both engines (no float log2 at bucket boundaries). The harmonic sum
  * Σ 2^−ρ is kept in **fixed point**: Σ 2^(53−ρ) as BIGINT — every term
  * is exact, the sum is order-free (integer addition commutes; doubles
  * would round differently per shuffle order), and m·2^53 < 2^63 for
  * p ≤ 9. One double division at the end produces the estimate; the
  * standard small-range linear-counting correction applies below 2.5m
  * when empty registers remain. Relative error ≈ 1.04/√m (±6.5% at
  * p=8); raise p for tighter marts.
  */
object HllSketch {

  /** Bits kept after the register index (fixed-point scale). */
  private val FpBits = 53

  /** α_m · m² · 2^53 — the raw-estimate numerator as ONE driver-side
    * double constant. Both the Spark plan and the generated oracle SQL
    * embed this exact value (`Double.toString` round-trips; DuckDB's
    * correctly-rounded parse recovers the identical IEEE bits), so no
    * cross-engine float expression evaluation can drift. DuckDB would
    * otherwise read `0.7213` as DECIMAL, not DOUBLE.
    */
  def rawNumerator(m: Int): Double =
    0.7213 / (1.0 + 1.079 / m) * m * m * (1L << FpBits).toDouble

  /** Per-(group, register) maxima: the sketch as rows. Columns:
    * groupCols ++ (register INT, rank INT). One shuffle keyed on
    * (group, register) with full map-side partial aggregation — at any
    * scale the post-shuffle row count is bounded by groups × m, not by
    * the data.
    */
  def registers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 9, s"p must be in [4,9] (m·2^53 must fit a long), got $p")
    val m = 1 << p
    val h = AuditableHash.h60(col(valueCol))
    // h div 2^p via shiftright — Column./ is DOUBLE division, which
    // loses bits above 2^53 on a 60-bit hash
    val w = shiftright(h, p).as("w")
    val bitlen = when(col("w") === 0L, 0)
      .otherwise(length(bin(col("w")))).cast("int")
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ (h % m).cast("int").as("register") :+ w: _*)
      // rank capped at FpBits: for p < 8 a rho of up to (60-p)+1 > 53 is
      // (astronomically rarely, ~2^-53) reachable, and 53 - rank would go
      // negative — Java's shiftleft wraps the amount mod 64, poisoning
      // fp_sum. The cap costs < 1 ulp of the estimate and keeps every
      // fixed-point term exact.
      .withColumn("rho", least(lit(60 - p) - bitlen + 1, lit(FpBits)))
      .groupBy((groupCols :+ "register").map(col): _*)
      .agg(max(col("rho")).cast("int").as("rank"))
  }

  /** Merge sketches (e.g. daily partitions of the same register table):
    * max per (group, register). Associative, commutative, idempotent —
    * replay-safe.
    */
  def merge(sketches: DataFrame*)(groupCols: Seq[String]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy((groupCols :+ "register").map(col): _*)
      .agg(max(col("rank")).cast("int").as("rank"))

  /** Estimate per group from a register table. Output: groupCols ++
    * (n_registers_hit INT, fp_sum BIGINT, estimate BIGINT). The two
    * integer columns ARE the sketch digest (exact, hash-checkable);
    * `estimate` applies the double math (one division + optional
    * linear-counting branch) and rounds half-up to a BIGINT.
    */
  def estimate(registers: DataFrame, groupCols: Seq[String],
      p: Int = 8): DataFrame = {
    val m = 1 << p
    // fixed-point Σ over ALL m registers: absent ones contribute 2^53
    val hitTerm = sum(expr(s"shiftleft(CAST(1 AS BIGINT), $FpBits - rank)")).as("hit_sum")
    val agg = registers.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("int").as("n_registers_hit"), hitTerm)
    val zeros = lit(m) - col("n_registers_hit")
    val fpSum = (col("hit_sum") + zeros.cast("long") * lit(1L << FpBits)).as("fp_sum")
    val raw = lit(rawNumerator(m)) / col("fp_sum")
    val corrected = when(col("n_registers_hit") < m && raw <= lit(2.5 * m),
        lit(m.toDouble) * log(lit(m.toDouble) / (lit(m) - col("n_registers_hit")).cast("double")))
      .otherwise(raw)
    agg.withColumn("fp_sum", fpSum)
      .withColumn("estimate", floor(corrected + lit(0.5)).cast("long"))
      .drop("hit_sum")
      .select((groupCols :+ "n_registers_hit" :+ "fp_sum" :+ "estimate").map(col): _*)
  }

  /** One-shot convenience: sketch + estimate in a single plan. */
  def approxCountDistinct(df: DataFrame, groupCols: Seq[String],
      valueCol: String, p: Int = 8): DataFrame =
    estimate(registers(df, groupCols, valueCol, p), groupCols, p)

  /** The DuckDB SQL computing [[AuditableHash.h60]]-based rho for an
    * expression — kept beside the Scala form so oracle and engine can't
    * drift (mirrors [[AuditableHash.duckH60]]).
    */
  def duckRho(expr: String, p: Int): String = {
    val m = 1 << p
    val w = s"(${AuditableHash.duckH60(expr)} // $m)"
    // least(..., FpBits) mirrors registers()'s rank cap (no-op at p=8)
    s"least(${60 - p} - (CASE WHEN $w = 0 THEN 0 ELSE length(bin($w)) END) + 1, $FpBits)"
  }
}
