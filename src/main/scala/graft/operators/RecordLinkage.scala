package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — the Fellegi–Sunter model ("A Theory
  * for Record Linkage", JASA 1969; the Splink lineage): candidate
  * pairs from cheap blocking, then a per-field agreement vector
  * scored by log-likelihood weights
  *
  *   w_field = log2(m/u)           when the field agrees
  *           = log2((1−m)/(1−u))   when it disagrees
  *
  * with `m` = P(agree | same entity) and `u` = P(agree | different
  * entities). The total score classifies the pair: above the match
  * threshold → `match`, between → `possible` (clerical review), below
  * → `non_match`.
  *
  * Determinism (the repo's fixed-point rule): m/u arrive as PARTS PER
  * MILLION integers; each weight is
  * `log2fp(ppm) − log2fp(otherPpm)` through the shared
  * [[graft.plans.Log2Fp]] kernel's scalar (2¹⁰ fixed point — the
  * DuckDB oracle re-derives the same values from the same ppm
  * literals through its recursive CTE), and the pair score is an
  * exact integer sum. No float ever orders a verdict.
  *
  * 100 TB shape: blocking is an equi-join on STABLE attributes (the
  * [[FuzzyJoin]] hot-block lesson applies — block keys must bound
  * occupancy; pass several so the product does); scoring is a narrow
  * map over candidate rows. m/u are per-field config — estimate them
  * from labeled pairs or priors upstream (u ≈ the field's match rate
  * among random pairs); they embed in the plan as literals, so the
  * scoring never joins anything.
  */
object RecordLinkage {

  /** One scored field: `column` must exist in both inputs; `agree`
    * compares the pair's two sides (default: null-safe equality —
    * two NULLs agree, the Fellegi–Sunter convention for comparing
    * absent values; pass a custom predicate for fuzzy fields).
    * `mPpm`/`uPpm` in (0, 1e6) exclusive — degenerate probabilities
    * make a weight infinite.
    */
  case class FieldSpec(column: String, mPpm: Long, uPpm: Long,
      agree: (Column, Column) => Column = (a, b) => a <=> b) {
    require(mPpm > 0 && mPpm < 1000000L && uPpm > 0 && uPpm < 1000000L,
      s"m/u ppm must be in (0, 1e6) for $column")
    def agreeFp: Long =
      graft.plans.Log2Fp.log2Fp(mPpm) - graft.plans.Log2Fp.log2Fp(uPpm)
    def disagreeFp: Long =
      graft.plans.Log2Fp.log2Fp(1000000L - mPpm) -
        graft.plans.Log2Fp.log2Fp(1000000L - uPpm)
  }

  /** Blocked candidate pairs between two tables: equi-join on
    * `blockCols` (present in both — derive block keys beforehand if
    * needed), every remaining column prefixed `a_`/`b_`. Pass enough
    * block columns that their VALUE PRODUCT bounds block occupancy;
    * blocking on one low-cardinality key is the quadratic hazard
    * [[FuzzyJoin.blockStats]] exists to surface.
    */
  def candidates(a: DataFrame, b: DataFrame, idCol: String,
      blockCols: Seq[String]): DataFrame = {
    require(blockCols.nonEmpty, "need at least one blocking column")
    def pre(df: DataFrame, p: String) = df.select(
      blockCols.map(col) ++
        df.columns.filterNot(blockCols.contains).map(c => col(c).as(s"$p$c")): _*)
    pre(a, "a_").join(pre(b, "b_"), blockCols)
  }

  /** Score + classify blocked candidates. Returns
    * `(id_a, id_b, <field>_agree flags…, score_fp, verdict)` for pairs
    * at `possible` or better — the clerical-review queue and the match
    * set; non-matches are the overwhelming bulk of candidates and are
    * dropped here (count them upstream if the blocking telemetry needs
    * the denominator). Thresholds are in the same 2⁻¹⁰·log2 fixed
    * point as the weights.
    */
  def link(a: DataFrame, b: DataFrame, idCol: String,
      blockCols: Seq[String], fields: Seq[FieldSpec],
      matchFp: Long, possibleFp: Long): DataFrame =
    scoreCandidates(candidates(a, b, idCol, blockCols), idCol, fields,
      matchFp, possibleFp)

  /** Persist the A side pre-blocked for incremental linkage:
    * `a_`-prefixed columns partitioned by the block keys, so a daily
    * B batch's [[linkIncrement]] equi-join physically prunes to the
    * batch's blocks (the FuzzyJoin block-index discipline). Linkage
    * is a pure per-pair function, so
    * `link(A, B₁ ∪ B₂) == linkIncrement(idx, B₁) ∪ linkIncrement(idx,
    * B₂)` exactly — no cap caveat, no state rewrite; takedown is an
    * anti-join on `a_<id>` like every index family.
    */
  def writeIndex(a: DataFrame, idCol: String, blockCols: Seq[String],
      dir: String): Unit =
    a.select(blockCols.map(col) ++
        a.columns.filterNot(blockCols.contains).map(c => col(c).as(s"a_$c")): _*)
      .write.mode("overwrite").partitionBy(blockCols: _*).parquet(dir)

  /** [[link]] of one B batch against the persisted A index —
    * value-identical to the batch form over the same rows
    * (RecordLinkageSpec pins it), at blocks-of-the-batch cost.
    */
  def linkIncrement(index: DataFrame, b: DataFrame, idCol: String,
      blockCols: Seq[String], fields: Seq[FieldSpec],
      matchFp: Long, possibleFp: Long): DataFrame = {
    val bSide = b.select(blockCols.map(col) ++
      b.columns.filterNot(blockCols.contains).map(c => col(c).as(s"b_$c")): _*)
    val cand = index.join(bSide, blockCols)
    scoreCandidates(cand, idCol, fields, matchFp, possibleFp)
  }

  private def scoreCandidates(cand: DataFrame, idCol: String,
      fields: Seq[FieldSpec], matchFp: Long, possibleFp: Long): DataFrame = {
    require(fields.nonEmpty, "need at least one scored field")
    require(matchFp >= possibleFp, "match threshold below possible")
    val withFlags = fields.foldLeft(cand) { (df, f) =>
      df.withColumn(s"${f.column}_agree",
        coalesce(f.agree(col(s"a_${f.column}"), col(s"b_${f.column}")),
          lit(false)))
    }
    val score = fields.map { f =>
      when(col(s"${f.column}_agree"), lit(f.agreeFp))
        .otherwise(lit(f.disagreeFp))
    }.reduce(_ + _)
    withFlags
      .withColumn("score_fp", score)
      .withColumn("verdict",
        when(col("score_fp") >= matchFp, lit("match"))
          .when(col("score_fp") >= possibleFp, lit("possible"))
          .otherwise(lit("non_match")))
      .filter(col("verdict") =!= "non_match")
      .select(Seq(col(s"a_$idCol").as("id_a"), col(s"b_$idCol").as("id_b")) ++
        fields.map(f => col(s"${f.column}_agree")) ++
        Seq(col("score_fp"), col("verdict")): _*)
  }

  /** Unsupervised m/u/λ estimation by expectation–maximization over
    * the blocked candidate pairs — the Fellegi–Sunter fit (Winkler
    * 1988; the Splink default). The decisive scale trick is the
    * AGREEMENT-PATTERN COLLAPSE: with F independent fields a pair
    * contributes only its pattern ∈ {agree, disagree}^F, so ONE corpus
    * pass aggregates candidates into ≤ 2^F `(pattern, count)` rows and
    * every EM iteration is driver arithmetic over that tiny table —
    * iterating never re-reads data (same shape as [[Dsir]]'s
    * fixed-dimension count state).
    *
    *   E: p(pattern) = λ·Π mᵢ^aᵢ(1−mᵢ)^(1−aᵢ) /
    *                   [that + (1−λ)·Π uᵢ^aᵢ(1−uᵢ)^(1−aᵢ)]
    *   M: λ = Σ n·p / Σ n;  mᵢ = Σ n·p·aᵢ / Σ n·p;
    *      uᵢ = Σ n·(1−p)·aᵢ / Σ n·(1−p)
    *
    * Driver doubles are fine here (fixed iteration order ⇒
    * deterministic; only the ROUNDED ppm outputs feed scoring, and
    * [[FieldSpec]] clamps keep weights finite). Caveats that are the
    * model's, not the code's: candidates are a BLOCKED (biased) sample
    * — blocked-equal fields can't be fitted, score them with priors;
    * and EM finds a two-class structure, whichever it is — the
    * m-init > u-init ordering pins the match class, and callers should
    * sanity-check λ against the expected match rate.
    *
    * Returns `(lambdaPpm, fitted fields)`; `fields` supply the init.
    */
  def emFit(a: DataFrame, b: DataFrame, idCol: String,
      blockCols: Seq[String], fields: Seq[FieldSpec],
      lambdaInitPpm: Long = 10000L, iters: Int = 25): (Long, Seq[FieldSpec]) = {
    require(fields.nonEmpty && fields.size <= 16,
      "1..16 fields (pattern table is 2^F rows)")
    require(iters >= 1 && lambdaInitPpm > 0 && lambdaInitPpm < 1000000L,
      "bad EM config")
    val cand = candidates(a, b, idCol, blockCols)
    val flagged = fields.foldLeft(cand) { (df, f) =>
      df.withColumn(s"${f.column}_agree",
        coalesce(f.agree(col(s"a_${f.column}"), col(s"b_${f.column}")),
          lit(false)))
    }
    val patterns: Array[(Array[Boolean], Long)] = flagged
      .groupBy(fields.map(f => col(s"${f.column}_agree")): _*)
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => (fields.indices.map(r.getBoolean).toArray,
        r.getLong(fields.size)))
    require(patterns.nonEmpty, "no candidate pairs — blocking too strict")

    var lambda = lambdaInitPpm / 1e6
    var m = fields.map(_.mPpm / 1e6).toArray
    var u = fields.map(_.uPpm / 1e6).toArray
    def clamp(x: Double) = math.min(0.999999, math.max(0.000001, x))
    var it = 0
    while (it < iters) {
      var sumN = 0.0; var sumP = 0.0
      val mNum = new Array[Double](fields.size)
      val uNum = new Array[Double](fields.size)
      var mDen = 0.0; var uDen = 0.0
      patterns.foreach { case (ag, n) =>
        var pm = lambda; var pu = 1.0 - lambda
        var i = 0
        while (i < fields.size) {
          pm *= (if (ag(i)) m(i) else 1.0 - m(i))
          pu *= (if (ag(i)) u(i) else 1.0 - u(i))
          i += 1
        }
        val p = if (pm + pu == 0.0) 0.0 else pm / (pm + pu)
        sumN += n; sumP += n * p
        mDen += n * p; uDen += n * (1.0 - p)
        i = 0
        while (i < fields.size) {
          if (ag(i)) { mNum(i) += n * p; uNum(i) += n * (1.0 - p) }
          i += 1
        }
      }
      lambda = clamp(sumP / sumN)
      var i = 0
      while (i < fields.size) {
        if (mDen > 0) m(i) = clamp(mNum(i) / mDen)
        if (uDen > 0) u(i) = clamp(uNum(i) / uDen)
        i += 1
      }
      it += 1
    }
    def ppm(x: Double): Long =
      math.min(999999L, math.max(1L, math.round(x * 1e6)))
    (ppm(lambda), fields.zipWithIndex.map { case (f, i) =>
      f.copy(mPpm = ppm(m(i)), uPpm = ppm(u(i)))
    })
  }

  /** Deterministic u-probability estimate for each field: the
    * agreement rate among DELIBERATELY NON-MATCHING pairs — record i
    * of a hash-shuffled A sample against record i+1 of a B sample
    * (the Splink random-pairs recipe, made deterministic with the
    * audit hash: same corpus ⇒ same estimate). Returns
    * `(column, agree_pairs, total_pairs, u_ppm)`; u_ppm is the
    * add-one-smoothed integer rate, never 0 or 1e6 (so weights stay
    * finite). Driver-collects nothing but the ≤#fields summary.
    */
  def estimateU(a: DataFrame, b: DataFrame, idCol: String,
      fields: Seq[FieldSpec], nPairs: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ranked(df: DataFrame, p: String, salt: String) = df
      .withColumn("__h", graft.functions.AuditableHash.h60(
        concat(lit(salt + ":"), col(idCol).cast("string"))))
      // distributed TakeOrdered first; the global rank window then
      // runs over ≤ nPairs+1 rows (the q73 bounded-window carve-out),
      // never the corpus
      .orderBy(col("__h")).limit(nPairs + 1)
      .withColumn("__r", row_number().over(Window.orderBy(col("__h"))))
      .select(col("__r") +: df.columns.map(c => col(c).as(s"$p$c")): _*)
    // offset by one rank: pairs (i, i+1) are hash-random, never the
    // same record's two copies under the differing salts
    val pairs = ranked(a, "a_", "ua")
      .join(ranked(b, "b_", "ub").withColumn("__r", col("__r") - 1), "__r")
    val aggs = fields.flatMap { f =>
      val agree = coalesce(
        f.agree(col(s"a_${f.column}"), col(s"b_${f.column}")), lit(false))
      Seq(sum(when(agree, 1L).otherwise(0L)).as(s"__a_${f.column}"),
        count(lit(1)).as(s"__n_${f.column}"))
    }
    val row = pairs.agg(aggs.head, aggs.tail: _*)
    val entries = fields.map { f =>
      struct(lit(f.column).as("column"),
        col(s"__a_${f.column}").as("agree_pairs"),
        col(s"__n_${f.column}").as("total_pairs"),
        // integer `div` (the Sharding boundary rule) — `/` on longs
        // would produce a double rate
        expr(s"((__a_${f.column} + 1) * 1000000) div (__n_${f.column} + 2)")
          .as("u_ppm"))
    }
    row.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }
}
