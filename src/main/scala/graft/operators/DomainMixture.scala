package graft.operators

import graft.functions.FixedPoint
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Loss-driven domain reweighting — the DoReMi-family mixture step
  * (Xie et al., "DoReMi: Optimizing Data Mixtures Speeds Up Language
  * Model Pretraining", 2023): upweight the domains a proxy model finds
  * HARD (excess loss over the corpus mean) with an exponentiated-
  * gradient update, smooth toward uniform, and hand the learned
  * weights to the mixture sampler. Full DoReMi interleaves proxy
  * RETRAINING between updates — a training-loop concern outside a
  * query engine; this operator is the in-engine half: one
  * reweighting step given frozen per-document losses (any integer
  * fixed-point loss column — CCNet perplexity from
  * [[CharLm]], chars-per-token, a model score), which the caller may
  * iterate against fresh losses.
  *
  * The repo's sketch discipline, end to end in integers:
  * per-domain mean loss and the corpus mean are exact `DIV`s, excess
  * clamps at 0, the EG factor is `2^(η·excess)` through
  * [[FixedPoint.pow2fp]] (ten Q30 literals both engines repeat —
  * no libm `exp`), and the normalized weight is a Q20 integer
  * `(1−ε)·u·2^20 DIV Σu + ε·2^20 DIV D` — so the whole weight table is
  * DuckDB-hash-matchable (q182) and partitioning-proof.
  *
  * Scale shape: one map-side-combined aggregate over the domain key
  * (rows = #domains), one 1-row corpus aggregate, one #domains-row
  * normalization — broadcasts all the way; the corpus is scanned once
  * however many domains ride the table.
  */
object DomainMixture {

  /** Learned mixture weights per domain:
    * `(domain, n_docs, mean_loss_fp, excess_fp, weight_fp)` — loss
    * means in the caller's Q10 units, `weight_fp` in Q20
    * (`Σ weight_fp ≈ 2^20`, short by at most one floor per domain).
    *
    * `etaNum/etaDen` is the EG step η (the softmax inverse
    * temperature: weight ratio between two domains = `2^(η·Δexcess)`
    * — η·excess is clamped to [[FixedPoint.pow2fp]]'s 2^40 cap, far
    * beyond any sane step). `smoothNum/smoothDen` is DoReMi's ε-uniform
    * smoothing (default 1/10): every domain keeps ≥ ε/D of the final
    * mixture, so a domain the proxy hates never starves to zero.
    */
  def weights(perDoc: DataFrame, domainCol: String, lossCol: String,
      etaNum: Long = 4L, etaDen: Long = 1L,
      smoothNum: Long = 1L, smoothDen: Long = 10L): DataFrame =
    weightsFromStats(
      lossRows(perDoc, domainCol, lossCol).groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"), sum(col("__loss")).as("sum_loss_fp")),
      etaNum, etaDen, smoothNum, smoothDen)

  private def lossRows(perDoc: DataFrame, domainCol: String,
      lossCol: String): DataFrame =
    perDoc.select(col(domainCol).as("domain"),
      col(lossCol).cast("long").as("__loss"))
      .filter(col("domain").isNotNull && col("__loss").isNotNull)

  /** Persist the per-domain loss sufficient statistic — one
    * domain-sized table `(domain, n_docs, sum_loss_fp)` per increment,
    * ADDITIVE (exact integer sums), so the daily reweighting never
    * re-scans history: [[appendLossState]] folds an increment in and
    * [[weightsFromState]] re-derives the weights from the summed
    * state, value-identical to [[weights]] over the union corpus by
    * construction (DomainMixtureSpec pins it hash-equal; q185 proves
    * it through the driver gate against q182's whole-corpus oracle) —
    * the incremental-state discipline every family here follows.
    */
  def writeLossState(perDoc: DataFrame, domainCol: String, lossCol: String,
      dir: String, overwrite: Boolean = true): Unit =
    lossStats(perDoc, domainCol, lossCol)
      .write.mode(if (overwrite) "overwrite" else "append").parquet(dir)

  /** The per-domain loss sufficient statistic as a FRAME
    * `(domain, n_docs, sum_loss_fp)` — the unit [[writeLossState]]
    * persists, exposed so composed jobs can fold it inside their own
    * atomic state swap ([[graft.jobs.CorpusJob.runIncremental]]'s
    * folded root) instead of the append-only dir layout.
    */
  def lossStats(perDoc: DataFrame, domainCol: String,
      lossCol: String): DataFrame =
    lossRows(perDoc, domainCol, lossCol).groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__loss")).as("sum_loss_fp"))

  /** Fold two loss-stat tables (exact integer sums — fold-per-batch ==
    * rebuild-from-union, the additive-state contract).
    */
  def mergeLossStats(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("domain"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("sum_loss_fp")).as("sum_loss_fp"))

  /** Fold a daily increment into an existing state (plain append —
    * readers re-sum).
    */
  def appendLossState(perDoc: DataFrame, domainCol: String,
      lossCol: String, dir: String): Unit =
    writeLossState(perDoc, domainCol, lossCol, dir, overwrite = false)

  /** [[weights]] from a persisted [[writeLossState]] dir — the daily
    * advisory at state-read cost (the corpus is never re-scanned).
    */
  def weightsFromState(spark: org.apache.spark.sql.SparkSession,
      dir: String, etaNum: Long = 4L, etaDen: Long = 1L,
      smoothNum: Long = 1L, smoothDen: Long = 10L): DataFrame =
    weightsFromStats(
      spark.read.parquet(dir).groupBy(col("domain"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("sum_loss_fp")).as("sum_loss_fp")),
      etaNum, etaDen, smoothNum, smoothDen)

  /** The shared tail: per-domain `(domain, n_docs, sum_loss_fp)` →
    * weight table. The corpus mean derives from the SAME stats
    * (`Σ sums DIV Σ counts`), so the batch and state paths cannot
    * disagree.
    */
  private def weightsFromStats(dom0: DataFrame, etaNum: Long, etaDen: Long,
      smoothNum: Long, smoothDen: Long): DataFrame = {
    require(etaNum > 0 && etaDen > 0, "eta must be positive")
    require(etaNum <= (1L << 20) && etaDen <= (1L << 20),
      "eta numerator/denominator must be <= 2^20 (the overflow-safe dial range)")
    require(smoothDen > 0 && smoothNum >= 0 && smoothNum <= smoothDen,
      "smoothing must be a fraction in [0, 1]")
    // same dial-range discipline as eta (ADVICE r12): the normalization
    // multiplies (smoothDen − smoothNum) by a Q20 share ≤ 2^20 over ≤
    // 2^20 domains — smoothDen ≤ 2^20 keeps every product ≤ 2^60,
    // inside signed-64; beyond it the sum could wrap and hand out a
    // silently NEGATIVE weight_fp
    require(smoothDen <= (1L << 20),
      "smoothing denominator must be <= 2^20 (the overflow-safe dial range)")
    val dom = dom0.withColumn("mean_loss_fp", expr("sum_loss_fp div n_docs"))
    val corpus = dom.agg(sum(col("n_docs")).as("__n"),
        sum(col("sum_loss_fp")).as("__s"))
      .select(expr("__s div __n").as("__corpus_fp"))
    val d = dom.crossJoin(broadcast(corpus))
      .withColumn("excess_fp",
        greatest(lit(0L), col("mean_loss_fp") - col("__corpus_fp")))
      // cap η·excess at 2^20 in Q10 (u ≤ 2^30: keeps u·2^20 inside
      // signed-64 at the normalization below) — and decide the cap
      // BEFORE multiplying: a caller-scale loss column can push
      // excess·etaNum past signed-64, where the wrapped negative would
      // clamp to u = 1 and hand the HARDEST domain the minimum weight.
      // Under the cap test, excess ≤ 20480·etaDen/etaNum + 1 ≤ ~2^35,
      // so the product stays ≤ ~2^55 with the required η dial range
      .withColumn("__u", FixedPoint.pow2fp(
        when(col("excess_fp") > lit(20480L * etaDen / etaNum), lit(20480L))
          .otherwise(least(lit(20480L),
            expr(s"excess_fp * ${etaNum}L div ${etaDen}L")))))
    val z = d.agg(sum(col("__u")).as("__z"), count(lit(1)).as("__d"))
    d.crossJoin(broadcast(z))
      .withColumn("weight_fp",
        expr(s"((${smoothDen - smoothNum}L * (__u * 1048576L div __z)) + " +
          s"(${smoothNum}L * (1048576L div __d))) div ${smoothDen}L"))
      .select(col("domain"), col("n_docs"), col("mean_loss_fp"),
        col("excess_fp"), col("weight_fp"))
  }

  /** The learned weights as [[Sampling.mixture]] input — a bounded
    * driver collect (rows = #domains, the dimension-sized contract):
    * Q20 → exact binary double `weight_fp / 2^20`.
    */
  def collectWeights(w: DataFrame): Map[String, Double] =
    w.select(col("domain"), col("weight_fp")).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / 1048576.0)
      .toMap
}
