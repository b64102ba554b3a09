package graft.operators

import graft.functions.{AuditableHash => H}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, key-stable sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: resampling the same
  * row set after a repartition, a retry, or on another engine yields a
  * *different* subset — unacceptable for reproducible corpus builds
  * and train/test hygiene. Everything here instead derives the draw
  * from [[graft.functions.AuditableHash.h60]] of a key column, so:
  *
  *  - membership is a pure function of the key — stable across runs,
  *    partitionings, engines (the DuckDB oracle reproduces it exactly);
  *  - it is a narrow map: no shuffle, no RNG state, embarrassingly
  *    parallel at any scale;
  *  - correlated rows (all chunks of one document, all examples of one
  *    user) stay together by hashing the *group* key — the standard
  *    guard against train/test leakage.
  *
  * The unit interval is modeled as h60's domain [0, 2^60): a rate r
  * maps to the threshold floor(r·2^60).
  */
object Sampling {

  private val Domain = 1L << 60

  /** `u01(c) ∈ [0,1)` — the key's deterministic uniform draw. */
  def u01(c: Column, salt: String): Column =
    H.h60(concat(lit(salt + ":"), c.cast("string"))).cast("double") / lit(Domain.toDouble)

  private def below(c: Column, salt: String, rate: Double): Column =
    H.h60(concat(lit(salt + ":"), c.cast("string"))) < lit(math.floor(rate * Domain).toLong)

  /** Bernoulli sample at `rate` keyed on `keyCol`: a row is kept iff
    * h60(salt:key) < rate·2^60. Same key ⇒ same verdict, always.
    */
  def bernoulli(df: DataFrame, keyCol: String, rate: Double,
      salt: String = "sample"): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate $rate outside [0,1]")
    df.filter(below(col(keyCol), salt, rate))
  }

  /** Stratified sample: per-stratum rates (e.g. downsample English,
    * keep all Vietnamese). Strata absent from `rates` fall back to
    * `defaultRate`. One narrow map — the rate lookup is a literal
    * map, not a join.
    */
  def stratified(df: DataFrame, keyCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = "stratified"): DataFrame = {
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0 && r <= 1),
      "rates must be in [0,1]")
    val thresh = rates.foldLeft(lit(math.floor(defaultRate * Domain).toLong)) {
      case (acc, (stratum, r)) =>
        when(col(stratumCol) === lit(stratum),
          lit(math.floor(r * Domain).toLong)).otherwise(acc)
    }
    df.filter(
      H.h60(concat(lit(salt + ":"), col(keyCol).cast("string"))) < thresh)
  }

  /** Per-row weighted keep: a row survives iff its key's deterministic
    * draw falls under `weightCol` (a probability in [0,1] — e.g. a
    * per-document quality-derived keep rate). Same stability contract
    * as [[bernoulli]]; rows with NULL weight drop.
    */
  def weighted(df: DataFrame, keyCol: String, weightCol: String,
      salt: String = "weighted"): DataFrame =
    df.filter(u01(col(keyCol), salt) < col(weightCol))

  /** Deterministic per-group cap — corpus balancing: keep at most
    * `cap` rows of each group (language/source/domain), chosen by the
    * key's auditable-hash rank (ties to the key itself), so an
    * over-represented web domain stops drowning the mixture. Stable
    * across runs/partitionings/engines — the SQL oracle reproduces the
    * exact survivor set, and growing the corpus only ever *replaces*
    * survivors whose hash outranks the newcomers (no rank drift from
    * unrelated rows). One shuffle on the group key; for very hot
    * groups the bounded-heap [[TopKPerGroup]] aggregator is the
    * O(cap·tasks) alternative to this window form.
    *
    * CONTRACT: `keyCol` must uniquely identify rows within a group (a
    * row id, not an attribute) — duplicate keys share an ordering
    * tuple, and when `cap` falls between them row_number breaks the
    * tie by partition-arrival order, surrendering the determinism this
    * operator exists for.
    */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
      cap: Int, salt: String = "cap"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(H.h60(concat(lit(salt + ":"), col(keyCol).cast("string"))).asc,
        col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Temperature-flattened mixture — the multilingual-training
    * rebalance (XLM-R / mBERT style): instead of caller-supplied
    * weights, each domain's mixture weight derives from its own mass,
    * `w_i ∝ (domainTokens_i)^α` — α = 1 keeps natural proportions,
    * α → 0 approaches uniform, and the common α ≈ 0.5 upweights
    * low-resource domains without drowning high-resource ones. The
    * acceptance rate is then [[mixture]]'s
    * `min(1, budget·w_i / domainTokens_i)` with the same deterministic
    * h60 draw.
    *
    * `alphaHalves` ∈ {0, 1, 2} picks α ∈ {0, 0.5, 1}: only powers
    * computable by a `sqrt` are offered because IEEE `sqrt` is
    * bit-exact across engines while libm `pow` is not. The powered
    * weight is FIXED-POINT (`floor(sqrt(dt · 2^20))`, a long) so the
    * cross-domain weight sum is exact integer arithmetic — a float
    * `Σ sqrt` would make the rate depend on engine-specific summation
    * order. Every value entering the final double division is an
    * exact integer < 2^53, so the oracle reproduces each rate to the
    * last ulp. Two tiny aggregates (one per-domain, one 1-row)
    * broadcast; the filter is a narrow map.
    */
  def temperatureMixture(df: DataFrame, keyCol: String, domainCol: String,
      tokensCol: String, budgetTokens: Long, alphaHalves: Int = 1,
      salt: String = "tempmix"): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    require(alphaHalves >= 0 && alphaHalves <= 2,
      s"alphaHalves must be 0, 1, or 2, got $alphaHalves")
    val totals = df.groupBy(col(domainCol))
      .agg(sum(col(tokensCol)).cast("long").as("__dt"))
    val powered = totals.withColumn("__p", alphaHalves match {
      case 0 => lit(1L)
      case 1 => floor(sqrt(col("__dt").cast("double") * lit(1048576.0))).cast("long")
      case 2 => col("__dt")
    })
    val wsum = powered.agg(sum(col("__p")).as("__wsum"))
    df.join(broadcast(powered), domainCol)
      .crossJoin(broadcast(wsum))
      .withColumn("__rate",
        // A zero-token (or all-NULL-token) domain must drop, not keep:
        // without the guard the division is NULL (or throws under ANSI)
        // and least(1.0, NULL) silently resolves to 1.0.
        when(col("__dt") > 0,
          least(lit(1.0),
            lit(budgetTokens.toDouble) * col("__p").cast("double")
              / col("__wsum").cast("double") / col("__dt").cast("double")))
          .otherwise(lit(0.0)))
      .filter(u01(col(keyCol), salt) < col("__rate"))
      .select(df.columns.map(col): _*)
  }

  /** Mixture sampling to a global token budget — the training-mixture
    * operator: given target domain *weights* (fractions of the final
    * mixture) and a total `budgetTokens`, derive each domain's
    * acceptance rate from the data (`rate = min(1, budget·weight /
    * domainTokens)`) and keep rows by the key's deterministic draw.
    * Unlike [[stratified]], the rates are not constants: they adapt to
    * what each domain actually holds, so the surviving corpus
    * approaches the requested mixture without anyone pre-computing
    * per-domain counts. A domain whose target exceeds its mass keeps
    * everything (rate caps at 1 — the mixture is then best-effort,
    * exactly the fastText/DoReMi-style sampling discipline); domains
    * absent from `weights` get `defaultWeight`.
    *
    * Two jobs in one plan: a map-side-combined aggregate over the
    * low-cardinality domain key (rows = #domains), broadcast-joined
    * back onto the corpus, then the same narrow h60 filter as
    * [[bernoulli]]. At 100 TB the aggregate is one cheap pass and the
    * broadcast is a few KB — no corpus shuffle anywhere.
    */
  def mixture(df: DataFrame, keyCol: String, domainCol: String,
      tokensCol: String, weights: Map[String, Double], budgetTokens: Long,
      defaultWeight: Double = 0.0, salt: String = "mixture"): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    require((defaultWeight +: weights.values.toSeq).forall(w => w >= 0 && w <= 1),
      "weights must be in [0,1]")
    val weight = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (domain, w)) =>
        when(col(domainCol) === lit(domain), lit(w)).otherwise(acc)
    }
    val totals = df.groupBy(col(domainCol))
      .agg(sum(col(tokensCol)).cast("double").as("__domain_tokens"))
    df.join(broadcast(totals), domainCol)
      .withColumn("__rate",
        when(col("__domain_tokens") > 0,
          least(lit(1.0),
            lit(budgetTokens.toDouble) * weight / col("__domain_tokens")))
          .otherwise(lit(0.0)))
      .filter(u01(col(keyCol), salt) < col("__rate"))
      .select(df.columns.map(col): _*)
  }

  /** Epoched mixture — the REPEAT-FACTOR side of data-recipe mixing
    * that [[mixture]]'s rate cap cannot express: a recipe states
    * per-domain TARGET token counts (`"3 epochs of wiki, half an epoch
    * of web"` → absolute targets), and a domain whose target exceeds
    * its mass is UPSAMPLED — every document repeats `floor(rate)`
    * times (`rate = target / domainTokens`) and one more with
    * probability `frac(rate)` by the key's deterministic h60 draw, so
    * the expected surviving mass is the target exactly. Each copy
    * carries a 0-based `epoch` column — the downstream shard/pack salt
    * (`concat(key, ':', epoch)`) that keeps repeated copies apart in
    * the shuffle order, so epochs of a document land in different
    * shards instead of back-to-back.
    *
    * `maxEpochs` hard-caps the rate (default 8): a mistyped target
    * against a tiny domain would otherwise explode a document into
    * target/dt copies — repeat factors beyond a handful are a recipe
    * error in every published mix, so the cap is the honest default
    * and the parameter is the documented escape hatch.
    *
    * Scale shape: one map-side-combined domain aggregate (rows =
    * #domains) broadcast back, then a narrow explode — no corpus
    * shuffle; output size is the recipe's doing (Σ targets), reported
    * by the `epoch` cardinality itself.
    */
  def epochedMixture(df: DataFrame, keyCol: String, domainCol: String,
      tokensCol: String, targets: Map[String, Long],
      maxEpochs: Int = 8, salt: String = "epochmix"): DataFrame = {
    require(targets.values.forall(_ >= 0), "targets must be >= 0")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val target = targets.foldLeft(lit(0L)) { case (acc, (d, t)) =>
      when(col(domainCol) === lit(d), lit(t)).otherwise(acc)
    }
    val totals = df.groupBy(col(domainCol))
      .agg(sum(col(tokensCol)).cast("long").as("__dt"))
    df.join(broadcast(totals), domainCol)
      .withColumn("__rate",
        when(col("__dt") > 0,
          least(target.cast("double") / col("__dt").cast("double"),
            lit(maxEpochs.toDouble)))
          .otherwise(lit(0.0)))
      .withColumn("__base", floor(col("__rate")).cast("long"))
      .withColumn("__n", col("__base") +
        when(u01(col(keyCol), salt) < col("__rate") - col("__base"), lit(1L))
          .otherwise(lit(0L)))
      .filter(col("__n") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__n") - 1)))
      .select(df.columns.map(col) :+ col("epoch"): _*)
  }

  /** Leakage-free split: every row gains a `split` column in
    * {train, val, test} decided by the *group* key's draw, so all rows
    * of a group land in the same fold. `valFrac`/`testFrac` are carved
    * off the top of the unit interval; the rest is train.
    */
  def split(df: DataFrame, groupCol: String,
      valFrac: Double, testFrac: Double,
      salt: String = "split"): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac <= 1,
      s"invalid fractions val=$valFrac test=$testFrac")
    val u = u01(col(groupCol), salt)
    df.withColumn("split",
      when(u < lit(testFrac), lit("test"))
        .when(u < lit(testFrac + valFrac), lit("val"))
        .otherwise(lit("train")))
  }

  /** Near-dup-leakage-safe split: [[split]] keyed by the DEDUP CLUSTER,
    * not the document — the Lee et al. ("Deduplicating Training Data
    * Makes Language Models Better", §6) hazard is near-duplicate pairs
    * straddling train/test, which a per-document hash split permits by
    * construction (each member draws independently). Routing every
    * document through `coalesce(cluster_id, id)` —
    * [[DedupCluster.clusters]]' convention that singletons are their
    * own cluster — makes straddling impossible: the whole component
    * shares one draw. `pairs` is whatever near-dup edge set the corpus
    * trusts (MinHash, SimHash, chunk overlap…); cost on top of the
    * clustering it reuses is one narrow map.
    */
  def leakSafeSplit(docs: DataFrame, pairs: DataFrame, idCol: String,
      srcCol: String, dstCol: String, lengthCol: String,
      valFrac: Double, testFrac: Double,
      salt: String = "csplit"): DataFrame =
    split(DedupCluster.clusters(docs, pairs, idCol, srcCol, dstCol, lengthCol),
      "cluster_id", valFrac, testFrac, salt)
}
