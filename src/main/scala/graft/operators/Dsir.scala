package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Importance-resampling data selection (DSIR — Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * pick the slice of a raw crawl that looks most like a small curated
  * target corpus, by scoring every raw document with the log-likelihood
  * ratio of two hashed-n-gram bag models — one fit on the target, one
  * on the raw pool — and keeping the top fraction. This is the
  * data-SELECTION stage of an LLM pipeline (between dedup and
  * sharding): quality classifiers ([[QualityModel]]) rank documents
  * against a learned notion of "good"; DSIR ranks them against a
  * DISTRIBUTION ("looks like Wikipedia/books"), with nothing to train
  * but two count tables.
  *
  * Spark-first shape, in three bounded stages:
  *   1. FIT: bucket-count the hashed unigram+bigram windows of each
  *      slice — one explode + hash aggregate per slice, shuffling at
  *      most `dim` rows (map-side combine collapses the corpus to the
  *      bucket table before the exchange). The two dim-long count
  *      vectors are the operator's driver collect (the documented
  *      budget: 2×dim rows, independent of corpus size).
  *   2. SCORE: the per-bucket log-ratio weights embed in the plan
  *      inside the SAME fused kernel the quality classifier uses
  *      ([[graft.plans.HashedBowScore]], `bigrams = true`) — scoring
  *      is a pure narrow map, one corpus scan, no join, no explode,
  *      whole-stage codegen. DSIR's feature set (hashed unigrams +
  *      bigrams) is exactly the classifier's, so one tokenization
  *      contract serves both.
  *   3. SELECT: the top `num/den` fraction by score — a global rank
  *      with NO global window: the repo's range-partition +
  *      per-partition-offset numbering idiom
  *      ([[Scd2Merge.assignSurrogateKeys]]), so a billion-document
  *      rank spreads over the cluster.
  *
  * Everything is exact integer arithmetic — the log is a fixed-point
  * base-2 log computed by the classic repeated-squaring algorithm
  * ([[log2Fp]]), bit-reproducible in pure-integer SQL (the q113
  * DuckDB oracle re-derives the weights with a recursive CTE) —
  * because IEEE `ln` differs between libms in the last ulp and a
  * hash-matched oracle cannot tolerate "almost".
  */
object Dsir {

  /** `floor(log2(n) * 2^fracBits)` in pure integer arithmetic —
    * normalize `n` to Q30 ∈ [2^30, 2^31), then one squaring per
    * fractional bit (square ∈ [2^60, 2^62): no signed-64 overflow);
    * each square that crosses 2^31 emits a 1 bit and renormalizes.
    * Deterministic on every platform and expressible in SQL as a
    * `fracBits`-step recursive CTE over `(x, r)` — which is how the
    * oracle reproduces it.
    */
  def log2Fp(n: Long, fracBits: Int = FracBits): Long = {
    require(n >= 1, s"log2Fp needs n >= 1, got $n")
    val m = 63 - java.lang.Long.numberOfLeadingZeros(n)
    var x = if (m <= 30) n << (30 - m) else n >> (m - 30)
    var r = m.toLong
    var i = 0
    while (i < fracBits) {
      x = (x * x) >> 30
      if (x >= (1L << 31)) { x >>= 1; r = r * 2 + 1 }
      else r *= 2
      i += 1
    }
    r
  }

  /** Fixed-point fractional bits: weights are in units of
    * 2^-10 ≈ 0.001 log2 — far finer than the ranking needs.
    */
  val FracBits = 10

  /** The hashed unigram+bigram window array of one document — the
    * feature extractor, shared bit-for-bit with the scoring kernel
    * ([[graft.plans.ShingleHashes]] at k=1 and k=2).
    */
  private def windowHashes(text: Column): Column = {
    def sh(k: Int) = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.ShingleHashes(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          text.cast("string")), k))
    concat(sh(1), sh(2))
  }

  /** `(bucket, ct)` table of a slice's hashed windows — the
    * PERSISTABLE form of the fit state: one explode + `dim`-group hash
    * aggregate (map-side combine means the exchange carries ≤ `dim`
    * rows whatever the corpus size). NULL/empty text contributes
    * nothing (the kernel yields no windows). Counts over disjoint doc
    * sets are ADDITIVE ([[mergeCounts]]) and a takedown SUBTRACTS
    * exactly what its documents contributed ([[subtractCounts]]) — so
    * the fit maintains incrementally like the TF-IDF vocabulary
    * ([[TermStats.mergeDocFreq]]'s contract), never re-reading the
    * corpus.
    */
  def bucketCountsDf(df: DataFrame, textCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    df.select(explode(windowHashes(col(textCol))).as("__h"))
      .select((col("__h") % dim).as("bucket")) // h60 is non-negative
      .groupBy("bucket").agg(count(lit(1)).as("ct"))
  }

  /** Additive merge of two count tables over DISJOINT doc sets. */
  def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bucket").agg(sum("ct").as("ct"))

  /** Retract a takedown batch's contribution: `state − deleted`,
    * zeroed buckets dropped. Only documents previously counted into
    * `state` may be subtracted — over-subtraction (a doc never added,
    * or subtracted twice) would drive counts negative, so that state
    * corruption fails loudly downstream ([[weightsFrom]] rejects
    * negative counts) instead of silently skewing the weights.
    */
  def subtractCounts(state: DataFrame, deleted: DataFrame): DataFrame =
    state.unionByName(deleted.withColumn("ct", -col("ct")))
      .groupBy("bucket").agg(sum("ct").as("ct"))
      .filter(col("ct") =!= 0L)

  /** [[bucketCountsDf]] collected dense — the operator's bounded
    * driver collect (≤ dim rows).
    */
  def bucketCounts(df: DataFrame, textCol: String, dim: Int): Array[Long] =
    toDense(bucketCountsDf(df, textCol, dim), dim)

  private[operators] def toDense(counts: DataFrame, dim: Int): Array[Long] = {
    val got = counts.collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    got.foreach { case (b, ct) =>
      require(b >= 0 && b < dim, s"bucket $b outside [0, $dim)")
      require(ct >= 0, s"negative count $ct in bucket $b — " +
        "count state corrupted (over-subtraction?)")
    }
    Array.tabulate(dim)(b => got.getOrElse(b, 0L))
  }

  /** [[fitWeights]] from maintained count tables (the incremental
    * form): same formula, but the corpus never re-reads — only the
    * two ≤ dim-row states collect.
    */
  def weightsFrom(targetCounts: DataFrame, rawCounts: DataFrame,
      dim: Int): Array[Long] =
    weightsFromDense(toDense(targetCounts, dim), toDense(rawCounts, dim))

  /** Fit the per-bucket importance weights
    * `λ[b] = log2((ct_t[b]+1)/(N_t+dim)) − log2((ct_r[b]+1)/(N_r+dim))`
    * (add-one smoothing; fixed-point via [[log2Fp]]) from a target
    * sample and the raw pool. A document's score
    * `Σ_windows λ[h60(window) mod dim]` is then its hashed-n-gram
    * log-likelihood ratio — positive ⇒ more target-like.
    */
  def fitWeights(target: DataFrame, raw: DataFrame, textCol: String,
      dim: Int): Array[Long] =
    weightsFromDense(bucketCounts(target, textCol, dim),
      bucketCounts(raw, textCol, dim))

  private def weightsFromDense(ctT: Array[Long], ctR: Array[Long]): Array[Long] = {
    require(ctT.length == ctR.length,
      s"count dims differ: ${ctT.length} vs ${ctR.length}")
    val dim = ctT.length
    val lgTT = log2Fp(ctT.sum + dim)
    val lgTR = log2Fp(ctR.sum + dim)
    Array.tabulate(dim)(b =>
      log2Fp(ctT(b) + 1) - lgTT - (log2Fp(ctR(b) + 1) - lgTR))
  }

  /** `df` + `dsir_score` (fixed-point long; NULL text → NULL,
    * token-less text → 0) — one narrow kernel pass.
    */
  def score(df: DataFrame, textCol: String, weights: Seq[Long]): DataFrame =
    df.withColumn("dsir_score",
      QualityModel.bowScore(col(textCol), weights, bigrams = true))

  /** `df` + `selected`: true for the `num/den` top fraction by
    * `(scoreCol desc, keyCol asc)` — `floor(N·num/den)` rows where N
    * counts the non-NULL scores (NULL-scored rows are never
    * selected). Global rank without a global window: range-partition
    * by the sort key, per-partition counts → exclusive offsets (the
    * collect is shuffle-partition-sized), each partition windows its
    * own slice. The ranked frame materializes once so the range
    * sampler's bounds cannot drift between the count pass and the
    * rank pass ([[Sharding.assignShards]]'s rule).
    */
  def selectTop(df: DataFrame, scoreCol: String, keyCol: String,
      num: Long, den: Long, scoredPred: Option[Column] = None): DataFrame = {
    require(num >= 0 && den >= 1 && num <= den,
      s"fraction must satisfy 0 <= num/den <= 1, got $num/$den")
    // `scoredPred` lets a caller whose score is an EXPENSIVE computed
    // column state the null condition on the cheap source column
    // instead (for [[score]]'s kernel: `text IS NOT NULL`) — a filter
    // on the score column itself would re-run the kernel on a second
    // full corpus scan just to route the handful of NULL rows
    val isScored = scoredPred.getOrElse(col(scoreCol).isNotNull)
    val scored = df.filter(isScored)
    val unscored = df.filter(!coalesce(isScored, lit(false)))
      .withColumn("selected", lit(false))
    val (ranked, n) = globalRank(scored,
      Seq(col(scoreCol).desc, col(keyCol)), "__rank")
    ranked
      .withColumn("selected", col("__rank") <= n * num / den)
      .drop("__rank")
      .unionByName(unscored)
  }

  /** Dense global rank (1-based) by `sortCols` with NO global window —
    * the range-partition + per-partition-offset numbering shared by
    * [[selectTop]] and the perplexity terciles ([[CharLm]]). Returns
    * the ranked frame (+ `rankCol`) and the total row count (free —
    * the offsets pass already counts). The ranged frame materializes
    * once so the range sampler's bounds cannot drift between the
    * count pass and the rank pass.
    */
  private[graft] def globalRank(df: DataFrame, sortCols: Seq[Column],
      rankCol: String): (DataFrame, Long) = {
    import org.apache.spark.sql.expressions.Window
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(nParts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = ranged.groupBy("__pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Long] =
      counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
        .zip(counts).map { case ((_, off), (pid, _)) => pid -> off }.toMap
    val localRank = row_number().over(
      Window.partitionBy(col("__pid")).orderBy(sortCols: _*))
    (ranged
      .withColumn(rankCol,
        element_at(typedlit(offsets), col("__pid")) + localRank)
      .drop("__pid"),
      counts.map(_._2).sum)
  }

  /** The end-to-end selection pass: fit on `(target, raw)`, score
    * `raw`, keep the top `num/den` — the composed operator a pipeline
    * calls between dedup and sharding.
    */
  def selectLikeTarget(target: DataFrame, raw: DataFrame, textCol: String,
      keyCol: String, dim: Int, num: Long, den: Long): DataFrame =
    selectTop(score(raw, textCol, fitWeights(target, raw, textCol, dim)),
      "dsir_score", keyCol, num, den,
      scoredPred = Some(col(textCol).isNotNull))
}
