package graft.operators

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]] is the exact baseline: broadcast the (small)
  *    query set against the corpus, score every pair, per-query top-k.
  *    Linear scan — correct at any scale, one broadcast + one shuffle
  *    (the per-query top-k), no cross-corpus shuffle.
  *  - [[lshTopK]] is the scale path: both sides hash into hyperplane
  *    sign buckets (multi-probe via several independent tables), only
  *    same-bucket pairs are scored. Corpus bucketing is a narrow map;
  *    the join shuffles on (table, bucket) — at 100 TB this is the
  *    difference between scoring ~N·Q pairs and ~N·Q/2^bits.
  *
  * Cosine is rounded to 6 dp *before* ranking so ties break identically
  * everywhere (rank order: score desc, then id asc — fully deterministic).
  */
object Similarity {

  /** Per-query top-k over scored (query_id, id, cosine) rows via the
    * bounded-heap aggregator — row-identical to the `row_number` window
    * form (same score-desc/id-asc contract, TopKPerGroupSpec), but
    * partial-aggregating: map-side state caps at k per query per task
    * and parallelism follows the INPUT partitions, not the handful of
    * query keys a window would hash everything onto.
    */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame =
    // unscorable pairs (NULL cosine — a null/ragged vector that survived
    // into a candidate bucket) are dropped, not ranked: the aggregator's
    // primitive (score, id) encoder would otherwise crash the whole job
    // on the first such pair
    TopKPerGroup(scored.filter(col("cosine").isNotNull)
        .select(col("query_id"), col("cosine"), col("id")),
        Seq("query_id"), "cosine", "id", k)
      .select("query_id", "id", "cosine", "rank")

  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      score: (Column, Column) => Column = V.cosine): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("cosine", round(score(col("cv"), col("qv")), 6))
    rankTopK(scored, k)
  }

  /** [[bruteForceTopK]] with fixed-point cosine and per-row
    * precomputation: corpus + queries quantize and norm once; each of
    * the N·Q scored pairs costs one integer dot product. Values
    * identical to `score = cosineQuantized`.
    */
  def bruteForceTopKQuantized(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int): DataFrame = {
    def pre(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id), V.quantize(col(vecCol)).as(s"${id}_qv"))
        .withColumn(s"${id}_n2", V.dotQ(col(s"${id}_qv"), col(s"${id}_qv")))
    val c = pre(corpus, "id")
    val q = pre(queries, "query_id")
    val scored = c.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("cosine", round(V.cosineFromQuantized(
        col("id_qv"), col("query_id_qv"), col("id_n2"), col("query_id_n2")), 6))
    rankTopK(scored, k)
  }

  /** Hard-negative mining for contrastive training (the SBERT /
    * DPR-style recipe: Karpukhin et al. 2020; Xiong et al., ANCE
    * 2021): per ANCHOR vector, the top-k most-similar corpus vectors
    * that are (a) not the anchor, (b) not a KNOWN positive, and
    * (c) not suspiciously close — cosine (in exact ppm) above
    * `maxCosinePpm` is excluded as a probable UNLABELED positive /
    * near-duplicate, the "false negative" that poisons a contrastive
    * loss (the semi-hard band: hardest negatives that are still
    * plausibly negative). Output `(query_id, id, cosine, rank)` —
    * rank 1 is the hardest admissible negative.
    *
    * Scale shape: the anchors broadcast into the corpus scan (the q26
    * contract — anchors are a training batch, the corpus is the 100 TB
    * side); positives anti-join BEFORE the top-k cut (a positive must
    * free its slot, not mask a negative below it), and the band filter
    * is exact integer ppm of the round-6 cosine, so the mined set is
    * oracle-re-derivable to the hash (q207). Swap the brute scorer for
    * the IVF probe when the corpus outgrows one pass — candidates are
    * candidates (the MMR seam argument): feed the probe's output to
    * [[hardNegativesFromCandidates]] with top-N ≫ k so the exclusions
    * can't exhaust the pool (q210 gates that composition at an
    * exhaustive probe, hash-identical to this brute form).
    */
  def hardNegatives(
      corpus: DataFrame,
      anchors: DataFrame,
      positives: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      maxCosinePpm: Long = 950000L): DataFrame = {
    def pre(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id), V.quantize(col(vecCol)).as(s"${id}_qv"))
        .withColumn(s"${id}_n2", V.dotQ(col(s"${id}_qv"), col(s"${id}_qv")))
    val scored = pre(corpus, "id")
      .join(broadcast(pre(anchors, "query_id")), col("id") =!= col("query_id"))
      .withColumn("cosine", round(V.cosineFromQuantized(
        col("id_qv"), col("query_id_qv"), col("id_n2"), col("query_id_n2")), 6))
      .select(col("query_id"), col("id"), col("cosine"))
    hardNegativesFromCandidates(scored, positives, k, maxCosinePpm)
  }

  /** The CANDIDATE SEAM of [[hardNegatives]] (r14 verdict task 2 —
    * the MMR-seam argument applied here): takes any scored
    * `(query_id, id, cosine)` frame — the brute scorer above, an
    * [[IvfIndex.probe]] top-N, a JL shortlist — and runs the mining
    * half: self-exclusion, the near-positive band in exact integer
    * micros of the round-6 cosine (the gate convention — no float
    * threshold an engine could tie-break differently), the positive
    * anti-join BEFORE the top-k cut (a positive must free its slot,
    * not mask a negative below it), then the bounded-heap per-query
    * top-k. [[hardNegatives]] delegates here, so brute == seam is
    * structural (SimilaritySpec pins it); q210 gates the
    * persisted-IVF composition against q207's brute oracle.
    *
    * Candidate contract: `cosine` must be the family's round-6
    * quantized cosine (every producer above emits it), and the frame
    * should carry top-N per query with N ≫ k — the band and the
    * positives only ever REMOVE rows, so an approximate producer's
    * misses can only lose negatives, never invent them. NULL cosines
    * (unscorable pairs) drop, as in every ranking here.
    */
  def hardNegativesFromCandidates(
      candidates: DataFrame,
      positives: DataFrame,
      k: Int,
      maxCosinePpm: Long = 950000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxCosinePpm >= -1000000L && maxCosinePpm <= 1000000L,
      s"maxCosinePpm must be a cosine in ppm, got $maxCosinePpm")
    val banded = candidates
      .select(col("query_id"), col("id"), col("cosine"))
      .filter(col("id") =!= col("query_id"))
      .filter(floor(col("cosine") * lit(1000000.0) + lit(0.5)).cast("long")
        <= maxCosinePpm)
    val negs = banded.join(
      positives.select(col("query_id"), col("id")).distinct(),
      Seq("query_id", "id"), "left_anti")
    rankTopK(negs, k)
  }

  /** Hyperplane-LSH bucket assignment as a pure narrow map: one native
    * codegen'd expression ([[graft.plans.LshBuckets]]) computes all
    * `tables` buckets per vector in a single triple loop over the plane
    * matrix. No explode-join matrix multiply (which shuffled
    * N·dim·tables·bits intermediate rows through two hash aggregates),
    * and no per-plane expression forest (whose 64 inlined dot loops
    * overflow the JIT's method budget) — at 100 TB the bucket
    * assignment rides the scan, embarrassingly parallel.
    *
    * Null / wrong-dimension / null-element vectors (which a dot product
    * can't score) get the all-ones fallback bucket in every table, so
    * no row ever vanishes from the index — same contract as before; the
    * one behavior change is that a *ragged* vector no longer gets a
    * partial-dot bucket, it gets the fallback (strictly safer: its old
    * bucket was a truncated projection).
    * Returns (id, vec, table, bucket).
    */
  def lshBucketsDf(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      bits: Int,
      tables: Int,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val planes = planeMatrix(dim, bits, tables, seed)

    val allBuckets = coalesce(
      ColumnBridge.column(graft.plans.LshBuckets(
        ColumnBridge.expression(col(vecCol).cast("array<double>")), planes)),
      typedlit(Seq.fill(tables)((1 << bits) - 1))) // null vector → fallback everywhere
    df.select(col(idCol).as("id"), col(vecCol).as("v"),
        posexplode(allBuckets))
      .withColumnRenamed("pos", "table")
      .withColumnRenamed("col", "bucket")
  }

  /** The deterministic hyperplane matrix: Gaussian draws from
    * `Random(seed)` in (table, bit, dim) order. Shared by
    * [[lshBucketsDf]] and the SQL oracle (which embeds the quantized
    * coefficients as literals), so bucket identity is one definition.
    */
  def planeMatrix(dim: Int, bits: Int, tables: Int,
      seed: Long): IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = {
    val rnd = new scala.util.Random(seed)
    IndexedSeq.tabulate(tables)(_ =>
      IndexedSeq.tabulate(bits)(_ => IndexedSeq.fill(dim)(rnd.nextGaussian())))
  }

  /** LSH-bucketed ANN: `tables` independent hash tables of `bits`
    * hyperplane bits each. A corpus row is scored for a query iff they
    * collide in at least one table; candidates are verified with the
    * exact fixed-point cosine (quantize once per row, one integer dot
    * per pair — same arithmetic as [[bruteForceTopKQuantized]], so the
    * scores are engine-exact). Returns the same schema as
    * [[bruteForceTopK]] (per-query top-k among candidates).
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      dim: Int,
      bits: Int = 8,
      tables: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    def bucketed(df: DataFrame, outId: String, qv: String, n2: String): DataFrame =
      lshBucketsDf(spark, df, "id", vecCol, dim, bits, tables)
        .select(col("id").as(outId), col("table"), col("bucket"),
          V.quantize(col("v")).as(qv))
        .withColumn(n2, V.dotQ(col(qv), col(qv)))

    val c = bucketed(corpus.select(col(idCol).as("id"), col(vecCol)),
      "id", "cqv", "cn2").as("c")
    val q = bucketed(queries.select(col(idCol).as("id"), col(vecCol)),
      "query_id", "qqv", "qn2").as("q")

    // cosine on the COLLISION ROW, then a scalar max per pair: the
    // score is identical in every table a pair collides in (it compares
    // the full vectors, not the bucket), so deduping (id, query_id)
    // aggregates one double — carrying the quantized arrays through
    // dropDuplicates would force a SortAggregate with first(array) on
    // every candidate row (sorting candidates × vector payload).
    // A pair colliding in t tables pays t integer dots instead of 1 —
    // t is small and a dot is ~dim multiply-adds; the sort isn't.
    val cand = c.join(broadcast(q),
        col("c.table") === col("q.table") && col("c.bucket") === col("q.bucket") &&
        col("c.id") =!= col("q.query_id"))
      .select(col("c.id").as("id"), col("q.query_id").as("query_id"),
        round(V.cosineFromQuantized(
          col("c.cqv"), col("q.qqv"), col("c.cn2"), col("q.qn2")), 6).as("cosine"))
      .groupBy(col("id"), col("query_id"))
      .agg(max(col("cosine")).as("cosine"))

    rankTopK(cand, k)
  }

  /** Exact-recall harness for the approximate path: fraction of
    * brute-force top-k pairs the LSH variant recovered, per query.
    */
  def recallAgainstExact(exact: DataFrame, approx: DataFrame): DataFrame = {
    val hits = exact.as("e").join(approx.as("a"),
        col("e.query_id") === col("a.query_id") && col("e.id") === col("a.id"),
        "left_outer")
      .groupBy(col("e.query_id").as("query_id"))
      .agg((sum(when(col("a.id").isNotNull, 1).otherwise(0)).cast("double") /
        count(lit(1))).as("recall"))
    hits
  }

  /** Second-stage reranking: score a BOUNDED candidate set (a lexical
    * recall stage's top-N — q141 feeds [[Bm25]]'s output here) by
    * exact quantized cosine against ONE probe vector, keep the top k.
    * The retrieve-then-rerank stack: the cheap stage bounds the
    * candidate count, so the expensive exact scoring runs on N rows,
    * not the corpus. Scale shape: the candidate set broadcasts into
    * the embedding join (the corpus-sized side is read id-pruned when
    * embeddings are stored bucketed by id), the 1-row quantized probe
    * rides a broadcast cross join, and top-k is
    * `TakeOrderedAndProject` + a ≤k-row rank window. Candidates
    * without an embedding can't be cosine-ranked and drop (inner
    * join — callers keep the lexical rank if they want them back).
    * Cosine rounds to 6 dp before ranking; ties break on id.
    */
  def rerankByVector(cands: DataFrame, idCol: String, emb: DataFrame,
      embIdCol: String, vecCol: String, probe: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val p = probe.select(V.quantize(col(vecCol)).as("__p_qv"))
      .withColumn("__p_n2", V.dotQ(col("__p_qv"), col("__p_qv")))
    val e = emb.select(col(embIdCol).as(idCol),
        V.quantize(col(vecCol)).as("__d_qv"))
      .withColumn("__d_n2", V.dotQ(col("__d_qv"), col("__d_qv")))
    val top = broadcast(cands).join(e, idCol)
      .crossJoin(broadcast(p))
      .withColumn("cosine", round(V.cosineFromQuantized(
        col("__d_qv"), col("__p_qv"), col("__d_n2"), col("__p_n2")), 6))
      .drop("__d_qv", "__d_n2", "__p_qv", "__p_n2")
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
    top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("cosine").desc, col(idCol))))
  }
  /** Reciprocal-rank fusion of top-k lists (Cormack, Clarke &
    * Buettcher, SIGIR 2009) — the standard hybrid-retrieval combiner:
    * each list contributes `10^6 DIV (k0 + rank)` for the documents it
    * retrieved, scores sum across lists, ties break by id. Rank
    * fusion needs NO cross-retriever score calibration (BM25
    * fixed-point vs cosine floats never meet), which is why production
    * hybrid search defaults to it; with the repo's integer quotient it
    * is also exactly oracle-re-derivable (q186). `k0 = 60` is the
    * paper's constant.
    *
    * Inputs are TOP-K lists by contract — 1-based ranks, one row per
    * document per list (both enforced loudly where cheap: NULL/0 ranks
    * throw; duplicate ids within one list would double-count rrf_fp
    * and inflate n_lists — `enforceDistinct = true` turns that caller
    * bug into a loud failure via a per-id distinct-list check inside
    * the fuse aggregate, ADVICE r12). Everything here is
    * bounded: the union carries ≤ Σ|list| rows, the fuse is one
    * bounded aggregate, and the final rank is a window over ≤ k rows
    * (the q73 carve-out). Output: `(idCol, n_lists, rrf_fp, rank)`.
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int, k0: Int = 60, enforceDistinct: Boolean = false): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(k >= 1 && k0 >= 0, s"bad k=$k / k0=$k0")
    val union = lists.zipWithIndex
      .map { case (l, i) => l.select(col(idCol),
        col(rankCol).cast("long").as("__r"), lit(i).as("__list")) }
      .reduce(_ unionByName _)
      // fail LOUDLY on a contract-violating list: a NULL or 0 rank
      // would otherwise NULL its quotient, which sum() skips while
      // count() still increments n_lists — a silently wrong fusion
      .filter(assert_true(col("__r") >= 1,
        lit("rrfFuse: ranks must be 1-based and non-null " +
          "(feed top-k list outputs)")).isNull)
    // n_lists counts ROWS; with the flag, a distinct-list count rides
    // the same aggregate and any per-list duplicate id fails loudly
    // (the countDistinct costs one expand, paid only when asked for)
    val aggs = Seq(count(lit(1)).cast("int").as("n_lists"),
      sum(expr(s"1000000L div (${k0}L + __r)")).as("rrf_fp")) ++
      (if (enforceDistinct)
        Seq(countDistinct(col("__list")).cast("int").as("__nd"))
      else Nil)
    val grouped = union.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    val checked =
      if (enforceDistinct)
        grouped.filter(assert_true(col("n_lists") === col("__nd"),
          concat(lit("rrfFuse: duplicate id within one list at " +
            s"$idCol = "), col(idCol).cast("string"))).isNull)
          .drop("__nd")
      else grouped
    val fused = checked
      .orderBy(col("rrf_fp").desc, col(idCol))
      .limit(k)
    fused.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("rrf_fp").desc, col(idCol))))
  }

  /** [[rrfFuse]] for BATCHES of queries — each input list carries a
    * `keyCol` (query id) and the fusion runs per key: the
    * contamination-mining hybrid shape (thousands of benchmark
    * questions, each with a lexical and a vector top-k list). Same
    * exact integer quotient, same loud 1-based-rank and (optional)
    * duplicate-id enforcement, per (key, list). Everything stays
    * bounded by the top-k input contract (≤ Σ|list| ≤ lists·k·|keys|
    * rows), so the per-key rank window is the q73 carve-out — rows per
    * key never exceed lists·k. Output: `(keyCol, idCol, n_lists,
    * rrf_fp, rank ≤ k)`.
    */
  def rrfFuseByKey(lists: Seq[DataFrame], keyCol: String, idCol: String,
      rankCol: String, k: Int, k0: Int = 60,
      enforceDistinct: Boolean = false): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(k >= 1 && k0 >= 0, s"bad k=$k / k0=$k0")
    val union = lists.zipWithIndex
      .map { case (l, i) => l.select(col(keyCol), col(idCol),
        col(rankCol).cast("long").as("__r"), lit(i).as("__list")) }
      .reduce(_ unionByName _)
      .filter(assert_true(col("__r") >= 1,
        lit("rrfFuseByKey: ranks must be 1-based and non-null " +
          "(feed top-k list outputs)")).isNull)
    val aggs = Seq(count(lit(1)).cast("int").as("n_lists"),
      sum(expr(s"1000000L div (${k0}L + __r)")).as("rrf_fp")) ++
      (if (enforceDistinct)
        Seq(countDistinct(col("__list")).cast("int").as("__nd"))
      else Nil)
    val grouped = union.groupBy(col(keyCol), col(idCol))
      .agg(aggs.head, aggs.tail: _*)
    val checked =
      if (enforceDistinct)
        grouped.filter(assert_true(col("n_lists") === col("__nd"),
          concat(lit("rrfFuseByKey: duplicate id within one list at " +
            s"$idCol = "), col(idCol).cast("string"))).isNull)
          .drop("__nd")
      else grouped
    checked.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
          .orderBy(col("rrf_fp").desc, col(idCol))))
      .filter(col("rank") <= k)
  }

}
