package graft.operators

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance: diversity-aware top-k selection
  * (Carbonell & Goldstein, "The use of MMR, diversity-based reranking
  * for reordering documents and producing summaries", SIGIR 1998).
  * Greedy: having selected S, the next pick maximizes
  * `λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)` — relevance traded against
  * redundancy with what is already selected, the selection a plain
  * cosine top-k cannot express (it happily returns k near-duplicates
  * of the best hit).
  *
  * Where a training-data pipeline wants this: few-shot / eval example
  * selection (k diverse exemplars near a topic, not k copies), seed
  * selection for semantic dedup audits, and diversified retrieval for
  * contamination review queues.
  *
  * Scale shape — the standard two-stage rerank: stage 1 (distributed,
  * corpus-sized) generates `nCandidates` by exact quantized-cosine
  * top-N ([[Similarity.bruteForceTopKQuantized]]; swap in the
  * IVF/LSH probe when the corpus outgrows brute force — candidates
  * are candidates); stage 2 is greedy MMR over the candidate set,
  * which is O(N²) integer arithmetic on ≤ a few hundred pairs — it
  * runs on the driver over the COLLECTED candidate matrix (bounded by
  * the top-N contract, `nCandidates ≤ 128` enforced — the BM25
  * verdict-path discipline: collect the bounded head, decide, return
  * a local relation). Per-query cost is independent of corpus size.
  *
  * All arithmetic on the greedy path is exact integer ppm: relevance
  * and pairwise similarity enter as `⌊cosine·10⁶ + ½⌋` of the
  * round-6 gate-convention cosine, and the objective
  * `λ_ppm·rel_u − (10⁶−λ_ppm)·msim_u` stays < 2^41 — no float
  * comparison anywhere a tie could cross engines (ties break to the
  * lower id, the family convention; the DuckDB oracle re-derives the
  * full greedy unrolled, q198).
  */
object Mmr {

  /** Micros of a round-6 cosine column (exact: the rounded value is a
    * 6-decimal quantity, so ·10⁶ + ½ floors to its integer micros).
    */
  private def ppm(cosine: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(cosine * lit(1000000.0) + lit(0.5)).cast("long")

  /** Diversified top-k for ONE query vector: returns `(mmr_rank, id,
    * rel_ppm, msim_ppm, score_fp)` — `msim_ppm` is the pick's max
    * similarity to the previously selected set at pick time (0 for
    * the first, pure-relevance pick), `score_fp` the exact objective
    * it won with. Batch queries loop this per query id (stage 1 is
    * the batch-capable part; stage 2 is per-query by nature).
    *
    * `lambdaPpm` ∈ [0, 10⁶]: 10⁶ = pure relevance (degenerates to
    * cosine top-k order), 0 = pure diversity after the first pick.
    */
  def select(corpus: DataFrame, query: DataFrame, vecCol: String, idCol: String,
      nCandidates: Int, k: Int, lambdaPpm: Long = 700000L): DataFrame = {
    require(nCandidates >= 1 && nCandidates <= 128,
      s"nCandidates must be in [1, 128] (driver-collected candidate matrix), got $nCandidates")
    require(k >= 1 && k <= nCandidates, s"k must be in [1, $nCandidates], got $k")
    require(lambdaPpm >= 0L && lambdaPpm <= 1000000L,
      s"lambdaPpm must be in [0, 1e6], got $lambdaPpm")
    val spark = corpus.sparkSession

    // stage 1 (distributed): exact quantized-cosine top-N candidates
    // checkpointed: the corpus-sized top-N subtree is referenced by BOTH
    // driver collects below (rel map directly, the pairs frame through
    // the broadcast candidate-id join) — without the break the most
    // expensive stage would run twice per query on the serving path
    val cands = Similarity.bruteForceTopKQuantized(
        corpus, query, vecCol, idCol, nCandidates)
      .select(col("id"), ppm(col("cosine")).as("rel_ppm"))
      .localCheckpoint(true)

    // candidate pairwise sims in-plan: ≤ N(N−1) rows, broadcast both
    // sides (the candidate id set is tiny against the corpus scan)
    val cvecs = corpus.select(col(idCol).as("id"), V.quantize(col(vecCol)).as("qv"))
      .withColumn("n2", V.dotQ(col("qv"), col("qv")))
      .join(broadcast(cands.select(col("id"))), "id")
    val a = cvecs.select(col("id").as("ia"), col("qv").as("qa"), col("n2").as("na"))
    val b = cvecs.select(col("id").as("ib"), col("qv").as("qb"), col("n2").as("nb"))
    val pairs = a.join(broadcast(b), col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"),
        ppm(round(V.cosineFromQuantized(col("qa"), col("qb"), col("na"), col("nb")), 6))
          .as("sim_ppm"))

    // stage 2 (driver, bounded): greedy over the collected matrix
    val rel = cands.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sim = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long, Long)]
    val remaining = scala.collection.mutable.SortedSet.empty[Long] ++ rel.keys
    var rank = 1
    while (rank <= k && remaining.nonEmpty) {
      val scoredStep = remaining.toSeq.map { d =>
        val msim = if (selected.isEmpty) 0L
          else selected.map(s => sim.getOrElse((d, s._2), 0L)).max
        val score = lambdaPpm * rel(d) - (1000000L - lambdaPpm) * msim
        (d, rel(d), msim, score)
      }
      // the FIRST pick is pure relevance BY DEFINITION (empty S), not
      // the λ-weighted objective: at λ=0 every round-1 score is 0 and
      // the objective alone would degenerate to lowest-id — selectBatch
      // ranks round 1 by rel_ppm explicitly, this must match it
      val pick =
        if (selected.isEmpty) scoredStep.minBy { case (d, r0, _, _) => (-r0, d) }
        else scoredStep.minBy { case (d, _, _, score) => (-score, d) }
      selected += ((rank, pick._1, pick._2, pick._3, pick._4))
      remaining -= pick._1
      rank += 1
    }
    import spark.implicits._
    selected.toSeq.toDF("mmr_rank", "id", "rel_ppm", "msim_ppm", "score_fp")
  }

  /** BATCH MMR — the throughput form: many query vectors, each
    * diversified over its own candidate set, with the greedy running
    * IN-PLAN (k fixed synchronous rounds of bounded joins — the
    * PageRank discipline) instead of on the driver. Use this for the
    * contamination-review / few-shot-mining shape (thousands of
    * queries); [[select]] remains the serving-path microlatency form
    * (one query, driver greedy over the collected matrix) — MmrSpec
    * pins them equal per query.
    *
    * Scale shape: stage 1 is the batch candidate cut (corpus-sized,
    * one pass); the pairwise-sim table is Q × N(N−1) rows built by ONE
    * hash self-join on query_id and persisted across rounds; each of
    * the k−1 greedy rounds is candidate-table-sized joins + a per-query
    * rank window over ≤ N rows (the bounded-window carve-out). Nothing
    * anywhere is corpus × corpus. Per-round frames localCheckpoint so
    * lineage stays one round deep (selected feeds three places per
    * round; an unbroken plan would grow ~3^k, the LinkGraph lesson).
    *
    * Queries with fewer than k candidates simply exhaust early and
    * emit what they have. Output: `(query_id, mmr_rank, id, rel_ppm,
    * msim_ppm, score_fp)`.
    */
  def selectBatch(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, nCandidates: Int, k: Int,
      lambdaPpm: Long = 700000L): DataFrame = {
    require(nCandidates >= 1 && nCandidates <= 128,
      s"nCandidates must be in [1, 128], got $nCandidates")
    require(k >= 1 && k <= nCandidates, s"k must be in [1, $nCandidates], got $k")
    require(lambdaPpm >= 0L && lambdaPpm <= 1000000L,
      s"lambdaPpm must be in [0, 1e6], got $lambdaPpm")
    import org.apache.spark.sql.expressions.Window

    val cands = Similarity.bruteForceTopKQuantized(
        corpus, queries, vecCol, idCol, nCandidates)
      .select(col("query_id"), col("id"), ppm(col("cosine")).as("rel_ppm"))
      .localCheckpoint(true)
    // candidate vectors fetched once (the candidate id list broadcasts
    // against the corpus scan), then ONE query-keyed self-join builds
    // every within-query pair — reused by all k−1 rounds
    val cvecs = corpus
      .select(col(idCol).as("id"), V.quantize(col(vecCol)).as("qv"))
      .withColumn("n2", V.dotQ(col("qv"), col("qv")))
      .join(broadcast(cands.select(col("id")).distinct()), "id")
    val a = cands.select(col("query_id"), col("id").as("ia"))
      .join(cvecs.select(col("id").as("ia"), col("qv").as("qa"), col("n2").as("na")), "ia")
    val b = cands.select(col("query_id"), col("id").as("ib"))
      .join(cvecs.select(col("id").as("ib"), col("qv").as("qb"), col("n2").as("nb")), "ib")
    val pairs = a.join(b, Seq("query_id"))
      .filter(col("ia") =!= col("ib"))
      .select(col("query_id"), col("ia"), col("ib"),
        ppm(round(V.cosineFromQuantized(col("qa"), col("qb"), col("na"), col("nb")), 6))
          .as("sim_ppm"))
      .localCheckpoint(true)

    // the bounded-window carve-out: every window below partitions by
    // query_id over ≤ nCandidates rows (the top-N input contract)
    val w = Window.partitionBy(col("query_id"))
    def rank1(df: DataFrame, order: Seq[Column]): DataFrame =
      df.withColumn("__rn", row_number().over(w.orderBy(order: _*)))
        .filter(col("__rn") === 1).drop("__rn")

    var selected = rank1(cands, Seq(col("rel_ppm").desc, col("id")))
      .select(col("query_id"), col("id"), col("rel_ppm"),
        lit(0L).as("msim_ppm"),
        (lit(lambdaPpm) * col("rel_ppm")).as("score_fp"),
        lit(1).as("mmr_rank"))
      .localCheckpoint(true)
    for (r <- 2 to k) {
      // ONE materialization per round — selected (the only frame
      // referenced more than once across rounds) checkpoints; remaining
      // re-derives from the checkpointed frames at depth 1, so there is
      // no lineage to break (the first cut checkpointed it too: k extra
      // tiny Spark jobs of pure latency, the q173 DAG-depth lesson)
      val remaining = cands.join(selected.select(col("query_id"), col("id")),
        Seq("query_id", "id"), "left_anti")
      val msims = pairs
        .join(selected.select(col("query_id"), col("id").as("ib")),
          Seq("query_id", "ib"))
        .groupBy(col("query_id"), col("ia").as("id"))
        .agg(max(col("sim_ppm")).as("msim_ppm"))
      val scored = remaining.join(msims, Seq("query_id", "id"))
        .withColumn("score_fp",
          lit(lambdaPpm) * col("rel_ppm") -
            lit(1000000L - lambdaPpm) * col("msim_ppm"))
      val pick = rank1(scored, Seq(col("score_fp").desc, col("id")))
        .withColumn("mmr_rank", lit(r))
        .select(col("query_id"), col("id"), col("rel_ppm"),
          col("msim_ppm"), col("score_fp"), col("mmr_rank"))
      selected = selected.unionByName(pick).localCheckpoint(true)
    }
    selected
  }
}
