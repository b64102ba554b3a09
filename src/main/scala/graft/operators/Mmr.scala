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
  * corpus-sized) generates the candidates; stage 2 runs the greedy
  * over the bounded candidate set. The candidate stage is a SEAM
  * (r13 verdict task 1): [[selectFromCandidates]] /
  * [[selectBatchFromCandidates]] take any `(… id, rel_ppm)` frame —
  * the exact brute-force cut ([[select]]/[[selectBatch]] default to
  * [[Similarity.bruteForceTopKQuantized]]), a persisted-IVF probe
  * ([[IvfIndex.probe]] — q202 gates that composition), or a JL
  * shortlist all produce it; candidates are candidates. Stage 2 is
  * O(N²) integer arithmetic on ≤ a few hundred pairs — the driver
  * form collects the bounded matrix (the BM25 verdict-path
  * discipline: collect the bounded head, decide, return a local
  * relation); the batch form runs it in-plan. Per-query cost is
  * independent of corpus size either way.
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

  /** The driver-collected candidate-matrix bound both surfaces
    * enforce: N² pairwise sims at 128 is 16k rows — greedy-stage
    * work that never grows with the corpus.
    */
  val MaxCandidates: Int = 128

  /** Micros of a round-6 cosine column (exact: the rounded value is a
    * 6-decimal quantity, so ·10⁶ + ½ floors to its integer micros).
    */
  def relPpm(cosine: Column): Column =
    floor(cosine * lit(1000000.0) + lit(0.5)).cast("long")

  /** Diversified top-k for ONE query vector: the brute-force exact
    * candidate cut ([[Similarity.bruteForceTopKQuantized]] top
    * `nCandidates`) fed through [[selectFromCandidates]]. Returns
    * `(mmr_rank, id, rel_ppm, msim_ppm, score_fp)`.
    *
    * `lambdaPpm` ∈ [0, 10⁶]: 10⁶ = pure relevance (degenerates to
    * cosine top-k order), 0 = pure diversity after the first pick.
    */
  def select(corpus: DataFrame, query: DataFrame, vecCol: String, idCol: String,
      nCandidates: Int, k: Int, lambdaPpm: Long = 700000L): DataFrame = {
    require(nCandidates >= 1 && nCandidates <= MaxCandidates,
      s"nCandidates must be in [1, $MaxCandidates] (driver-collected candidate matrix), got $nCandidates")
    require(k >= 1 && k <= nCandidates, s"k must be in [1, $nCandidates], got $k")
    // single-query contract enforced up front (ADVICE r13): a
    // multi-row query frame would silently merge every query's
    // candidates into ONE rel map (query_id drops below) — a
    // meaningless selection, not an error. limit(2) bounds the probe.
    val nq = query.select(col(idCol)).limit(2).count()
    require(nq <= 1L,
      s"select takes exactly one query row, got >1 — use selectBatch for multi-query MMR")
    val cands = Similarity.bruteForceTopKQuantized(
        corpus, query, vecCol, idCol, nCandidates)
      .select(col("id"), relPpm(col("cosine")).as("rel_ppm"))
    selectFromCandidates(corpus, cands, vecCol, idCol, k, lambdaPpm)
  }

  /** The single-query greedy over a CALLER-SUPPLIED candidate frame
    * `(id, rel_ppm)` — the candidate seam: brute force, a persisted
    * IVF probe, a JL shortlist all produce this shape ([[relPpm]]
    * converts their round-6 cosine). `corpus` supplies the vectors
    * for the pairwise-redundancy term; every candidate id SHOULD
    * resolve in it — an unresolvable id degrades to msim = 0
    * (maximally diverse) identically on both seam surfaces (ADVICE
    * r14; MmrSpec pins the planted case). ≤ [[MaxCandidates]] rows
    * and unique ids enforced on the collected matrix.
    */
  def selectFromCandidates(corpus: DataFrame, candidates: DataFrame,
      vecCol: String, idCol: String, k: Int,
      lambdaPpm: Long = 700000L): DataFrame = {
    require(k >= 1 && k <= MaxCandidates, s"k must be in [1, $MaxCandidates], got $k")
    require(lambdaPpm >= 0L && lambdaPpm <= 1000000L,
      s"lambdaPpm must be in [0, 1e6], got $lambdaPpm")
    val spark = corpus.sparkSession

    // ONE action on the caller's candidate subtree: the collected rows
    // serve the rel map directly AND go back as a LOCAL relation for
    // the pairwise join's broadcast side (r15 — the first cut
    // checkpointed the frame and then read it twice: one extra eager
    // job of pure latency per serving-path call, the q173 DAG-depth
    // lesson; a corpus-sized candidate subtree still runs exactly once)
    val relRows = candidates
      .select(col("id").cast("long").as("id"), col("rel_ppm").cast("long").as("rel_ppm"))
      .collect()
    require(relRows.length <= MaxCandidates,
      s"candidate frame has ${relRows.length} rows; the driver greedy takes ≤ $MaxCandidates — " +
        "cut the candidate stage tighter (top-N per query)")
    val rel = relRows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(rel.size == relRows.length,
      s"candidate frame has duplicate ids (${relRows.length} rows, ${rel.size} distinct)")
    import spark.implicits._
    val candIds = rel.keys.toSeq.sorted.toDF("id")

    // candidate pairwise sims in-plan: ≤ N(N−1) rows, broadcast both
    // sides (the candidate id set is tiny against the corpus scan)
    val cvecs = corpus.select(col(idCol).as("id"), V.quantize(col(vecCol)).as("qv"))
      .withColumn("n2", V.dotQ(col("qv"), col("qv")))
      .join(broadcast(candIds), "id")
    val a = cvecs.select(col("id").as("ia"), col("qv").as("qa"), col("n2").as("na"))
    val b = cvecs.select(col("id").as("ib"), col("qv").as("qb"), col("n2").as("nb"))
    val pairs = a.join(broadcast(b), col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"),
        relPpm(round(V.cosineFromQuantized(col("qa"), col("qb"), col("na"), col("nb")), 6))
          .as("sim_ppm"))

    // stage 2 (driver, bounded): greedy over the collected matrix
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
    * diversified over its own brute-force candidate cut, the greedy
    * running IN-PLAN via [[selectBatchFromCandidates]]. Use this for
    * the contamination-review / few-shot-mining shape (thousands of
    * queries); [[select]] remains the serving-path microlatency form
    * (one query, driver greedy over the collected matrix) — MmrSpec
    * pins them equal per query.
    */
  def selectBatch(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, nCandidates: Int, k: Int,
      lambdaPpm: Long = 700000L): DataFrame = {
    require(nCandidates >= 1 && nCandidates <= MaxCandidates,
      s"nCandidates must be in [1, $MaxCandidates], got $nCandidates")
    require(k >= 1 && k <= nCandidates, s"k must be in [1, $nCandidates], got $k")
    val cands = Similarity.bruteForceTopKQuantized(
        corpus, queries, vecCol, idCol, nCandidates)
      .select(col("query_id"), col("id"), relPpm(col("cosine")).as("rel_ppm"))
    selectBatchFromCandidates(corpus, cands, vecCol, idCol, k, lambdaPpm)
  }

  /** The batch greedy over a CALLER-SUPPLIED candidate frame
    * `(query_id, id, rel_ppm)` — the batch half of the candidate
    * seam (a persisted-IVF probe slots in here: q202 gates
    * `IvfIndex.probe → selectBatchFromCandidates` hash-identical to
    * the brute-cut q199 at an exhaustive nProbe). The per-query
    * candidate bound (≤ [[MaxCandidates]], unique ids) is enforced
    * with ONE state-sized aggregate over the checkpointed candidate
    * frame — it is what bounds every greedy-round window below.
    *
    * Scale shape: the pairwise-sim table is Q × N(N−1) rows built by
    * ONE hash self-join on query_id and persisted across rounds; each
    * of the k−1 greedy rounds is candidate-table-sized joins + a
    * per-query rank window over ≤ N rows (the bounded-window
    * carve-out). Nothing anywhere is corpus × corpus. Per-round
    * frames localCheckpoint so lineage stays one round deep (selected
    * feeds three places per round; an unbroken plan would grow ~3^k,
    * the LinkGraph lesson).
    *
    * Queries with fewer than k candidates simply exhaust early and
    * emit what they have. Output: `(query_id, mmr_rank, id, rel_ppm,
    * msim_ppm, score_fp)`.
    */
  def selectBatchFromCandidates(corpus: DataFrame, candidates: DataFrame,
      vecCol: String, idCol: String, k: Int,
      lambdaPpm: Long = 700000L): DataFrame = {
    require(k >= 1 && k <= MaxCandidates, s"k must be in [1, $MaxCandidates], got $k")
    require(lambdaPpm >= 0L && lambdaPpm <= 1000000L,
      s"lambdaPpm must be in [0, 1e6], got $lambdaPpm")
    import org.apache.spark.sql.expressions.Window

    // The candidate checkpoint is LAZY: the contract check's head()
    // below materializes it immediately anyway, so the eager form's
    // separate construction job was pure latency (r15). The per-round
    // frames STAY eager — a lazy checkpoint read by the next round's
    // three consumers inside one job can be computed concurrently by
    // sibling stages before the persisted copy lands (measured on
    // q202: lazy rounds +16% wall, +43% cpu — duplicated probe work),
    // while eager materialization guarantees compute-once.
    val cands = candidates
      .select(col("query_id"), col("id").cast("long").as("id"),
        col("rel_ppm").cast("long").as("rel_ppm"))
      .localCheckpoint(eager = false)
    // the contract check: every greedy-round window below is bounded
    // BY the per-query candidate count — a caller-supplied frame must
    // prove it (candidate-table-sized aggregate, never corpus-sized).
    // INVARIANT (the lazy-checkpoint coupling, r15 advice): this
    // head() is a GLOBAL aggregate over `cands` and therefore the
    // action that lands the lazy checkpoint above — it must stay the
    // FIRST consumer and must not be sampled, moved below cvecs/a/b,
    // or short-circuited, or the three downstream consumers would
    // silently recompute the candidate subtree concurrently (the
    // measured q202 trap: +16% wall, +43% cpu).
    val bound = cands.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), countDistinct(col("id")).as("nd"))
      .agg(max(col("n")).as("mx"), sum(col("n") - col("nd")).as("dups"))
      .head()
    if (!bound.isNullAt(0)) {
      require(bound.getLong(0) <= MaxCandidates,
        s"a query has ${bound.getLong(0)} candidates; the greedy takes ≤ $MaxCandidates per query")
      require(bound.getLong(1) == 0L,
        "candidate frame has duplicate (query_id, id) rows")
    }
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
        relPpm(round(V.cosineFromQuantized(col("qa"), col("qb"), col("na"), col("nb")), 6))
          .as("sim_ppm"))
      .localCheckpoint(true)

    // the bounded-window carve-out: every window below partitions by
    // query_id over ≤ MaxCandidates rows (the enforced input contract)
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
      // LEFT join + coalesce(0): a candidate id that does not resolve
      // in `corpus` has no pairs rows, so an inner join here would
      // silently DROP it from rounds ≥ 2 while the driver form scores
      // the same input with sim.getOrElse(0) — the two seam surfaces
      // must agree on contract-violating input (ADVICE r14; MmrSpec
      // plants an unresolvable id and pins driver == batch: it scores
      // msim = 0, i.e. maximally diverse, on BOTH)
      val scored = remaining.join(msims, Seq("query_id", "id"), "left")
        .withColumn("msim_ppm", coalesce(col("msim_ppm"), lit(0L)))
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
