package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over a document corpus — the search leg of a
  * curation pipeline (contamination mining: "which training docs score
  * high against this benchmark question"; quality auditing: "show me
  * the top docs for this query"; boilerplate hunting by keyword). The
  * reference's query surface stops at LIKE-prefix scans
  * (`22130124/data_warehouse_nhom8` staging filters); this is the
  * ranked-search extension a 100 TB corpus needs.
  *
  * Scoring is the Lucene BM25 variant, k1 = 1.2, b = 0.75:
  *
  * {{{  idf(t)  = log2((2N + 2) / (2·df(t) + 1))          // ln(1 + (N − df + ½)/(df + ½)), base-2 units
  *      tfn(t,d)= tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *      score   = Σ_t idf(t) · tfn(t, d)                  }}}
  *
  * in EXACT fixed-point integer arithmetic — idf via the
  * [[graft.plans.Log2Fp]] kernel (2^-10 units; IEEE `ln` differs
  * between libms in the last ulp and a hash-matched oracle cannot
  * tolerate "almost"), tfn as a single integer division in 2^-10
  * units (clearing the rational k1/b and the avgdl denominator:
  * `tfn_fp = 22528·tf·avgdl_fp div (10·tf·avgdl_fp + 3·avgdl_fp +
  * 2304·dl)` with `avgdl_fp = 256·TL div N`), so scores are longs in
  * 2^-20 units, summed order-free. Exact while
  * `tf × avgdl < 2^47` (far beyond any chunked corpus — upstream
  * [[Chunker]] bounds documents to hundreds of tokens; a 2^20-token
  * doc in a 2^20-avg corpus still fits).
  *
  * Index shape at 100 TB: [[postings]] `(id, term, tf, dl)` and
  * [[docLens]] `(id, dl)` are both ADDITIVE over disjoint doc-id sets
  * (plain union — each doc owns its rows; the vocabulary statistic df
  * is derived per-query from the postings of the query's terms, so
  * there is no df state to maintain). Persist postings partitioned /
  * bucketed BY TERM: a query touches |q| term groups, so the scan is
  * partition-pruned to the query's postings lists — increment-sized
  * work however big the corpus, the Lucene access path expressed
  * relationally. Daily ingest appends its own [[postings]]; takedown
  * is [[deleteDocs]] (anti-join, the same contract as the dedup
  * indexes). Query terms are deduplicated (set semantics, as Lucene's
  * default BooleanQuery).
  */
object Bm25 {

  /** Whitespace tokens of `c`, lowercased, empties dropped — the
    * TermStats tokenizer, shared so BM25 df and TF-IDF df agree.
    */
  private def tokens(c: Column): Column =
    filter(split(lower(coalesce(c, lit(""))), "\\s+"), t => t =!= "")

  private def log2fp(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.Log2Fp(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))

  /** `(id, term, tf, dl)` — one row per (document, distinct term).
    * `dl` (the document's token count) rides every row so the scorer
    * needs NO per-doc join at query time (Lucene's norms, stored
    * inline). Tokenize is a narrow map ([[Spread]]-parallelized on
    * one-row-group corpora); one shuffle keyed on (id, term).
    * Zero-token documents contribute no rows.
    */
  def postings(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    Spread.auto(docs, col(idCol))
      .select(col(idCol), tokens(col(textCol)).as("__tk"))
      .select(col(idCol), size(col("__tk")).cast("long").as("dl"),
        explode(col("__tk")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))

  /** `(id, dl)` — one row per document, INCLUDING zero-token docs
    * (they score nothing but count toward N and avgdl, so adding empty
    * docs changes rankings exactly as a batch rebuild would).
    */
  def docLens(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol), size(tokens(col(textCol))).cast("long").as("dl"))

  /** Additive index merge over DISJOINT doc-id sets: each document
    * owns its postings and lens rows, so the merge is a plain union —
    * no aggregation, increment-sized cost (BatchSpec property:
    * `postings(a ∪ b) == merge(postings(a), postings(b))`).
    */
  def mergePostings(parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "nothing to merge")
    parts.reduce(_ unionByName _)
  }

  /** Takedown: drop every index row of the deleted documents — one
    * anti-join per table, the standard index-family contract
    * (delete-then-search == build-without, Bm25Spec).
    */
  def deleteDocs(index: DataFrame, deleted: DataFrame, idCol: String): DataFrame =
    index.join(deleted.select(col(idCol)).distinct(), Seq(idCol), "left_anti")

  /** Hard cap on the DISTINCT query terms a batch probe may collect to
    * the driver (r15 verdict hardening — the [[Mmr.MaxCandidates]]
    * discipline): the batch surfaces embed the collected terms as one
    * literal `isin`, so an unbounded query table would mean an
    * unbounded driver collect AND a plan-embedded In-list of that size
    * (analysis/codegen blowup) instead of a loud failure. 4096 terms
    * is far above any benchmark batch while keeping the literal list
    * plan-sized; split a larger query table into term chunks and union
    * the results if a bigger batch is ever really wanted.
    */
  val MaxQueryTerms: Int = 4096

  private def requireTermBudget(terms: Seq[String]): Unit =
    require(terms.length <= MaxQueryTerms,
      s"query batch has ${terms.length} distinct terms; the batch probe " +
        s"collects them to the driver and embeds a literal In-list, so it " +
        s"takes <= $MaxQueryTerms — chunk the query table and union the results")

  /** 1-row corpus meta: N, total token count, and avgdl in Q8 fixed
    * point (exact integer div — floor(long/double) misrounds above
    * 2^53, the Sharding boundary lesson).
    */
  private def metaFrame(lens: DataFrame): DataFrame =
    lens.agg(count(lit(1)).as("__n"),
        coalesce(sum(col("dl")), lit(0L)).as("__tl"))
      .withColumn("__avg", expr("(__tl * 256L) div greatest(__n, 1L)"))

  /** `(term, __idf)` for the candidate rows' terms — df is a count of
    * the (doc, term)-unique candidate rows, so filtering postings to
    * the query's terms first doesn't change any df.
    */
  private def idfFrame(cand: DataFrame, meta: DataFrame): DataFrame =
    cand.groupBy(col("term")).agg(count(lit(1)).as("__df"))
      .crossJoin(broadcast(meta))
      .select(col("term"),
        (log2fp(lit(2L) * col("__n") + lit(2L)) -
          log2fp(lit(2L) * col("__df") + lit(1L))).as("__idf"))

  /** Per-candidate-row fixed-point term weight (expects `tf`, `dl`,
    * `__idf`, `__avg` in scope).
    */
  private def termWeight: Column = col("__idf") *
    expr("(22528L * tf * __avg) div (10L * tf * __avg + 3L * __avg + 2304L * dl)")

  /** Exact current impact of every candidate posting row: the
    * broadcast ≤|q|-row idf table (df derived from the candidates
    * themselves), the broadcast 1-row corpus meta, and [[termWeight]]
    * as `__w` — the ONE scoring definition all four probe paths share
    * (the pruned == full rank-safety proofs require them to be the
    * same code, not four copies kept in lockstep by hand).
    */
  private def weightedCandidates(cand: DataFrame, meta: DataFrame): DataFrame =
    cand.join(broadcast(idfFrame(cand, meta)), "term")
      .crossJoin(broadcast(meta.select(col("__avg"))))
      .withColumn("__w", termWeight)

  /** Top-k documents for `query` against a postings index: filter the
    * postings to the query's terms (partition-pruned when the index is
    * stored by term), derive df per term from those rows, broadcast
    * the ≤|q|-row idf table and the 1-row corpus meta, score each
    * candidate row in one narrow integer projection, sum per doc, and
    * `TakeOrderedAndProject` the top k by `(score desc, id)`. The
    * only shuffle over candidate rows is the per-doc sum — everything
    * corpus-sized stays in the pruned scan. Absent terms (df = 0)
    * simply contribute no rows. `rank` is a row_number over the ≤k
    * result rows (bounded single-partition window, the q73 carve-out).
    */
  def searchPostings(post: DataFrame, lens: DataFrame, idCol: String,
      query: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(query.nonEmpty, "query must have at least one term")
    val q = query.map(_.toLowerCase).distinct
    val meta = metaFrame(lens)
    val cand = post.filter(col("term").isin(q: _*))
    val top = weightedCandidates(cand, meta)
      .groupBy(col(idCol))
      .agg(sum(col("__w")).as("score_fp"))
      .orderBy(col("score_fp").desc, col(idCol))
      .limit(k)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("score_fp").desc, col(idCol))))
  }

  /** BATCH retrieval: top-k documents for EVERY query in a query
    * table `(qidCol, termCol)` — the contamination-mining shape
    * (thousands of benchmark questions against the corpus), one
    * corpus pass however many queries. The query table broadcasts
    * (benchmark-sized); candidate rows are postings of any queried
    * term; the per-(query, doc) sum shuffles once; per-query top-k
    * runs through [[TopKPerGroup]]'s bounded-buffer aggregator — the
    * map-side phase caps state at k rows per query per task, so the
    * final exchange carries O(k · queries · tasks), never the
    * candidate set. Per-query term multiplicity collapses (set
    * semantics, matching [[searchPostings]]). The aggregator's double
    * buffer round-trips `score_fp` exactly below 2^53 (a score needs
    * ~10^8 matched query terms to get there; the output re-casts to
    * long).
    */
  def searchManyPostings(post: DataFrame, lens: DataFrame, idCol: String,
      queries: DataFrame, qidCol: String, termCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val q = queries.select(col(qidCol).as("__qid"),
      lower(col(termCol)).as("term")).distinct()
    val meta = metaFrame(lens)
    // the candidate restriction is a LITERAL isin, not a broadcast join
    // (r15): a join against the query terms cannot push below `post`'s
    // (id, term) aggregate, so the one-shot form shuffled the FULL
    // corpus postings to then keep a handful of terms — the literal
    // predicate pushes through the aggregate to the exploded tokens
    // (and partition-prunes a stored term-bucketed index). The collect
    // is the bounded batch-query contract this surface already assumes
    // (benchmark-sized table, broadcast below; enforced LOUDLY by
    // [[MaxQueryTerms]]). Same rows: per-term tf/dl/df are functions of
    // that term's own rows only.
    val terms = q.select(col("term")).distinct().collect().map(_.getString(0))
    requireTermBudget(terms.toSeq)
    val cand =
      if (terms.isEmpty) post.filter(lit(false))
      else post.filter(col("term").isin(terms.toSeq: _*))
    val scored = weightedCandidates(cand, meta)
      .join(broadcast(q), "term")
      .groupBy(col("__qid"), col(idCol))
      .agg(sum(col("__w")).as("score_fp"))
    TopKPerGroup(scored, Seq("__qid"), "score_fp", idCol, k)
      .select(col("__qid").as(qidCol), col(idCol),
        col("score_fp").cast("long").as("score_fp"), col("rank"))
  }

  /** One-shot form: build the index legs lazily and search; production
    * probes a persisted index via [[searchPostings]].
    */
  def search(docs: DataFrame, textCol: String, idCol: String,
      query: Seq[String], k: Int): DataFrame =
    searchPostings(postings(docs, textCol, idCol),
      docLens(docs, textCol, idCol), idCol, query, k)

  /** Per-term impact metadata `(term, df_ub, max_tf, min_dl)` — the
    * WAND-style statistics stored beside a persisted [[postings]]
    * index. `max_tf`/`min_dl` bound any posting's term weight from
    * above (tfn is monotone ↑tf, ↓dl), and stay SOUND after
    * [[deleteDocs]] without maintenance: deletes only shrink the true
    * max-tf / grow the true min-dl, so a stale bound is still an upper
    * bound (`df_ub` likewise only over-counts — safe for the
    * exhausted-term shortcut below, never for scoring; scoring df is
    * always derived fresh from the probed postings). Merge across
    * index parts: [[mergeImpactMeta]] (sum/max/min — additive).
    */
  def impactMeta(post: DataFrame): DataFrame =
    post.groupBy(col("term")).agg(count(lit(1)).as("df_ub"),
      max(col("tf")).as("max_tf"), min(col("dl")).as("min_dl"))

  /** Additive merge of [[impactMeta]] parts (disjoint doc-id sets). */
  def mergeImpactMeta(parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "nothing to merge")
    parts.reduce(_ unionByName _).groupBy(col("term"))
      .agg(sum(col("df_ub")).as("df_ub"), max(col("max_tf")).as("max_tf"),
        min(col("min_dl")).as("min_dl"))
  }

  /** RANK-SAFE pruned top-k probe — the MaxScore/WAND idea expressed
    * relationally: most candidate postings cannot put their document
    * into the top k, so they must not ride the per-doc score exchange.
    *
    * Phases (both scans are partition-pruned to the query's terms when
    * the index is stored by term):
    *
    *  1. **Heads**: per query term, the top `b` postings by EXACT
    *     current impact (idf·tfn with the live df/avgdl — never the
    *     stored bounds), selected by [[TopKPerGroup]]'s bounded-buffer
    *     aggregator: map-side state caps at b rows per term per task,
    *     so the exchange carries O(b·|q|·tasks), never the postings
    *     lists. The b-th impact per term is that term's `cutoff`.
    *  2. **Exact rescore**: every document owning a head posting
    *     (≤ b·|q| ids, broadcast) gets its FULL exact score via a
    *     broadcast semi-join — no wide shuffle.
    *
    *  A document outside the head set has per-term impact ≤ cutoff(t)
    *  for every t (heads order by (impact desc, id), so non-kept ≤
    *  boundary), hence total ≤ Σ cutoffs over NON-exhausted terms (an
    *  exhausted term — every posting kept — contributes nothing
    *  outside). The pruned answer is provably the true top-k iff the
    *  k-th rescored score STRICTLY exceeds that bound (strict, because
    *  an outside tie could still win the id tie-break); otherwise this
    *  probe FALLS BACK to [[searchPostings]] — identical results
    *  either way (Bm25Spec pins pruned == full across b sweeps,
    *  including forced fallbacks; q135 hash-checks the pruned path
    *  against the DuckDB full-scoring oracle).
    *
    * The two driver-side `collect`s are bounded: |q| cutoff rows and k
    * result rows — the Lucene-style interactive-probe contract.
    * `materializeCandidates` localCheckpoints the weighted candidate
    * rows so the two phases share one scan — right for the one-shot
    * form (whose scan is a full tokenize); leave false against a
    * persisted term-partitioned index, where re-reading the pruned
    * postings lists beats spilling them.
    *
    * Ids must be integral (the [[TopKPerGroup]] contract); `meta`
    * (from [[impactMeta]]) enables the exhausted-corpus shortcut —
    * when every query term's df_ub ≤ b the pruned path would keep
    * everything, so the plain probe is dispatched without the
    * two-phase overhead.
    */
  def searchPostingsPruned(post: DataFrame, lens: DataFrame, idCol: String,
      query: Seq[String], k: Int, b: Int = 0,
      meta: Option[DataFrame] = None,
      materializeCandidates: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(query.nonEmpty, "query must have at least one term")
    val q = query.map(_.toLowerCase).distinct
    val headB = if (b > 0) b else math.max(8 * k, 64)
    val shortcut = meta.exists { m =>
      val rows = m.filter(col("term").isin(q: _*))
        .agg(coalesce(max(col("df_ub")), lit(0L))).head().getLong(0)
      rows <= headB // every term exhausted: pruning would keep everything
    }
    if (shortcut) return searchPostings(post, lens, idCol, query, k)
    val corpusMeta = metaFrame(lens)
    val cand = post.filter(col("term").isin(q: _*))
    val weighted0 = weightedCandidates(cand, corpusMeta)
      .select(col("term"), col(idCol), col("__w"))
    val weighted =
      if (materializeCandidates) weighted0.localCheckpoint(eager = true)
      else weighted0
    // phase 1: per-term impact heads through the bounded-buffer top-k
    val heads = TopKPerGroup(weighted, Seq("term"), "__w", idCol, headB)
      .localCheckpoint(eager = true) // ≤ |q|·b rows, read three times
    val stats = heads.groupBy(col("term"))
      .agg(count(lit(1)).as("__cnt"), min(col("__w")).as("__cut"))
      .collect() // ≤ |q| rows
    val ubOutside = stats.iterator
      .filter(_.getLong(1) == headB) // exhausted terms have no outside tail
      .map(_.getDouble(2).toLong).sum
    val allExhausted = stats.forall(_.getLong(1) < headB)
    // phase 2: exact full scores for the head documents only
    val candDocs = heads.select(col(idCol)).distinct()
    val exact = weighted
      .join(broadcast(candDocs), Seq(idCol), "left_semi")
      .groupBy(col(idCol))
      .agg(sum(col("__w")).as("score_fp"))
      .orderBy(col("score_fp").desc, col(idCol))
      .limit(k)
      .localCheckpoint(eager = true) // ≤ k rows
    val topRows = exact.collect()
    val provablyExact = allExhausted ||
      (topRows.length == k && topRows.last.getLong(1) > ubOutside)
    if (provablyExact)
      exact.withColumn("rank",
        row_number().over(Window.orderBy(col("score_fp").desc, col(idCol))))
    else searchPostings(post, lens, idCol, query, k)
  }

  /** One-shot pruned form (the q135 correctness surface): build the
    * index legs lazily, materialize the candidate rows once, probe
    * pruned. Rank-safe, so it hash-matches the full-scoring oracle.
    */
  def searchPruned(docs: DataFrame, textCol: String, idCol: String,
      query: Seq[String], k: Int): DataFrame =
    searchPostingsPruned(postings(docs, textCol, idCol),
      docLens(docs, textCol, idCol), idCol, query, k,
      materializeCandidates = true)

  /** BATCH retrieval with [[searchPostingsPruned]]'s rank-safe pruning —
    * the contamination-mining shape (thousands of benchmark questions)
    * where pruning matters most: per-term impact heads are computed
    * ONCE and shared by every query using the term, so the per-(query,
    * doc) rescore exchange carries O(b · terms-per-query · queries)
    * rows instead of every (query, matching-posting) pair.
    *
    * Per-query soundness, decided entirely in the plan (no per-query
    * driver collects): a query accepts iff every one of its terms is
    * exhausted (all postings kept → its candidates are complete), or
    * its k-th rescored score STRICTLY exceeds Σ cutoffs of its
    * non-exhausted terms. Queries that cannot be proven re-dispatch
    * through the full-scoring path over the SAME weighted candidate
    * rows, restricted to just those queries — value-identical to
    * [[searchManyPostings]] for every query (per-term df and the
    * corpus meta don't depend on which queries ride the batch;
    * Bm25Spec sweeps budgets incl. forced fallbacks). The candidate-
    * pair table (≤ b·|terms| rows of (query, doc)) broadcasts — at 10k
    * benchmark queries that is a few-MB broadcast, the batch-query
    * contract this surface already assumes.
    *
    * Barrier discipline (the r11 latency finding — this used to pay
    * four eager `localCheckpoint` jobs plus an eager verdict, ~3×
    * q140's wall for the same answer): the verdict, the per-query
    * bound, term stats, and the accept/fallback split are all LAZY, so
    * the whole accept ∪ fallback union executes as one plan at action
    * time; when no query fails, AQE's empty-relation propagation
    * prunes the fallback leg off the plan at runtime. Frame sharing is
    * regime-split:
    *
    *  - `materializeCandidates = true` (the one-shot form, where
    *    `post` is a lazy tokenize): the weighted candidate rows, the
    *    per-term heads, and the pruned top-k persist lazily, every
    *    re-reader (heads feeds stats + rescore pairs; pruned feeds
    *    verdict + output; weighted feeds heads + rescore + fallback)
    *    hits the cache, the BOUNDED result (≤ k·|queries| rows)
    *    materializes eagerly at the end, and all three cache entries
    *    are unpersisted before returning — the call leaks nothing and
    *    the returned frame is a self-contained checkpoint. The corpus
    *    is tokenized exactly once.
    *  - `materializeCandidates = false` (a persisted term-partitioned
    *    index, the production probe): re-reading the pruned postings
    *    lists beats spilling them, so `weighted` stays a lazy scan and
    *    the shared heads and pruned top-k take eager bounded
    *    checkpoints (≤ b·|terms| and ≤ k·|queries| rows) to keep the
    *    scan count at the documented two.
    */
  def searchManyPostingsPruned(post: DataFrame, lens: DataFrame,
      idCol: String, queries: DataFrame, qidCol: String, termCol: String,
      k: Int, b: Int = 0, materializeCandidates: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val headB = if (b > 0) b else math.max(8 * k, 64)
    val q = queries.select(col(qidCol).as("__qid"),
      lower(col(termCol)).as("term")).distinct()
      .localCheckpoint(eager = true) // benchmark-sized, read four times
    val meta = metaFrame(lens)
    // literal isin off the checkpointed query table (the
    // searchManyPostings r15 note): a term join cannot push below a
    // lazy `post` aggregate, a literal predicate can — and it
    // partition-prunes a stored term-bucketed index identically.
    // Bounded loudly by [[MaxQueryTerms]].
    val terms = q.select(col("term")).distinct().collect().map(_.getString(0))
    requireTermBudget(terms.toSeq)
    val cand =
      if (terms.isEmpty) post.filter(lit(false))
      else post.filter(col("term").isin(terms.toSeq: _*))
    val weighted0 = weightedCandidates(cand, meta)
      .select(col("term"), col(idCol), col("__w"))
    // persist(), not a lazy localCheckpoint: a lazy checkpoint compiles
    // its subplan to an RDD up front, OUTSIDE adaptive execution, and
    // the re-planned shuffles cost more than the sharing saves
    // (measured +40% on this probe). The entries are explicitly
    // unpersisted before returning — see the bounded eager result below
    val weighted =
      if (materializeCandidates) weighted0.persist()
      else weighted0
    // bounded frames travel as ONE partition: ≤ |terms|·b rows spread
    // over the parent's 32+ partitions would launch a full task wave in
    // every downstream consumer — measured as the dominant cost of this
    // probe at bench scale (a dozen 32-task stages over dozens of rows)
    val heads0 = TopKPerGroup(weighted, Seq("term"), "__w", idCol, headB)
      .coalesce(1)
    val heads = // ≤ |terms|·b rows, read three times
      if (materializeCandidates) heads0.persist()
      else heads0.localCheckpoint(eager = true)
    val termStats = heads.groupBy(col("term"))
      .agg(count(lit(1)).as("__cnt"),
        min(col("__w")).cast("long").as("__cut")) // lazy: ≤ |terms| rows off the checkpoint
    // per-query outside upper bound: Σ cutoffs over NON-exhausted terms
    // (a term absent from the postings contributes nothing either way),
    // plus the COUNT-BASED exhaustion flag: `__ub = 0` is NOT the same
    // as "all terms exhausted" — a saturated term whose postings all
    // weigh 0 (idf_fp floors to 0 once df ≈ N) has cutoff 0 while its
    // tail is very much alive, and accepting on the zero bound alone
    // would return an incomplete candidate set
    val ub = q.join(termStats, Seq("term"), "left")
      .groupBy(col("__qid"))
      .agg(coalesce(sum(when(col("__cnt") === headB, col("__cut"))
        .otherwise(0L)), lit(0L)).as("__ub"),
        coalesce(max(when(col("__cnt") === headB, 1).otherwise(0)), lit(0))
          .as("__anyfull"))
    // exact rescore of each query's head documents — no distinct: the
    // consumer is a broadcast LEFT SEMI probe, which dedups the build
    // side by construction, and the duplicate factor is ≤ |q terms|
    val candPairs = q.join(heads.select(col("term"), col(idCol)), "term")
      .select(col("__qid"), col(idCol))
    val scored = weighted
      .join(broadcast(q), "term")
      .join(broadcast(candPairs), Seq("__qid", idCol), "left_semi")
      .groupBy(col("__qid"), col(idCol))
      .agg(sum(col("__w")).as("score_fp"))
    val pruned0 = TopKPerGroup(scored, Seq("__qid"), "score_fp", idCol, k)
      .select(col("__qid"), col(idCol),
        col("score_fp").cast("long").as("score_fp"), col("rank"))
      .coalesce(1) // ≤ k·|queries| rows — same single-partition rule
    val pruned = // read twice (verdict + accepted output)
      if (materializeCandidates) pruned0.persist()
      else pruned0.localCheckpoint(eager = true)
    // acceptance: all terms exhausted (count-based), or k rows with
    // kth > ub STRICTLY (an outside tie could win the id tie-break).
    // Lazy — every input is a checkpoint, so the two consumers below
    // re-derive it with tiny joins, no barrier
    val kth = pruned.filter(col("rank") === k)
      .select(col("__qid"), col("score_fp").as("__kth"))
    // both union branches read the verdict; in the index regime it is a
    // plain lazy frame (each derivation is a handful of joins over the
    // eager checkpoints), in the one-shot regime it rides the same
    // persist-then-unpersist discipline as the other internal frames
    val verdict0 = ub.join(kth, Seq("__qid"), "left")
      .select(col("__qid"),
        (col("__anyfull") === 0 ||
          coalesce(col("__kth") > col("__ub"), lit(false))).as("__ok"))
    val verdict =
      if (materializeCandidates) verdict0.persist() else verdict0
    val okQ = verdict.filter(col("__ok")).select(col("__qid"))
    val failedQ = verdict.filter(!col("__ok")).select(col("__qid"))
    val accepted = pruned.join(broadcast(okQ), Seq("__qid"), "left_semi")
    // full-scoring fallback over the SAME weighted rows (per-term df and
    // avgdl are query-set-independent, so this is value-identical to
    // dispatching searchManyPostings on the failed queries — without
    // rescanning/retokenizing the corpus)
    val failedScored = weighted
      .join(broadcast(q.join(broadcast(failedQ), Seq("__qid"), "left_semi")),
        "term")
      .groupBy(col("__qid"), col(idCol))
      .agg(sum(col("__w")).as("score_fp"))
    val fallback = TopKPerGroup(failedScored, Seq("__qid"), "score_fp",
        idCol, k)
      .select(col("__qid"), col(idCol),
        col("score_fp").cast("long").as("score_fp"), col("rank"))
    val out = accepted.unionByName(fallback)
      .select(col("__qid").as(qidCol), col(idCol), col("score_fp"), col("rank"))
    if (!materializeCandidates) out
    else {
      // the one-shot regime materializes the BOUNDED result eagerly
      // (≤ k·|queries| rows — the batch-query contract) so the three
      // internal caches can be released HERE instead of leaking a
      // CacheManager entry per call (no caller handle could ever
      // unpersist them); the returned frame is a self-contained
      // checkpoint the ContextCleaner reclaims with the frame itself
      val res = out.localCheckpoint(eager = true)
      weighted.unpersist(blocking = false)
      heads.unpersist(blocking = false)
      pruned.unpersist(blocking = false)
      verdict.unpersist(blocking = false)
      res
    }
  }

  // ---- persisted impact index (champion lists — the WAND convention) ----

  /** Bucket routing for the on-disk layout: terms hash into `buckets`
    * partition directories via [[graft.functions.AuditableHash.h60]],
    * which has a bit-identical DRIVER-side twin — so a probe can turn
    * its literal query terms into literal partition values and the
    * scan prunes to the query's buckets without any Spark job. (A raw
    * vocabulary `partitionBy("term")` would create one directory per
    * distinct term — millions at corpus scale; bucketing bounds the
    * directory count while keeping the pruned read ≈ |q|/buckets of
    * the index.)
    */
  private def termBucketCol(buckets: Int): Column =
    graft.functions.AuditableHash.h60(
      concat(lit("bm25bucket:"), col("term"))) % lit(buckets.toLong)

  private def termBucketOf(term: String, buckets: Int): Long =
    graft.functions.AuditableHash.h60(s"bm25bucket:$term") % buckets

  /** Build and persist the COMPLETE BM25 index under `dir` — postings,
    * lens, the 1-row corpus meta, and the WAND-style impact metadata
    * the r12 probe recomputed at query time (the q173 latency carry):
    *
    *  - `postings/` — [[postings]] rows, partitioned by term bucket,
    *  - `lens/` — [[docLens]] rows,
    *  - `meta/` — 1 row `(n_docs, total_tokens, avgdl_fp, head_b,
    *    buckets)`,
    *  - `termstats/` — per term `(df, idf_fp, cut_fp, exhausted)`:
    *    the live document frequency, its fixed-point idf, the head-B-th
    *    exact impact (the term's pruning CUTOFF), and whether every
    *    posting of the term fits inside the head budget,
    *  - `champions/` — per term the top-`headB` postings by EXACT
    *    impact as `(term, id, w_fp)` (Lucene/WAND champion lists),
    *    partitioned by term bucket.
    *
    * With impacts persisted, [[searchManyIndexPruned]]'s critical path
    * has NO runtime heads aggregate: heads, cutoffs, and idf are
    * pruned READS. Consistency contract: impacts are exact for the
    * index they were computed over — [[appendToIndex]] refreshes them
    * after every postings append (one index-sized pass, no corpus
    * re-tokenize), the same derived-statistics discipline as Lucene's
    * merge-time norms.
    */
  def writeIndex(docs: DataFrame, textCol: String, idCol: String,
      dir: String, headB: Int = 64, buckets: Int = 64): Unit = {
    require(headB >= 1, s"headB must be >= 1, got $headB")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = docs.sparkSession
    docLens(docs, textCol, idCol)
      .write.mode("overwrite").parquet(s"$dir/lens")
    postings(docs, textCol, idCol)
      .withColumn("term_bucket", termBucketCol(buckets))
      // one shuffle partition per bucket: without it every write task
      // fans a file into every bucket dir (32 tasks x 64 buckets =
      // 2048 tiny files) and the probe's pruned read drowns in footer
      // fetches. `buckets` is therefore also the file-count dial — set
      // it to the wanted write parallelism at corpus scale
      .repartition(col("term_bucket"))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$dir/postings")
    refreshImpacts(spark, dir, idCol, headB, buckets)
  }

  /** Append an increment's postings/lens rows (disjoint doc ids — the
    * [[mergePostings]] contract) and refresh the impact metadata.
    * Cost: the append is increment-sized; the refresh is one pass over
    * the INDEX (postings + lens — never a corpus re-tokenize), exactly
    * the statistics rewrite a Lucene merge pays. Takedown goes through
    * [[deleteFromIndex]]'s atomic swap instead — deletes RAISE true
    * impacts above stored cutoffs, so stale stats there would break
    * rank-safety, while growth only LOWERS them (stale-after-append is
    * conservative). Crash contract: a crash between the append and
    * the refresh leaves stats stale against the grown postings —
    * re-run [[refreshImpacts]] (idempotent over the stored tables)
    * before probing; production wraps index maintenance in the audit
    * bracket like every other job here.
    */
  def appendToIndex(docs: DataFrame, textCol: String, idCol: String,
      dir: String): Unit = {
    val spark = docs.sparkSession
    promoteCrashedRewrite(spark, dir)
    val m = spark.read.parquet(s"$dir/meta").head()
    val headB = m.getAs[Int]("head_b")
    val buckets = m.getAs[Int]("buckets")
    docLens(docs, textCol, idCol)
      .write.mode("append").parquet(s"$dir/lens")
    postings(docs, textCol, idCol)
      .withColumn("term_bucket", termBucketCol(buckets))
      .repartition(col("term_bucket"))
      .write.mode("append").partitionBy("term_bucket")
      .parquet(s"$dir/postings")
    refreshImpacts(spark, dir, idCol, headB, buckets)
  }

  /** Takedown for a persisted index: stage the rewritten postings/lens
    * (anti-joined against the deleted ids) plus FRESHLY refreshed
    * impact metadata under a sibling root, then swap the whole index
    * in one rename. The order matters for rank-safety: deletes SHRINK
    * df, so true idf (and hence true impacts) can RISE above the old
    * stored cutoffs — champions/stats must never be live against
    * post-delete postings, which is why this is one atomic root swap
    * and not a rewrite-then-refresh of the live dir. A crash before
    * the rename leaves the live index untouched (stale staging is
    * dropped on the next attempt); delete-then-probe == build-without
    * (Bm25Spec).
    */
  def deleteFromIndex(spark: SparkSession, dir: String, deleted: DataFrame,
      idCol: String): Unit = {
    promoteCrashedRewrite(spark, dir)
    val m = spark.read.parquet(s"$dir/meta").head()
    val headB = m.getAs[Int]("head_b")
    val buckets = m.getAs[Int]("buckets")
    val tmp = s"${dir}__rewrite"
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    if (fs.exists(tmpPath)) fs.delete(tmpPath, true) // crashed mid-STAGE
    deleteDocs(spark.read.parquet(s"$dir/lens"), deleted, idCol)
      .write.mode("overwrite").parquet(s"$tmp/lens")
    deleteDocs(spark.read.parquet(s"$dir/postings"), deleted, idCol)
      .repartition(col("term_bucket"))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$tmp/postings")
    refreshImpacts(spark, tmp, idCol, headB, buckets)
    fs.delete(hPath, true)
    require(fs.rename(tmpPath, hPath), s"atomic swap failed: $tmp -> $dir")
  }

  /** Operating diagnostics for a persisted [[writeIndex]] dir — the
    * [[IvfIndex.cellStats]] analogue: one row of
    * `(n_docs, total_tokens, avgdl_fp, head_b, buckets, vocab_size,
    * max_df, exhausted_frac_fp)` from the 1-row meta + one aggregate
    * over the (vocab-sized, never corpus-sized) termstats table.
    * `exhausted_frac_fp` (‰ of terms whose every posting fits the head
    * budget) is the "is head_b right" dial: near 1000‰ the pruning
    * machinery is dead weight (every probe takes the exhausted
    * shortcut — shrink the budget or enjoy the exactness); near 0‰
    * with a tiny `max_df` the budget wastes champion storage.
    */
  def indexStats(spark: SparkSession, dir: String): DataFrame = {
    promoteCrashedRewrite(spark, dir)
    val meta = spark.read.parquet(s"$dir/meta")
    val ts = spark.read.parquet(s"$dir/termstats")
      .agg(count(lit(1)).as("vocab_size"),
        coalesce(max(col("df")), lit(0L)).as("max_df"),
        coalesce(sum(when(col("exhausted"), 1L).otherwise(0L)), lit(0L))
          .as("__nex"))
      .withColumn("exhausted_frac_fp",
        expr("__nex * 1000L div greatest(vocab_size, 1L)"))
    meta.crossJoin(broadcast(ts))
      .select(col("n_docs"), col("total_tokens"), col("avgdl_fp"),
        col("head_b"), col("buckets"), col("vocab_size"), col("max_df"),
        col("exhausted_frac_fp"))
  }

  /** Heal [[deleteFromIndex]]'s delete→rename crash window (the
    * [[graft.sources.Zone]] `recover` discipline): a MISSING index
    * root beside a complete `__rewrite` staging root means the swap's
    * delete fired but the rename didn't — the staging root IS the
    * post-delete index (it is only ever deleted-then-renamed after
    * [[refreshImpacts]] completes), so promote it. Called by every
    * index entry point; a no-op when the root exists.
    */
  private def promoteCrashedRewrite(spark: SparkSession, dir: String): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmpPath = new org.apache.hadoop.fs.Path(s"${dir}__rewrite")
    if (!fs.exists(hPath) && fs.exists(tmpPath))
      require(fs.rename(tmpPath, hPath),
        s"crashed-rewrite promotion failed: $tmpPath -> $dir")
  }

  /** Recompute `meta/`, `termstats/`, `champions/` from the persisted
    * postings + lens — the derived-statistics half of [[writeIndex]],
    * shared by build and append so the impact definition exists once.
    * Champion impacts use the SAME [[termWeight]] integer kernel as
    * every probe path, over the same persisted df/avgdl — so a
    * champion's stored `w_fp` equals the probe's recomputed `__w`
    * bit-for-bit, which is what makes the stored cutoffs rank-safe.
    */
  def refreshImpacts(spark: SparkSession, dir: String, idCol: String,
      headB: Int, buckets: Int): Unit = {
    val post = spark.read.parquet(s"$dir/postings")
    val lens = spark.read.parquet(s"$dir/lens")
    metaFrame(lens)
      .select(col("__n").as("n_docs"), col("__tl").as("total_tokens"),
        col("__avg").as("avgdl_fp"),
        lit(headB).as("head_b"), lit(buckets).as("buckets"))
      .write.mode("overwrite").parquet(s"$dir/meta")
    val meta = spark.read.parquet(s"$dir/meta")
    val dfStats = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(meta.select(col("n_docs"))))
      .select(col("term"), col("df"),
        (log2fp(lit(2L) * col("n_docs") + lit(2L)) -
          log2fp(lit(2L) * col("df") + lit(1L))).as("idf_fp"))
    // exact impacts: a term-keyed SHUFFLE join (vocab-sized idf table —
    // too big to broadcast at corpus scale; this is build-time cost)
    val weighted = post
      .join(dfStats.select(col("term"), col("idf_fp").as("__idf")), "term")
      .crossJoin(broadcast(meta.select(col("avgdl_fp").as("__avg"))))
      .withColumn("__w", termWeight)
    val champs = TopKPerGroup(
        weighted.select(col("term"), col(idCol), col("__w")),
        Seq("term"), "__w", idCol, headB)
      .select(col("term"), col(idCol), col("__w").cast("long").as("w_fp"))
    champs.withColumn("term_bucket", termBucketCol(buckets))
      .repartition(col("term_bucket"))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$dir/champions")
    val cuts = spark.read.parquet(s"$dir/champions")
      .groupBy(col("term")).agg(min(col("w_fp")).as("cut_fp"))
    dfStats.join(cuts, Seq("term"))
      .withColumn("exhausted", col("df") <= lit(headB.toLong))
      .withColumn("term_bucket", termBucketCol(buckets))
      .repartition(col("term_bucket"))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$dir/termstats")
  }

  /** Batch rank-safe pruned retrieval against a PERSISTED
    * [[writeIndex]] dir — [[searchManyPostingsPruned]]'s production
    * twin with the runtime heads barrier REMOVED from the critical
    * path (r12 verdict task 2): per-term heads, cutoffs, and idf are
    * partition-pruned READS of the stored champion lists and term
    * stats, so the plan goes straight to the exact rescore of the
    * champion documents. Value-identical to [[searchManyPostings]]
    * over the indexed corpus for every query:
    *
    *  - champions hold each term's top-headB postings by exact impact,
    *    so a document outside them is bounded by Σ stored cutoffs over
    *    non-exhausted terms (same proof as the runtime-heads form);
    *  - acceptance per query is decided in the plan (all terms
    *    exhausted, or k-th rescored score STRICTLY above the bound);
    *    failed queries re-dispatch through full scoring over the same
    *    pruned postings scan — identical results either way;
    *  - the rescore recomputes impacts with the STORED df/avgdl
    *    (identical integers to the champion build — see
    *    [[refreshImpacts]]), so pruned == full == one-shot exactly.
    *
    * The query table collects its ≤|terms| distinct terms to drive
    * PARTITION pruning with literal bucket values (bounded — the
    * benchmark-query contract this batch surface already assumes).
    * Scans: champions/termstats prune to the query's buckets (tiny);
    * postings prune likewise and are read at most twice (rescore +
    * fallback leg, which AQE's empty-relation propagation drops when
    * every query accepts).
    */
  /** The 1-row stored corpus meta as driver scalars `(buckets,
    * avgdl_fp)` — the values every probe of a [[writeIndex]] dir embeds
    * as literals. A serving session probing one index many times can
    * read this ONCE and pass it back via `metaHint` (the r15-verdict
    * "shared probe session" item): the meta is frozen WITH the index —
    * [[writeIndex]]/[[refreshImpacts]]/[[deleteFromIndex]] rewrite it —
    * so the hint's lifetime is the caller's index handle, exactly the
    * SparkEntry StateMemo discipline.
    */
  def readIndexMeta(spark: SparkSession, dir: String): (Int, Long) = {
    val m = spark.read.parquet(s"$dir/meta").head()
    (m.getAs[Int]("buckets"), m.getAs[Long]("avgdl_fp"))
  }

  def searchManyIndexPruned(spark: SparkSession, dir: String,
      queries: DataFrame, qidCol: String, termCol: String,
      k: Int, metaHint: Option[(Int, Long)] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    promoteCrashedRewrite(spark, dir)
    // ONE bounded collect of the distinct (qid, term) pairs serves
    // everything driver-side (terms for partition pruning, the local
    // relation the plan re-reads for free — no checkpoint job, the
    // barrier audit that got the r12 one-shot form under budget)
    val qd = queries.select(col(qidCol).as("__qid"),
      lower(col(termCol)).as("term")).distinct()
    val qRows = qd.collect()
    val q = spark.createDataFrame(
      java.util.Arrays.asList(qRows: _*), qd.schema)
    val terms = qRows.map(_.getString(1)).distinct.toSeq
    requireTermBudget(terms) // the same loud MaxQueryTerms bound
    // corpus meta is 3 scalars — read once, embedded as literals (a
    // broadcast of a 1-row frame would cost a build job per consumer);
    // metaHint skips even that one head() job when the caller holds a
    // session-scoped index handle (r16 — one blocking job fewer per
    // probe on every hybrid/batch serving path)
    val (buckets, avgdlFp) = metaHint.getOrElse(readIndexMeta(spark, dir))
    val bucketLits = terms.map(termBucketOf(_, buckets)).distinct
    def pruned(table: String): DataFrame =
      spark.read.parquet(s"$dir/$table")
        .filter(col("term_bucket").isin(bucketLits: _*) &&
          col("term").isin(terms: _*))
    val stats = pruned("termstats") // ≤ |terms| rows
    val champs = pruned("champions") // ≤ |terms|·headB rows
    val idCol = idColOf(champs)
    // stored cutoffs/exhaustion flags come to the driver (≤ |terms|
    // rows — the bounded interactive-probe contract searchPostingsPruned
    // already set); the per-query verdict then needs NO plan-side joins
    val statRows = stats.select(col("term"), col("cut_fp"),
      col("exhausted")).collect()
    val cutOf = statRows.map(r =>
      r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val candPairs = q.join(champs.select(col("term"), col(idCol)), "term")
      .select(col("__qid"), col(idCol))
    val post = pruned("postings")
    // exact rescore with the stored idf/avgdl — the one termWeight kernel
    val weighted = post
      .join(broadcast(stats.select(col("term"), col("idf_fp").as("__idf"))),
        "term")
      .withColumn("__avg", lit(avgdlFp))
      .withColumn("__w", termWeight)
      .select(col("term"), col(idCol), col("__w"))
    val scored = weighted
      .join(broadcast(q), "term")
      .join(broadcast(candPairs), Seq("__qid", idCol), "left_semi")
      .groupBy(col("__qid"), col(idCol))
      .agg(sum(col("__w")).as("score_fp"))
    val prunedTop = TopKPerGroup(scored, Seq("__qid"), "score_fp", idCol, k)
      .select(col("__qid"), col(idCol),
        col("score_fp").cast("long").as("score_fp"), col("rank"))
    // the ONE main action of the probe: ≤ k·|queries| result rows come
    // to the driver (bounded — the batch-query contract), acceptance is
    // decided locally, and the accepted rows go back as a LOCAL
    // relation — no checkpoint barrier, no verdict sub-plans, the DAG
    // is exactly "pruned scans → rescore → top-k"
    val topRows = prunedTop.collect()
    val byQid = topRows.groupBy(_.get(0))
    def accepts(qid: Any): Boolean = {
      val qTerms = qRows.filter(_.get(0) == qid).map(_.getString(1))
      val nonExhaustedCuts = qTerms.flatMap(cutOf.get).collect {
        case (cut, false) => cut
      }
      // all terms exhausted (or absent) → candidates complete; else the
      // k-th exact score must STRICTLY beat the stored outside bound
      nonExhaustedCuts.isEmpty || {
        val rows = byQid.getOrElse(qid, Array.empty[org.apache.spark.sql.Row])
        rows.length == k &&
          rows.map(_.getLong(2)).min > nonExhaustedCuts.sum
      }
    }
    val qids = qRows.map(_.get(0)).distinct
    val (okQids, failedQids) = qids.partition(accepts)
    val okSet = okQids.toSet
    val accepted = spark.createDataFrame(
      java.util.Arrays.asList(topRows.filter(r => okSet(r.get(0))): _*),
      prunedTop.schema)
    // full-scoring fallback over the same pruned postings scan,
    // restricted to the unprovable queries (value-identical to the
    // plain probe for them — df/avgdl are stored, query-set-free)
    val out =
      if (failedQids.isEmpty) accepted
      else {
        val failedScored = weighted
          .join(broadcast(q.filter(col("__qid").isin(failedQids: _*))),
            "term")
          .groupBy(col("__qid"), col(idCol))
          .agg(sum(col("__w")).as("score_fp"))
        accepted.unionByName(TopKPerGroup(failedScored, Seq("__qid"),
            "score_fp", idCol, k)
          .select(col("__qid"), col(idCol),
            col("score_fp").cast("long").as("score_fp"), col("rank")))
      }
    out.select(col("__qid").as(qidCol), col(idCol), col("score_fp"),
      col("rank"))
  }

  /** The doc-id column of an index table — everything that isn't a
    * layout or statistics column (the index schema owns exactly one
    * caller-named id column, preserved through [[writeIndex]]).
    */
  private def idColOf(df: DataFrame): String = {
    val known = Set("term", "tf", "dl", "w_fp", "term_bucket", "df",
      "idf_fp", "cut_fp", "exhausted", "pos")
    val rest = df.columns.filterNot(known)
    require(rest.length == 1,
      s"cannot infer the id column from ${df.columns.mkString(",")}")
    rest.head
  }

  /** Single-query top-k against a persisted [[writeIndex]] dir — the
    * batch probe with one query row (one code path, the q135/q140
    * equivalence transfers).
    */
  def searchIndexPruned(spark: SparkSession, dir: String,
      query: Seq[String], k: Int,
      metaHint: Option[(Int, Long)] = None): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    import spark.implicits._
    searchManyIndexPruned(spark, dir,
        query.map(t => (0L, t)).toDF("__q", "__t"), "__q", "__t", k, metaHint)
      .drop("__q")
  }

  /** POSITIONAL postings `(id, term, pos)` — one row per token
    * occurrence (pos is the 0-based token index). The phrase-query
    * index: additive over disjoint doc sets, takedown by
    * [[deleteDocs]], persist partitioned by term like [[postings]] so
    * a phrase query reads its terms' occurrence lists only. Heavier
    * than [[postings]] (a row per occurrence, not per distinct term) —
    * build it only when phrase queries are on the menu, exactly the
    * Lucene positions-on/off dial.
    */
  def positions(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    Spread.auto(docs, col(idCol))
      .select(col(idCol), posexplode(tokens(col(textCol))))
      .select(col(idCol), col("col").as("term"), col("pos").cast("long").as("pos"))

  /** Exact-phrase match over a positional index: documents containing
    * `phrase`'s tokens CONSECUTIVELY, with the occurrence count
    * (overlapping occurrences count — "order order order" has two
    * "order order" hits, the Lucene PhraseQuery convention). Shape:
    * one pruned read per phrase term, then (m−1) equi-joins on
    * `(id, pos − i)` — all co-partitioned on the same key, so the
    * chain re-uses one exchange per side and never widens beyond the
    * rarest term's occurrence list. Returns `(id, hits)`.
    */
  def phraseMatches(pos: DataFrame, idCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    val terms = phrase.map(_.toLowerCase)
    val first = pos.filter(col("term") === terms.head)
      .select(col(idCol), col("pos").as("__p"))
    terms.zipWithIndex.drop(1).foldLeft(first) { case (acc, (t, i)) =>
      acc.join(pos.filter(col("term") === t)
          .select(col(idCol), (col("pos") - i).as("__p")),
        Seq(idCol, "__p"))
    }.groupBy(col(idCol)).agg(count(lit(1)).as("hits"))
  }

  /** One-shot phrase search over raw documents (the q143 correctness
    * surface); production probes a persisted [[positions]] index via
    * [[phraseSearchIndexed]].
    */
  def phraseSearch(docs: DataFrame, textCol: String, idCol: String,
      phrase: Seq[String]): DataFrame =
    phraseMatches(positions(docs, textCol, idCol), idCol, phrase)

  /** Persist the positional index under `dir` — `positions/`
    * partitioned by the same driver-computable term bucket as
    * [[writeIndex]] (phrase probes prune to their terms' occurrence
    * lists with literal values) plus a 1-row `meta/` recording the
    * bucket count. Unlike the BM25 index there is NO derived
    * statistics table — positional postings are pure additive facts,
    * so increments are plain [[appendPositions]] appends and takedown
    * is an anti-join rewrite ([[deleteDocs]] +
    * [[graft.sources.Zone.overwriteInPlace]]-style swap), with nothing
    * to refresh.
    */
  def writePositions(docs: DataFrame, textCol: String, idCol: String,
      dir: String, buckets: Int = 64): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = docs.sparkSession
    import spark.implicits._
    Seq(buckets).toDF("buckets")
      .write.mode("overwrite").parquet(s"$dir/meta")
    positions(docs, textCol, idCol)
      .withColumn("term_bucket", termBucketCol(buckets))
      .repartition(col("term_bucket"))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$dir/positions")
  }

  /** Append an increment's occurrence rows (disjoint doc ids) — plain
    * additive append, no derived state.
    */
  def appendPositions(docs: DataFrame, textCol: String, idCol: String,
      dir: String): Unit = {
    val spark = docs.sparkSession
    val buckets = spark.read.parquet(s"$dir/meta").head().getAs[Int]("buckets")
    positions(docs, textCol, idCol)
      .withColumn("term_bucket", termBucketCol(buckets))
      .repartition(col("term_bucket"))
      .write.mode("append").partitionBy("term_bucket")
      .parquet(s"$dir/positions")
  }

  /** Exact-phrase search against a persisted [[writePositions]] dir:
    * the scan prunes to the phrase's term buckets (literal partition
    * values — the [[searchManyIndexPruned]] discipline), then
    * [[phraseMatches]]' co-partitioned `(id, pos − i)` join chain runs
    * over just those occurrence lists. Value-identical to the one-shot
    * [[phraseSearch]] over the indexed corpus.
    */
  def phraseSearchIndexed(spark: SparkSession, dir: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    val buckets = spark.read.parquet(s"$dir/meta").head().getAs[Int]("buckets")
    val terms = phrase.map(_.toLowerCase).distinct
    val bucketLits = terms.map(termBucketOf(_, buckets)).distinct
    val pos = spark.read.parquet(s"$dir/positions")
      .filter(col("term_bucket").isin(bucketLits: _*) &&
        col("term").isin(terms: _*))
    phraseMatches(pos, idColOf(pos), phrase)
  }
}
