package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-span deduplication — the positional complement to
  * the whole-document and chunk-level families in [[Dedup]]: instead
  * of asking "is this document a (near-)copy of another", it asks
  * "WHICH token ranges of this document occur elsewhere in the
  * corpus", the annotation a training pipeline needs to *excise*
  * boilerplate, licence blocks, and quoted passages while keeping the
  * novel remainder (the suffix-array dedup of Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better",
  * re-shaped for a shuffle-based engine).
  *
  * Algorithm — three stages, two exchanges, no suffix array:
  *
  *  1. Shingle: every position `i` of every document emits the h60 of
  *     its `k`-token window (tokens lowercased inside the hash, so
  *     matching is case-blind while positions index the original
  *     tokenization), projected immediately to the narrow
  *     `(hash: long, doc_id, pos)` triple — the wide shingle string
  *     never reaches an exchange.
  *  2. Mark: [[duplicateSpans]] marks an occurrence iff its hash
  *     occurs ≥ 2 times corpus-wide; [[excise]] instead marks all but
  *     the corpus-FIRST occurrence (the `(doc_id, pos)` minimum), the
  *     keep-one-copy discipline of the paper. Both are an AGGREGATE
  *     keyed on the hash (count / min-struct) joined back to the
  *     occurrences — deliberately NOT a window over the hash
  *     partition, although that would save the join: a window must
  *     co-locate every occurrence of a key in one task, so a single
  *     boilerplate shingle repeated across 1% of a 100 TB corpus
  *     serializes billions of rows through one sort, and AQE cannot
  *     split a window partition. The aggregate's partial (map-side)
  *     combine collapses the hot hash BEFORE its exchange, and the
  *     join back IS one of the shapes AQE skew-split handles
  *     (SubstringDedupSpec plants a hot shingle and asserts the split
  *     activates with the result set unchanged).
  *  3. Merge: per document, marked positions whose windows overlap or
  *     touch (`pos' − pos ≤ k`) coalesce into maximal spans — the
  *     standard gaps-and-islands window, one exchange on doc id.
  *
  * The row count entering stage 2 is `Σ max(0, n_tokens − k + 1)` —
  * linear in corpus tokens at 24 bytes a row; at 100 TB both
  * exchanges are hash-partitioned on uniform keys (a 60-bit digest, a
  * doc id), so the plan scales like the tokenize pass itself. A
  * single pathological shingle (an empty-ish boilerplate line
  * repeated everywhere) skews the stage-2 window partition; AQE's
  * skew split handles the sort, and the count itself is O(partition).
  *
  * Determinism: positions are a pure function of the whitespace
  * tokenization ([[graft.functions.TextFunctions.tokens]]), the hash
  * is the auditable h60, and
  * the canonical occurrence is the `(doc_id, pos)` minimum — the span
  * sets and excised text are engine-independent (DuckDB oracles q90 /
  * q91 reproduce them exactly).
  */
object SubstringDedup {

  /** `(doc_id, pos, hash)` for every k-token window — one
    * [[graft.plans.ShingleHashes]] pass per document (tokenize +
    * lowercase + window-hash fused; NULL text yields no rows through
    * `posexplode`'s null-drop), positions 1-based.
    */
  private[operators] def occurrences(docs: DataFrame, textCol: String,
      idCol: String, k: Int): DataFrame = {
    val hashes = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.ShingleHashes(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          col(textCol).cast("string")), k))
    docs
      .select(col(idCol), posexplode(hashes).as(Seq("__p0", "__h")))
      .select(col(idCol), (col("__p0") + 1).cast("long").as("pos"), col("__h"))
  }

  /** Gaps-and-islands merge of marked positions into maximal spans. */
  private[operators] def mergeSpans(marked: DataFrame, idCol: String,
      k: Int): DataFrame = {
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    marked
      // NULL lag (first marked position of a doc) → otherwise(1):
      // every island opener increments the group id
      .withColumn("__brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= k, lit(0))
          .otherwise(lit(1)))
      .withColumn("__grp", sum(col("__brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (k - 1)).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** Maximal duplicated token spans per document:
    * `(id, span_start, span_end, span_tokens)` with 1-based inclusive
    * token indices into the document's whitespace tokenization. Every
    * occurrence of a duplicated window is marked (analysis view — "how
    * much of this doc exists elsewhere"); documents with no duplicated
    * window emit no rows.
    */
  def duplicateSpans(docs: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"window must be >= 2 tokens, got $k")
    val occ = occurrences(docs, textCol, idCol, k)
    // hashes occurring >= 2 times, via partial-combinable aggregate +
    // semi join (not a count window — see the stage-2 note up top);
    // the decoy grouping key puts the build side on its own
    // planner-owned shuffle stage so the probe side is
    // AQE-skew-splittable (the markNonFirst note)
    val dup = occ
      .groupBy(col("__h"), pmod(col("__h"), lit(1L)).as("__k0"))
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= 2)
      .select(col("__h"))
    mergeSpans(occ.join(dup, Seq("__h"), "left_semi"), idCol, k)
  }

  /** Spans covering every occurrence EXCEPT the corpus-first one (the
    * `(doc_id, pos)`-minimum occurrence of each window keeps its
    * text): what [[excise]] cuts. Windows unique in the corpus are
    * never marked (`row_number ≥ 2` implies `count ≥ 2`).
    */
  def nonCanonicalSpans(docs: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"window must be >= 2 tokens, got $k")
    val occ = occurrences(docs, textCol, idCol, k)
    mergeSpans(markNonFirst(occ, idCol), idCol, k)
  }

  /** Occurrences minus each hash's corpus-first `(id, pos)` holder —
    * the min via a partial-combinable struct aggregate joined back on
    * the hash (not a `row_number` window — see the stage-2 note up
    * top). Struct ordering is lexicographic by field, so
    * `min(struct(id, pos))` IS the `(id, pos)` minimum.
    *
    * The decoy secondary grouping key is load-bearing: AQE's skew
    * split only matches a sort-merge join whose BOTH children sit
    * directly on ENSURE_REQUIREMENTS shuffle stages (the ShuffleStage
    * matcher tests the origin, so a manual `.repartition` — origin
    * REPARTITION_BY_COL — can never enable a split), and a final
    * aggregate between the build side's exchange and the join breaks
    * the shape. Grouping on `(__h, pmod(__h, 1))` — the same groups,
    * since the decoy is a pure function of `__h` — leaves the
    * aggregate's output partitioning unusable for the `__h` join, so
    * EnsureRequirements plants ITS OWN exchange directly under the
    * join. The firsts table pays one extra exchange (hash-distinct
    * rows, post-combine); the corpus-sized probe side becomes
    * splittable at mapper granularity, which is what survives a
    * boilerplate hash at 100 TB.
    */
  private def markNonFirst(occ: DataFrame, idCol: String): DataFrame = {
    val firsts = occ
      .groupBy(col("__h"), pmod(col("__h"), lit(1L)).as("__k0"))
      .agg(min(struct(col(idCol), col("pos"))).as("__first"))
      .drop("__k0")
    occ.join(firsts, Seq("__h"))
      .filter(!(col(idCol) === col("__first").getField(idCol) &&
        col("pos") === col("__first").getField("pos")))
      .drop("__first")
  }

  /** The persistable incremental index: the DISTINCT h60 set of every
    * k-token window in `docs` — one narrow long column, the only state
    * the incremental form needs ("has this window been seen before").
    * Store bucketed on `shingle_h` so daily probes co-locate.
    */
  def shingleIndex(docs: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"window must be >= 2 tokens, got $k")
    occurrences(docs, textCol, idCol, k)
      .select(col("__h").as("shingle_h")).distinct()
  }

  /** Fully-attributed variant of [[shingleIndex]] — the POSTINGS of
    * the window-hash set: one row per distinct `(hash, doc)` pair.
    * This is the state shape that supports both production disciplines
    * the attribution-free set cannot:
    *
    *  - **Replay safety**: a replayed daily batch must probe only
    *    hashes introduced BEFORE itself; `doc_id < min(batch ids)` is
    *    exact under the monotonic-id contract
    *    ([[graft.jobs.CorpusJob.runIncremental]]'s span leg). A
    *    keyless hash set cannot exclude its own crashed attempt's
    *    appends.
    *  - **Deletion**: retracting a document is an anti-join on
    *    `doc_id` against the tombstone set — a hash stops marking
    *    spans exactly when its LAST live holder goes, with no
    *    re-election scan (cf. the fingerprint index, whose single
    *    `canonical_id` attribution needs one). The exclusion join is
    *    the same [[graft.jobs.CorpusJob.deleteDocs]] contract as the
    *    sig/band/cell tables; [[graft.jobs.CorpusJob.compactState]]
    *    purges the rows physically.
    *
    * Size: |distinct (hash, doc)| rows versus [[shingleIndex]]'s
    * |distinct hash| — a small multiple (the mean document frequency
    * of a k-token window is near 1 for everything but boilerplate) at
    * 16 bytes a row, still bucketed on `shingle_h` so the daily probe
    * plan is unchanged (the probe projects `shingle_h` and dedups
    * inside the semi-join build). Appends are idempotent by value:
    * a replayed batch re-emits identical rows and the probe's
    * distinct absorbs them.
    */
  def shinglePostings(docs: DataFrame, textCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k >= 2, s"window must be >= 2 tokens, got $k")
    occurrences(docs, textCol, idCol, k)
      .select(col("__h").as("shingle_h"), col(idCol).cast("long").as("doc_id"))
      .distinct()
  }

  /** Incremental [[nonCanonicalSpans]]: spans for a daily `batch` of
    * NEW documents against the accumulated corpus, without touching the
    * corpus — a batch occurrence is non-canonical iff its window hash
    * exists in the persisted [[shingleIndex]] (one semi-join; with the
    * index bucketed on the hash only the increment shuffles) OR an
    * earlier `(doc_id, pos)` occurrence exists within the batch itself
    * (`row_number` over the batch's hash partition). With batch ids
    * monotonically above every indexed id — the daily-append contract
    * the rest of the index family assumes — this equals the full-corpus
    * [[nonCanonicalSpans]] restricted to the batch (q92's oracle).
    * Maintain the index by appending the batch's distinct hashes.
    */
  def nonCanonicalSpansIncremental(index: DataFrame, batch: DataFrame,
      textCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 2, s"window must be >= 2 tokens, got $k")
    val occ = occurrences(batch, textCol, idCol, k)
    // ONE batch pipeline, not a union of marking legs: the batch-first
    // aggregate, its join back, and the index probe are all keyed on
    // __h, so the batch exchanges once (the firsts/seen build sides
    // are their own small exchanges). The distinct() makes the
    // left-join indicator safe against a non-distinct index. Marking
    // is the same aggregate-not-window shape as [[nonCanonicalSpans]]
    // (the stage-2 note) — batch-internal non-first OR seen-in-index.
    // The decoy grouping key matches [[markNonFirst]]: a hot
    // boilerplate shingle inside one large batch is the same
    // single-task hazard as in the batch path, and without the decoy
    // the firsts aggregate sits between the exchange and the mark
    // join, so AQE's skew split cannot activate on the probe side.
    val firsts = occ
      .groupBy(col("__h"), pmod(col("__h"), lit(1L)).as("__k0"))
      .agg(min(struct(col(idCol), col("pos"))).as("__first"))
      .drop("__k0")
    val seen = index.select(col("shingle_h").as("__h")).distinct()
      .withColumn("__seen", lit(true))
    val marked = occ.join(firsts, Seq("__h"))
      .join(seen, Seq("__h"), "left")
      .filter(!(col(idCol) === col("__first").getField(idCol) &&
          col("pos") === col("__first").getField("pos")) ||
        col("__seen").isNotNull)
      .drop("__first", "__seen")
    mergeSpans(marked, idCol, k)
  }

  /** Keep-one-copy excision: every document gains `text_deduped` (its
    * whitespace tokens minus the [[nonCanonicalSpans]] ranges, re-joined
    * by single spaces — original casing and token order preserved;
    * original inter-token whitespace is normalised, which the
    * tokenization already discards) and `n_tokens_removed`. Documents
    * that are pure copies of earlier ones collapse to the empty
    * string; the corpus-first occurrence of every passage survives
    * somewhere. One extra doc-id join against the span list; the cut
    * itself is a codegen'd collection expression, no UDF.
    */
  def excise(docs: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame =
    cutSpans(docs, nonCanonicalSpans(docs, textCol, idCol, k),
      textCol, idCol)

  /** Cut arbitrary token spans out of documents: every doc gains
    * `text_deduped` (tokens outside any of its `spans` rows, re-joined
    * by single spaces — original casing and order preserved, original
    * inter-token whitespace normalised) and `n_tokens_removed`. The
    * assembly half of [[excise]], public so other span producers
    * (e.g. [[Decontaminate.overlapSpans]] — surgical benchmark
    * removal) compose with it. One doc-id join hanging the span list
    * on the docs; the cut is ONE native kernel
    * ([[graft.plans.CutSpans]]: tokenize + interval-merge + sweep +
    * re-join fused inside whole-stage codegen), replacing the earlier
    * `transform`/`filter`/`exists` higher-order functions whose
    * lambdas ran interpreted at O(tokens × spans) per document on the
    * heaviest pass of a real dedup run (CutSpansSpec proves the two
    * forms equal, nulls and overlaps included).
    */
  def cutSpans(docs: DataFrame, spans: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val spanList = spans
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start").cast("long"),
        col("span_end").cast("long"))).as("__spans"))
    val cut = ColumnBridge.column(graft.plans.CutSpans(
      ColumnBridge.expression(col(textCol).cast("string")),
      ColumnBridge.expression(col("__spans"))))
    docs.join(spanList, Seq(idCol), "left")
      .withColumn("__cut", cut)
      .withColumn("text_deduped", col("__cut").getField("text_deduped"))
      .withColumn("n_tokens_removed", col("__cut").getField("n_tokens_removed"))
      .select(docs.columns.map(col) :+ col("text_deduped")
        :+ col("n_tokens_removed"): _*)
  }
}
