package graft.operators

import graft.functions.{AuditableHash => H, TextFunctions => T}
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
  *     its `k`-token window, projected immediately to the narrow
  *     `(hash: long, doc_id, pos)` triple — the wide shingle string
  *     never reaches an exchange.
  *  2. Mark: a shingle occurrence is *duplicated* iff its hash occurs
  *     ≥ 2 times corpus-wide (in another document OR again in the same
  *     one). One hash exchange: `count(*) OVER (PARTITION BY hash)`
  *     keeps the positions attached — no second pass over the corpus
  *     to re-join a duplicate-hash set.
  *  3. Merge: per document, duplicated positions whose windows overlap
  *     or touch (`pos' − pos ≤ k`) coalesce into maximal spans — the
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
  * Determinism: positions are a pure function of the tokenization
  * ([[T.tokens]] over lowercased text), the hash is the auditable
  * h60, so the span set is engine-independent — the DuckDB oracle
  * reproduces it exactly (q90).
  */
object SubstringDedup {

  /** Maximal duplicated token spans per document:
    * `(id, span_start, span_end, span_tokens)` with 1-based inclusive
    * token indices into the document's whitespace tokenization.
    * Documents with no duplicated window emit no rows.
    */
  def duplicateSpans(docs: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"window must be >= 2 tokens, got $k")
    val toks = T.tokens(lower(col(textCol)))
    // guard: sequence(1, n-k+1) RUNS BACKWARDS when n < k — gate it
    val starts = when(size(toks) >= k,
      sequence(lit(1), size(toks) - k + 1))
      .otherwise(array().cast("array<int>"))
    val occ = docs
      .select(col(idCol), explode(starts).as("__p"), toks.as("__toks"))
      .select(col(idCol), col("__p").cast("long").as("pos"),
        H.h60(array_join(slice(col("__toks"), col("__p"), lit(k)), " ")).as("__h"))
    val byHash = Window.partitionBy(col("__h"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val dup = occ
      .withColumn("__cnt", count(lit(1)).over(byHash))
      .filter(col("__cnt") >= 2)
    dup
      // NULL lag (first duplicated position of a doc) → otherwise(1):
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
}
