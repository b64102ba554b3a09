package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data decontamination: fraction of each corpus document's
  * distinct word shingles that appear anywhere in a benchmark/eval set
  * — the overlap check every serious pretraining pipeline runs before
  * training (a model scoring well on an eval it memorized verbatim is
  * measuring leakage, not ability).
  *
  * Scale shape: the benchmark side reduces to its DISTINCT shingle set
  * and is broadcast — eval suites are a few MB against a 100 TB
  * corpus, the canonical broadcast asymmetry. The corpus side is the
  * same one-pass native shingling every dedup operator rides
  * ([[Dedup.shingleRows]], `Spread`-parallelized); the probe is a
  * broadcast left join + per-doc aggregate keyed on doc id — no
  * corpus-side shuffle beyond the aggregation itself.
  */
object Decontaminate {

  /** Per corpus document: `n_shingles` (distinct), `n_contaminated`
    * (of them, how many occur in `benchmark`), and `contamination` =
    * round(n_contaminated / n_shingles, 6). Documents with no tokens
    * still emit one ""-shingle row (shingleRows contract), so every
    * corpus document appears in the output.
    */
  def overlap(corpus: DataFrame, benchmark: DataFrame, textCol: String,
      idCol: String, n: Int = 3): DataFrame = {
    val cs = Dedup.shingleRows(corpus, textCol, idCol, Nil, n)
    val bs = Dedup.shingleRows(benchmark, textCol, idCol, Nil, n)
      .select(col("shingle")).distinct()
      .withColumn("__hit", lit(1L))
    cs.join(broadcast(bs), Seq("shingle"), "left")
      .groupBy(col("id").as(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
      .withColumn("contamination",
        round(col("n_contaminated").cast("double") / col("n_shingles"), 6))
  }

  /** Span-level decontamination: WHICH token ranges of each corpus
    * document overlap the benchmark, as maximal `(id, span_start,
    * span_end, span_tokens)` spans — the surgical alternative to
    * [[overlap]]'s per-doc ratio (drop the quoted eval question, keep
    * the rest of the page). The benchmark's distinct k-window hash set
    * ([[SubstringDedup.shingleIndex]] — eval sets are tiny) broadcasts
    * against the corpus's positional occurrences; marked positions
    * merge by the same gaps-and-islands rule as the dedup span family.
    * Compose with [[SubstringDedup.cutSpans]] to emit cleaned text.
    */
  def overlapSpans(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, k: Int = 8): DataFrame = {
    val bench = SubstringDedup.shingleIndex(benchmark, textCol, idCol, k)
      .select(col("shingle_h").as("__h"))
    val marked = SubstringDedup.occurrences(corpus, textCol, idCol, k)
      .join(broadcast(bench), Seq("__h"), "left_semi")
    SubstringDedup.mergeSpans(marked, idCol, k)
  }
}
