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
  *
  * When the "do not train on this" set outgrows a broadcast (10⁹+
  * shingles — takedown corpora, whole prior crawls), switch to
  * [[PortableBloom.contaminationByBloom]]: the set compresses to m
  * bits riding the plan as constants (no false negatives, bounded FP
  * tax — q196), and [[PortableBloom.writeShingleState]] maintains it
  * daily without re-scanning history (measured: the broadcast form
  * grows 13.4× at 100× corpus while the Bloom probe stays flat,
  * SCALE_r13_bloom100).
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

  /** SEMANTIC decontamination — the embedding-space complement of the
    * lexical surfaces above: a paraphrased eval question shares no
    * 8-token window with the corpus copy, but their embeddings sit at
    * cosine ≈ 1 (the leakage the lexical checks structurally miss).
    * Every corpus vector scores against every benchmark vector by the
    * exact quantized cosine (the benchmark side broadcasts — eval
    * suites are tiny against a 100 TB corpus, the q26 exact-baseline
    * shape; when a benchmark outgrows a broadcast, generate candidates
    * with the IVF/LSH machinery and rescore exactly, the SemDeDup
    * discipline), keeps its single best match through the
    * bounded-buffer top-1 aggregate (ties → lower benchmark id), and
    * is flagged when that best cosine reaches `minCosine`.
    *
    * Corpus and benchmark id spaces must be disjoint (the caller
    * separates the sets — a self-pair would trivially read 1.0).
    * Output: `(query_id = corpus id, id = best benchmark id, cosine,
    * contaminated)`, one row per scorable corpus vector (null/ragged
    * embeddings cannot be scored and drop, the ANN-family contract).
    */
  def semanticOverlap(corpusEmb: DataFrame, benchEmb: DataFrame,
      vecCol: String, idCol: String, minCosine: Double): DataFrame = {
    require(minCosine >= -1.0 && minCosine <= 1.0,
      s"minCosine must be in [-1, 1], got $minCosine")
    import graft.functions.{VectorFunctions => V}
    def pre(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).as(outId), V.quantize(col(vecCol)).as(s"${outId}_qv"))
        .withColumn(s"${outId}_n2", V.dotQ(col(s"${outId}_qv"), col(s"${outId}_qv")))
    // the CORPUS is the scanned side (query_id of the per-doc top-1);
    // the benchmark broadcasts — same arithmetic and tie-break as
    // bruteForceTopKQuantized, asymmetry flipped for the corpus-sized
    // input
    val scored = pre(corpusEmb, "query_id")
      .join(broadcast(pre(benchEmb, "id")), col("id") =!= col("query_id"))
      .withColumn("cosine", round(V.cosineFromQuantized(
        col("id_qv"), col("query_id_qv"), col("id_n2"), col("query_id_n2")), 6))
    Similarity.rankTopK(scored, 1)
      .withColumn("contaminated", col("cosine") >= lit(minCosine))
      .drop("rank") // top-1: the rank column is constant
  }
}
