package graft.jobs

import graft.functions.{TextFunctions => T}
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The training-data pipeline end-to-end: raw document corpus →
  * exact + canonical dedup → near-dup (MinHash LSH) pruning → quality
  * + language annotation → filter → training-ready corpus + stats.
  *
  * Shuffle budget at 100 TB: one hash exchange on the 16-byte content
  * fingerprint (dedup), one on (band, bandHash) for LSH, one for the
  * final stats rollup. Annotation is entirely narrow. Near-dup pruning
  * keeps the *lowest doc_id* of each candidate pair's cluster — a
  * deterministic, order-free survivor rule.
  */
object CorpusJob {

  final case class Config(
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      nearDupThreshold: Double = 0.8,
      minQuality: Double = 0.3,
      minTokens: Int = 5)

  /** Annotate every document with dedup + quality + language columns
    * (no filtering — callers decide policy).
    */
  def annotate(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    // ONE TextStats pass per row, computed BELOW the canonical-dedup
    // window: a filter pushed down from above (CorpusJob.filter's
    // policy) cannot cross a Window whose partition key it doesn't
    // reference, so the pushed predicate stops above the window and
    // reads the materialized `__tstats` ATTRIBUTE. Computing the struct
    // after the join instead leaves it an alias chain the optimizer
    // inlines into the filter condition — graft_text_stats(text)
    // re-evaluated per predicate reference (6 full text scans per row;
    // FilterExec does no common-subexpression elimination). Measured on
    // the q50 policy filter at sf0.1: 2.0 s → this form cuts the
    // redundant scans. The struct is ~10 small ints per row riding the
    // fingerprint exchange — negligible at any scale.
    val canonical = Dedup.canonical(
      docs.withColumn("__tstats", T.textStats(col("text"))), "text", "doc_id")
    // Loser ids via the collision-row form: one exchange cheaper than
    // pairs→greatest→distinct (see Dedup.minHashLshLosers), and the LSH
    // branch reads ONLY (doc_id, text) — at 100 TB the second pass over
    // the corpus prunes to the two columns it needs at the parquet scan.
    val nearDupIds = Dedup.minHashLshLosers(
        docs.select(col("doc_id"), col("text")), "text", "doc_id",
        cfg.shingleSize, cfg.numHashes, cfg.bands, cfg.nearDupThreshold)
      .withColumn("is_near_duplicate", lit(true))
    canonical
      .join(nearDupIds, Seq("doc_id"), "left_outer")
      .withColumn("is_near_duplicate",
        coalesce(col("is_near_duplicate"), lit(false)))
      .withColumn("n_tokens", T.tokenCountFrom(col("__tstats")).cast("long"))
      .withColumn("quality", T.qualityFrom(col("__tstats")))
      .withColumn("lang_pred", T.langIdFrom(col("__tstats")))
      .drop("__tstats")
  }

  /** Apply the keep-policy: first occurrence of each canonical group,
    * not a near-dup loser, above the quality/length floors.
    */
  def filter(annotated: DataFrame, cfg: Config = Config()): DataFrame =
    annotated
      .filter(!col("is_duplicate") && !col("is_near_duplicate") &&
        col("quality") >= cfg.minQuality && col("n_tokens") >= cfg.minTokens)

  /** Run annotate → filter → write corpus + per-language stats. Returns
    * (kept, dropped) counts.
    */
  def run(spark: SparkSession, docs: DataFrame, outDir: String,
      cfg: Config = Config()): (Long, Long) = {
    val annotated = annotate(docs, cfg).cache()
    val kept = filter(annotated, cfg)
    kept.write.mode("overwrite").parquet(s"$outDir/corpus")
    annotated.groupBy(col("lang_pred"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("is_duplicate") || col("is_near_duplicate"), 1).otherwise(0))
          .as("n_dropped_dup"),
        sum(when(col("quality") < cfg.minQuality, 1).otherwise(0)).as("n_low_quality"),
        sum(col("n_tokens")).as("total_tokens"))
      .write.mode("overwrite").parquet(s"$outDir/stats")
    val keptN = spark.read.parquet(s"$outDir/corpus").count()
    val total = annotated.count()
    annotated.unpersist()
    (keptN, total - keptN)
  }
}
