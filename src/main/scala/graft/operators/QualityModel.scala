package graft.operators

import graft.functions.{AuditableHash => H}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document scoring — the classifier stage of an LLM data
  * pipeline (fastText-style quality / domain classifiers à la GPT-3's
  * WebText filter or CCNet's language-model perplexity gate): featurize
  * each document as a hashed bag of words, score it with a linear
  * model, filter on the score. The heuristic quality signals
  * ([[graft.plans.TextStats]]) catch degenerate text; a TRAINED scorer
  * is how production corpora rank borderline documents, and this
  * operator is the inference plumbing for one.
  *
  * Spark-first shape: the model is tiny (dim fixed-point weights) and
  * the corpus is not — so the weights EMBED in the plan as a reference
  * object inside one native codegen expression
  * ([[graft.plans.HashedBowScore]]) and scoring is a pure narrow map:
  * no join, no explode, no shuffle, whole-stage codegen end-to-end. At
  * 100 TB the pass costs exactly one corpus scan; a 1000-executor
  * cluster scores shards independently.
  *
  * The model itself is a STUB by the same discipline as the multimodal
  * decode ([[Multimodal]]): training happens outside this engine (no
  * ML libs in the sandbox), so [[stubWeights]] derives a deterministic
  * fixed-point weight vector from the h60 family — the full inference
  * path (hashing, bucketing, dot product, thresholding) is real,
  * tested, and DuckDB-oracle-exact, and a trained model drops in as a
  * `Seq[Long]` (fixed-point export is the standard quantized-inference
  * contract) without touching the plan shape.
  */
object QualityModel {

  /** Deterministic stand-in weight vector: bucket b weighs
    * `h60("salt:b") mod 2001 − 1000` ∈ [−1000, 1000] (fixed-point,
    * scale 1000 ≙ 1.0). Derived from the auditable hash family so the
    * SQL oracle regenerates it in-query — no out-of-band parameter
    * shipping, exactly the MinHash-constants discipline.
    */
  def stubWeights(dim: Int, salt: String = "qw"): Seq[Long] = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    Seq.tabulate(dim)(b => H.h60(s"$salt:$b") % 2001L - 1000L)
  }

  /** The scoring column: exact integer `Σ weights[h60(token) mod dim]`
    * over the document's whitespace tokens (NULL text → NULL, empty →
    * 0).
    */
  def bowScore(text: Column, weights: Seq[Long]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.HashedBowScore(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          text.cast("string")), weights))

  /** `df` + `bow_score` (fixed-point long) + `quality_pass`
    * (score ≥ minScore; NULL text fails the gate).
    */
  def score(df: DataFrame, textCol: String, weights: Seq[Long],
      minScore: Long = 0L): DataFrame =
    df.withColumn("bow_score", bowScore(col(textCol), weights))
      .withColumn("quality_pass",
        coalesce(col("bow_score") >= minScore, lit(false)))

  /** Keep only documents the model accepts. */
  def filterByScore(df: DataFrame, textCol: String, weights: Seq[Long],
      minScore: Long = 0L): DataFrame =
    score(df, textCol, weights, minScore).filter(col("quality_pass"))
      .drop("quality_pass")
}
