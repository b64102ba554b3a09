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
  * TRAINING is outside this engine by the same discipline as the
  * multimodal decode ([[Multimodal]]) — no ML libs in the sandbox —
  * but a trained model IMPORTS: [[loadModel]] parses the documented
  * fixed-point weight-file format (dim / scale / bigrams / sparse
  * bucket weights) into a [[Model]] that [[scoreWith]] runs through
  * the same kernel, word-bigram features included (fastText's actual
  * feature set). [[stubWeights]] remains the deterministic stand-in
  * the q99 oracle regenerates in-query — no out-of-band parameter
  * shipping, exactly the MinHash-constants discipline.
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

  /** A trained model as this operator consumes it: `dim` fixed-point
    * weights at `scale` (1.0 ≙ `scale`), optionally with word-bigram
    * features (fastText's actual feature set — the bigram hash is the
    * span family's k=2 window hash, so one tokenization contract
    * serves classifier and dedup alike).
    */
  final case class Model(scale: Long, bigrams: Boolean, weights: IndexedSeq[Long]) {
    require(weights.nonEmpty, "model must have dim >= 1")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    def dim: Int = weights.length
  }

  /** Import a trained model from the documented fixed-point export
    * format — the piece that separates inference plumbing from a
    * usable classifier stage (training happens outside this engine;
    * file parsing does not). Line-oriented text:
    *
    * {{{
    * # comments and blank lines ignored
    * dim 64            (required, first directive)
    * scale 1000        (optional, default 1000 — 1.0 ≙ scale)
    * bigrams true      (optional, default false)
    * w 0 125           (bucket weight, fixed-point; unlisted buckets
    * w 3 -770           weigh 0 — sparse exports stay small)
    * }}}
    *
    * A float-weight trainer exports by rounding `w * scale` — the
    * standard quantized-inference contract, which is what keeps the
    * score exact-integer and therefore DuckDB-oracle-comparable.
    * Fails loudly on malformed lines, duplicate buckets, or a bucket
    * outside [0, dim).
    */
  def loadModel(path: String): Model = {
    val src = scala.io.Source.fromFile(path)
    try {
      var dim = -1
      var scale = 1000L
      var bigrams = false
      val weights = scala.collection.mutable.Map.empty[Int, Long]
      src.getLines().zipWithIndex.foreach { case (line0, i) =>
        val line = line0.trim
        def fail(msg: String) =
          throw new IllegalArgumentException(s"$path:${i + 1}: $msg in '$line'")
        if (line.nonEmpty && !line.startsWith("#")) {
          line.split("\\s+").toSeq match {
            case Seq("dim", v) =>
              dim = scala.util.Try(v.toInt).filter(_ >= 1)
                .getOrElse(fail("bad dim"))
            case Seq("scale", v) =>
              scale = scala.util.Try(v.toLong).filter(_ >= 1)
                .getOrElse(fail("bad scale"))
            case Seq("bigrams", v) =>
              bigrams = scala.util.Try(v.toBoolean).getOrElse(fail("bad bigrams"))
            case Seq("w", b, v) =>
              if (dim < 1) fail("'w' before 'dim'")
              val bucket = scala.util.Try(b.toInt).getOrElse(fail("bad bucket"))
              if (bucket < 0 || bucket >= dim) fail(s"bucket outside [0, $dim)")
              if (weights.contains(bucket)) fail("duplicate bucket")
              weights(bucket) = scala.util.Try(v.toLong).getOrElse(fail("bad weight"))
            case _ => fail("unrecognized directive")
          }
        }
      }
      if (dim < 1) throw new IllegalArgumentException(s"$path: missing 'dim'")
      Model(scale, bigrams,
        IndexedSeq.tabulate(dim)(b => weights.getOrElse(b, 0L)))
    } finally src.close()
  }

  /** Fixed-point scale of [[train]]'s weights (1.0 ≙ 2^20) — a power
    * of two so every quantization step is exact binary arithmetic.
    */
  val TrainScale: Long = 1L << 20

  /** Distributed, DETERMINISTIC in-engine training of the hashed-BoW
    * classifier — closes the train→infer loop: the weights this fits
    * are exactly what [[HashedBowScore]] embeds, and train-time
    * margins are computed BY that kernel, so the feature contract
    * (whitespace tokenize, lowercase, h60 mod dim, occurrence-counted)
    * cannot drift between the two sides by construction.
    *
    * Batch gradient descent on a quasi-logistic link
    * `σ̃(x) = 0.5 + x / (2·(1+|x|))` — only IEEE +, ×, ÷, |·|, which
    * are bit-portable across engines (the repo's sqrt-over-libm-pow
    * discipline; `exp` is libm and is not), so a SQL oracle replays
    * the whole optimization to the bit. Per-document residuals
    * quantize to [[TrainScale]] fixed-point BEFORE any cross-row sum:
    * every gradient accumulation is exact integer arithmetic —
    * order-free, so the fitted weights cannot drift with partitioning
    * or parallelism. The weight update is all-long truncating division
    * (Scala `/`, Spark `div`, and DuckDB `//` agree, negatives
    * included). `etaDen = 0` auto-derives `4·n` (step ∝ the mean
    * per-document gradient).
    *
    * Scale shape, per iteration: ONE narrow kernel pass for margins
    * (weights embedded in the plan — no join), one bucket aggregate
    * over the pre-materialized `(id, bucket, count)` table, one
    * `dim`-sized collect (the CharLm driver-budget discipline). The
    * count table materializes once, rows = Σ distinct buckets per doc.
    * NULL-text documents contribute no features (the kernel's NULL
    * propagates and the explode drops them).
    */
  def train(df: DataFrame, textCol: String, labelCol: String,
      idCol: String, dim: Int, iters: Int = 8,
      etaNum: Long = 1L, etaDen: Long = 0L): Model = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(etaNum >= 1, s"etaNum must be >= 1, got $etaNum")
    require(etaDen >= 0, s"etaDen must be >= 0, got $etaDen")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val hashes = ColumnBridge.column(graft.plans.ShingleHashes(
      ColumnBridge.expression(col(textCol).cast("string")), 1))
    val labeled = df.select(col(idCol).as("__id"),
        col(labelCol).cast("long").as("__y"), col(textCol))
      .localCheckpoint(true)
    // the label rides the feature table (r16): only documents WITH
    // feature rows ever contribute to a gradient (grad joins cnt), so
    // stamping __y onto the checkpointed counts once removes the
    // per-iteration labeled-join — one join + one exchange fewer in
    // every GD round's plan. Value-identical: __y is constant per id,
    // and NULL/empty docs (no cnt rows) contributed nothing before.
    val cnt = labeled
      .select(col("__id"), col("__y"), explode(hashes).as("__h"))
      .withColumn("__b", (col("__h") % dim).cast("int"))
      .groupBy(col("__id"), col("__b"))
      .agg(count(lit(1)).as("__c"), max(col("__y")).as("__y"))
      .localCheckpoint(true)
    val den = if (etaDen > 0) etaDen else math.max(1L, 4L * labeled.count())
    val f = lit(TrainScale.toDouble)
    // (__id, __g) margins/residuals for one GD step, given per-doc
    // fixed-point margins __xfp — the quasi-logistic link quantized to
    // TrainScale BEFORE any cross-row sum (exact integer grads)
    def residuals(x: DataFrame): DataFrame = x
      .withColumn("__x", col("__xfp").cast("double") / f)
      .withColumn("__g",
        floor((col("__y").cast("double") -
          (lit(0.5) + col("__x") / (lit(2.0) * (lit(1.0) + abs(col("__x"))))))
          * f + lit(0.5)).cast("long"))
      .select(col("__id"), col("__g"))
    def step(w: IndexedSeq[Long], grad: Map[Int, Long]): IndexedSeq[Long] =
      IndexedSeq.tabulate(dim)(b => w(b) + etaNum * grad.getOrElse(b, 0L) / den)
    var w = IndexedSeq.fill(dim)(0L)
    var it = 0
    while (it < iters) {
      // the margin comes from the CHECKPOINTED feature-count table, not
      // a re-hash of the text (r15): Σ weights[h60(tok) mod dim] over
      // tokens ≡ Σ_b w(b)·cnt(b) exactly (integer sum, same h60 bucket
      // map — the gradient below already depends on that identity), so
      // each iteration pays a bounded aggregate over (id, bucket, cnt)
      // instead of a full md5 pass over the corpus text. A doc with
      // cnt rows always has a margin (the aggregate never yields NULL
      // over its own rows), matching the r15 left-join + coalesce(0).
      val wArr = typedlit(w)
      val x1 = cnt.groupBy(col("__id"))
        .agg(sum(element_at(wArr, col("__b") + 1) * col("__c")).as("__xfp"),
          max(col("__y")).as("__y"))
      val grad1 = cnt.join(residuals(x1), Seq("__id"))
        .groupBy(col("__b"))
        .agg(sum(col("__g") * col("__c")).as("__G"))
      if (it + 1 >= iters) {
        val g1 = grad1.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        w = step(w, g1)
        it += 1
      } else {
        // TWO GD steps per blocking job (r16, the r15-verdict item):
        // step 2's weights re-derive IN-PLAN from step 1's gradient —
        // w2(b) = w1(b) + (etaNum·G1(b)) div den, the SAME all-long
        // truncating division the driver update uses (Scala /, Spark
        // div, DuckDB // agree, negatives included — the r15 pin), so
        // the margins are bit-identical to running the steps
        // sequentially. One collect returns both dim-sized gradients;
        // the iteration-latency half of training (per-job planning +
        // AQE barriers) halves with the job count.
        val d1 = grad1.select(col("__b"),
          expr(s"($etaNum * __G) div $den").as("__d"))
        val x2 = cnt.join(broadcast(d1), Seq("__b"), "left")
          .groupBy(col("__id"))
          .agg(sum((element_at(wArr, col("__b") + 1) +
            coalesce(col("__d"), lit(0L))) * col("__c")).as("__xfp"),
            max(col("__y")).as("__y"))
        val grad2 = cnt.join(residuals(x2), Seq("__id"))
          .groupBy(col("__b"))
          .agg(sum(col("__g") * col("__c")).as("__G"))
        val rows = grad1.withColumn("__s", lit(1))
          .unionByName(grad2.withColumn("__s", lit(2)))
          .collect()
        val byStep = rows.groupBy(_.getInt(2))
        def asMap(s: Int): Map[Int, Long] = byStep.getOrElse(s, Array.empty)
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        w = step(step(w, asMap(1)), asMap(2))
        it += 2
      }
    }
    Model(TrainScale, bigrams = false, weights = w)
  }

  /** Held-out evaluation of a fitted [[Model]]: score `test` through
    * the SAME inference kernel training used, predict positive at
    * `margin ≥ threshold`, and aggregate the confusion matrix plus
    * accuracy / precision / recall (NULL on an empty denominator,
    * never a fake score; all-zero counts on an empty test set). One
    * narrow kernel pass + one 1-row aggregate.
    */
  def evaluate(test: DataFrame, textCol: String, labelCol: String,
      model: Model, threshold: Long = 0L): DataFrame = {
    val y = col(labelCol).cast("long")
    val pos = coalesce(bowScore(col(textCol), model.weights, model.bigrams),
      lit(0L)) >= threshold
    val z = lit(0L)
    test.agg(
        coalesce(sum(when(y === 1 && pos, 1L).otherwise(0L)), z).as("tp"),
        coalesce(sum(when(y === 0 && pos, 1L).otherwise(0L)), z).as("fp"),
        coalesce(sum(when(y === 1 && !pos, 1L).otherwise(0L)), z).as("fn"),
        coalesce(sum(when(y === 0 && !pos, 1L).otherwise(0L)), z).as("tn"))
      .withColumn("accuracy",
        when(col("tp") + col("fp") + col("fn") + col("tn") > 0,
          round((col("tp") + col("tn")).cast("double") /
            (col("tp") + col("fp") + col("fn") + col("tn")).cast("double"), 6)))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          round(col("tp").cast("double") /
            (col("tp") + col("fp")).cast("double"), 6)))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0,
          round(col("tp").cast("double") /
            (col("tp") + col("fn")).cast("double"), 6)))
  }

  /** The scoring column: exact integer `Σ weights[h60(token) mod dim]`
    * over the document's whitespace tokens (NULL text → NULL, empty →
    * 0); with `bigrams`, plus `Σ weights[h60(tok_i ' ' tok_i+1) mod
    * dim]` over the adjacent pairs — all inside one
    * [[graft.plans.HashedBowScore]] kernel pass.
    */
  def bowScore(text: Column, weights: Seq[Long],
      bigrams: Boolean = false): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.HashedBowScore(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          text.cast("string")), weights, bigrams))

  /** [[score]] with an imported [[Model]]. */
  def scoreWith(df: DataFrame, textCol: String, model: Model,
      minScore: Long = 0L): DataFrame =
    df.withColumn("bow_score",
        bowScore(col(textCol), model.weights, model.bigrams))
      .withColumn("quality_pass",
        coalesce(col("bow_score") >= minScore, lit(false)))

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
