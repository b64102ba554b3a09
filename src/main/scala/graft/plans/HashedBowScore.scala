package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed bag-of-words linear score of one document against an
  * embedded weight vector: `string → long` where the score is
  * `Σ weights[h60(lower(token)) mod dim]` over the whitespace tokens —
  * the fastText-style classifier inference pass
  * ([[graft.operators.QualityModel]]). Weights are fixed-point longs
  * (the model's export contract), so the score is exact integer
  * arithmetic and the DuckDB oracle reproduces it bit-for-bit; NULL
  * text → NULL, a token-less document scores 0.
  *
  * Per-token hashing delegates to [[ShingleHashes.compute]] with k=1
  * (a 1-token window hash IS the token's h60 — tokenize + lowercase +
  * md5 in one fused pass, bit-identical to the span family's kernels
  * and to `md5(lower(tok))` in SQL), so the tokenization contract
  * cannot drift between the classifier and the dedup operators.
  *
  * Why a custom Expression (the [[IvfAssign]]/[[LshBuckets]]
  * rationale): the composed form — `aggregate(transform(...))` over an
  * exploded token array with an `element_at` against a dim-long array
  * literal — runs the per-token lambda interpreted (~10 µs/row at
  * dim-scale forests, the q90 pathology), and at 100 TB the scoring
  * pass sits on every document. This is one tight loop over a `long[]`
  * reference object inside whole-stage codegen: scoring stays a pure
  * narrow map — no join, no explode, no row amplification.
  */
case class HashedBowScore(child: Expression, weights: Seq[Long],
    bigrams: Boolean = false)
    extends UnaryExpression {

  require(weights.nonEmpty, "weights must be non-empty (dim >= 1)")

  private val dim = weights.length

  @transient private lazy val w: Array[Long] = weights.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_bow_score requires string, got $t")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bow_score"

  override protected def nullSafeEval(input: Any): Any =
    HashedBowScore.compute(input.asInstanceOf[UTF8String], w, bigrams)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("bowWeights", w, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.HashedBowScore.compute($a, $wRef, $bigrams);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedBowScore =
    copy(child = newChild)
}

object HashedBowScore {

  /** Exact integer score; shared by interpreted eval and codegen.
    * `bigrams = true` adds fastText's actual feature set — word
    * bigrams — as one more fused pass: the k=2 window hash of the
    * span family ([[ShingleHashes]]) IS the bigram feature hash
    * (`h60(lower(tok_i) + ' ' + lower(tok_i+1))`), so the classifier
    * and the dedup operators share one tokenization + hash contract
    * and the SQL oracle reproduces bigram features with the same
    * `md5(lower(...))` expression it already uses for spans.
    */
  def compute(text: UTF8String, w: Array[Long], bigrams: Boolean = false): Long = {
    val dim = w.length
    // tokenize+lowercase ONCE; each k pass hashes over the shared
    // token-byte arrays (the bigram pass previously re-ran the whole
    // string pipeline, doubling per-row work on the corpus-scan path)
    val tb = ShingleHashes.tokenBytes(text)
    var score = sumPass(ShingleHashes.hashWindows(tb, 1), w, dim)
    if (bigrams) score += sumPass(ShingleHashes.hashWindows(tb, 2), w, dim)
    score
  }

  private def sumPass(hashes: Array[Long], w: Array[Long], dim: Int): Long = {
    var score = 0L
    var i = 0
    while (i < hashes.length) {
      // h60 is non-negative, so % is a true mod
      score += w((hashes(i) % dim).toInt)
      i += 1
    }
    score
  }
}
