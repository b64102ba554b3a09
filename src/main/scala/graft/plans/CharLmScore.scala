package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed character-trigram language-model log-probability of one
  * string: `string → long` where the score is
  * `Σ_windows w3[h60(c_i..c_i+2) mod d3] − w2[h60(c_i..c_i+1) mod d2]`
  * over the trigram window starts — with `w3[b] = log2fp(ct3[b]+1)`
  * and `w2[b] = log2fp(ct2[b]+d3)` this is the fixed-point
  * `Σ log2 p̂(c_i+2 | c_i c_i+1)` of an add-one-smoothed hashed
  * trigram model, the CCNet-style perplexity-gate inference pass
  * (`graft.operators.CharLm`). NULL → NULL; fewer than 3 code points
  * → 0.
  *
  * Why a custom Expression ([[HashedBowScore]]'s rationale, char
  * edition): the composed form explodes two hash arrays and joins a
  * weight table per window — row amplification on every-document
  * scans. Here both weight vectors ride the plan as `long[]` reference
  * objects, the code-point walk happens ONCE for both window sizes
  * (each trigram's prefix bigram shares its start offset), and the
  * whole pass stays inside whole-stage codegen: a pure narrow map.
  * Window hashes are bit-identical to [[CharNgramHashes]] (same
  * offsets, same digest fold), so fitting and scoring cannot drift.
  */
case class CharLmScore(child: Expression, w3: Seq[Long], w2: Seq[Long])
    extends UnaryExpression {

  require(w3.nonEmpty && w2.nonEmpty, "weight vectors must be non-empty")

  @transient private lazy val a3: Array[Long] = w3.toArray
  @transient private lazy val a2: Array[Long] = w2.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_char_lm requires string, got $t")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_char_lm"

  override protected def nullSafeEval(input: Any): Any =
    CharLmScore.compute(input.asInstanceOf[UTF8String], a3, a2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r3 = ctx.addReferenceObj("charLmW3", a3, "long[]")
    val r2 = ctx.addReferenceObj("charLmW2", a2, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.CharLmScore.compute($a, $r3, $r2);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharLmScore =
    copy(child = newChild)
}

object CharLmScore {

  private val localDigest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Exact integer score; shared by interpreted eval and codegen. */
  def compute(text: UTF8String, w3: Array[Long], w2: Array[Long]): Long = {
    val bytes = text.getBytes
    val offs = CharNgramHashes.codePointOffsets(bytes)
    val n = offs.length - 1
    if (n < 3) return 0L
    val d3 = w3.length
    val d2 = w2.length
    val md = localDigest.get()
    var score = 0L
    var s = 0
    while (s <= n - 3) {
      // h60 is non-negative, so % is a true mod
      val h3 = CharNgramHashes.h60Slice(md, bytes, offs(s), offs(s + 3))
      val h2 = CharNgramHashes.h60Slice(md, bytes, offs(s), offs(s + 2))
      score += w3((h3 % d3).toInt) - w2((h2 % d2).toInt)
      s += 1
    }
    score
  }
}
