package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi-best unigram-LM segmentation of one word — the per-type DP
  * kernel of [[graft.operators.UnigramLm]] (SentencePiece's unigram
  * model, Kudo 2018, in the repo's deterministic hard-EM form). The
  * vocabulary `(piece, cost_fp)` is embedded in the plan like
  * [[BpeApplyMerges]]' merge list (bounded model artifact), so one
  * expression node segments the whole word-TYPE table per round —
  * O(len · maxPieceLen) per word, independent of corpus size.
  *
  * Semantics the DuckDB oracle states as an unrolled position-DP CTE
  * chain (q169/q170) and must match bit-for-bit:
  *
  *  - `cost(0) = 0, path(0) = ""`; for each end position j,
  *    `cost(j) = min over piece lengths l` of `cost(j−l) +
  *    cost_fp(word[j−l..j])` over pieces present in the vocabulary;
  *  - ties break on the PATH STRING ascending (`" p1 p2 …"`, pieces
  *    space-joined). Paths to the same position are never
  *    prefix-related (both spell the same j letters), so the
  *    lexicographic-min full path extends the lexicographic-min
  *    prefix — the greedy per-node tie-break is globally correct and
  *    identical to the oracle's `row_number() OVER (ORDER BY cost,
  *    path)`;
  *  - a word longer than `maxWordLen`, or with any position no vocab
  *    piece covers (e.g. a non-[a-z] character against an [a-z]-only
  *    vocabulary), FALLS BACK to one unsplit piece — in the oracle the
  *    DP simply never reaches `j = length(word)` and the left join
  *    coalesces to the same unsplit form.
  *
  * Output is the canonical segmentation form `" p1 p2 … "` (leading +
  * trailing space, the [[graft.operators.BpeVocab]] convention), so
  * downstream piece explodes split identically. NULL propagates.
  */
case class UnigramViterbi(child: Expression, vocab: Seq[(String, Long)],
    maxWordLen: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_unigram_viterbi requires string, got $t")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unigram_viterbi"

  @transient private lazy val model = new UnigramViterbi.Model(vocab, maxWordLen)

  override protected def nullSafeEval(input: Any): Any =
    UnigramViterbi.compute(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramViterbi.Model].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.UnigramViterbi.compute($a, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramViterbi =
    copy(child = newChild)
}

object UnigramViterbi {

  /** Vocabulary lookup, built once per (de)serialized instance. */
  final class Model(vocab: Seq[(String, Long)], val maxWordLen: Int)
      extends Serializable {
    val pieces: Array[String] = vocab.map(_._1).toArray
    val costsArr: Array[Long] = vocab.map(_._2).toArray
    val maxPieceLen: Int =
      if (pieces.isEmpty) 1 else pieces.iterator.map(_.length).max
    @transient lazy val costOf: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
      var i = 0
      while (i < pieces.length) {
        // first occurrence wins; the operator never emits duplicates
        m.putIfAbsent(pieces(i), java.lang.Long.valueOf(costsArr(i)))
        i += 1
      }
      m
    }
  }

  private def fallback(w: String): UTF8String =
    UTF8String.fromString(" " + w + " ")

  def compute(word: UTF8String, model: Model): UTF8String = {
    val w = word.toString
    val n = w.length
    if (n == 0 || n > model.maxWordLen) return fallback(w)
    val INF = Long.MaxValue / 4
    val cost = Array.fill(n + 1)(INF)
    val path = new Array[String](n + 1)
    cost(0) = 0L
    path(0) = ""
    var j = 1
    while (j <= n) {
      val lmax = math.min(model.maxPieceLen, j)
      var l = 1
      while (l <= lmax) {
        if (cost(j - l) < INF) {
          val c = model.costOf.get(w.substring(j - l, j))
          if (c != null) {
            val cand = cost(j - l) + c.longValue()
            if (cand <= cost(j)) {
              val p = path(j - l) + " " + w.substring(j - l, j)
              if (cand < cost(j) || p.compareTo(path(j)) < 0) {
                cost(j) = cand
                path(j) = p
              }
            }
          }
        }
        l += 1
      }
      j += 1
    }
    if (cost(n) >= INF) fallback(w)
    else UTF8String.fromString(path(n) + " ")
  }
}
