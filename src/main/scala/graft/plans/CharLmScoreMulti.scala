package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** N char-trigram language models scored in ONE code-point walk:
  * `string → array<long>` where element `k` is [[CharLmScore]]'s score
  * under model `k`. The per-window md5 digests (the expensive part —
  * two h60 digests per trigram start) are computed ONCE and reused for
  * every model's table lookup, so scoring a corpus against N language
  * models costs one walk + N·windows array reads instead of N full
  * walks — the language-ID shape (CCNet fits one LM per language and
  * argmaxes), where N single-model kernel calls would re-digest the
  * text N times. All models must share the hash dimensions (enforced),
  * so the bucket indices are computed once too. NULL → NULL; fewer
  * than 3 code points → all zeros.
  */
case class CharLmScoreMulti(child: Expression,
    w3s: Seq[Seq[Long]], w2s: Seq[Seq[Long]])
    extends UnaryExpression {

  require(w3s.nonEmpty && w3s.length == w2s.length,
    "need one (w3, w2) pair per model")
  require(w3s.forall(_.length == w3s.head.length) &&
    w2s.forall(_.length == w2s.head.length),
    "all models must share hash dimensions")

  @transient private lazy val a3: Array[Array[Long]] =
    w3s.map(_.toArray).toArray
  @transient private lazy val a2: Array[Array[Long]] =
    w2s.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_char_lm_multi requires string, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_char_lm_multi"

  override protected def nullSafeEval(input: Any): Any =
    CharLmScoreMulti.compute(input.asInstanceOf[UTF8String], a3, a2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r3 = ctx.addReferenceObj("charLmW3s", a3, "long[][]")
    val r2 = ctx.addReferenceObj("charLmW2s", a2, "long[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.CharLmScoreMulti.compute($a, $r3, $r2);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharLmScoreMulti =
    copy(child = newChild)
}

object CharLmScoreMulti {

  private val localDigest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** One walk, N accumulators; window hashing identical to
    * [[CharLmScore.compute]] (differential-tested), so
    * `compute(t, ws)(k) == CharLmScore.compute(t, w3s(k), w2s(k))`.
    */
  def compute(text: UTF8String,
      w3s: Array[Array[Long]], w2s: Array[Array[Long]]): GenericArrayData = {
    val nModels = w3s.length
    val scores = new Array[Long](nModels)
    val bytes = text.getBytes
    val offs = CharNgramHashes.codePointOffsets(bytes)
    val n = offs.length - 1
    if (n >= 3) {
      val d3 = w3s(0).length
      val d2 = w2s(0).length
      val md = localDigest.get()
      var s = 0
      while (s <= n - 3) {
        val b3 = (CharNgramHashes.h60Slice(md, bytes, offs(s), offs(s + 3)) % d3).toInt
        val b2 = (CharNgramHashes.h60Slice(md, bytes, offs(s), offs(s + 2)) % d2).toInt
        var k = 0
        while (k < nModels) {
          scores(k) += w3s(k)(b3) - w2s(k)(b2)
          k += 1
        }
        s += 1
      }
    }
    new GenericArrayData(scores)
  }
}
