package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of one document in one pass:
  * `string → array<string>` — the set the dedup family consumes
  * ([[graft.operators.Dedup.shingleRows]] documents the contract:
  * whitespace tokens of the trimmed text, n-grams joined by a single
  * space, documents shorter than n tokens collapse to one whole-text
  * shingle, empty/blank docs keep one "" shingle so no row vanishes).
  *
  * Why a custom Expression: the relational form exploded every token,
  * shuffled the corpus on the document id, and ran two window passes
  * (n-1 leads + a count) just to stitch adjacent tokens back together —
  * the one exchange in an otherwise narrow pipeline. This emits the
  * finished shingle set from a single tokenize pass, so shingling rides
  * the scan and the first exchange in q24/q22-style pipelines becomes
  * the join/aggregate itself. Output strings are byte-identical to the
  * relational form (differential-tested), so every downstream hash —
  * and every DuckDB oracle — is unchanged.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "n must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_word_shingles requires string, got $t")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.WordShingles.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String, n: Int): ArrayData = {
    val trimmed = text.trim().toString
    if (trimmed.isEmpty)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val toks = Ws.split(trimmed, -1)
    val out = new java.util.LinkedHashSet[String]
    if (toks.length < n) {
      out.add(toks.mkString(" "))
    } else {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }
}
