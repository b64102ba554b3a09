package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization: `string → string` via the JVM's built-in
  * `java.text.Normalizer` (Unicode canonical decomposition followed by
  * canonical composition — no external library). The ingest-side
  * normalization a text pipeline runs BEFORE fingerprinting and
  * shingling: the same visible text can arrive as precomposed `é`
  * (U+00E9) or as `e` + combining acute (U+0065 U+0301), and without
  * canonicalization those hash as different documents, splitting dedup
  * groups and double-counting near-identical content. NULL → NULL;
  * already-normalized text (the common case — `Normalizer.isNormalized`
  * is a cheap scan) returns the input UTF8String unchanged, no copy.
  *
  * Both this (JVM) and DuckDB's `nfc_normalize` implement the Unicode
  * standard's NFC, so the q109 oracle hash-matches the normalized
  * strings themselves. Spark has no built-in normalization function;
  * the UDF alternative would break codegen on the ingest scan
  * (the [[TextStats]] rationale).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_nfc requires string, got $t")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.NfcNormalize.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
