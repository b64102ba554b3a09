package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's native expressions with the
  * SQL function registry, so `spark.sql("SELECT graft_dotq(a, b)")`
  * works alongside the Column API. Install with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  private type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def binary(name: String, clazz: Class[_],
      make: (Expression, Expression) => Expression): Descriptor = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (children: Seq[Expression]) => {
      require(children.length == 2, s"$name takes exactly 2 arguments")
      make(children.head, children(1))
    })

  val descriptors: Seq[Descriptor] = Seq(
    binary("graft_dotq", classOf[LongArrayDot], LongArrayDot.apply),
    binary("graft_dotd", classOf[DoubleArrayDot], DoubleArrayDot.apply),
    binary("graft_eq_count", classOf[LongArrayEqCount], LongArrayEqCount.apply),
    (FunctionIdentifier("graft_h60"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, "graft_h60"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_h60 takes exactly 1 argument")
        Md5Prefix60(children.head)
      }),
    (FunctionIdentifier("graft_quantize"),
      new ExpressionInfo(classOf[QuantizeVec].getName, "graft_quantize"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_quantize takes exactly 1 argument")
        QuantizeVec(children.head)
      }),
    (FunctionIdentifier("graft_cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "graft_cdc_chunks"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "graft_cdc_chunks takes (text, w, avgSize)")
        def intLit(e: Expression, name: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(s"$name must be an int literal")
        }
        CdcChunks(children.head, intLit(children(1), "w"), intLit(children(2), "avgSize"))
      }),
    (FunctionIdentifier("graft_shingle_h60"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_h60"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_shingle_h60 takes (text, k)")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException("k must be an int literal")
        }
        ShingleHashes(children.head, k)
      }),
    (FunctionIdentifier("graft_image_header"),
      new ExpressionInfo(classOf[ImageHeader].getName, "graft_image_header"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_image_header takes exactly 1 argument")
        ImageHeader(children.head)
      }),
    (FunctionIdentifier("graft_av_header"),
      new ExpressionInfo(classOf[AvHeader].getName, "graft_av_header"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_av_header takes exactly 1 argument")
        AvHeader(children.head)
      }),
    (FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_nfc takes exactly 1 argument")
        NfcNormalize(children.head)
      }),
    (FunctionIdentifier("graft_char_ngrams"),
      new ExpressionInfo(classOf[CharNgramHashes].getName, "graft_char_ngrams"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_char_ngrams takes (text, k)")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException("k must be an int literal")
        }
        CharNgramHashes(children.head, k)
      }),
    (FunctionIdentifier("graft_strip_html"),
      new ExpressionInfo(classOf[HtmlStrip].getName, "graft_strip_html"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_strip_html takes exactly 1 argument")
        HtmlStrip(children.head)
      }),
    (FunctionIdentifier("graft_log2fp"),
      new ExpressionInfo(classOf[Log2Fp].getName, "graft_log2fp"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_log2fp takes exactly 1 argument")
        Log2Fp(children.head)
      }))

  /** Register on an already-built session (tests, Verify/Bench mains). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach(d =>
      spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3))
}
