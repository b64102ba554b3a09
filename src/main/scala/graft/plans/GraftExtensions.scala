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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotqDescriptor)
  }
}

object GraftExtensions {
  val dotqDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dotq"),
    new ExpressionInfo(classOf[LongArrayDot].getName, "graft_dotq"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_dotq takes exactly 2 arguments")
      LongArrayDot(children.head, children(1))
    })

  /** Register on an already-built session (tests, Verify/Bench mains). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      dotqDescriptor._1, dotqDescriptor._2, dotqDescriptor._3)
}
