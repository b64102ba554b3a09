package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-k as a typed `Aggregator` — the scale alternative to
  * the `row_number` window: a window sorts and shuffles EVERY candidate
  * row of a group; this keeps a bounded best-k buffer per group, so the
  * partial (map-side) phase caps state at k rows per group per task and
  * the exchange carries at most that. For q26-style ANN scoring with
  * millions of candidates per query, the shuffle shrinks from
  * O(candidates) to O(k · tasks).
  *
  * Ordering contract matches the ranking queries: score descending,
  * id ascending on ties — deterministic for any data.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size < k) (buf :+ x).sortWith(better)
    else if (better(x, buf.last)) (buf.init :+ x).sortWith(better)
    else buf

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: ExpressionEncoder[Seq[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: ExpressionEncoder[Seq[(Double, Long)]] = ExpressionEncoder()
}

object TopKPerGroup {

  /** Top-k rows per group: returns (groupCols…, rank, scoreCol, idCol),
    * rank 1-based in (score desc, id asc) order — identical rows to the
    * `row_number() <= k` window form (asserted in TopKPerGroupSpec),
    * different physical shape.
    */
  def apply(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    val topk = udaf(new TopKAggregator(k), ExpressionEncoder[(Double, Long)]())
    df.groupBy(groupCols.map(col): _*)
      .agg(topk(col(scoreCol).cast("double"), col(idCol).cast("long")).as("__topk"))
      .select(groupCols.map(col) :+ posexplode(col("__topk")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("int").as("rank"),
        col("col._1").as(scoreCol),
        col("col._2").as(idCol)): _*)
  }
}
