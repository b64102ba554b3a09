package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the single right row with the
  * greatest `rightTs <= leftTs` within the same key — the standard
  * temporal enrichment (quote-at-trade-time, dimension-as-of-event).
  * Spark has no native ASOF JOIN; the scalable form is the classic
  * union + ordered window:
  *
  *  1. tag and union both sides on (key, ts);
  *  2. one window per key ordered by (ts, side) carries the latest
  *     right payload forward (`last(_, ignoreNulls = true)` over
  *     unbounded preceding);
  *  3. keep the left rows.
  *
  * Cost: ONE shuffle on the key — versus the naive
  * `leftTs >= rightTs` inequality join, which Catalyst can only plan
  * as a nested-loop product plus a per-left-row top-1. Ties
  * (`rightTs == leftTs`) match (≤ semantics): the right side orders
  * before the left at equal timestamps. Left rows with no prior right
  * row keep NULL payloads (left-outer semantics, same as DuckDB's
  * `ASOF LEFT JOIN`). A NULL in a matched payload value is
  * indistinguishable from "no row" and carries the previous non-null
  * value — keep payloads non-null (or wrap them in a struct).
  */
object AsOfJoin {

  /** @param left      driving side, keeps every row
    * @param right     lookup side
    * @param keys      equi-key columns (same names both sides)
    * @param leftTs    left event-time column name
    * @param rightTs   right event-time column name
    * @param payload   right columns to attach (must not collide with
    *                  left column names)
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "payload columns required")
    require(payload.forall(p => !left.columns.contains(p)),
      "payload names must not collide with left columns")
    require(payload.forall(p => !keys.contains(p) && p != rightTs),
      "payload must be value columns, not keys or the right timestamp")

    val carryLeft = left.columns.toIndexedSeq.filterNot(c => keys.contains(c) || c == leftTs)

    // right rows sort BEFORE left rows at the same instant so <= ties match
    val taggedLeft = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side")) ++
        carryLeft.map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val taggedRight = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side")) ++
        carryLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(taggedLeft.unionByName(taggedRight)) { (df, p) =>
      df.withColumn(p, last(when(col("__side") === 0, col(p)), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select((keys.map(col) :+ col("__ts").as(leftTs)) ++
        carryLeft.map(col) ++ payload.map(col): _*)
  }
}
