package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style column profiling — the warehouse maintenance stat the
  * reference's audit/dashboard family reads off its tables (row counts,
  * null rates, cardinalities, value ranges), as ONE relational
  * operator: a single wide aggregate over one scan, unpivoted to a row
  * per column.
  *
  * Scale shape: the multiple `count_distinct`s plan as one scan with an
  * Expand (factor = #profiled columns) feeding a partial+final
  * aggregate — no per-column re-scan, no driver loop; min/max/counts
  * ride the same pass. Exact distinct counts are the profile's point at
  * audit time; for a quick 100 TB sweep where estimates suffice,
  * compose [[HllSketch.portable]] per column instead (the q62 family —
  * same one-scan shape, sketch-sized state).
  *
  * `min_value`/`max_value` surface as strings so heterogeneous column
  * types share one output schema — the classic profile shape. Order
  * rows by `col_name` for a deterministic frame.
  */
object Profile {

  /** One row per profiled column: `(col_name, n_rows, n_nulls,
    * n_distinct, min_value, max_value)`. `cols` empty ⇒ every column.
    * NULLs are excluded from `n_distinct`/`min`/`max` (SQL aggregate
    * semantics), counted in `n_nulls`.
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val cs = if (cols.nonEmpty) cols else df.columns.toSeq
    require(cs.nonEmpty, "nothing to profile")
    val aggs = cs.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      count_distinct(col(c)).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c")))
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = cs.map(c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"),
        col(s"__mx_$c").as("max_value")))
    row.select(explode(array(stacked: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }
}
