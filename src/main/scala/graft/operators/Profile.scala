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
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame =
    stats(df, resolve(df, cols), exact = true).orderBy(col("col_name"))

  /** [[profile]]'s ESTIMATE twin for the sweep where exact
    * `count_distinct`'s per-group hash state is the memory problem
    * (billions of distincts per column at 100 TB): cardinalities come
    * from the portable HLL ([[HllSketch]] — the q62 family, so the
    * estimates are engine-reproducible to the bit), everything else
    * from the same wide one-scan aggregate as [[profile]]. Two light
    * passes total: the counts/ranges aggregate, and a long-form
    * explode (factor = #columns) into register aggregation whose state
    * is `#cols · 2^p` rows. Estimates count distinct STRING renderings
    * of values — injective for the scalar types a profile covers, and
    * exactly what the auditable-hash family hashes anyway. An all-NULL
    * column has no registers and estimates 0.
    */
  def approxProfile(df: DataFrame, cols: Seq[String] = Nil,
      p: Int = 8): DataFrame = {
    val cs = resolve(df, cols)
    val long = df.select(explode(array(cs.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("__v"))): _*))
        .as("x"))
      .select(col("x.col_name").as("col_name"), col("x.__v").as("__v"))
    val est = HllSketch.estimate(
        HllSketch.registers(long, Seq("col_name"), "__v", p),
        Seq("col_name"), p)
      .select(col("col_name"), col("estimate").as("n_distinct_est"))
    stats(df, cs, exact = false)
      .join(est, Seq("col_name"), "left")
      .withColumn("n_distinct_est",
        coalesce(col("n_distinct_est"), lit(0L)))
      .orderBy(col("col_name"))
  }

  private def resolve(df: DataFrame, cols: Seq[String]): Seq[String] = {
    val cs = if (cols.nonEmpty) cols else df.columns.toSeq
    require(cs.nonEmpty, "nothing to profile")
    cs
  }

  /** The shared wide-aggregate spine: one scan computing counts and
    * ranges for every column (+ exact distincts when `exact`),
    * unpivoted to a row per column.
    */
  private def stats(df: DataFrame, cs: Seq[String], exact: Boolean): DataFrame = {
    val aggs = cs.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c")) ++
      (if (exact) Seq(count_distinct(col(c)).as(s"__nd_$c")) else Nil))
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = cs.map { c =>
      val base = Seq(lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"))
      val dist = if (exact) Seq(col(s"__nd_$c").as("n_distinct")) else Nil
      struct(base ++ dist ++ Seq(
        col(s"__mn_$c").as("min_value"),
        col(s"__mx_$c").as("max_value")): _*)
    }
    row.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
  }
}
