package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Distribution-drift monitor between two snapshots of a table — the
  * population stability index (PSI), the standard score for "did this
  * feed change shape since the reference batch?" (banking/model-risk
  * lineage; same quantity as the symmetrized discrete KL divergence).
  *
  * `PSI = Σ_cat (p_cat − q_cat) · log(p_cat / q_cat)` with `p` the
  * reference share and `q` the current share. Rule-of-thumb bands
  * (in natural-log units; ours are log2 — multiply the thresholds by
  * 1/ln 2 ≈ 1.44): < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.
  *
  * Determinism (the repo's sketch rule): shares are never floated.
  * With add-one smoothing (`cnt' = cnt + 1`, `total' = total + C`
  * over the C categories of the UNION — keeps every log finite and
  * is the standard PSI treatment of empty buckets),
  *
  *   p − q = (cr·tc − cc·tr) / (tr·tc)
  *   log2(p/q) = log2(cr·tc) − log2(cc·tr)
  *
  * so each category contributes the exact integer
  * `(cr·tc − cc·tr) · (log2fp(cr·tc) − log2fp(cc·tr))` (the
  * [[graft.plans.Log2Fp]] 2¹⁰-fixed-point kernel, bit-identical to
  * the DuckDB oracle's recursive CTE), summed exactly and divided by
  * `tr·tc·2¹⁰` only at the very end. Both factors of a term always
  * share a sign, so terms are non-negative — PSI ≥ 0 exactly.
  *
  * Magnitudes: the LOG arguments `cr·tc`, `cc·tr` are ≤ ~N·(N+C) and
  * stay inside signed-64 up to N ≈ 3·10⁹ rows per snapshot (a
  * runtime `require` guards the bound loudly instead of letting ANSI
  * mode throw mid-plan). The TERM, however, is (count-difference ~N²)
  * × (log-difference ~2¹⁰·log₂N² ≈ 1.3·10⁵) ≈ 10²¹ under strong
  * drift — past Long.MaxValue long before the log arguments are —
  * so the term product and its Σ are computed in `decimal(38,0)`
  * (the oracle mirrors with HUGEINT): exact, never wrapping, and the
  * drift report cannot itself blow up at exactly the large-drift
  * moment it exists to catch.
  *
  * Execution shape: one aggregate per snapshot (map-side combined,
  * category-sized output), a full-outer category join (category-sized),
  * and a category-sized summary aggregate. The corpus is scanned once
  * per snapshot regardless of how many monitored columns ride the same
  * [[report]] call.
  */
object Drift {

  private def log2fp(c: Column): Column =
    ColumnBridge.column(graft.plans.Log2Fp(ColumnBridge.expression(c)))

  /** Category counts for one column — the sufficient statistic of one
    * drift side: `(category, <out>)`. This is what [[writeReference]]
    * persists; everything downstream is category-sized.
    */
  private def counts(df: DataFrame, column: String, out: String): DataFrame =
    df.select(coalesce(col(column).cast("string"), lit("__null__"))
        .as("category"))
      .groupBy(col("category")).agg(count(lit(1)).as(out))

  /** Per-category drift detail for one categorical column:
    * `(category, n_ref, n_cur, psi_term_fp)` — the exact integer PSI
    * numerator per category (units: 2⁻¹⁰ log2, times tr·tc), plus the
    * raw counts. NULL categories count as the literal category
    * `"__null__"` so absence drifts visibly.
    */
  def categorical(ref: DataFrame, cur: DataFrame, column: String): DataFrame =
    categoricalFromCounts(
      counts(ref, column, "n_ref"), counts(cur, column, "n_cur"))

  /** [[categorical]] over pre-aggregated sides — the incremental form:
    * the reference side is the PERSISTED counts table
    * ([[writeReference]]), so a daily monitoring run aggregates only
    * the current snapshot and joins two category-sized tables. By
    * construction `fromCounts(persisted ref, cur) == categorical(ref,
    * cur)` — DriftSpec pins it.
    */
  def categoricalFromCounts(refCounts: DataFrame,
      curCounts: DataFrame): DataFrame = {
    val joined = refCounts.select(col("category"), col("n_ref"))
      .join(curCounts.select(col("category"), col("n_cur")),
        Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(
      sum(col("n_ref")).as("__tr0"), sum(col("n_cur")).as("__tc0"),
      count(lit(1)).as("__cats"))
    joined.crossJoin(broadcast(totals))
      // add-one smoothing: cnt+1 over total+C
      .withColumn("__cr", col("n_ref") + 1L)
      .withColumn("__cc", col("n_cur") + 1L)
      .withColumn("__tr", col("__tr0") + col("__cats"))
      .withColumn("__tc", col("__tc0") + col("__cats"))
      // long→3e9-row guard for the log arguments; the term itself is
      // decimal (see scaladoc — ~10²¹ under strong drift). The guard
      // filter sits STRUCTURALLY BELOW the product projection (filter
      // first, products in a later withColumn) so under ANSI mode the
      // promised "shard the snapshot" message is the only failure path
      // — were guard and products one projection, the long products
      // could ARITHMETIC_OVERFLOW-throw before the diagnostic fires
      .filter(assert_true(
        col("__tr") <= lit(3000000000L) && col("__tc") <= lit(3000000000L),
        lit("Drift: snapshot exceeds ~3e9 rows — log2fp argument would " +
          "overflow signed-64; shard the snapshot or pre-bucket"))
        .isNull) // assert_true returns NULL; keeps the guard live
      .withColumn("psi_term_fp",
        ((col("__cr") * col("__tc")).cast("decimal(20,0)") -
          (col("__cc") * col("__tr")).cast("decimal(20,0)")) *
          (log2fp(col("__cr") * col("__tc")) -
            log2fp(col("__cc") * col("__tr"))).cast("decimal(7,0)"))
      .select(col("category"), col("n_ref"), col("n_cur"),
        col("psi_term_fp").cast("decimal(38,0)").as("psi_term_fp"))
  }

  /** EMBEDDING-SPACE drift (round 14): did the new crawl move in
    * semantic space — the question categorical/binned columns cannot
    * see (two text distributions can share every metadata histogram
    * and still be about different things). The lens is the IVF cell:
    * both snapshots assign to the REFERENCE snapshot's centroids
    * ([[IvfIndex.centroids]] — the h60-deterministic pick, so the
    * oracle re-derives the codebook; holding the codebook FIXED is
    * what makes the comparison apples-to-apples, the
    * [[graft.operators.Dedup]] frozen-codebook discipline), and the
    * cell-mass distributions run through the exact PSI machinery
    * ([[categoricalFromCounts]] — same smoothing, same Q10 log2, same
    * decimal terms as every drift column). `nCells` is the binning
    * resolution dial; the category table is ≤ nCells rows, so the
    * monitoring cost after the two assignment scans is nil.
    */
  def embedding(ref: DataFrame, cur: DataFrame, idCol: String,
      vecCol: String, nCells: Int = 16): DataFrame = {
    require(nCells >= 2, s"nCells must be >= 2, got $nCells")
    val cents = graft.operators.IvfIndex.centroids(ref, idCol, vecCol, nCells)
    categoricalFromCounts(
      cellCounts(ref, idCol, vecCol, cents, "n_ref"),
      cellCounts(cur, idCol, vecCol, cents, "n_cur"))
  }

  /** One snapshot's IVF-cell mass distribution — the sufficient
    * statistic of one embedding-drift side (the [[counts]] analogue
    * with cells as categories): `(category, <out>)`, ≤ |codebook| rows.
    */
  private def cellCounts(df: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, out: String): DataFrame =
    graft.operators.IvfIndex.assign(df, idCol, vecCol, cents)
      .select(col("centroid_id").cast("string").as("category"))
      .groupBy(col("category")).agg(count(lit(1)).as(out))

  /** Persist the embedding-drift REFERENCE — frozen codebook +
    * reference cell masses — so daily monitoring never re-reads the
    * reference snapshot (r14 verdict task 3: [[embedding]] re-derived
    * the codebook AND re-assigned/counted the reference EVERY call;
    * the [[writeReference]] incremental-state pattern applied to the
    * embedding lens). One assignment scan of the reference, total.
    * Layout: `dir/centroids` (the h60-deterministic codebook —
    * freezing it is what keeps every later comparison
    * apples-to-apples, the [[graft.operators.Dedup]] frozen-codebook
    * discipline) and `dir/refcounts` `(category, n_ref)`.
    */
  def writeEmbeddingReference(ref: DataFrame, idCol: String, vecCol: String,
      dir: String, nCells: Int = 16): Unit = {
    require(nCells >= 2, s"nCells must be >= 2, got $nCells")
    val cents = graft.operators.IvfIndex.centroids(ref, idCol, vecCol, nCells)
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
    cellCounts(ref, idCol, vecCol,
        ref.sparkSession.read.parquet(s"$dir/centroids"), "n_ref")
      .write.mode("overwrite").parquet(s"$dir/refcounts")
  }

  /** [[embedding]] against a persisted [[writeEmbeddingReference]] —
    * value-identical to `embedding(ref, cur, …)` by construction
    * (q211 shares q208's oracle; DriftSpec pins it structurally), at
    * increment cost: one assignment scan of the CURRENT snapshot plus
    * cell-sized joins. The reference data is never re-read.
    */
  def embeddingAgainstReference(spark: org.apache.spark.sql.SparkSession,
      dir: String, cur: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val cents = spark.read.parquet(s"$dir/centroids")
    val refCounts = spark.read.parquet(s"$dir/refcounts")
    categoricalFromCounts(refCounts,
      cellCounts(cur, idCol, vecCol, cents, "n_cur"))
  }

  /** Fixed-width binning for numeric columns — the deterministic
    * histogram lens that turns a continuous column into categories
    * [[categorical]] can monitor: bin = `floor(value / width)` as a
    * string label (`"[lo,hi)"`), NULL → `"__null__"`. Fixed widths
    * (not quantiles) so the reference and current snapshots bin
    * IDENTICALLY no matter how either is distributed.
    */
  def binned(column: String, width: Double): Column = {
    val b = floor(col(column).cast("double") / width).cast("long")
    when(col(column).isNull, lit("__null__"))
      .otherwise(concat(lit("["), (b * width).cast("decimal(20,2)").cast("string"),
        lit(","), ((b + 1) * width).cast("decimal(20,2)").cast("string"), lit(")")))
  }

  /** Drift summary across monitored columns: one row per column —
    * `(column, n_categories, n_new, n_vanished, psi_fp, psi_bits)`
    * where `n_new`/`n_vanished` count categories present in only one
    * snapshot (the schema-drift early warning), `psi_fp` is the exact
    * integer Σ numerator and `psi_bits` the final double division
    * (rounded 6dp — the only float in the pipeline). Pass derived
    * columns (e.g. [[binned]]) by pre-selecting them with an alias.
    */
  def report(ref: DataFrame, cur: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "need at least one monitored column")
    columns.map(c => summarize(c, categorical(ref, cur, c)))
      .reduce(_ unionByName _).orderBy(col("column"))
  }

  private def summarize(c: String, detail: DataFrame): DataFrame =
    detail.agg(
        sum(col("n_ref")).as("__tr0"), sum(col("n_cur")).as("__tc0"),
        count(lit(1)).as("n_categories"),
        sum(when(col("n_ref") === 0L, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("n_cur") === 0L, 1L).otherwise(0L)).as("n_vanished"),
        sum(col("psi_term_fp")).cast("decimal(38,0)").as("psi_fp"))
      .select(lit(c).as("column"),
        col("n_categories"), col("n_new"), col("n_vanished"), col("psi_fp"),
        // factors to double BEFORE multiplying: (tr·tc) as long would sit
        // at the signed-64 edge exactly when both snapshots hit the 3e9
        // guard; the quotient is presentation-only (6dp) anyway
        round(col("psi_fp").cast("double") /
            ((col("__tr0") + col("n_categories")).cast("double") *
              (col("__tc0") + col("n_categories")).cast("double")) / 1024.0,
          6).as("psi_bits"))

  /** Persist the reference side's sufficient statistic — one
    * category-counts table `(column, category, n_ref)` for all
    * monitored columns, ONE scan of the reference snapshot total.
    * After this, the reference data never needs re-reading: daily
    * monitoring is [[reportAgainstReference]], whose cost is one scan
    * of the CURRENT snapshot plus category-sized joins — the
    * incremental-state discipline every index family here follows.
    */
  def writeReference(ref: DataFrame, columns: Seq[String], dir: String): Unit = {
    require(columns.nonEmpty, "need at least one monitored column")
    columns.map(c => counts(ref, c, "n_ref")
        .select(lit(c).as("column"), col("category"), col("n_ref")))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(dir)
  }

  /** [[report]] against a persisted [[writeReference]] table —
    * value-identical to `report(ref, cur, columns)` by construction
    * (DriftSpec pins it), at increment cost: the reference snapshot is
    * never re-scanned.
    */
  def reportAgainstReference(refCounts: DataFrame, cur: DataFrame,
      columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "need at least one monitored column")
    columns.map { c =>
      summarize(c, categoricalFromCounts(
        refCounts.filter(col("column") === c).drop("column"),
        counts(cur, c, "n_cur")))
    }.reduce(_ unionByName _).orderBy(col("column"))
  }
}
