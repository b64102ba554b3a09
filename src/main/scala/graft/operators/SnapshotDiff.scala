package graft.operators

import graft.sources.Zone
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document-level diff between two corpus versions — the release-notes
  * operator of a versioned corpus ([[Zone.writeSnapshot]]'s pin-able
  * versions): which documents were ADDED, REMOVED, or CHANGED between
  * snapshot v1 and v2. A training pipeline consumes this three ways —
  * audit (what moved between the corpus a model trained on and
  * today's), incremental re-processing (only `added ∪ changed` need
  * re-annotation/re-embedding), and takedown verification (`removed`
  * must cover the delete list).
  *
  * One full-outer hash join on the key, change classed by fingerprint
  * inequality — at 100 TB both sides shuffle once on the key (or zero
  * times if the snapshots are bucketed on it), and the fingerprint
  * comparison rides the join row. Unchanged documents (the vast
  * majority between adjacent versions) drop before the result
  * materializes.
  */
object SnapshotDiff {

  /** `(key, change ∈ added|removed|changed)` between two frames that
    * each carry `keyCol` (unique) and `fpCol` (any equality-comparable
    * content digest — e.g. `TextFunctions.contentFingerprint`).
    */
  def byKey(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      fpCol: String): DataFrame = {
    // presence flags, NOT fp nullness: a document whose fingerprint is
    // NULL (e.g. null text) must still diff correctly — fp comparison
    // is null-safe (<=>)
    val o = oldDf.select(col(keyCol), col(fpCol).as("__fp_old"))
      .withColumn("__in_old", lit(true))
    val n = newDf.select(col(keyCol), col(fpCol).as("__fp_new"))
      .withColumn("__in_new", lit(true))
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("change",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(!(col("__fp_old") <=> col("__fp_new")), lit("changed")))
      .filter(col("change").isNotNull)
      .select(col(keyCol), col("change"))
  }

  /** [[byKey]] over two published snapshot versions of a zone root. */
  def ofSnapshots(spark: SparkSession, root: String, v1: Long, v2: Long,
      keyCol: String, fpCol: String): DataFrame =
    byKey(Zone.readSnapshot(spark, root, Some(v1)),
      Zone.readSnapshot(spark, root, Some(v2)), keyCol, fpCol)
}
