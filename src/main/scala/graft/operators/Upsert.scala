package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-selective upsert — the reference's `INSERT … ON DUPLICATE KEY
  * UPDATE job_title, salary, posted_time, date_id` keyed on
  * `UNIQUE(job_id)` (SURVEY.md §2.7 U3;
  * `staging/staging_transformer_v2.py:134-151`): on key conflict only
  * `refreshCols` take the incoming value, every other column keeps the
  * existing row's value. New keys insert whole.
  *
  * Physical shape: one shuffle per side on the key (full outer hash
  * join). `incoming` is first collapsed to its latest row per key so a
  * batch containing the same key twice behaves like MySQL's sequential
  * upsert (last writer wins).
  */
object Upsert {
  def apply(
      existing: DataFrame,
      incoming: DataFrame,
      key: String,
      refreshCols: Seq[String],
      incomingOrder: Seq[Column]): DataFrame = {

    // side-presence markers, NOT key-null checks: the key itself can be
    // NULL (matched null-safely by <=>), so `e.key.isNull` would
    // misclassify a present-but-null-keyed row as "missing" and
    // `i.key.isNotNull` would skip refreshing it
    val latest = LatestPerKey(incoming, Seq(key), incomingOrder)
      .withColumn("__i_present", lit(true))
    val e = existing.withColumn("__e_present", lit(true)).as("e")
    val i = latest.as("i")
    val joined = e.join(i, col(s"e.$key") <=> col(s"i.$key"), "full_outer")
    val isNew      = col("e.__e_present").isNull
    val hasUpdate  = col("i.__i_present").isNotNull

    val outCols = existing.columns.map { c =>
      if (c == key)
        when(isNew, col(s"i.$key")).otherwise(col(s"e.$key")).as(key)
      else if (refreshCols.contains(c))
        when(hasUpdate, col(s"i.$c")).otherwise(col(s"e.$c")).as(c)
      else
        when(isNew, col(s"i.$c")).otherwise(col(s"e.$c")).as(c)
    }
    joined.select(outCols.toIndexedSeq: _*)
  }
}
