package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group Top-1 — the reference's recurring `ORDER BY log_id DESC
  * LIMIT 1` scoped to a key (SURVEY.md §2.5;
  * `run_topcv_scraper_with_retry.sh:186-190`,
  * `load_to_wh_with_retry.sh:92-96`), generalized to all keys at once.
  *
  * One shuffle on the key; the sort is per-partition-per-key and Spark
  * plans it as a WindowExec after a hash exchange — at scale this is the
  * standard "latest snapshot" pattern and AQE handles skewed keys.
  */
object LatestPerKey {
  def apply(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
