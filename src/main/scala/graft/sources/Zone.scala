package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-zone primitives shared by the jobs and the audit store. */
object Zone {

  /** Read a table directory, or None if it doesn't exist yet.
    *
    * Existence is checked explicitly (Hadoop FS): a blanket
    * `catch { _ => empty }` around the read would also swallow corrupt
    * footers and transient IO errors — and the caller's subsequent
    * overwrite would silently wipe the accumulated table. Real read
    * errors must propagate.
    */
  def exists(spark: SparkSession, dir: String): Boolean = {
    val path = new Path(dir)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
  }

  def readIfExists(spark: SparkSession, dir: String): Option[DataFrame] =
    if (exists(spark, dir)) Some(spark.read.parquet(dir)) else None

  /** Overwrite `dir` with `df` when `df`'s plan reads from `dir`
    * itself (parquet can't overwrite its own input): materialize to a
    * temp sibling, rewrite the target from it, drop the temp.
    */
  def overwriteInPlace(spark: SparkSession, df: DataFrame, dir: String): Unit = {
    val tmp = dir + "__rewrite"
    df.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(dir)
    val tmpPath = new Path(tmp)
    tmpPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(tmpPath, true)
  }
}
