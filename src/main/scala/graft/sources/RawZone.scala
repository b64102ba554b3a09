package graft.sources

import graft.model.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The file raw zone: Hive-partitioned CSV, layout
  * `raw/source_id=<src>/extracted_date=<yyyy-MM-dd>/part-*.csv` — the
  * Spark-native form of the reference's
  * `raw/source=<src>/date=<d>/<src>_<HHMMSS>.csv` (S3/S4/S5,
  * `extract/topcv_scraper_v5.py:198-201`, `staging/staging_loader.py:55-57`).
  *
  * Partition pruning replaces the reference's glob: a read filtered on
  * `(source_id, extracted_date)` lists exactly one directory — the same
  * I/O the glob did, but composable with Catalyst (check
  * `PartitionFilters` in `.explain`). The reference's header-skip
  * concat "merge" step (S6, `run_all_scrapers.sh:99-133`) vanishes:
  * a multi-file read is already a union.
  */
object RawZone {

  /** Write one extract batch into its partition. Dynamic partition
    * overwrite keeps re-runs idempotent per (source, date) without
    * truncating sibling partitions (§2.9 exactly-once-ish).
    */
  def write(df: DataFrame, rawDir: String): Unit =
    df.write
      .partitionBy("source_id", "extracted_date")
      .option("header", "true")
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .csv(rawDir)

  /** Read the raw zone with the pinned schema. `source_id` /
    * `extracted_date` come back as partition columns; filters on them
    * prune directories.
    */
  def read(spark: SparkSession, rawDir: String): DataFrame = {
    // partition cols are directory-encoded, not in the files
    val fileSchema = org.apache.spark.sql.types.StructType(
      Schemas.rawScrape.filterNot(f =>
        f.name == "source_id" || f.name == "extracted_date"))
    spark.read
      .schema(fileSchema)
      .option("header", "true")
      .option("basePath", rawDir)
      .csv(rawDir)
      .withColumn("source_id", col("source_id").cast("string"))
      .withColumn("extracted_date", col("extracted_date").cast("string"))
  }

  /** One partition, by predicate — pruning does the directory math. */
  def readPartition(spark: SparkSession, rawDir: String,
      sourceId: String, date: String): DataFrame =
    read(spark, rawDir)
      .filter(col("source_id") === sourceId && col("extracted_date") === date)
}
