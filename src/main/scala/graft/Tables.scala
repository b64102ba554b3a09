package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness-generated parquet tables (TESTDATA.md).
  *
  * Each loader is a plain parquet scan — schema comes from the file
  * footer, so Catalyst gets column pruning + filter pushdown for free
  * (`PushedFilters` / `ReadSchema` in `.explain("formatted")`).
  * At 100 TB these would be partitioned/bucketed catalog tables; the
  * call sites below never assume single-file inputs.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** `events.ts` is written with nanosecond precision, which Spark's
    * parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). We read nanos as
    * Long (session conf) and floor-convert to microseconds — the same
    * truncation DuckDB's `CAST(ts AS TIMESTAMP)` applies, so oracles
    * agree. Integer `div` (not double /) — ns epochs overflow a double's
    * 53-bit mantissa.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
