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
  /** `events.ts` arrives in one of three physical shapes depending on
    * the generator vintage: nanosecond precision (which Spark's parquet
    * reader rejects, [PARQUET_TYPE_ILLEGAL] — read nanos as Long via
    * session conf and floor-convert to microseconds, the same
    * truncation DuckDB's `CAST(ts AS TIMESTAMP)` applies), microsecond
    * without timezone (Spark reads TIMESTAMP_NTZ — cast to session-tz
    * TIMESTAMP; the session pins UTC so the wall-clock fields are
    * unchanged and epoch math agrees with DuckDB's naive TIMESTAMP),
    * or already a plain TIMESTAMP. Integer `div` (not double /) on the
    * nanos path — ns epochs overflow a double's 53-bit mantissa.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
