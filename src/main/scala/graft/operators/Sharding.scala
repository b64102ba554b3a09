package graft.operators

import graft.functions.{AuditableHash => H}
import graft.sources.Zone
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic token-budget sharding — the training-export layout
  * step: give every document a `shard_id` such that (a) documents are
  * pseudo-randomly shuffled (order = h60 of the key — a new run, a
  * different engine, or a grown corpus prefix reproduces the same
  * order), and (b) consecutive shards hold ~`shardTokens` tokens each
  * (a shard closes at the first document that crosses the budget, so
  * a shard overshoots by at most one document — the streaming-pack
  * rule trainers expect, q51's convention made global).
  *
  * The global running token sum is the naive plan's poison: a
  * `Window.orderBy` with no partitionBy drags the corpus through ONE
  * task. Instead this reuses the repo's distributed dense-numbering
  * idiom ([[Scd2Merge.assignSurrogateKeys]]): range-partition by the
  * shuffle order, materialize the partitioning once (the range
  * sampler's bounds must not drift between passes), per-partition
  * token sums collect to the driver (rows = shuffle partitions), their
  * exclusive prefix sums become per-partition offsets, and each
  * partition windows only its own slice. One range exchange total; a
  * billion-document corpus spreads over the cluster.
  */
object Sharding {

  /** `df` + `shard_id` (0-based, contiguous). `keyCol` must uniquely
    * identify rows — it seeds the deterministic shuffle order and
    * breaks hash ties.
    */
  def assignShards(df: DataFrame, keyCol: String, tokensCol: String,
      shardTokens: Long, salt: String = "shard"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shardTokens > 0, s"shardTokens must be > 0, got $shardTokens")
    val u = H.h60(concat(lit(salt + ":"), col(keyCol).cast("string")))
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df
      .withColumn("__u", u)
      .repartitionByRange(nParts, col("__u"), col(keyCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = ranged.groupBy("__pid")
      .agg(sum(col(tokensCol).cast("long")).as("t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Long] =
      counts.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) => (pid, acc + t) }
        .zip(counts).map { case ((_, off), (pid, _)) => pid -> off }.toMap
    val w = Window.partitionBy(col("__pid")).orderBy(col("__u"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn("__cum",
        element_at(typedlit(offsets), col("__pid")) +
          sum(col(tokensCol).cast("long")).over(w))
      .withColumn("shard_id",
        floor((col("__cum") - col(tokensCol).cast("long")) / shardTokens)
          .cast("long"))
      .drop("__u", "__pid", "__cum")
  }

  /** [[assignShards]] + the physical layout: one directory per shard
    * (`partitionBy(shard_id)` — a trainer reads shard k as one glob)
    * and a `_manifest` table `(shard_id, n_docs, n_tokens)` written
    * LAST, so a complete manifest certifies a complete export. Returns
    * the manifest.
    */
  def writeShards(spark: SparkSession, df: DataFrame, dir: String,
      keyCol: String, tokensCol: String, shardTokens: Long,
      salt: String = "shard"): DataFrame = {
    val sharded = assignShards(df, keyCol, tokensCol, shardTokens, salt)
    sharded.write.mode("overwrite").partitionBy("shard_id")
      .parquet(s"$dir/shards")
    // partition-column inference reads shard_id back as int — pin long
    val manifest = spark.read.parquet(s"$dir/shards")
      .groupBy(col("shard_id").cast("long").as("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol).cast("long")).as("n_tokens"))
    Zone.overwriteInPlace(spark, manifest, s"$dir/_manifest")
    spark.read.parquet(s"$dir/_manifest")
  }
}
