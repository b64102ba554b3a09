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
    * breaks hash ties. `startTokens` offsets the global running sum:
    * 0 for a one-shot export; the persisted cursor for the
    * incremental form ([[continueShards]]), so a new batch keeps
    * filling the shard the previous batch left open instead of
    * truncating it at the day boundary. NULL token counts weigh 0 (the
    * row still lands in a shard — a doc with unknown length must not
    * crash the export or fall out of it).
    *
    * The range partitioning must materialize once — the range
    * sampler's bounds must not drift between the offset pass and the
    * window pass. HOW it materializes is the `checkpointDir` decision
    * rule: `None` (default) uses `localCheckpoint` — executor block
    * storage, right for the DAILY-BATCH input the incremental form
    * feeds (bounded size; an executor loss just re-runs the batch).
    * A one-shot export over a FULL corpus should pass a durable
    * directory instead: the input materializes there as parquet (and
    * is the caller's to clean up), so the export neither pins the
    * corpus in executor storage nor dies with one executor.
    */
  def assignShards(df: DataFrame, keyCol: String, tokensCol: String,
      shardTokens: Long, salt: String = "shard",
      startTokens: Long = 0L, checkpointDir: Option[String] = None): DataFrame = {
    require(shardTokens > 0, s"shardTokens must be > 0, got $shardTokens")
    require(startTokens >= 0, s"startTokens must be >= 0, got $startTokens")
    val tok = coalesce(col(tokensCol).cast("long"), lit(0L))
    // integer `div`, not floor(a / b): the double division is only
    // exact below 2^53 and for power-of-2 budgets — a corpus-scale
    // running sum with an odd budget could misround the boundary doc
    withGlobalCum(df, keyCol, tokensCol, salt, startTokens, checkpointDir)
      .withColumn("__start", col("__cum") - tok)
      .withColumn("shard_id", expr(s"__start div ${shardTokens}L"))
      .drop("__cum", "__start")
  }

  /** The shared spine of [[assignShards]] and [[packSequences]]: `df` +
    * `__cum`, the INCLUSIVE global running token sum in the h60-shuffled
    * order (`startTokens` + every row at or before this one under
    * `(u, key)`). One range exchange, per-partition sums to the driver
    * (rows = shuffle partitions), offsets broadcast back — the
    * distributed dense-numbering idiom described on the object doc.
    */
  private def withGlobalCum(df: DataFrame, keyCol: String, tokensCol: String,
      salt: String, startTokens: Long,
      checkpointDir: Option[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = coalesce(col(tokensCol).cast("long"), lit(0L))
    val u = H.h60(concat(lit(salt + ":"), col(keyCol).cast("string")))
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged0 = df
      .withColumn("__u", u)
      .repartitionByRange(nParts, col("__u"), col(keyCol))
      .withColumn("__pid", spark_partition_id())
    val ranged = checkpointDir match {
      case Some(dir) =>
        ranged0.write.mode("overwrite").parquet(dir)
        df.sparkSession.read.parquet(dir)
      case None => ranged0.localCheckpoint(true)
    }
    val counts = ranged.groupBy("__pid")
      .agg(sum(tok).as("t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Long] =
      counts.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) => (pid, acc + t) }
        .zip(counts).map { case ((_, off), (pid, _)) => pid -> off }.toMap
    val w = Window.partitionBy(col("__pid")).orderBy(col("__u"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn("__cum",
        lit(startTokens) + element_at(typedlit(offsets), col("__pid")) +
          sum(tok).over(w))
      .drop("__u", "__pid")
  }

  /** GPT-style sequence PACKING — the other training-export layout:
    * concatenate the corpus in the deterministic h60-shuffled order and
    * split it into fixed `blockTokens`-sized context windows, so a
    * document may STRADDLE blocks (unlike [[assignShards]], whose
    * shards close on document boundaries). This is the layout a
    * pretraining batch actually consumes — block k of width B holds
    * global token positions `[k·B, (k+1)·B)` — and the per-document
    * frame this returns is the packing MAP a loader needs to slice
    * documents into blocks:
    *
    *   - `tok_start`    the document's global token offset (exclusive
    *     prefix sum; `startTokens`-shifted for continuous exports)
    *   - `block_first`  `tok_start / B`
    *   - `block_last`   `(tok_start + n_tokens - 1) / B` — the block
    *     holding the document's LAST token
    *   - `n_blocks`     blocks the document touches (0 for a 0-token
    *     or NULL-count document: it occupies no positions, but keeps
    *     its offset row so the map covers the corpus)
    *
    * Every block except the last is exactly full by construction — the
    * fill-ratio question shard packing must answer (greedy first-fit,
    * padding waste) vanishes under concat-and-chunk, which is why it is
    * the pretraining default. Scale shape: the same single-range-
    * exchange prefix-sum spine as [[assignShards]] (offsets collect =
    * shuffle-partition rows); everything after the spine is a narrow
    * integer map. Same determinism contract too: order = h60 of the
    * key, so a re-run, another engine, or a grown corpus prefix
    * reproduces identical block assignments, and `startTokens` chains
    * daily batches into one unbroken token stream (the [[continueShards]]
    * cursor discipline applies unchanged).
    */
  def packSequences(df: DataFrame, keyCol: String, tokensCol: String,
      blockTokens: Long, salt: String = "pack",
      startTokens: Long = 0L, checkpointDir: Option[String] = None): DataFrame = {
    require(blockTokens > 0, s"blockTokens must be > 0, got $blockTokens")
    require(startTokens >= 0, s"startTokens must be >= 0, got $startTokens")
    val tok = coalesce(col(tokensCol).cast("long"), lit(0L))
    // integer `div` throughout — see assignShards' boundary note; the
    // oracle's `//` is exact BIGINT division and these must agree at
    // any corpus size
    withGlobalCum(df, keyCol, tokensCol, salt, startTokens, checkpointDir)
      .withColumn("tok_start", (col("__cum") - tok).cast("long"))
      .withColumn("block_first", expr(s"tok_start div ${blockTokens}L"))
      .withColumn("block_last",
        when(tok > 0, expr(s"(__cum - 1) div ${blockTokens}L"))
          .otherwise(col("block_first")).cast("long"))
      .withColumn("n_blocks",
        when(tok > 0, col("block_last") - col("block_first") + 1)
          .otherwise(lit(0L)).cast("long"))
      .drop("__cum")
  }

  /** [[assignShards]] + the physical layout: one directory per shard
    * (`partitionBy(shard_id)` — a trainer reads shard k as one glob)
    * and a `_manifest` table `(shard_id, n_docs, n_tokens)` written
    * LAST, so a complete manifest certifies a complete export. Returns
    * the manifest. `checkpointDir`: see [[assignShards]] — a
    * full-corpus one-shot export should pass a durable staging
    * directory rather than pin the corpus in executor block storage.
    *
    * `format`: `"parquet"` (default) or `"json"` — JSON Lines, the
    * training-data interchange most trainers ingest directly (one JSON
    * object per document, one directory per shard). The manifest is
    * computed from a READ-BACK of the written files either way, so it
    * certifies what is actually on disk, not what the plan intended.
    */
  def writeShards(spark: SparkSession, df: DataFrame, dir: String,
      keyCol: String, tokensCol: String, shardTokens: Long,
      salt: String = "shard", checkpointDir: Option[String] = None,
      format: String = "parquet"): DataFrame = {
    require(format == "parquet" || format == "json",
      s"format must be parquet or json, got $format")
    val sharded = assignShards(df, keyCol, tokensCol, shardTokens, salt,
      checkpointDir = checkpointDir)
    sharded.write.mode("overwrite").partitionBy("shard_id")
      .format(format).save(s"$dir/shards")
    // Read back with the writer's schema pinned: JSON Lines omits
    // NULL fields, so inference over an all-NULL column would drop it
    // and the manifest aggregation would fail unresolved; the explicit
    // schema also pins partition-column shard_id to long (inference
    // would narrow it to int).
    val manifest = spark.read.schema(sharded.schema).format(format)
      .load(s"$dir/shards")
      .groupBy(col("shard_id").cast("long").as("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col(tokensCol).cast("long"), lit(0L))).as("n_tokens"))
    // per-file sha256 audit trail ([[fileHashes]]) lands BEFORE the
    // row manifest: `_manifest` stays the written-last completion
    // marker, and a complete export always carries its hash trail
    Zone.overwriteInPlace(spark, fileHashes(spark, s"$dir/shards"),
      s"$dir/_filehashes")
    Zone.overwriteInPlace(spark, manifest, s"$dir/_manifest")
    spark.read.parquet(s"$dir/_manifest")
  }

  /** Per-file integrity manifest of a shard export: one row per data
    * file under `shardsDir` with its byte length and sha256 — the
    * takedown AUDIT TRAIL: snapshot before and after a
    * [[redactShards]] pass and the diff proves exactly which
    * `(batch, shard)` partitions were rewritten and that every other
    * file is byte-identical (ShardingSpec pins this). Fully
    * distributed: the `binaryFile` source reads each part file in the
    * executor that hashes it (`sha2` is codegen'd), nothing rides
    * through the driver — a year-scale export audits at scan speed.
    * Partition-column values parse from the path, so the manifest
    * self-describes for both [[writeShards]] layouts (`shard_id=`) and
    * [[continueShards]] state (`__batch_id=`/`shard_id=`).
    */
  def fileHashes(spark: SparkSession, shardsDir: String): DataFrame =
    spark.read.format("binaryFile").load(shardsDir)
      .select(
        regexp_replace(col("path"), "^.*?(__batch_id=|shard_id=)", "$1")
          .as("file"),
        when(regexp_extract(col("path"), "__batch_id=(-?\\d+)", 1) =!= "",
          regexp_extract(col("path"), "__batch_id=(-?\\d+)", 1).cast("long"))
          .as("batch_id"),
        when(regexp_extract(col("path"), "shard_id=(-?\\d+)", 1) =!= "",
          regexp_extract(col("path"), "shard_id=(-?\\d+)", 1).cast("long"))
          .as("shard_id"),
        col("length").as("n_bytes"),
        sha2(col("content"), 256).as("sha256"))

  /** Incremental training-shard export — the continuous form of
    * [[writeShards]]: each daily `batch` is pseudo-randomly shuffled
    * WITHIN itself (the h60 order) and appended to the shard sequence
    * from wherever the previous batch stopped, so the shard a day
    * leaves part-filled keeps filling the next day and no shard is
    * truncated at a day boundary. Day-over-day union equals the
    * one-shot [[assignShards]] under day-major order — cumsum ordered
    * by `(day, u, key)` — which is the exact semantics a continuous
    * export CAN have: already-shipped shards are immutable, so a new
    * batch may only extend the sequence, never reshuffle into it
    * (q98's oracle states this as SQL; ShardingSpec pins the
    * day-seam fill and the budget bound across it).
    *
    * State under `stateDir`:
    *   - `shards/`  rows partitioned by `(__batch_id, shard_id)` and
    *     written with DYNAMIC partition overwrite — a replayed batch
    *     rewrites exactly its own partitions with identical bytes
    *     (same cursor ⇒ same assignment), so the append is idempotent
    *     through any crash point; a trainer reads shard k as the
    *     `shard_id = k` slice (partition-pruned) across batch dirs
    *   - `_cursor/` 1-row `(total_tokens, last_batch)`, swapped LAST
    *     ([[Zone.overwriteInPlace]]) — the replay marker: any batch id
    *     ≤ the committed one short-circuits to a no-op (batch ids must
    *     be monotonic, [[Zone.lastCommittedBatch]]'s convention — an
    *     old batch must never re-run against an advanced cursor)
    *
    * The cursor read and the per-partition offset collect are the
    * operator's two bounded driver actions (1 row + shuffle-partition
    * rows — the family's documented collect budget). Returns the
    * batch's token count (0 for a replay of a committed batch).
    */
  def continueShards(spark: SparkSession, batch: DataFrame, stateDir: String,
      keyCol: String, tokensCol: String, shardTokens: Long,
      batchId: Long, salt: String = "shard"): Long = {
    val cursor = Zone.readIfExists(spark, s"$stateDir/_cursor")
      .map(_.select(col("total_tokens"), col("last_batch")).head())
    if (cursor.exists(_.getLong(1) >= batchId)) return 0L
    val start = cursor.map(_.getLong(0)).getOrElse(0L)
    val sharded = assignShards(batch, keyCol, tokensCol, shardTokens,
      salt, startTokens = start)
    sharded.withColumn("__batch_id", lit(batchId))
      .write
      .partitionBy("__batch_id", "shard_id")
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(s"$stateDir/shards")
    // summed over `sharded` (rooted at assignShards' localCheckpoint),
    // not `batch` — the upstream pipeline producing the batch is never
    // recomputed for the cursor arithmetic
    val batchTokens = sharded.agg(coalesce(sum(col(tokensCol).cast("long")),
      lit(0L))).head().getLong(0)
    import spark.implicits._
    Zone.overwriteInPlace(spark,
      Seq((start + batchTokens, batchId)).toDF("total_tokens", "last_batch"),
      s"$stateDir/_cursor")
    batchTokens
  }

  /** Incremental sequence packing — [[continuePack]] is to
    * [[packSequences]] what [[continueShards]] is to [[assignShards]]:
    * each daily batch is h60-shuffled within itself and appended to
    * the GLOBAL token stream from wherever the previous batch stopped,
    * so the context-window block a day leaves part-filled keeps
    * filling the next day and no block is truncated at a day boundary.
    * Day-over-day union equals the one-shot [[packSequences]] under
    * day-major order — the only semantics a continuous packing can
    * have, since shipped blocks are immutable.
    *
    * Same state contract as [[continueShards]]: rows under
    * `stateDir/packed` partitioned by `__batch_id` with dynamic
    * overwrite (a replayed batch rewrites exactly its own partition
    * with identical bytes — same cursor ⇒ same offsets), and a 1-row
    * `_cursor` swapped LAST as the replay marker (batch ids monotonic;
    * a batch id ≤ the committed one no-ops). Returns the batch's token
    * count (0 for a replay).
    */
  def continuePack(spark: SparkSession, batch: DataFrame, stateDir: String,
      keyCol: String, tokensCol: String, blockTokens: Long,
      batchId: Long, salt: String = "pack"): Long = {
    val cursor = Zone.readIfExists(spark, s"$stateDir/_cursor")
      .map(_.select(col("total_tokens"), col("last_batch")).head())
    if (cursor.exists(_.getLong(1) >= batchId)) return 0L
    val start = cursor.map(_.getLong(0)).getOrElse(0L)
    val packed = packSequences(batch, keyCol, tokensCol, blockTokens,
      salt, startTokens = start)
    packed.withColumn("__batch_id", lit(batchId))
      .write
      .partitionBy("__batch_id")
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(s"$stateDir/packed")
    val batchTokens = packed.agg(coalesce(sum(col(tokensCol).cast("long")),
      lit(0L))).head().getLong(0)
    import spark.implicits._
    Zone.overwriteInPlace(spark,
      Seq((start + batchTokens, batchId)).toDF("total_tokens", "last_batch"),
      s"$stateDir/_cursor")
    batchTokens
  }

  /** Takedown for ALREADY-EXPORTED shards ([[continueShards]] state):
    * remove `deleted` documents from the shard table by rewriting ONLY
    * the `(__batch_id, shard_id)` partitions that contain them —
    * a right-to-be-forgotten pass over an export measured in years
    * touches the handful of partitions the documents landed in, never
    * the corpus. Shard identities and boundaries stay FROZEN
    * (redaction shrinks a shard's content; it never re-packs — *
    * trainers' shard references stay valid and the cursor is
    * untouched), which is the immutable-export semantics a takedown
    * wants.
    *
    * Crash contract: partitions the redaction leaves EMPTY are removed
    * FIRST — dynamic partition overwrite only rewrites partitions that
    * produce output rows, so an emptied partition would never be
    * rewritten and a trailing cleanup would be load-bearing (a crash
    * before it would leave the taken-down documents readable). An
    * emptied partition's every row is a deleted doc, so removing the
    * directory IS its redaction, and a crash mid-removal is healed by
    * a re-run (the surviving originals still contain the deleted docs,
    * so the partition is re-detected as affected). The dynamic
    * overwrite of the partially-redacted partitions follows
    * (idempotent — a replay rewrites the same partitions to the same
    * bytes). A crash at any point therefore leaves each partition
    * original (re-run redacts it), fully redacted, or removed — never
    * a state a re-run can't converge. The affected-partition list is a
    * bounded driver collect (a takedown batch lands in at most
    * |deleted| partitions). Returns the number of rows removed.
    */
  def redactShards(spark: SparkSession, stateDir: String,
      deleted0: DataFrame, keyCol: String): Long = {
    val shardsDir = s"$stateDir/shards"
    if (!Zone.exists(spark, shardsDir)) return 0L
    val all = spark.read.parquet(shardsDir)
    val del = deleted0
      .select(col(deleted0.columns.head).cast("long").as(keyCol)).distinct()
    val affected = all.join(del, Seq(keyCol), "left_semi")
      .select(col("__batch_id").cast("long"), col("shard_id").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    if (affected.isEmpty) return 0L
    import spark.implicits._
    val affectedDf = affected.toSeq.toDF("__b", "__s")
    val inAffected = all
      .join(broadcast(affectedDf),
        col("__batch_id").cast("long") === col("__b") &&
          col("shard_id").cast("long") === col("__s"), "left_semi")
    val removed = inAffected.join(del, Seq(keyCol), "left_semi").count()
    // materialize before touching the directory: the plan reads the
    // same files it overwrites/removes (affected partitions only —
    // takedown-sized)
    val kept = inAffected.join(del, Seq(keyCol), "left_anti")
      .localCheckpoint(true)
    // emptied partitions FIRST (see crash contract): their only rows
    // are deleted docs, so directory removal is itself the redaction
    val survivors = kept
      .select(col("__batch_id").cast("long"), col("shard_id").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fs = new org.apache.hadoop.fs.Path(shardsDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    affected.filterNot(survivors).foreach { case (b, s) =>
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$shardsDir/__batch_id=$b/shard_id=$s"), true)
    }
    kept.write
      .partitionBy("__batch_id", "shard_id")
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(shardsDir)
    removed
  }
}
