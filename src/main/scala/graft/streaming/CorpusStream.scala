package graft.streaming

import graft.operators.{Dedup, IvfIndex}
import graft.sources.Zone
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming incremental near-duplicate detection: documents arrive as
  * a stream; each micro-batch computes its MinHash signatures, joins
  * its NARROW band rows against the PERSISTED two-table index
  * ([[Dedup.signatures]] + [[Dedup.signatureBands]] via
  * [[Dedup.minHashLshIncremental]] — only new×index and new×new pairs,
  * never a corpus recompute), appends the pairs to the pair log, and
  * extends both index tables. At 100 TB this is the shape that keeps
  * daily dedup cost proportional to the increment: the bands table is
  * band-partitioned parquet carrying no signature payload, signatures
  * move only per candidate pair, and the stream checkpoint makes each
  * batch effectively-once (an index append replayed for the same batch
  * re-emits the same pairs; downstream consumers dedupe on
  * (id_a, id_b) exactly like the operator does).
  */
object CorpusStream {

  /** @param docs        streaming DataFrame with `idCol` + `textCol`
    * @param indexDir    two-table signature index — `sigs/` (id, sig)
    *                    and `bands/` (id, band, band_key), created on
    *                    the first batch
    * @param pairsDir    append-only near-dup pair log
    */
  def runIncrementalNearDup(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      idCol: String,
      indexDir: String,
      pairsDir: String,
      checkpointDir: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val newSigs = Dedup.signatures(
          batch, textCol, idCol, shingleSize, numHashes).cache()
        val newBands = Dedup.signatureBands(newSigs, numHashes, bands)
        try {
          val pairs = (Zone.readIfExists(spark, s"$indexDir/bands"),
              Zone.readIfExists(spark, s"$indexDir/sigs")) match {
            case (Some(idxBands), Some(idxSigs)) =>
              Dedup.minHashLshIncremental(idxBands, idxSigs,
                newBands, newSigs, numHashes, threshold)
            case _ => // first batch: the increment IS the corpus
              Dedup.minHashLshIncremental(newBands.limit(0), newSigs.limit(0),
                newBands, newSigs, numHashes, threshold)
          }
          pairs.write.mode("append").parquet(pairsDir)
          // sigs BEFORE bands: a sig row without band rows is inert
          // (generates no candidates), while a band row whose sig is
          // missing would make later batches' pair verification drop
          // the pair silently — so a crash between the two writes must
          // leave the harmless orphan, not the dangerous one
          newSigs.write.mode("append").parquet(s"$indexDir/sigs")
          newBands.write.mode("append").parquet(s"$indexDir/bands")
        } finally newSigs.unpersist()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming incremental SimHash near-dup — the same micro-batch
    * discipline as [[runIncrementalNearDup]] over the ONE-table
    * [[Dedup.simHashChunks]] index (the 8-byte signature rides the
    * chunk rows, so each batch is one pair append + one index append;
    * with a single index table there is no write-ordering hazard at
    * all — a crash before the index append just re-emits the same
    * batch's pairs on replay, which consumers dedupe on (id_a, id_b)).
    */
  def runIncrementalSimHash(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      idCol: String,
      indexDir: String,
      pairsDir: String,
      checkpointDir: String,
      maxHamming: Int = 3): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val newChunks = Dedup.simHashChunks(
          Dedup.simHashDf(batch, textCol, idCol)).cache()
        try {
          val pairs = Zone.readIfExists(spark, indexDir) match {
            case Some(idx) => Dedup.simHashIncremental(idx, newChunks, maxHamming)
            case None => // first batch: the increment IS the corpus
              Dedup.simHashIncremental(newChunks.limit(0), newChunks, maxHamming)
          }
          pairs.write.mode("append").parquet(pairsDir)
          newChunks.write.mode("append").parquet(indexDir)
        } finally newChunks.unpersist()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming incremental embedding near-dup — the same micro-batch
    * discipline over the two-table embedding LSH index
    * ([[Dedup.embeddingIndex]]): each batch's NARROW bucket rows join
    * the persisted index, vectors fetch per candidate pair, pairs
    * append to the log, both index tables extend. Same crash ordering
    * as the MinHash stream: vectors BEFORE buckets — a vector row with
    * no bucket rows is inert, a bucket row with no vector would
    * silently drop pairs in later batches' verification. The hyperplane
    * `seed` is the frozen codebook; changing it mid-stream is a
    * rebuild, not an increment.
    */
  def runIncrementalEmbeddingNearDup(
      spark: SparkSession,
      vectors: DataFrame,
      vecCol: String,
      idCol: String,
      indexDir: String,
      pairsDir: String,
      checkpointDir: String,
      dim: Int,
      minCosine: Double = 0.9,
      bits: Int = 8,
      tables: Int = 8,
      seed: Long = 42L): StreamingQuery =
    vectors.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (newBk0, newV0) = Dedup.embeddingIndex(
          batch, vecCol, idCol, dim, bits, tables, seed)
        val (newBk, newV) = (newBk0.cache(), newV0.cache())
        try {
          val pairs = (Zone.readIfExists(spark, s"$indexDir/buckets"),
              Zone.readIfExists(spark, s"$indexDir/vecs")) match {
            case (Some(idxBk), Some(idxV)) =>
              Dedup.embeddingNearDupIncremental(idxBk, idxV, newBk, newV, minCosine)
            case _ => // first batch: the increment IS the corpus
              Dedup.embeddingNearDupIncremental(
                newBk.limit(0), newV.limit(0), newBk, newV, minCosine)
          }
          pairs.write.mode("append").parquet(pairsDir)
          newV.write.mode("append").parquet(s"$indexDir/vecs")
          newBk.write.mode("append").parquet(s"$indexDir/buckets")
        } finally { newBk.unpersist(); newV.unpersist() }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming IVF index maintenance — the ANN side of the same
    * discipline: the first micro-batch bootstraps the two-table index
    * ([[IvfIndex.buildIndex]] — codebook + cells); every later batch is
    * ONE [[IvfIndex.assignIncrement]] narrow map against the PERSISTED
    * codebook and a cells append. Queries probe the persisted tables on
    * demand ([[IvfIndex.probe]]); codebook drift under a shifting
    * distribution is a scheduled [[IvfIndex.rebuild]], never something
    * the stream pays for.
    *
    * Crash ordering: centroids commit BEFORE cells. A centroid table
    * with no cells just makes the next replay take the incremental
    * branch — which assigns the same batch against the same frozen
    * codebook and appends exactly the rows the crashed buildIndex would
    * have (the incremental==batch property, doing recovery work) —
    * while cells referencing a centroid table that never landed would
    * poison every later probe.
    */
  def runIncrementalAnnIndex(
      spark: SparkSession,
      vectors: DataFrame,
      vecCol: String,
      idCol: String,
      indexDir: String,
      checkpointDir: String,
      nCentroids: Int = 16): StreamingQuery =
    vectors.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val centsDir = s"$indexDir/centroids"
        val cellsDir = s"$indexDir/cells"
        Zone.readIfExists(spark, centsDir) match {
          case Some(cents) =>
            IvfIndex.assignIncrement(batch, idCol, vecCol, cents)
              .write.mode("append").parquet(cellsDir)
          case None => // first batch bootstraps the codebook
            val (cents, cells) = IvfIndex.buildIndex(batch, idCol, vecCol, nCentroids)
            cents.write.mode("overwrite").parquet(centsDir)
            cells.write.mode("append").parquet(cellsDir)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
