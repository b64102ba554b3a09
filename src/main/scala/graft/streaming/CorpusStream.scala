package graft.streaming

import graft.operators.Dedup
import graft.sources.Zone
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming incremental near-duplicate detection: documents arrive as
  * a stream; each micro-batch computes its banded MinHash signatures,
  * joins them against the PERSISTED signature index
  * ([[Dedup.bandedSignatures]] / [[Dedup.minHashLshIncremental]] — only
  * new×index and new×new pairs, never a corpus recompute), appends the
  * pairs to the pair log, and extends the index. At 100 TB this is the
  * shape that keeps daily dedup cost proportional to the increment:
  * the index is band-partitioned parquet, the join prunes to colliding
  * bands, and the stream checkpoint makes each batch effectively-once
  * (an index append replayed for the same batch re-emits the same
  * pairs; downstream consumers dedupe on (id_a, id_b) exactly like the
  * operator does).
  */
object CorpusStream {

  /** @param docs        streaming DataFrame with `idCol` + `textCol`
    * @param indexDir    banded-signature index (created on first batch)
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
        val newBanded = Dedup.bandedSignatures(
          batch, textCol, idCol, shingleSize, numHashes, bands).cache()
        try {
          val pairs = Zone.readIfExists(spark, indexDir) match {
            case Some(index) =>
              Dedup.minHashLshIncremental(index, newBanded, numHashes, threshold)
            case None => // first batch: the increment IS the corpus
              Dedup.minHashLshIncremental(newBanded.limit(0), newBanded,
                numHashes, threshold)
          }
          pairs.write.mode("append").parquet(pairsDir)
          newBanded.write.mode("append").parquet(indexDir)
        } finally newBanded.unpersist()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
