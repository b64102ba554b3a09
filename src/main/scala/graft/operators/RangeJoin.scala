package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — an operator Spark has no native plan
  * for: `points ⋈ intervals ON lo <= p < hi` falls back to
  * BroadcastNestedLoopJoin (every point × every interval). The scalable
  * re-expression is chunk bucketing:
  *
  *  1. pick a chunk width; an interval replicates to every chunk it
  *     overlaps (`floor(lo/w) .. floor((hi-ulp)/w)` — `sequence` +
  *     explode, all codegen);
  *  2. a point maps to exactly ONE chunk (`floor(p/w)`);
  *  3. equi-join on the chunk id, then the exact `lo <= p < hi`
  *     post-filter.
  *
  * Work drops from O(P·I) to O(P + Σ interval-chunks) with a plain hash
  * join that broadcasts/shuffles like any other — at 100 TB the chunk
  * id is just another join key. Chunk width trades replication against
  * selectivity: ~the median interval width is the usual choice.
  *
  * Intervals are half-open `[lo, hi)`; points with NULL values and
  * NULL/empty intervals drop (inner-join semantics).
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      chunkWidth: Double): DataFrame = {
    require(chunkWidth > 0, "chunkWidth must be positive")
    // hi is exclusive: the last covered chunk is the one containing the
    // largest value strictly below hi — exactly floor(hi/w), EXCEPT when
    // hi sits on a chunk boundary, where it's the previous chunk. The
    // boundary test is exact float equality against the recomputed
    // boundary (an absolute epsilon would silently drop matches for
    // intervals ending within epsilon·w above a boundary).
    val hiChunkRaw = floor(col(hiCol) / chunkWidth).cast("long")
    val hiChunk = when(col(hiCol) === hiChunkRaw * chunkWidth, hiChunkRaw - 1)
      .otherwise(hiChunkRaw)
    val iv = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull && col(loCol) < col(hiCol))
      .withColumn("__chunk", explode(sequence(
        floor(col(loCol) / chunkWidth).cast("long"), hiChunk)))
    val pt = points
      .filter(col(pointCol).isNotNull)
      .withColumn("__chunk", floor(col(pointCol) / chunkWidth).cast("long"))
    pt.join(iv, Seq("__chunk"))
      .filter(col(loCol) <= col(pointCol) && col(pointCol) < col(hiCol))
      .drop("__chunk")
  }
}
