package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism repair for compute-heavy narrow pipelines over
  * few-partition inputs ("small file, heavy map").
  *
  * A compressed text corpus can be tiny on disk but expensive per row —
  * shingling + 64 MinHash permutations cost ~100 CPU-ops per token. A
  * single-row-group parquet file arrives as ONE scan partition, so the
  * whole narrow pipeline (and the partial aggregation above it) runs in
  * one task while the rest of the cluster idles: measured 1.2 s
  * single-task vs <0.2 s spread for the signature pipeline at sf0.1.
  *
  * `auto` repartitions by a key ONLY when the scan's parallelism is
  * below the cluster's — on a real many-split 100 TB input it's an
  * exact no-op (no exchange added), and when it does fire the exchange
  * moves the small raw input (cheapest point in the pipeline: before
  * any row explosion). Keying by the downstream aggregation key means
  * the later groupBy reuses this partitioning instead of adding its own
  * exchange — the shuffle is MOVED, not added.
  *
  * Streaming inputs are returned untouched (partition introspection
  * needs a materializable plan; micro-batches parallelize by source).
  */
object Spread {

  def auto(df: DataFrame, key: Column): DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, key) else df
  }
}
