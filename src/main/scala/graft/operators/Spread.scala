package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Range}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
  * Scan parallelism is ESTIMATED from the analyzed plan's leaves (file
  * source size ÷ split size, the same packing arithmetic Spark's file
  * scan uses) — never from `df.rdd`, which would force full physical
  * planning outside AQE once per invocation: a driver stall on deep
  * 100 TB plans, and it pins a non-adaptive plan Spark then can't
  * re-optimize. Reading the file index's size is O(plan), not O(data).
  *
  * Streaming inputs are returned untouched (partition introspection
  * needs a materializable plan; micro-batches parallelize by source).
  *
  * SCOPE: `auto` is built for SCAN-ROOTED NARROW pipelines — read →
  * per-row transform → (maybe) aggregate, the shape every caller in
  * this repo has. Two deliberate approximations follow from that:
  * the leaf estimate only reads scan leaves, so a frame whose real
  * parallelism comes from a downstream exchange (an aggregate or join
  * over a small file) may be repartitioned when its exchange would
  * already have spread it (harmless: one cheap extra exchange on tiny
  * input); and `alreadySpread` suppresses repair if ANY repartition
  * appears anywhere in the plan, even on an unrelated side of a join
  * (also harmless at the call sites, which invoke `auto` directly on
  * the scan frame before composing). Callers with exchange-rooted or
  * multi-branch frames should repartition explicitly instead.
  */
object Spread {

  /** Estimated split count of one file-source leaf — mirrors
    * `FilePartition.maxSplitBytes`: splitSize = min(maxPartitionBytes,
    * max(openCostInBytes, totalBytes / defaultParallelism)). Ignoring
    * per-file boundaries errs toward FEWER estimated splits, i.e.
    * toward repairing parallelism — the safe direction.
    */
  private def estimatedFileSplits(bytes: Long, target: Int,
      maxPartitionBytes: Long, openCost: Long): Long = {
    val perCore = bytes / math.max(1, target)
    val split = math.min(maxPartitionBytes, math.max(openCost, math.max(1L, perCore)))
    (bytes + split - 1) / split
  }

  /** Leaf-derived parallelism of the plan: the max across leaves (the
    * narrow pipeline runs at its driving scan's width). Unknown leaf
    * types (v2 relations, catalog tables) are assumed source-parallel —
    * `auto` must never add an exchange it can't justify.
    */
  private def estimatedLeafParallelism(df: DataFrame, target: Int): Long = {
    val conf = df.sparkSession.sessionState.conf
    val leaves = df.queryExecution.analyzed.collectLeaves()
    val perLeaf = leaves.map {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          estimatedFileSplits(fs.location.sizeInBytes, target,
            conf.filesMaxPartitionBytes, conf.filesOpenCostInBytes)
        case _ => target.toLong
      }
      case r: Range => r.numSlices.getOrElse(target).toLong
      case _: LocalRelation => 1L // driver-local rows: one task's worth
      case _ => target.toLong
    }
    if (perLeaf.isEmpty) target.toLong else perLeaf.max
  }

  /** True when the plan already contains an explicit repartition —
    * the leaf estimate can't see one (it only reads scans), so without
    * this check a pre-spread input would be exchanged twice.
    */
  private def alreadySpread(df: DataFrame): Boolean =
    df.queryExecution.analyzed.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation => true
      case _ => false
    }

  def auto(df: DataFrame, key: Column): DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (!alreadySpread(df) && estimatedLeafParallelism(df, target) < target)
      df.repartition(target, key)
    else df
  }

  /** Keyless (round-robin) variant: same firing rule, but the exchange
    * does NOT pre-satisfy any downstream aggregate's requirement — for
    * pipelines that WANT their aggregate to insert its own exchange as
    * a stage-reuse point (see `Dedup.signatures`).
    */
  def autoRoundRobin(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (!alreadySpread(df) && estimatedLeafParallelism(df, target) < target)
      df.repartition(target)
    else df
  }
}
