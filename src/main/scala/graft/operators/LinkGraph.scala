package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph authority scoring: fixed-point integer PageRank over an
  * edge list — the host/document authority signal real web-curation
  * pipelines feed into quality filtering (CommonCrawl publishes
  * exactly this ranking over its host graph), and the one classic
  * iterative-numeric workload the engine lacked next to its iterative
  * min-label components ([[DedupCluster]]).
  *
  * Arithmetic is exact integer fixed point, like every scored surface
  * in this repo ([[Dsir]], [[graft.plans.Log2Fp]]): ranks live in
  * units of `1/scale`, each node's out-contribution is `rank DIV
  * outdeg`, damping is `(dampNum/dampDen)` applied as integer
  * multiply-then-DIV, and dangling mass redistributes as `DIV n`.
  * Long sums are order-free, so the result is bit-stable under any
  * partitioning and reproducible verbatim by a DuckDB oracle — no
  * float power iteration to drift in the last ulp.
  *
  * Scale shape (the reason this is an operator and not a loop in a
  * notebook): edges are deduped, hash-partitioned on `src` ONCE and
  * persisted — each of the `iters` rounds then joins the node-sized
  * contribution table onto the stationary edge partitions (the rank
  * side shuffles, the 100 TB edge side does not) and pays exactly one
  * edge-sized shuffle, the `GROUP BY dst`. Ranks are
  * locally-checkpointed per round so lineage stays one round deep
  * (the rank frame feeds three places per round — contribs, the
  * dangling aggregate, and the next rank join — so an unbroken plan
  * would grow 3^iters). The dangling term rides as a broadcast 1-row
  * cross join, never a driver collect, and `n` (node count) is the
  * one scalar materialized up front — it also materializes the edge
  * persist.
  */
object LinkGraph {

  /** PageRank after exactly `iters` synchronous rounds (fixed
    * iteration count, not convergence-tested: a deterministic oracle
    * needs a deterministic round count, and at damping 0.85 the
    * ranking order is stable well before 5 rounds on web-shaped
    * graphs).
    *
    * Node set = every id appearing as `src` or `dst` (isolated nodes
    * never enter; callers wanting them union zero-degree ids into the
    * edge list as self-loops first). Initial rank is `scale` per node
    * (uniform, total mass `n·scale`); per round
    * `r'(v) = ((dampDen−dampNum)·scale) DIV dampDen
    *        + (dampNum·(Σ_{u→v} r(u) DIV outdeg(u) + D DIV n)) DIV dampDen`
    * where `D` is the summed rank of dangling nodes (no out-edges).
    * Truncating DIV leaks a few units of mass per round — fine: the
    * output is an authority RANKING in fixed units, not a probability
    * that must sum to one.
    *
    * Returns `(node, rank_fp)`, one row per node.
    */
  def pageRank(edgesIn: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5, dampNum: Long = 85L, dampDen: Long = 100L,
      scale: Long = 1L << 20): DataFrame = {
    require(iters >= 1 && dampNum >= 0 && dampNum <= dampDen && scale >= 1,
      s"pageRank: bad parameters iters=$iters damp=$dampNum/$dampDen scale=$scale")
    val edges = edgesIn
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // materializes both persists
    require(n > 0, "pageRank: empty edge list")
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val teleport = (dampDen - dampNum) * scale / dampDen // Long DIV, both sides nonneg

    var ranks = nodes.withColumn("rank_fp", lit(scale))
      .localCheckpoint(eager = false)
    var round = 0
    while (round < iters) {
      val prev = ranks
      // per-SOURCE contribution (one DIV per node, not per edge), then
      // fan out along the stationary edge partitions
      val contrib = ranks.join(outdeg, ranks("node") === outdeg("src"))
        .select(col("src"), expr("rank_fp DIV deg").as("__c"))
      val inbound = edges.join(contrib, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("__c")).as("__in"))
      // dangling mass: ranks of nodes with no out-edges, as a broadcast
      // 1-row scalar (left anti beats a null-producing outer join here)
      val dangling = ranks.join(outdeg, ranks("node") === outdeg("src"), "left_anti")
        .agg(coalesce(sum(col("rank_fp")), lit(0L)).as("__d"))
      val next = nodes
        .join(inbound, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit(teleport) +
            expr(s"$dampNum * (coalesce(__in, CAST(0 AS BIGINT)) + __d DIV $n)" +
              s" DIV $dampDen")
          ).as("rank_fp"))
      // eager: materialize THIS round, THEN release the previous one
      ranks = next.localCheckpoint(eager = true)
      prev.unpersist()
      round += 1
    }
    edges.unpersist()
    nodes.unpersist()
    ranks
  }
}
