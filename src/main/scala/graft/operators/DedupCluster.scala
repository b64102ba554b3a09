package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Near-duplicate *cluster* resolution: pair lists (MinHash/LSH, chunk
  * overlap, embedding cosine — any of [[Dedup]]'s pair producers) only
  * say "a resembles b"; deduplication needs the transitive closure —
  * a ~ b ~ c is ONE group even when (a, c) never surfaced as a pair —
  * and then one canonical survivor per group. This is the stage the
  * reference's exact `INSERT IGNORE` dedup cannot express at all
  * (`loadtowh/load_to_wh.sh:64-78` dedups on exact key equality only).
  *
  * Scale design: iterative min-label propagation over the edge list.
  * Each round is one join (labels ⋈ edges) + one hash aggregation
  * (min per node) — both shuffle on the node id, so AQE coalesces and
  * co-partitions them; nothing is ever collected to the driver. Round
  * count = graph diameter, and near-dup graphs are dense low-diameter
  * clusters of mutually-similar documents (a transitively-chained
  * corpus-length path would mean the similarity threshold is
  * meaningless), so propagation converges in a handful of rounds; the
  * O(log n)-round alternating large-star/small-star scheme (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC'14) buys
  * its asymptotics with 2× the per-round shuffles and only wins on
  * adversarial high-diameter graphs. Convergence is detected with a
  * driver-side scalar (sum of labels, monotonically decreasing, as
  * DECIMAL(38,0) so 10^12 rows × 10^12 ids cannot overflow), not a
  * row-level diff join.
  */
object DedupCluster {

  /** Connected components of the undirected graph given as a pair list.
    * Returns one row per node appearing in any pair: (`id`, `comp`)
    * where `comp` is the minimum node id in the component — stable
    * across runs, partitionings, and retries (pure min, no RNG).
    *
    * `maxIter` is a safety bound, not a tuning knob: iteration stops as
    * soon as a round changes nothing. Throws if the bound is hit while
    * still converging — a silently-partial clustering would under-dedup.
    */
  def connectedComponents(pairs: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 30): DataFrame = {
    val edges = pairs.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .union(pairs.select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
      .dropDuplicates("a", "b")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // localCheckpoint (not persist): each round's plan embeds the previous
    // round's TWICE (once under the join, once under the union), so lineage
    // grows 2^rounds — Catalyst optimization and plan stringification OOM
    // long before the data does. Checkpointing truncates the logical plan
    // to the materialized RDD each round; on a real cluster swap in
    // reliable `checkpoint()` (HDFS-backed) if executor loss during the
    // loop must be recoverable.
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var checksum = labelSum(labels)

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // neighbor's label flows along every edge; min with own label
      // (explicit aliases: labels derives from edges, so attribute-based
      // join conditions would be ambiguous self-join references)
      val prop = labels.as("l").join(edges.as("e"), col("l.id") === col("e.a"))
        .select(col("e.b").as("id"), col("l.comp").as("comp"))
      val next = labels.select("id", "comp").union(prop)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      labels.unpersist()
      labels = next
      converged = nextSum == checksum // min-prop only ever decreases the sum
      checksum = nextSum
      iter += 1
    }
    edges.unpersist()
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — graph diameter exceeds the bound")
    labels
  }

  private def labelSum(labels: DataFrame): java.math.BigDecimal =
    labels.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)

  /** Full dedup-cluster assembly over a document table: every document
    * gains its `cluster_id` (component min of the near-dup graph;
    * documents in no pair are their own singleton cluster),
    * `cluster_size`, and `is_canonical` — the deterministic survivor,
    * longest `lengthCol` first, ties to the smallest id (keep the most
    * complete copy; at 100 TB swap the ordering column for a quality
    * score without touching the plumbing). Exactly one canonical row
    * per cluster by construction.
    */
  def clusters(docs: DataFrame, pairs: DataFrame, idCol: String,
      srcCol: String, dstCol: String, lengthCol: String): DataFrame = {
    val comp = connectedComponents(pairs, srcCol, dstCol)
    val w = Window.partitionBy(col("cluster_id"))
    val rank = Window.partitionBy(col("cluster_id"))
      .orderBy(col(lengthCol).desc, col(idCol).asc)
    docs.join(comp, docs(idCol) === comp("id"), "left")
      .withColumn("cluster_id", coalesce(col("comp"), col(idCol)))
      .drop("id", "comp")
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("is_canonical", row_number().over(rank) === 1)
  }
}
