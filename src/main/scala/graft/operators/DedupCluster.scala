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
  * Scale design — two regimes, picked by the measured edge count (the
  * same decision shape as Spark's broadcast-join threshold):
  *
  *  - **Driver union-find** when the deduped edge list fits comfortably
  *    on the driver (default ≤ 4M edges ≈ 64 MB). A near-dup edge list
  *    is a tiny fraction of the corpus — pairs above a similarity
  *    threshold are rare by construction — so even multi-TB corpora
  *    usually land here. One collect + path-compressed union-find +
  *    one createDataFrame: no iterative jobs, no per-round codegen.
  *  - **Iterative min-label propagation** otherwise. Each round: labels
  *    flow along edges (join + min-aggregate, both keyed on node id so
  *    AQE co-partitions), then a pointer-jump (comp := comp(comp),
  *    Shiloach–Vishkin-style shortcutting) so long chains collapse in
  *    O(log diameter) rounds. Convergence is detected with a
  *    driver-side scalar (sum of labels, monotonically decreasing, as
  *    DECIMAL(38,0) so 10^12 rows × 10^12 ids cannot overflow), not a
  *    row-level diff join.
  *
  * Both regimes produce identical output (comp = component min;
  * differential-tested), so the cutover is invisible to callers.
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
    *
    * `checkpointDir`: when set, the iterative regime truncates lineage
    * with RELIABLE checkpoints into this directory (HDFS/object store on
    * a real cluster) instead of `localCheckpoint`, so mid-loop executor
    * loss replays from durable storage rather than failing the job —
    * localCheckpoint blocks are gone with the executor that held them.
    * Leave unset for single-node / latency-sensitive runs.
    *
    * Checkpoint-file lifecycle: files land in a fresh per-run UUID
    * subdirectory (Spark's `setCheckpointDir` contract); each round's
    * files are DELETED as soon as the next round materializes (the
    * automatic cleaner only covers this when
    * `spark.cleaner.referenceTracking.cleanCheckpoints` was set at
    * session startup — off by default — so a long run would otherwise
    * accumulate one RDD directory per round). Only the FINAL round's
    * files survive, because the returned frame reads them lazily;
    * callers may delete the run's subdirectory once the result is
    * consumed or re-materialized.
    */
  def connectedComponents(pairs: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 30, collectThreshold: Long = 4000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    // both directions in ONE pass over the pair source: a union of two
    // projections would execute the (possibly expensive) pair-producing
    // pipeline once per branch — only exchanges get reused, not arbitrary
    // subtrees
    val edges = pairs.select(explode(array(
        struct(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b")),
        struct(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .dropDuplicates("a", "b")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val edgeCount = edges.count() // materializes the persist either way
    if (edgeCount <= collectThreshold) {
      val result = driverUnionFind(edges)
      edges.unpersist()
      return result
    }
    iterative(edges, maxIter, checkpointDir)
  }

  /** Incremental connected components: fold a day's NEW pair edges into
    * an existing labeling without replaying the accumulated pair log.
    * A `(id, comp)` label row IS an edge to a member of its component
    * (comp = component min, a real node), so the compressed graph
    * `labels-as-edges ∪ newPairs` has exactly the original graph's
    * connectivity — `incremental(cc(oldPairs), newPairs) ==
    * cc(oldPairs ∪ newPairs)` (DedupClusterSpec property). Daily input
    * size is nodes + increment, not the ever-growing edge log, and the
    * label graph has diameter ≤ 2, so when new edges bridge old
    * components the propagation loop converges in a couple of rounds.
    * Callers persist the returned labels as the next day's input.
    */
  def incremental(labels: DataFrame, newPairs: DataFrame,
      srcCol: String, dstCol: String,
      maxIter: Int = 30, collectThreshold: Long = 4000000L,
      checkpointDir: Option[String] = None): DataFrame =
    connectedComponents(
      labels.select(col("id").as(srcCol), col("comp").as(dstCol))
        .unionByName(newPairs.select(col(srcCol), col(dstCol))),
      srcCol, dstCol, maxIter, collectThreshold, checkpointDir)

  /** Deletion/retraction for an existing labeling — the operation
    * [[incremental]] cannot express: removing a node can SPLIT a
    * component (drop the bridge and the two halves separate), and the
    * labels-as-edges compression only ever merges. Instead of replaying
    * the whole accumulated pair log, rebuild ONLY the components that
    * contained a deleted node:
    *
    *  1. affected components = the (tiny) set of `comp` values owning a
    *     deleted node — one semi-join against the labels;
    *  2. untouched components keep their labels verbatim (anti-join on
    *     the broadcast-small affected set);
    *  3. the pair log filters to the affected components' edges (one
    *     scan; components are closed under edges, so membership of ONE
    *     endpoint decides), minus every edge touching a deleted node,
    *     and connected components re-run on that slice alone.
    *
    * `pairs` must be the CURRENT graph's edge log — i.e. `labels ==
    * connectedComponents(pairs)` with earlier deletions already
    * filtered out (callers that tombstone should pre-exclude
    * tombstoned endpoints, as [[graft.jobs.CorpusJob]] does): a stale
    * edge to a previously-deleted node would break the closure that
    * step 3 relies on.
    *
    * Deleted nodes drop out of the labeling, as does any affected node
    * the deletion left edge-less (cc's "one row per node appearing in
    * any pair" contract) — so the result is exactly
    * `connectedComponents(pairs ∖ edgesTouching(deleted))`
    * (IncrementalProps property; DedupClusterSpec pins the
    * bridge-split case).
    *
    * Cost ∝ one pair-log filter scan + CC over the affected slice. The
    * affected-comp and deleted sets are usually tiny (near-dup
    * components are small; takedown batches are a sliver of the
    * corpus), so the auxiliary semi/anti joins broadcast — but that is
    * left to AQE's size check rather than forced, so one pathological
    * mega-component cannot OOM the driver with a hint.
    */
  def deleteNodes(labels: DataFrame, pairs: DataFrame, deleted: DataFrame,
      srcCol: String, dstCol: String,
      maxIter: Int = 30, collectThreshold: Long = 4000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    val del = deleted
      .select(col(deleted.columns.head).cast("long").as("__del_id")).distinct()
    val affected = labels
      .join(del, labels("id") === del("__del_id"), "left_semi")
      .select(col("comp").as("__aff_comp")).distinct()
    val keep = labels
      .join(affected, labels("comp") === affected("__aff_comp"), "left_anti")
    val members = labels
      .join(affected, labels("comp") === affected("__aff_comp"), "left_semi")
      .select(col("id").as("__member_id"))
    val slice = pairs
      .join(members, pairs(srcCol) === members("__member_id"), "left_semi")
    val clean = slice
      .join(del, slice(srcCol) === del("__del_id"), "left_anti")
    val clean2 = clean
      .join(del, clean(dstCol) === del("__del_id"), "left_anti")
    keep.unionByName(connectedComponents(
      clean2, srcCol, dstCol, maxIter, collectThreshold, checkpointDir))
  }

  /** Small-graph regime: collect the (deduped, symmetric) edge list and
    * run path-compressed union-find on the driver. 16 bytes/edge; the
    * default threshold collects ≤ 64 MB.
    */
  private def driverUnionFind(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    // <= not <: a self-loop pair (x, x) still registers node x (the
    // iterative regime emits it too — "one row per node in any pair")
    val arr = edges.filter(col("a") <= col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = new scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    arr.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      // union by min: the smaller id becomes the root, so the root IS
      // the component minimum (the public contract)
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    val rows = parent.keysIterator.map(id => (id, find(id))).toSeq
    import spark.implicits._
    rows.toDF("id", "comp")
  }

  /** Rounds the most recent [[iterative]] run took to converge on this
    * thread — observability for round-count drift (a labels-as-edges
    * incremental fold should converge in ~2-3 rounds; trending upward
    * at fixed input means the seeding or jump logic regressed, the
    * r8→r9 watch item). Diagnostic only: queries never read it.
    */
  private[graft] val lastIterativeRounds = new ThreadLocal[Integer]

  private def iterative(edges: DataFrame, maxIter: Int,
      checkpointDir: Option[String]): DataFrame = {
    // checkpoint (not persist): each round's plan embeds the previous
    // round's TWICE (once under the join, once under the union), so lineage
    // grows 2^rounds — Catalyst optimization and plan stringification OOM
    // long before the data does. Checkpointing truncates the logical plan
    // to the materialized RDD each round. Default is localCheckpoint
    // (executor-memory blocks, no extra IO); pass `checkpointDir` to make
    // each round durable instead (see connectedComponents scaladoc).
    val sc = edges.sparkSession.sparkContext
    val ckpt: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        sc.setCheckpointDir(dir)
        df => df.checkpoint(eager = true)
      case None => df => df.localCheckpoint(eager = true)
    }
    // Reliable-checkpoint hygiene (see connectedComponents scaladoc):
    // round k's files are deletable the moment round k+1's checkpoint is
    // materialized — everything downstream reads the newer files.
    // setCheckpointDir just created a fresh UUID subdir, so every name
    // under it belongs to THIS run and deletion can't touch a
    // concurrent run's checkpoints.
    val ckptRoot = checkpointDir.flatMap(_ => sc.getCheckpointDir).map { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      (p.getFileSystem(sc.hadoopConfiguration), p)
    }
    def listCkpts(): Set[String] = ckptRoot match {
      case Some((fs, root)) if fs.exists(root) =>
        fs.listStatus(root).map(_.getPath.getName).toSet
      case _ => Set.empty
    }
    def dropCkpts(names: Set[String]): Unit = ckptRoot.foreach { case (fs, root) =>
      // best-effort: a failed delete only leaves garbage, never breaks the run
      names.foreach(n => scala.util.Try(
        fs.delete(new org.apache.hadoop.fs.Path(root, n), true)))
    }
    //
    // Round structure (each round ≈ fixed scheduling cost, so fewer
    // rounds beat cheaper rounds):
    //  - seed: comp = min(id, min neighbor) — one aggregation, worth a
    //    full propagation round;
    //  - propagate: neighbor labels flow along every edge, min per node;
    //  - pointer-jump: comp := comp(comp) — label paths halve each
    //    round (Shiloach–Vishkin-style shortcutting), so convergence is
    //    O(log diameter) rounds instead of O(diameter); the jump join is
    //    labels⋈labels (node-count rows, much smaller than the edge join).
    var labels = ckpt(edges.groupBy("a").agg(min(col("b")).as("mb"))
      .select(col("a").as("id"), least(col("a"), col("mb")).as("comp")))
    var checksum = labelSum(labels)
    var lastCkpt = labels // the checkpointed frame each round builds on
    var prevCkptDirs = listCkpts() // the seed round's checkpoint files

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // (explicit aliases: labels derives from edges, so attribute-based
      // join conditions would be ambiguous self-join references)
      val prop = labels.as("l").join(edges.as("e"), col("l.id") === col("e.a"))
        .select(col("e.b").as("id"), col("l.comp").as("comp"))
      // checkpoint BEFORE the jump self-join: self-joining the raw
      // union+aggregate plan trips Union constraint rewriting on shared
      // attribute ids (Catalyst NoSuchElementException); over the
      // checkpointed LogicalRDD the self-join dedups cleanly, and the
      // jump's own lineage stays one join deep
      val next = ckpt(labels.select("id", "comp").union(prop)
        .groupBy("id").agg(min("comp").as("comp")))
      // comp(x) is a node (min over a neighborhood including real ids),
      // so the jump target row always exists — inner join is total
      val jumped = next.as("x").join(next.as("y"), col("x.comp") === col("y.id"))
        .select(col("x.id").as("id"), col("y.comp").as("comp"))
      val nextSum = labelSum(jumped)
      lastCkpt.unpersist()
      val nowDirs = listCkpts()
      dropCkpts(prevCkptDirs)          // previous round is now unreferenced
      prevCkptDirs = nowDirs -- prevCkptDirs // this round's new files
      lastCkpt = next
      labels = jumped
      converged = nextSum == checksum // min-prop only ever decreases the sum
      checksum = nextSum
      iter += 1
    }
    edges.unpersist()
    lastIterativeRounds.set(iter)
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — graph diameter exceeds the bound")
    labels
  }

  private def labelSum(labels: DataFrame): java.math.BigDecimal =
    labels.agg(sum(col("comp").cast("decimal(38,0)"))).head().getDecimal(0)

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
    // internal names that can't collide with caller columns: a docs
    // table whose id column is literally "id" (or that owns a "comp")
    // would otherwise hit AMBIGUOUS_REFERENCE / get silently dropped
    val comp = connectedComponents(pairs, srcCol, dstCol)
      .select(col("id").as("__cc_id"), col("comp").as("__cc_comp"))
    val w = Window.partitionBy(col("cluster_id"))
    val rank = Window.partitionBy(col("cluster_id"))
      .orderBy(col(lengthCol).desc, col(idCol).asc)
    docs.join(comp, docs(idCol) === comp("__cc_id"), "left")
      .withColumn("cluster_id", coalesce(col("__cc_comp"), col(idCol)))
      .drop("__cc_id", "__cc_comp")
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("is_canonical", row_number().over(rank) === 1)
  }
}
