package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupClusterSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: transitive closure across chained pairs") {
    // 1-2, 2-3 chain one component; 10-11 another; 20 never paired
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comp = DedupCluster.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components: long path converges (diameter rounds)") {
    val n = 12 // diameter 12 path: 0-1-2-...-12
    val pairs = (0 until n).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    val comp = DedupCluster.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(comp.values.toSet == Set(0L))
    assert(comp.size == n + 1)
  }

  test("iterative regime == driver union-find regime, exactly") {
    // chains + a dense clique + singleton pairs; force the iterative
    // path with collectThreshold = 0 and compare to the collect path
    val pairs = ((0 until 20).map(i => (i.toLong, i + 1L)) ++
      Seq((100L, 103L), (101L, 103L), (102L, 103L), (100L, 102L), (200L, 201L)))
      .toDF("id_a", "id_b")
    val viaCollect = DedupCluster.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val viaIter = DedupCluster.connectedComponents(pairs, "id_a", "id_b",
        collectThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaCollect == viaIter)
    assert(viaCollect(20L) == 0L && viaCollect(103L) == 100L && viaCollect(201L) == 200L)
  }

  test("reliable-checkpoint regime == localCheckpoint regime, exactly") {
    // same graph as the iterative differential; checkpointDir switches
    // per-round lineage truncation to durable checkpoint() files — the
    // result (and convergence behavior) must be identical
    val pairs = ((0 until 20).map(i => (i.toLong, i + 1L)) ++
      Seq((100L, 103L), (101L, 103L), (102L, 103L), (100L, 102L), (200L, 201L)))
      .toDF("id_a", "id_b")
    val ckptDir = tmpDir("cc-ckpt")
    val viaLocal = DedupCluster.connectedComponents(pairs, "id_a", "id_b",
        collectThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    val viaReliable = DedupCluster.connectedComponents(pairs, "id_a", "id_b",
        collectThreshold = 0L, checkpointDir = Some(ckptDir))
      .as[(Long, Long)].collect().toMap
    assert(viaReliable == viaLocal)
    // the flag actually wrote durable checkpoint files
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, "no reliable checkpoint files written")
    // per-round hygiene: the 21-node chain takes several rounds, but
    // every superseded round's rdd-* directory is deleted as the loop
    // advances — only the FINAL round's checkpoint (which the returned
    // frame reads) may remain
    import scala.jdk.CollectionConverters._
    val rddDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
      .iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("rdd-"))
      .toSeq
    assert(rddDirs.size == 1,
      s"superseded round checkpoints not cleaned: ${rddDirs.mkString(", ")}")
  }

  test("incremental CC == full CC: new edges bridge old components correctly") {
    // old graph: two chains (1-2-3, 10-11) and a singleton pair (20,21);
    // the increment bridges chain 1 to chain 2 (3,10), adds a node to
    // the third component (21,22), and opens a brand-new one (30,31)
    val oldPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("id_a", "id_b")
    val newPairs = Seq((3L, 10L), (21L, 22L), (30L, 31L)).toDF("id_a", "id_b")
    val all = oldPairs.unionByName(newPairs)

    val oldLabels = DedupCluster.connectedComponents(oldPairs, "id_a", "id_b")
    val inc = DedupCluster.incremental(oldLabels, newPairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val full = DedupCluster.connectedComponents(all, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(inc == full)
    assert(inc(11L) == 1L, "bridged components must re-label to the joint minimum")
    assert(inc(22L) == 20L && inc(30L) == 30L)

    // and through the iterative regime (threshold 0 forces it)
    val incIter = DedupCluster.incremental(
        DedupCluster.connectedComponents(oldPairs, "id_a", "id_b", collectThreshold = 0L),
        newPairs, "id_a", "id_b", collectThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(incIter == full)
    // round-count observability (the r8→r9 watch item): the incremental
    // fold's input is labels-as-edges (diameter <= 2) plus a handful of
    // bridges — seed + pointer-jump must converge in a few rounds, and
    // trending above this bound at fixed input means seeding drifted
    val rounds = DedupCluster.lastIterativeRounds.get
    assert(rounds != null && rounds <= 3,
      s"incremental CC took $rounds rounds on a diameter-2 label graph")
  }

  test("connected components: edge direction is irrelevant") {
    val a = Seq((5L, 1L), (1L, 9L)).toDF("id_a", "id_b") // min in the middle
    val comp = DedupCluster.connectedComponents(a, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 5L -> 1L, 9L -> 1L))
  }

  test("maxIter bound throws instead of returning a partial clustering") {
    val pairs = (0 until 40).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      DedupCluster.connectedComponents(pairs, "id_a", "id_b", maxIter = 2,
        collectThreshold = 0L)
    }
  }

  test("clusters: exactly one canonical per cluster, longest text wins") {
    val docs = Seq(
      (1L, "short", 5L), (2L, "the longest text here", 21L), (3L, "mid one", 7L),
      (4L, "unpaired", 8L))
      .toDF("doc_id", "text", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = DedupCluster.clusters(docs, pairs, "doc_id", "id_a", "id_b", "n_chars")
      .select("doc_id", "cluster_id", "cluster_size", "is_canonical")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 1L, 3L, false), (2L, 1L, 3L, true), (3L, 1L, 3L, false),
      (4L, 4L, 1L, true)))
    // invariant: one canonical per cluster over the harness documents too
    val hd = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val hp = Dedup.chunkOverlapPairs(hd, "text", "doc_id", minShared = 1)
      .filter(col("containment") >= 0.5)
    val hc = DedupCluster.clusters(hd, hp, "doc_id", "id_a", "id_b", "n_chars")
    val perCluster = hc.groupBy("cluster_id")
      .agg(sum(when(col("is_canonical"), 1).otherwise(0)).as("n_canon"))
      .filter(col("n_canon") =!= 1).count()
    assert(perCluster == 0)
  }

  test("deleteNodes: removing a bridge SPLITS the component; untouched comps keep labels") {
    // 1-2-3-4-5 chain bridged by 3, plus a separate comp {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val labels = DedupCluster.connectedComponents(pairs, "id_a", "id_b")
    val afterDel = DedupCluster.deleteNodes(labels, pairs,
        Seq(3L).toDF("doc_id"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    // the chain splits into {1,2} and {4,5}; 3 is gone; {10,11} untouched
    assert(afterDel == Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L,
      10L -> 10L, 11L -> 10L))
    // == the from-scratch build without the deleted node's edges
    val scratch = DedupCluster.connectedComponents(
        pairs.filter(col("id_a") =!= 3L && col("id_b") =!= 3L), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(afterDel == scratch)
    // deleting a leaf leaves its partner edge-less: both drop out
    val leafDel = DedupCluster.deleteNodes(labels, pairs,
        Seq(11L).toDF("doc_id"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(leafDel == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("self-loop pairs register their node in BOTH regimes") {
    val pairs = Seq((5L, 5L), (1L, 2L)).toDF("id_a", "id_b")
    val viaCollect = DedupCluster.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val viaIter = DedupCluster.connectedComponents(pairs, "id_a", "id_b",
        collectThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaCollect == Map(5L -> 5L, 1L -> 1L, 2L -> 1L))
    assert(viaIter == viaCollect)
  }
}
