package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: the same fixed-point recurrence in plain
    * Scala Maps — an implementation independent of every Spark
    * operator the production path uses, so a match means the
    * distributed join/agg assembly computes the declared arithmetic,
    * not merely "agrees with itself".
    */
  private def refRank(edges: Seq[(Long, Long)], iters: Int,
      dampNum: Long = 85L, dampDen: Long = 100L,
      scale: Long = 1L << 20): Map[Long, Long] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toLong
    val outdeg = es.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    val teleport = (dampDen - dampNum) * scale / dampDen
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(outdeg.contains).map(r).sum
      val contrib = r.collect { case (u, ru) if outdeg.contains(u) => u -> ru / outdeg(u) }
      val inbound = es.groupBy(_._2).map { case (d, g) =>
        d -> g.map(e => contrib(e._1)).sum
      }
      r = nodes.map(v => v ->
        (teleport + dampNum * (inbound.getOrElse(v, 0L) + dangling / n) / dampDen)
      ).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LinkGraph.pageRank(edges.toDF("s", "d"), "s", "d", iters = iters)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap

  test("pageRank matches the driver-side fixed-point reference, " +
      "including a dangling node") {
    // 1->2, 1->3, 2->3, 4 dangling-in-only? use: 3->1 cycle + 4 with
    // only an in-edge (dangling: no out-edges)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (2L, 4L))
    for (iters <- Seq(1, 3, 5)) {
      val got = run(edges, iters)
      val want = refRank(edges, iters)
      assert(got == want, s"iters=$iters: $got != $want")
    }
    // authority sanity on the 5-round result: 3 collects from 1 and 2
    // and must outrank the leaf 4 (one inbound from a split vote)
    val r5 = run(edges, 5)
    assert(r5(3L) > r5(4L) && r5(3L) > r5(2L))
  }

  test("pageRank is partitioning-invariant and dedupes edge multiplicity") {
    val edges = (1L to 40L).map(i => (i, i % 7 + 100L)) ++
      Seq((100L, 1L), (101L, 2L), (102L, 3L))
    val dup = edges ++ edges ++ edges // multiplicity must not triple contribs
    val base = run(edges, 4)
    val viaDup = LinkGraph.pageRank(
        dup.toDF("s", "d").repartition(7), "s", "d", iters = 4)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(viaDup == base)
    assert(base == refRank(edges, 4))
  }

  test("pageRank rejects bad parameters and empty graphs") {
    intercept[IllegalArgumentException] {
      LinkGraph.pageRank(Seq((1L, 2L)).toDF("s", "d"), "s", "d", iters = 0)
    }
    intercept[IllegalArgumentException] {
      LinkGraph.pageRank(Seq.empty[(Long, Long)].toDF("s", "d"), "s", "d")
    }
  }
}
