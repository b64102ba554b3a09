package graft.operators

import graft.TestSpark
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants of [[DedupCluster.connectedComponents]]
  * over random graphs:
  *  - both regimes (driver union-find / iterative propagation) produce
  *    identical labelings;
  *  - every label is the true component minimum (checked against a
    *   reference BFS on the driver).
  */
object DedupClusterProps extends Properties("DedupCluster") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private val graphGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 40)     // node id space
    m <- Gen.choose(1, 60)     // edges
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong)
      b <- Gen.choose(0L, n.toLong) if a != b
    } yield (a, b))
  } yield es

  private def referenceComponents(edges: List[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.HashMap.empty[Long, List[Long]]
    edges.foreach { case (a, b) =>
      adj(a) = b :: adj.getOrElse(a, Nil)
      adj(b) = a :: adj.getOrElse(b, Nil)
    }
    val seen = scala.collection.mutable.HashMap.empty[Long, Long]
    adj.keys.toSeq.sorted.foreach { start =>
      if (!seen.contains(start)) {
        // BFS; labels the whole component with its minimum (sorted start
        // order guarantees the first unseen node IS the component min)
        var frontier = List(start)
        seen(start) = start
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(adj(_)).filterNot(seen.contains)
          frontier.foreach(seen(_) = start)
        }
      }
    }
    seen.toMap
  }

  property("both regimes == reference BFS labeling") = forAll(graphGen) { es =>
    val pairs = es.toDF("id_a", "id_b")
    val want = referenceComponents(es)
    val viaCollect = DedupCluster.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val viaIter = DedupCluster.connectedComponents(pairs, "id_a", "id_b",
        collectThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    viaCollect == want && viaIter == want
  }
}
