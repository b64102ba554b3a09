package graft.operators

import graft.SparkSpec
import graft.functions.AuditableHash
import org.apache.spark.sql.functions._

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def randVecs(n: Int, dim: Int): Seq[(Long, Array[Float])] = {
    // deterministic "random" components from the hash family itself
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(d =>
        ((AuditableHash.h60(s"rpspec:$i:$d") % 2001L) - 1000L).toFloat / 1000f))
    }
  }

  test("native projection == plain-Scala reference (signs, quantize, dot)") {
    val dim = 8; val outDim = 4
    val vecs = randVecs(5, dim)
    val got = vecs.toDF("vec_id", "embedding")
      .select($"vec_id", RandomProjection.project($"embedding", outDim, dim).as("rp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val sgn = RandomProjection.signs(outDim, dim)
    vecs.foreach { case (id, v) =>
      val q = v.map(x => math.floor(x.toDouble * 1e6).toLong)
      val want = (0 until outDim).map(j =>
        (0 until dim).map(d => sgn(j)(d) * q(d)).sum)
      assert(got(id) == want, s"vec $id")
    }
  }

  test("unscorable vectors (ragged / null element) project to NULL") {
    val df = Seq(
      (1L, Array[java.lang.Float](1f, 2f, 3f, 4f)),
      (2L, Array[java.lang.Float](1f, 2f)),               // ragged
      (3L, Array[java.lang.Float](1f, null, 3f, 4f))      // null element
    ).toDF("vec_id", "embedding")
    val got = df.select($"vec_id",
        RandomProjection.project($"embedding".cast("array<float>"), 2, 4).as("rp"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!got(1L) && got(2L) && got(3L))
  }

  test("distance preservation: the scaled projected dist tracks the true dist (JL envelope)") {
    val dim = 64; val outDim = 16
    val vecs = randVecs(40, dim)
    val df = vecs.toDF("vec_id", "embedding")
      .select($"vec_id",
        graft.functions.VectorFunctions.quantize($"embedding").as("qv"),
        RandomProjection.project($"embedding", outDim, dim).as("rp"))
    val a = df.select($"vec_id".as("ia"), $"qv".as("qa"), $"rp".as("ra"))
    val b = df.select($"vec_id".as("ib"), $"qv".as("qb"), $"rp".as("rb"))
    val rows = a.join(b, $"ia" < $"ib")
      .select(
        RandomProjection.projDistSq($"ra", $"rb").as("dproj"),
        RandomProjection.projDistSq($"qa", $"qb").as("dtrue"))
      .collect()
    val ratios = rows.map(r =>
      r.getLong(0).toDouble / outDim / math.max(1L, r.getLong(1)).toDouble)
    // E[ratio] = 1; JL at outDim=16 is loose — assert the bulk lands
    // in a wide band and the MEDIAN is tight
    val sorted = ratios.sorted
    val median = sorted(sorted.length / 2)
    assert(median > 0.6 && median < 1.6, s"median ratio $median")
    assert(ratios.count(r => r > 0.2 && r < 3.0).toDouble / ratios.length >= 0.9,
      s"too many pairs outside the wide band")
  }

  test("shortlist = corpus size degenerates to exact brute force") {
    val vecs = randVecs(30, 16)
    val emb = vecs.toDF("vec_id", "embedding")
    val q = emb.filter($"vec_id" < 3)
    val got = RandomProjection.topKProjected(emb, q, "embedding", "vec_id",
        k = 5, outDim = 8, dim = 16, shortlist = 30)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val want = Similarity.bruteForceTopKQuantized(emb, q, "embedding", "vec_id", 5)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(got == want)
  }

  test("recall@10 on real harness embeddings at a 4x shortlist") {
    val emb = graft.Tables.embeddings(spark, sfDir())
    val q = emb.filter($"vec_id" < 5)
    val got = RandomProjection.topKProjected(emb, q, "embedding", "vec_id",
        k = 10, outDim = 32, dim = 64, shortlist = 80)
      .select($"query_id", $"id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopKQuantized(emb, q, "embedding", "vec_id", 10)
      .select($"query_id", $"id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got intersect exact).size.toDouble / exact.size
    info(s"recall@10 at outDim=32, shortlist=80: $recall")
    assert(recall >= 0.5, s"recall@10 $recall below floor")
  }
}
