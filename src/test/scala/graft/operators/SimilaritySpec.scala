package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("brute-force top-k: known geometry, deterministic ranks") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.8f, 0.6f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val q = corpus.filter($"vec_id" === 1L)
    val out = Similarity.bruteForceTopK(corpus, q, "embedding", "vec_id", k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(2L, 3L, 4L))
    assert(math.abs(out(0).getAs[Double]("cosine") - 0.8) < 1e-6)
  }

  test("LSH ANN achieves usable recall vs exact on the real embeddings") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter($"vec_id" < 5)
    val exact  = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", 10)
    val approx = Similarity.lshTopK(emb, queries, "embedding", "vec_id", 10,
      dim = 64, bits = 4, tables = 8)
    val recall = Similarity.recallAgainstExact(exact, approx)
      .agg(avg($"recall")).head().getDouble(0)
    // 8 tables × 4 bits on 500 weakly-clustered vectors
    assert(recall > 0.4, s"mean recall $recall too low")
  }

  test("quantized cosine ≈ float cosine (1e-4) and is exactly reproducible") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir).limit(50)
    val pairs = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        V.cosine(col("a.embedding"), col("b.embedding")).as("c1"),
        V.cosineQuantized(col("a.embedding"), col("b.embedding")).as("c2"))
    val maxDiff = pairs.agg(max(abs($"c1" - $"c2"))).head().getDouble(0)
    assert(maxDiff < 1e-4, s"quantization error $maxDiff")
  }
}
