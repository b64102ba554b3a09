package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.lit

class MmrSpec extends SparkSpec {
  import spark.implicits._

  /** Query sits on axis 0; cluster A = three near-identical vectors
    * hugging the query; cluster B = one moderately relevant vector off
    * on axis 1. Cosine top-k would return A, A', A'' first; MMR at
    * λ=0.5 must interleave B ahead of the redundant A copies.
    */
  private def fixture = Seq(
    (0L, Array(1.00f, 0.00f, 0f, 0f)), // the query
    (1L, Array(0.99f, 0.10f, 0f, 0f)), // A
    (2L, Array(0.98f, 0.12f, 0f, 0f)), // A'
    (3L, Array(0.97f, 0.14f, 0f, 0f)), // A''
    (4L, Array(0.90f, 0.00f, 0.436f, 0f)) // B: nearly as relevant, diverse axis
  ).toDF("vec_id", "embedding")

  test("pure relevance (lambda = 1e6) degenerates to cosine top-k order") {
    val emb = fixture
    val got = Mmr.select(emb, emb.filter($"vec_id" === 0), "embedding", "vec_id",
        nCandidates = 4, k = 4, lambdaPpm = 1000000L)
      .orderBy("mmr_rank").select("id").as[Long].collect().toSeq
    val topk = Similarity.bruteForceTopKQuantized(
        emb, emb.filter($"vec_id" === 0), "embedding", "vec_id", 4)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    assert(got == topk)
  }

  test("diversity bites: the diverse cluster jumps the redundant copies") {
    val emb = fixture
    val got = Mmr.select(emb, emb.filter($"vec_id" === 0), "embedding", "vec_id",
        nCandidates = 4, k = 3, lambdaPpm = 500000L)
      .orderBy("mmr_rank").collect()
    assert(got(0).getAs[Long]("id") == 1L)        // first pick: pure relevance
    assert(got(0).getAs[Long]("msim_ppm") == 0L)  // by definition
    assert(got(1).getAs[Long]("id") == 4L,        // B beats A'/A'' despite lower rel
      got.map(_.toString).mkString(", "))
    // msim recorded at pick time is the sim to the already-picked set
    assert(got(1).getAs[Long]("msim_ppm") > 0L)
    assert(got(2).getAs[Long]("id") == 2L)        // then back to the next A copy
  }

  test("exact-duplicate candidates tie-break to the lower id") {
    val emb = Seq(
      (0L, Array(1f, 0f)), (5L, Array(0.9f, 0.1f)),
      (7L, Array(0.9f, 0.1f)), (6L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val got = Mmr.select(emb, emb.filter($"vec_id" === 0), "embedding", "vec_id",
        nCandidates = 3, k = 3, lambdaPpm = 700000L)
      .orderBy("mmr_rank").select("id").as[Long].collect().toSeq
    assert(got == Seq(5L, 6L, 7L))
  }

  test("batch form == driver form per query (the two-surface contract)") {
    // 12 vectors in general position + two query vectors
    val emb = ((0 until 12).map { i =>
      (100L + i, Array(1f + i * 0.1f, (i % 5) * 0.3f, (i % 3) * 0.7f, 0.2f * i))
    } ++ Seq((1L, Array(1f, 0.1f, 0.5f, 0f)), (2L, Array(0.2f, 1f, 0f, 0.3f))))
      .toDF("vec_id", "embedding")
    val batch = Mmr.selectBatch(emb, emb.filter($"vec_id" <= 2),
        "embedding", "vec_id", nCandidates = 8, k = 4, lambdaPpm = 600000L)
      .orderBy("query_id", "mmr_rank")
      .select("query_id", "mmr_rank", "id", "rel_ppm", "msim_ppm", "score_fp")
      .collect().map(_.toString).toSeq
    val perQuery = Seq(1L, 2L).flatMap { q =>
      Mmr.select(emb, emb.filter($"vec_id" === q), "embedding", "vec_id",
          nCandidates = 8, k = 4, lambdaPpm = 600000L)
        .withColumn("query_id", lit(q))
        .orderBy("mmr_rank")
        .select("query_id", "mmr_rank", "id", "rel_ppm", "msim_ppm", "score_fp")
        .collect().map(_.toString).toSeq
    }
    assert(batch == perQuery)
  }

  test("lambda = 0 (pure diversity): first pick is still pure relevance; batch == driver") {
    val emb = fixture
    val driver = Mmr.select(emb, emb.filter($"vec_id" === 0), "embedding", "vec_id",
        nCandidates = 4, k = 3, lambdaPpm = 0L)
      .orderBy("mmr_rank").collect()
    // round 1 must be the relevance argmax (id 1), NOT the lowest id —
    // at λ=0 every round-1 objective is 0 and a naive argmax degenerates
    assert(driver(0).getAs[Long]("id") == 1L)
    val batch = Mmr.selectBatch(emb, emb.filter($"vec_id" === 0), "embedding", "vec_id",
        nCandidates = 4, k = 3, lambdaPpm = 0L)
      .orderBy("mmr_rank")
      .select("mmr_rank", "id", "rel_ppm", "msim_ppm", "score_fp")
      .collect().map(_.toString).toSeq
    assert(batch == driver.map(r => org.apache.spark.sql.Row(
      r.getAs[Int]("mmr_rank"), r.getAs[Long]("id"), r.getAs[Long]("rel_ppm"),
      r.getAs[Long]("msim_ppm"), r.getAs[Long]("score_fp")).toString).toSeq)
  }

  test("batch form is partitioning-invariant (exact integer objective, no order dependence)") {
    val emb = ((0 until 20).map { i =>
      (50L + i, Array(0.5f + i * 0.02f, (i % 7) * 0.1f, (i % 4) * 0.25f, 0.05f * i))
    } :+ ((1L, Array(1f, 0.2f, 0.3f, 0.1f)))).toDF("vec_id", "embedding")
    def run(df: org.apache.spark.sql.DataFrame): Seq[String] =
      Mmr.selectBatch(df, df.filter($"vec_id" === 1), "embedding", "vec_id",
          nCandidates = 10, k = 5)
        .orderBy("query_id", "mmr_rank").collect().map(_.toString).toSeq
    assert(run(emb) == run(emb.repartition(7)))
  }

  test("batch form: a query exhausting its candidates emits what it has") {
    val emb = Seq(
      (1L, Array(1f, 0f)), (10L, Array(0.9f, 0.1f)), (11L, Array(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val got = Mmr.selectBatch(emb, emb.filter($"vec_id" === 1),
      "embedding", "vec_id", nCandidates = 4, k = 4)
    assert(got.count() == 2L) // only two non-query vectors exist
  }

  test("select rejects a multi-row query frame (the single-query contract, ADVICE r13)") {
    val emb = fixture
    val e = intercept[IllegalArgumentException] {
      Mmr.select(emb, emb.filter($"vec_id" <= 1), "embedding", "vec_id",
        nCandidates = 4, k = 2)
    }
    assert(e.getMessage.contains("one query row"))
  }

  test("candidate seam: caller-supplied candidates == the built-in cut on both surfaces") {
    val emb = ((0 until 12).map { i =>
      (100L + i, Array(1f + i * 0.1f, (i % 5) * 0.3f, (i % 3) * 0.7f, 0.2f * i))
    } ++ Seq((1L, Array(1f, 0.1f, 0.5f, 0f)), (2L, Array(0.2f, 1f, 0f, 0.3f))))
      .toDF("vec_id", "embedding")
    val cands = Similarity.bruteForceTopKQuantized(
        emb, emb.filter($"vec_id" <= 2), "embedding", "vec_id", 8)
      .select($"query_id", $"id", Mmr.relPpm($"cosine").as("rel_ppm"))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy("query_id", "mmr_rank")
        .select("query_id", "mmr_rank", "id", "rel_ppm", "msim_ppm", "score_fp")
        .collect().map(_.toString).toSeq
    assert(rows(Mmr.selectBatchFromCandidates(emb, cands, "embedding", "vec_id",
        k = 4, lambdaPpm = 600000L)) ==
      rows(Mmr.selectBatch(emb, emb.filter($"vec_id" <= 2), "embedding", "vec_id",
        nCandidates = 8, k = 4, lambdaPpm = 600000L)))
    // driver surface through the same seam
    val c1 = cands.filter($"query_id" === 1L).select($"id", $"rel_ppm")
    assert(Mmr.selectFromCandidates(emb, c1, "embedding", "vec_id",
        k = 4, lambdaPpm = 600000L).orderBy("mmr_rank").collect().map(_.toString).toSeq ==
      Mmr.select(emb, emb.filter($"vec_id" === 1L), "embedding", "vec_id",
        nCandidates = 8, k = 4, lambdaPpm = 600000L)
        .orderBy("mmr_rank").collect().map(_.toString).toSeq)
  }

  test("candidate seam enforces the bounds: duplicates and oversized sets fail loudly") {
    val emb = fixture
    val dup = Seq((9L, 1L, 900000L), (9L, 1L, 900000L), (9L, 2L, 800000L))
      .toDF("query_id", "id", "rel_ppm")
    val e1 = intercept[IllegalArgumentException] {
      Mmr.selectBatchFromCandidates(emb, dup, "embedding", "vec_id", k = 2)
    }
    assert(e1.getMessage.contains("duplicate"))
    val big = (1L to 200L).map(i => (9L, i, 1000000L - i))
      .toDF("query_id", "id", "rel_ppm")
    val e2 = intercept[IllegalArgumentException] {
      Mmr.selectBatchFromCandidates(emb, big, "embedding", "vec_id", k = 2)
    }
    assert(e2.getMessage.contains("candidates"))
    val e3 = intercept[IllegalArgumentException] {
      Mmr.selectFromCandidates(emb,
        big.select($"id", $"rel_ppm"), "embedding", "vec_id", k = 2)
    }
    assert(e3.getMessage.contains("candidate"))
  }

  test("candidate seam: an unresolvable candidate id scores msim = 0 on BOTH " +
      "surfaces — never silently dropped (ADVICE r14)") {
    val emb = fixture // corpus ids 0–4; 99 does NOT resolve
    val cands = Seq((1L, 990000L), (2L, 985000L), (99L, 880000L), (4L, 900000L))
      .toDF("id", "rel_ppm")
    val driver = Mmr.selectFromCandidates(emb, cands, "embedding", "vec_id",
        k = 4, lambdaPpm = 500000L)
      .orderBy("mmr_rank")
      .select("mmr_rank", "id", "rel_ppm", "msim_ppm", "score_fp")
      .collect().map(_.toString).toSeq
    val batch = Mmr.selectBatchFromCandidates(emb,
        cands.select(lit(7L).as("query_id"), $"id", $"rel_ppm"),
        "embedding", "vec_id", k = 4, lambdaPpm = 500000L)
      .orderBy("mmr_rank")
      .select("mmr_rank", "id", "rel_ppm", "msim_ppm", "score_fp")
      .collect().map(_.toString).toSeq
    assert(driver == batch, s"surfaces diverge:\n$driver\n$batch")
    // the planted id is PRESENT (all 4 candidates selected at k = 4)
    // and scored maximally diverse — msim exactly 0 past round 1
    val planted = Mmr.selectBatchFromCandidates(emb,
        cands.select(lit(7L).as("query_id"), $"id", $"rel_ppm"),
        "embedding", "vec_id", k = 4, lambdaPpm = 500000L)
      .filter($"id" === 99L).collect()
    assert(planted.length == 1, "unresolvable candidate vanished from the batch greedy")
    assert(planted.head.getAs[Long]("msim_ppm") == 0L)
    assert(planted.head.getAs[Int]("mmr_rank") > 1)
  }

  test("k exceeding the candidate pool returns the whole pool; dials are validated") {
    val emb = fixture
    val got = Mmr.select(emb, emb.filter($"vec_id" === 0), "embedding", "vec_id",
      nCandidates = 4, k = 4)
    assert(got.count() == 4L)
    intercept[IllegalArgumentException] {
      Mmr.select(emb, emb, "embedding", "vec_id", nCandidates = 200, k = 5)
    }
    intercept[IllegalArgumentException] {
      Mmr.select(emb, emb, "embedding", "vec_id", nCandidates = 4, k = 5, lambdaPpm = 2000000L)
    }
  }
}
