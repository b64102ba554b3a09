package graft.operators

import graft.SparkSpec

class RetrievalMetricsSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala twin of the Q20 DCG contribution (differential against
    * the in-plan Log2Fp kernel).
    */
  private def c(grade: Long, rank: Long): Long =
    grade * (1L << 30) / graft.plans.Log2Fp.log2Fp(rank + 1)

  private def resultsFx = Seq(
    (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), // q1: 11 rel@2, 12 rel@3
    (2L, 20L, 1), (2L, 21L, 2),               // q2: nothing relevant
    (9L, 90L, 1)                              // q9: unjudged query
  ).toDF("query_id", "doc_id", "rank")

  private def qrelsFx = Seq(
    (1L, 11L, 2L), (1L, 12L, 1L), (1L, 13L, 3L), // q1: best doc missed
    (2L, 29L, 1L),                               // q2: judged, missed
    (3L, 30L, 2L)                                // q3: retriever empty
  ).toDF("query_id", "doc_id", "grade")

  test("perQuery matches the hand-computed trec arithmetic (graded gains, Q10 log2 discount)") {
    val got = RetrievalMetrics.perQuery(resultsFx, qrelsFx, k = 10)
      .orderBy("query_id").collect()
    assert(got.length == 3, "metric universe is the QRELS query set")
    val q1 = got(0)
    val dcg1 = c(2, 2) + c(1, 3)
    val idcg1 = c(3, 1) + c(2, 2) + c(1, 3) // ideal: grades 3, 2, 1
    assert(q1.getAs[Long]("n_judged") == 3L)
    assert(q1.getAs[Int]("first_rel_rank") == 2)
    assert(q1.getAs[Long]("rr_ppm") == 500000L)
    assert(q1.getAs[Int]("hit_k") == 1)
    assert(q1.getAs[Long]("dcg_fp") == dcg1)
    assert(q1.getAs[Long]("idcg_fp") == idcg1)
    assert(q1.getAs[Long]("ndcg_ppm") == dcg1 * 1000000L / idcg1)
    // q2: judged but nothing relevant retrieved → zeros, NOT skipped
    val q2 = got(1)
    assert(q2.isNullAt(q2.fieldIndex("first_rel_rank")))
    assert(q2.getAs[Long]("rr_ppm") == 0L && q2.getAs[Int]("hit_k") == 0)
    assert(q2.getAs[Long]("dcg_fp") == 0L && q2.getAs[Long]("ndcg_ppm") == 0L)
    assert(q2.getAs[Long]("idcg_fp") == c(1, 1))
    // q3: the retriever returned NOTHING — scores zero, not absent
    // (skipping it would flatter the system)
    assert(got(2).getAs[Long]("query_id") == 3L)
    assert(got(2).getAs[Long]("ndcg_ppm") == 0L)
  }

  test("rank-1 hit contributes exactly grade·2^20; a fully ideal ranking scores ndcg = 1e6") {
    val results = Seq((1L, 5L, 1), (1L, 6L, 2)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 5L, 3L), (1L, 6L, 1L)).toDF("query_id", "doc_id", "grade")
    val r = RetrievalMetrics.perQuery(results, qrels, k = 10).head()
    assert(r.getAs[Long]("dcg_fp") == 3L * (1L << 20) + c(1, 2))
    assert(r.getAs[Long]("ndcg_ppm") == 1000000L)
    assert(r.getAs[Long]("rr_ppm") == 1000000L)
  }

  test("k cuts both the gain and the ideal; judged docs beyond k still count toward n_judged") {
    val results = Seq((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3))
      .toDF("query_id", "doc_id", "rank")
    val qrels = (1L to 5L).map(d => (1L, d, 1L))
      .toDF("query_id", "doc_id", "grade")
    val r = RetrievalMetrics.perQuery(results, qrels, k = 2).head()
    assert(r.getAs[Long]("dcg_fp") == c(1, 1) + c(1, 2))
    assert(r.getAs[Long]("idcg_fp") == c(1, 1) + c(1, 2))
    assert(r.getAs[Long]("ndcg_ppm") == 1000000L)
    assert(r.getAs[Long]("n_judged") == 5L)
  }

  test("summary: exact integer means over the judged-query set") {
    val s = RetrievalMetrics.summary(
      RetrievalMetrics.perQuery(resultsFx, qrelsFx, k = 10)).head()
    assert(s.getAs[Long]("n_queries") == 3L)
    assert(s.getAs[Long]("mrr_ppm") == 500000L / 3L)
    assert(s.getAs[Long]("hit_rate_ppm") == 1000000L / 3L)
  }

  test("dials and hygiene: k validated; non-positive and oversized grades drop") {
    intercept[IllegalArgumentException] {
      RetrievalMetrics.perQuery(resultsFx, qrelsFx, k = 0)
    }
    val qrels = Seq((1L, 11L, 0L), (1L, 12L, -3L), (1L, 13L, 2000000L))
      .toDF("query_id", "doc_id", "grade")
    assert(RetrievalMetrics.perQuery(resultsFx, qrels, k = 10).count() == 0L)
  }
}
