package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked-retrieval quality metrics over results + graded judgments
  * (qrels) — the EVAL half a retrieval deployment runs beside its
  * serving path: recall telemetry (q129/q204) answers "did the ANN
  * dial lose true neighbors"; these answer "is the RANKING any good"
  * against human/synthetic relevance labels:
  *
  *  - **RR@k** (reciprocal rank): `10^6 DIV rank` of the first
  *    relevant hit in the top k (0 if none) — mean over queries = MRR.
  *  - **Hit@k** (success@k): 1 iff ≥ 1 relevant doc in the top k.
  *  - **nDCG@k** (Järvelin & Kekäläinen, TOIS 2002): graded gain
  *    discounted by rank, `DCG = Σ grade / log2(rank+1)` over the top
  *    k, normalized by the ideal DCG of the query's own judged grades.
  *
  * Exactness discipline (the gate convention): ranks and grades are
  * integers; the reciprocal enters as the RRF integer quotient, and
  * log2 rides the SAME Q10 fixed-point kernel as the BM25 idf
  * ([[graft.plans.Log2Fp]] — `graft_log2fp`, reproduced in the oracle
  * as the 10-step recursive CTE), so every per-query metric and every
  * corpus mean is an exact integer any engine re-derives. DCG
  * contributions are Q20: `grade · 2^30 DIV log2fp(rank+1)`
  * (rank 1 ⇒ grade · 2^20 exactly).
  *
  * Evaluation scope: the metric universe is the QRELS' query set (a
  * query the retriever returned nothing for scores 0 — skipping it
  * would flatter the system; a result row with no judgments for its
  * query is out of scope, the standard pooled-judgment convention).
  * Unjudged docs inside the top k contribute no gain (grade 0), the
  * trec_eval convention.
  *
  * Scale shape: one equi-join of results×qrels on (query, doc) — both
  * sides bounded (top-k per query; judgments are human-bounded per
  * query), the ideal-DCG window partitions BY QUERY over that query's
  * judgments, and everything aggregates straight back on query_id.
  * Nothing is ever corpus-sized; at 10⁶ eval queries this is three
  * hash-partitioned passes over `queries × (k + judged)` rows.
  */
object RetrievalMetrics {

  /** `graft_log2fp(rank + 1)` — the Q10 kernel, Column form. */
  private def log2fpOfRankPlus1(rank: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.Log2Fp(
      ColumnBridge.expression((rank + lit(1)).cast("long"))))
  }

  /** Per-query metrics over `results (queryCol, docCol, rankCol)` and
    * `qrels (queryCol, docCol, gradeCol)`: one row per JUDGED query —
    * `(queryCol, n_judged, first_rel_rank, rr_ppm, hit_k, dcg_fp,
    * idcg_fp, ndcg_ppm)`. Grades must be positive integers (≤ 10⁶ —
    * the Q20 envelope); ranks start at 1.
    *
    * Input contracts (the trec file-format invariants, stated because
    * a frame can violate what a file format cannot): `results` is a
    * ranked LIST — one row per (query, doc); `qrels` is a judgment
    * SET — one grade per (query, doc). Duplicate keys on either side
    * would double-count gains/judgments rather than fail loudly (both
    * joins are bounded, so callers with doubtful upstreams can afford
    * a dropDuplicates first).
    */
  def perQuery(results: DataFrame, qrels: DataFrame, k: Int,
      queryCol: String = "query_id", docCol: String = "doc_id",
      rankCol: String = "rank", gradeCol: String = "grade"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val res = results.select(col(queryCol), col(docCol),
        col(rankCol).cast("int").as("__rank"))
      .filter(col("__rank") >= 1 && col("__rank") <= k)
    val qr = qrels.select(col(queryCol), col(docCol),
        col(gradeCol).cast("long").as("__grade"))
      .filter(col("__grade") > 0 && col("__grade") <= 1000000L)

    // relevant hits inside the top k: bounded join (top-k × judged);
    // grade·2^30 stays far under signed-64 at the enforced grade cap
    val hits = res.join(qr, Seq(queryCol, docCol))
      .withColumn("__lg", log2fpOfRankPlus1(col("__rank")))
      .withColumn("__contrib", expr(s"__grade * ${1L << 30} DIV __lg"))
      .groupBy(col(queryCol))
      .agg(min(col("__rank")).as("first_rel_rank"),
        sum(col("__contrib")).as("__dcg"))

    // ideal DCG: the query's OWN grades, best-first, discounted at
    // positions 1..k — the per-query window runs over that query's
    // judgments only (human-bounded), never results or corpus rows
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col("__grade").desc, col(docCol))
    val ideal = qr.withColumn("__pos", row_number().over(w))
      .withColumn("__lg", log2fpOfRankPlus1(col("__pos")))
      .withColumn("__contrib", expr(s"__grade * ${1L << 30} DIV __lg"))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_judged"),
        sum(when(col("__pos") <= k, col("__contrib")).otherwise(0L))
          .as("idcg_fp"))

    ideal.join(hits, Seq(queryCol), "left")
      .select(col(queryCol), col("n_judged"), col("first_rel_rank"),
        coalesce(expr("1000000 DIV first_rel_rank"), lit(0L)).as("rr_ppm"),
        when(col("first_rel_rank").isNotNull, 1).otherwise(0).as("hit_k"),
        coalesce(col("__dcg"), lit(0L)).as("dcg_fp"),
        col("idcg_fp"),
        when(col("idcg_fp") > 0,
            expr("coalesce(__dcg, 0L) * 1000000 DIV idcg_fp"))
          .otherwise(0L).as("ndcg_ppm"))
  }

  /** Corpus-level summary of a [[perQuery]] frame (ONE row): exact
    * integer means — `MRR = Σ rr_ppm DIV n`, likewise nDCG and the
    * hit rate. Order-free by construction (integer sums, one final
    * division), the q129 micro-recall discipline.
    */
  def summary(pq: DataFrame): DataFrame =
    pq.agg(
      count(lit(1)).as("n_queries"),
      expr("sum(rr_ppm) DIV count(1)").as("mrr_ppm"),
      expr("sum(ndcg_ppm) DIV count(1)").as("mean_ndcg_ppm"),
      expr("sum(hit_k) * 1000000 DIV count(1)").as("hit_rate_ppm"))
}
