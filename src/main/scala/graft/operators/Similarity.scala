package graft.operators

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]] is the exact baseline: broadcast the (small)
  *    query set against the corpus, score every pair, per-query top-k.
  *    Linear scan — correct at any scale, one broadcast + one shuffle
  *    (the per-query top-k), no cross-corpus shuffle.
  *  - [[lshTopK]] is the scale path: both sides hash into hyperplane
  *    sign buckets (multi-probe via several independent tables), only
  *    same-bucket pairs are scored. Corpus bucketing is a narrow map;
  *    the join shuffles on (table, bucket) — at 100 TB this is the
  *    difference between scoring ~N·Q pairs and ~N·Q/2^bits.
  *
  * Cosine is rounded to 6 dp *before* ranking so ties break identically
  * everywhere (rank order: score desc, then id asc — fully deterministic).
  */
object Similarity {

  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      score: (Column, Column) => Column = V.cosine): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("cosine", round(score(col("cv"), col("qv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "id", "cosine", "rank")
  }

  /** LSH-bucketed ANN: `tables` independent hash tables of `bits`
    * hyperplane bits each. A corpus row is scored for a query iff they
    * collide in at least one table. Returns the same schema as
    * [[bruteForceTopK]] (per-query top-k among candidates).
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      dim: Int,
      bits: Int = 8,
      tables: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(
        col(id), col(vec),
        posexplode(array((0 until tables).map(t =>
          V.lshBucket(col(vec), dim, bits, seed = 1000L + t)): _*)))
        .withColumnRenamed("pos", "table")
        .withColumnRenamed("col", "bucket")

    val c = bucketed(corpus.select(col(idCol).as("id"), col(vecCol).as("cv")), "id", "cv")
      .as("c")
    val q = bucketed(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "query_id", "qv").as("q")

    val cand = c.join(broadcast(q),
        col("c.table") === col("q.table") && col("c.bucket") === col("q.bucket") &&
        col("c.id") =!= col("q.query_id"))
      .select(col("c.id").as("id"), col("c.cv").as("cv"),
        col("q.query_id").as("query_id"), col("q.qv").as("qv"))
      .dropDuplicates("id", "query_id")

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    cand
      .withColumn("cosine", round(V.cosine(col("cv"), col("qv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "id", "cosine", "rank")
  }

  /** Exact-recall harness for the approximate path: fraction of
    * brute-force top-k pairs the LSH variant recovered, per query.
    */
  def recallAgainstExact(exact: DataFrame, approx: DataFrame): DataFrame = {
    val hits = exact.as("e").join(approx.as("a"),
        col("e.query_id") === col("a.query_id") && col("e.id") === col("a.id"),
        "left_outer")
      .groupBy(col("e.query_id").as("query_id"))
      .agg((sum(when(col("a.id").isNotNull, 1).otherwise(0)).cast("double") /
        count(lit(1))).as("recall"))
    hits
  }
}
