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

  /** [[bruteForceTopK]] with fixed-point cosine and per-row
    * precomputation: corpus + queries quantize and norm once; each of
    * the N·Q scored pairs costs one integer dot product. Values
    * identical to `score = cosineQuantized`.
    */
  def bruteForceTopKQuantized(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int): DataFrame = {
    def pre(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id), V.quantize(col(vecCol)).as(s"${id}_qv"))
        .withColumn(s"${id}_n2", V.dotQ(col(s"${id}_qv"), col(s"${id}_qv")))
    val c = pre(corpus, "id")
    val q = pre(queries, "query_id")
    val scored = c.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("cosine", round(V.cosineFromQuantized(
        col("id_qv"), col("query_id_qv"), col("id_n2"), col("query_id_n2")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "id", "cosine", "rank")
  }

  /** Hyperplane-LSH bucket assignment as a relational matrix multiply:
    * explode the vector to (id, dim, x) rows, broadcast-join the
    * (table, bit, dim, coef) plane matrix, aggregate sign bits, pack
    * buckets. Everything stays in whole-stage codegen (a literal
    * plane-array expression form would evaluate its lambdas
    * interpreted, which dominates runtime).
    * Returns (id, vec, table, bucket).
    */
  def lshBucketsDf(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      bits: Int,
      tables: Int,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val planes = (for {
      t <- 0 until tables
      b <- 0 until bits
      d <- 0 until dim
    } yield (t, b, d, rnd.nextGaussian())).toDF("t", "b", "d", "coef")

    val exploded = df.select(col(idCol).as("id"), col(vecCol).as("v"),
        posexplode(col(vecCol).cast("array<double>")))
      .withColumnRenamed("pos", "d").withColumnRenamed("col", "x")
    val computed = exploded.join(broadcast(planes), "d")
      .groupBy(col("id"), col("t"), col("b"))
      .agg(sum(col("x") * col("coef")).as("dot"))
      .withColumn("bit", when(col("dot") >= 0, 1).otherwise(0))
      .groupBy(col("id"), col("t"))
      .agg(sum(col("bit") * pow(lit(2.0), col("b")).cast("int")).cast("int").as("bucket"))
    // null/empty vectors explode to zero rows and would vanish from the
    // index entirely (a query row would silently get no candidates);
    // give every (id, table) a bucket — the all-ones bucket is what a
    // zero vector's sign bits (dot 0 >= 0) produce anyway
    val allTables = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("t", explode(array((0 until tables).map(t => lit(t)): _*)))
    allTables.join(computed, Seq("id", "t"), "left_outer")
      .withColumn("bucket", coalesce(col("bucket"), lit((1 << bits) - 1)))
      .withColumnRenamed("t", "table")
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
    val spark = corpus.sparkSession
    def bucketed(df: DataFrame, id: String, vec: String): DataFrame =
      lshBucketsDf(spark,
        df.select(col(id), col(vec)), id, vec, dim, bits, tables)
        .select(col("id").as(id), col("v").as(vec), col("table"), col("bucket"))

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
