package graft.operators

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path beside hyperplane LSH ([[Similarity.lshTopK]]).
  *
  * Index: `nCentroids` coarse centroids (a deterministic hash-sample of
  * the corpus — no k-means iterations, no RNG at runtime); every vector
  * is assigned to its nearest centroid (one broadcast join; centroid
  * count is small by construction). At 100 TB the assignment is a
  * narrow map over the corpus and the index is just a partitioning
  * column — write `partitionBy("centroid_id")` and probes prune files.
  *
  * Query: score the query against all centroids (tiny), keep `nProbe`
  * best cells, then scan only those cells' vectors. Work drops from
  * O(N·Q) to O(N·Q·nProbe/nCentroids) at the cost of recall near cell
  * borders — the classic IVF trade.
  */
object IvfIndex {

  /** Deterministic centroid pick: the `nCentroids` corpus vectors with
    * the smallest auditable hash of `"ivf:" + id`
    * ([[graft.functions.AuditableHash.h60]] — md5-derived, so the SQL
    * oracle reproduces the same pick). Stable across runs/executors. The
    * top-k runs distributed (TakeOrdered: per-partition heaps, no
    * global sort); only the winning `nCentroids` vectors — the coarse
    * codebook, which every consumer broadcasts anyway — come to the
    * driver, where the dense `centroid_id` is a local array index
    * rather than a single-partition global window.
    */
  def centroids(df: DataFrame, idCol: String, vecCol: String, nCentroids: Int): DataFrame = {
    val spark = df.sparkSession
    val picked = df
      .select(col(idCol).as("centroid_pick_id"), col(vecCol).as("centroid_vec"))
      .withColumn("__h",
        graft.functions.AuditableHash.h60(
          concat(lit("ivf:"), col("centroid_pick_id").cast("string"))))
      .orderBy(col("__h"))
      .limit(nCentroids)
    val vecType = picked.schema("centroid_vec").dataType
    val rows = picked.collect().zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(r.get(r.fieldIndex("centroid_vec")), i)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("centroid_vec", vecType),
        org.apache.spark.sql.types.StructField("centroid_id",
          org.apache.spark.sql.types.IntegerType, nullable = false))))
  }

  private def withQuant(df: DataFrame, vecCol: String, prefix: String): DataFrame =
    df.withColumn(s"${prefix}qv", V.quantize(col(vecCol)))
      .withColumn(s"${prefix}n2", V.dotQ(col(s"${prefix}qv"), col(s"${prefix}qv")))

  /** Assign every vector to its nearest centroid (max quantized cosine,
    * ties to the lower centroid id). Broadcast join + per-row argmax —
    * vectors quantize once, each (row, centroid) pair costs one native
    * integer dot.
    */
  def assign(df: DataFrame, idCol: String, vecCol: String, cents: DataFrame): DataFrame =
    assignQ(df, idCol, vecCol, cents).drop("__vqv", "__vn2")

  /** [[assign]] keeping the quantized vector + squared norm columns
    * (`__vqv`, `__vn2`) so [[topK]] doesn't quantize the corpus twice.
    *
    * The argmax is `groupBy(max_by)` rather than a row_number window:
    * the broadcast join amplifies the corpus ×nCentroids, and a window
    * would shuffle+sort ALL of it — the hash aggregate's partial phase
    * collapses each vector's centroid rows to one on the map side (they
    * were generated colocated from one input row), so the exchange
    * carries N rows, not N×nCentroids. Tie-break: max of
    * (sim, -centroid_id) struct ⇒ lowest centroid id wins equal sims,
    * matching the oracle's `ORDER BY sim DESC, centroid_id ASC`.
    */
  private def assignQ(df: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame): DataFrame = {
    val scored = withQuant(df, vecCol, "__v")
      .join(broadcast(withQuant(cents, "centroid_vec", "__c")))
      .withColumn("__sim", V.cosineFromQuantized(
        col("__vqv"), col("__cqv"), col("__vn2"), col("__cn2")))
    val keep = scored.columns.filter(c =>
      c != idCol && c != "__sim" && c != "centroid_vec" &&
      c != "__cqv" && c != "__cn2")
    scored
      .groupBy(col(idCol))
      .agg(max_by(struct(keep.map(col).toIndexedSeq: _*),
        struct(col("__sim"), (-col("centroid_id")).as("neg_cid"))).as("__best"))
      .select(col(idCol) +: keep.map(c => col(s"__best.$c").as(c)).toIndexedSeq: _*)
  }

  /** Probe: per query keep the `nProbe` closest centroids, scan only
    * vectors assigned to those cells, return per-query top-k with the
    * same deterministic ranking contract as the exact baseline.
    */
  def topK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val cents = centroids(corpus, idCol, vecCol, nCentroids)
    val assigned = assignQ(corpus, idCol, vecCol, cents)
      .select(col(idCol).as("id"), col("centroid_id"),
        col("__vqv").as("cqv"), col("__vn2").as("cn2"))

    val qCells = withQuant(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "qv", "__q")
      .join(broadcast(withQuant(cents, "centroid_vec", "__c")))
      .withColumn("__sim", V.cosineFromQuantized(
        col("__qqv"), col("__cqv"), col("__qn2"), col("__cn2")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("__sim").desc, col("centroid_id").asc)))
      .filter(col("__rn") <= nProbe)
      .select(col("query_id"), col("__qqv").as("qqv"), col("__qn2").as("qn2"),
        col("centroid_id"))

    val cand = assigned.join(broadcast(qCells), Seq("centroid_id"))
      .filter(col("id") =!= col("query_id"))
    Similarity.rankTopK(cand.withColumn("cosine", round(
      V.cosineFromQuantized(col("cqv"), col("qqv"), col("cn2"), col("qn2")), 6)), k)
  }
}
