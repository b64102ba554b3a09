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
  def centroids(df: DataFrame, idCol: String, vecCol: String, nCentroids: Int): DataFrame =
    centroidsWithCodebook(df, idCol, vecCol, nCentroids)._1

  /** [[centroids]] plus the driver-side quantized codebook
    * `(centroid_id, qv, n2)` from the SAME single collect — the
    * assignment path embeds the codebook as literals ([[assignQ]]), and
    * collecting it separately would cost a second driver-blocking job
    * per query construction. Quantization happens through the real
    * [[graft.plans.QuantizeVec]] expression before the collect, so
    * driver and executors can't disagree on it.
    */
  private def centroidsWithCodebook(df: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int): (DataFrame, Array[(Int, Seq[Long], Long)]) = {
    val spark = df.sparkSession
    val picked = withQuant(df
      .select(col(idCol).as("centroid_pick_id"), col(vecCol).as("centroid_vec"))
      .withColumn("__h",
        graft.functions.AuditableHash.h60(
          concat(lit("ivf:"), col("centroid_pick_id").cast("string"))))
      .orderBy(col("__h"))
      .limit(nCentroids), "centroid_vec", "__c")
    val vecType = picked.schema("centroid_vec").dataType
    val collected = picked.collect()
    val rows = collected.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(r.get(r.fieldIndex("centroid_vec")), i)
    }
    val codebook = collected.zipWithIndex.map { case (r, i) =>
      (i, r.getSeq[Long](r.fieldIndex("__cqv")), r.getLong(r.fieldIndex("__cn2")))
    }
    val cents = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("centroid_vec", vecType),
        org.apache.spark.sql.types.StructField("centroid_id",
          org.apache.spark.sql.types.IntegerType, nullable = false))))
    (cents, codebook)
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
    assignQ(df, idCol, vecCol, collectCodebook(cents)).drop("__vqv", "__vn2")

  /** Quantized codebook of an existing centroid table (one tiny
    * collect). [[topK]] avoids this via [[centroidsWithCodebook]].
    */
  private def collectCodebook(cents: DataFrame): Array[(Int, Seq[Long], Long)] =
    withQuant(cents, "centroid_vec", "__c")
      .select(col("centroid_id"), col("__cqv"), col("__cn2"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1)

  /** [[assign]] keeping the quantized vector + squared norm columns
    * (`__vqv`, `__vn2`) so [[topK]] doesn't quantize the corpus twice.
    *
    * The argmax is a PURE NARROW MAP: the codebook is tiny and already
    * driver-resident ([[centroids]] collects it), so it embeds in the
    * native [[graft.plans.IvfAssign]] expression — one tight loop per
    * row computing every centroid's fixed-point cosine and keeping the
    * first maximum (lowest centroid id on ties, the oracle's
    * `ORDER BY sim DESC, centroid_id ASC`). No join, no row
    * amplification, no aggregate. (The broadcast-join + `max_by` form
    * amplified the corpus ×nCentroids and — max_by over an
    * array-bearing struct can't hash-aggregate — planned a
    * per-partition SORT of the amplified rows with the full embedding
    * payload; a composed argmax over nCentroids separate dot
    * expressions instead inlines that many loops into one generated
    * method and blows the JIT budget. The expression form dodges both.)
    *
    * The codebook literals are read back through the real
    * [[graft.plans.QuantizeVec]] expression, so driver and executors
    * can't disagree on quantization.
    */
  private def assignQ(df: DataFrame, idCol: String, vecCol: String,
      code: Array[(Int, Seq[Long], Long)]): DataFrame = {
    require(code.zipWithIndex.forall { case ((cid, _, _), i) => cid == i },
      "centroid ids must be dense 0..k-1 (IvfAssign returns the codebook position)")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val assignCol = ColumnBridge.column(graft.plans.IvfAssign(
      ColumnBridge.expression(col("__vqv")),
      code.map(_._2).toSeq, code.map(_._3).toSeq))
    withQuant(df, vecCol, "__v")
      .withColumn("centroid_id", assignCol)
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
    val (cents, codebook) = centroidsWithCodebook(corpus, idCol, vecCol, nCentroids)
    val assigned = assignQ(corpus, idCol, vecCol, codebook)
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
