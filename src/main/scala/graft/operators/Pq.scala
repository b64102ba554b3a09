package graft.operators

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Product quantization (Jégou et al., TPAMI 2011) — the vector
  * COMPRESSION leg of the ANN family, beside hyperplane LSH
  * ([[Similarity.lshTopK]]) and coarse IVF ([[IvfIndex]]).
  *
  * A dim-D embedding splits into `m` contiguous subvectors; each
  * subspace gets a `k`-entry codebook and every vector is stored as
  * its `m` nearest-sub-centroid ids — `m·ceil(log2 k)` bits instead of
  * `32·D`: at (D=64, m=8, k=16) that is 8 small ints vs 64 floats,
  * ~32× fewer scan bytes. Search never decompresses: a query builds an
  * m·k lookup table once ([[graft.plans.PqDistTable]]) and each
  * candidate costs `m` adds ([[graft.plans.PqAdc]]) — the asymmetric
  * distance (ADC) of the paper, equal to the exact distance between
  * the query and the candidate's reconstruction.
  *
  * Everything is exact fixed-point integer arithmetic over
  * [[graft.functions.VectorFunctions.quantize]]d vectors — codebook
  * pick, code assignment, distances — so the DuckDB oracle reproduces
  * results bit-for-bit (the repo's sketch-determinism rule).
  *
  * 100 TB shape: training collects `k` sampled vectors (one tiny
  * TakeOrdered — the [[IvfIndex.centroids]] discipline); encoding is a
  * pure narrow map riding the corpus scan; the codes table is what
  * persists (32× smaller than the embeddings it summarizes), and
  * search scans codes, not vectors. Compose with [[IvfIndex]] cells
  * for IVF-PQ: centroid partition pruning picks cells, ADC scores
  * them (see [[probeIvfAdc]]).
  */
object Pq {

  /** Driver-resident codebook: `rows(sub*k + code)` is that
    * subspace-centroid's quantized subvector (`subDim` longs).
    */
  case class Codebook(m: Int, k: Int, subDim: Int, rows: Seq[Seq[Long]]) {
    require(rows.length == m * k, "codebook must be (m*k) rows")
    require(rows.forall(_.length == subDim), "ragged codebook")
    def dim: Int = m * subDim
  }

  /** Train = deterministic sample: the `k` corpus vectors with the
    * smallest `h60("pq:" + id)` ([[IvfIndex.centroids]]' audit-hash
    * pick — no RNG, oracle-reproducible), quantized through the real
    * [[graft.plans.QuantizeVec]] expression and sliced into `m`
    * subvectors. Sample `j` (in hash order) becomes code `j` of EVERY
    * subspace — the k-sample product codebook. Distributed TakeOrdered;
    * only `k` vectors reach the driver.
    *
    * `dim` must divide evenly into `m` subspaces (checked against the
    * first sampled vector).
    */
  def train(df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int): Codebook = {
    val sampled = df
      .select(col(idCol).as("__pid"), V.quantize(col(vecCol)).as("__pqv"))
      .filter(col("__pqv").isNotNull)
      .withColumn("__h", graft.functions.AuditableHash.h60(
        concat(lit("pq:"), col("__pid").cast("string"))))
      .orderBy(col("__h"))
      .limit(k)
      .select(col("__pqv"))
      .collect()
      .map(_.getSeq[Long](0))
    require(sampled.length == k, s"corpus has fewer than $k usable vectors")
    val dim = sampled.head.length
    require(dim % m == 0, s"dim $dim must split into $m equal subspaces")
    val subDim = dim / m
    require(sampled.forall(_.length == dim), "ragged corpus vectors in sample")
    val rows = for (sub <- 0 until m; code <- 0 until k)
      yield sampled(code).slice(sub * subDim, (sub + 1) * subDim)
    Codebook(m, k, subDim, rows)
  }

  /** Codebook as a persistable DataFrame `(sub, code, cvec)` —
    * write it beside the codes table; [[codebookFromDf]] restores the
    * driver form so increments encode against a FROZEN codebook (the
    * SemDeDup frozen-codebook discipline: incremental encodes must
    * never re-sample, or old codes silently mean different centroids).
    */
  def codebookDf(spark: SparkSession, cb: Codebook): DataFrame = {
    import spark.implicits._
    (for (sub <- 0 until cb.m; code <- 0 until cb.k)
      yield (sub, code, cb.rows(sub * cb.k + code)))
      .toDF("sub", "code", "cvec")
  }

  /** Restore [[Codebook]] from its [[codebookDf]] persisted form (one
    * m·k-row collect — tiny by construction).
    */
  def codebookFromDf(df: DataFrame): Codebook = {
    val rows = df.select(col("sub"), col("code"), col("cvec")).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Long](2)))
      .sortBy(_._1)
    require(rows.nonEmpty, "empty codebook table")
    val m = rows.map(_._1._1).max + 1
    val k = rows.map(_._1._2).max + 1
    require(rows.length == m * k, s"codebook table is not dense (m=$m, k=$k)")
    Codebook(m, k, rows.head._2.length, rows.map(_._2).toIndexedSeq)
  }

  private def encodeCol(vecCol: String, cb: Codebook) =
    ColumnBridge.column(graft.plans.PqEncode(
      ColumnBridge.expression(V.quantize(col(vecCol))), cb.rows, cb.m))

  private def distTableCol(vecCol: String, cb: Codebook) =
    ColumnBridge.column(graft.plans.PqDistTable(
      ColumnBridge.expression(V.quantize(col(vecCol))), cb.rows, cb.m))

  private def adcCol(codesCol: String, tableCol: String, cb: Codebook) =
    ColumnBridge.column(graft.plans.PqAdc(
      ColumnBridge.expression(col(codesCol)),
      ColumnBridge.expression(col(tableCol)), cb.m, cb.k))

  /** Encode a corpus: `(id, codes: array<int>[m], distortion: bigint)`.
    * One narrow map — quantize, per-subspace argmin
    * ([[graft.plans.PqEncode]]), and the exact integer squared
    * reconstruction error (self-ADC: the distance table against the
    * vector's own codes). Unencodable vectors (NULL / ragged / NULL
    * element) keep NULL codes so no row silently vanishes from the
    * index — callers filter or audit them. This is the table that
    * persists at scale (partition however the corpus partitions; it
    * is ~32× narrower than the embedding column it replaces).
    */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      cb: Codebook): DataFrame =
    df.select(col(idCol).as("id"),
        encodeCol(vecCol, cb).as("codes"),
        distTableCol(vecCol, cb).as("__t"))
      .withColumn("distortion", adcCol("codes", "__t", cb))
      .drop("__t")

  /** ADC top-k search: per query, the `topK` candidates with the
    * smallest approximate squared distance (ties → lower id).
    *
    * Queries (few) build their m·k distance tables in one narrow map,
    * then BROADCAST onto the codes table; each (candidate, query) pair
    * costs m integer adds inside whole-stage codegen. Ranking is the
    * bounded-heap aggregator ([[TopKPerGroup]] on negated distance) —
    * map-side state caps at topK per query per task, parallelism
    * follows the codes partitions, no single-partition window. The
    * deliberate tiny-side broadcast nested-loop join is the same shape
    * as [[Similarity.bruteForceTopKQuantized]] (PLANS.md BNLJ census).
    *
    * Returns `(query_id, id, d2, rank)`; self-matches excluded when a
    * query id collides with a corpus id (the brute-force convention).
    */
  def searchAdc(codes: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, cb: Codebook, topK: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      distTableCol(vecCol, cb).as("__qt"))
    val scored = codes.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("d2", adcCol("codes", "__qt", cb))
      .filter(col("d2").isNotNull)
    TopKPerGroup(scored.select(col("query_id"), (-col("d2")).as("__nd"), col("id")),
        Seq("query_id"), "__nd", "id", topK)
      // TopKPerGroup's primitive heap state is double-typed; ADC sums
      // (≤ ~2⁴⁵ at 10⁶-scale quantization) round-trip exactly, and the
      // cast restores the schema's exact-integer contract
      .select(col("query_id"), col("id"), (-col("__nd")).cast("long").as("d2"),
        col("rank"))
  }

  /** IVF-PQ: restrict ADC scoring to the `nProbe` best IVF cells per
    * query (coarse centroids from [[IvfIndex.buildIndex]]), the
    * billion-scale composition of the FAISS lineage: centroid
    * partition pruning cuts the candidate set to
    * `nProbe/nCentroids` of the corpus, then each survivor costs m
    * adds. `cells` is the IVF assignment `(id, centroid_id, …)`
    * joined here against the codes table on id — persist the two
    * co-partitioned by `centroid_id` and the join is co-located.
    *
    * Returns `(query_id, id, d2, rank)` — same contract as
    * [[searchAdc]] but candidates outside probed cells never score.
    */
  def probeIvfAdc(codes: DataFrame, cells: DataFrame, cents: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, cb: Codebook,
      topK: Int, nProbe: Int): DataFrame = {
    val probes = IvfIndex.probeCells(cents, queries, idCol, vecCol, nProbe)
      .select(col("query_id"), col("centroid_id"))
    val q = queries.select(col(idCol).as("query_id"),
      distTableCol(vecCol, cb).as("__qt"))
    val cand = codes
      .join(cells.select(col("id"), col("centroid_id")), Seq("id"))
      .join(broadcast(probes), Seq("centroid_id"))
      .join(broadcast(q), Seq("query_id"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("d2", adcCol("codes", "__qt", cb))
      .filter(col("d2").isNotNull)
    TopKPerGroup(cand.select(col("query_id"), (-col("d2")).as("__nd"), col("id")),
        Seq("query_id"), "__nd", "id", topK)
      // TopKPerGroup's primitive heap state is double-typed; ADC sums
      // (≤ ~2⁴⁵ at 10⁶-scale quantization) round-trip exactly, and the
      // cast restores the schema's exact-integer contract
      .select(col("query_id"), col("id"), (-col("__nd")).cast("long").as("d2"),
        col("rank"))
  }

  /** Lloyd refinement of the sub-codebooks: `iters` rounds of
    * (encode under the current codebook → per-(sub, code) integer
    * centroid mean), the [[IvfIndex.rebuild]] discipline applied per
    * subspace. Means use exact integer `div` (the Sharding boundary
    * rule) so refinement is deterministic across partitionings and
    * engines; empty cells keep their old centroid (a k-means cell that
    * loses all members must not teleport). Like `rebuild`, the refined
    * codebook is NOT the frozen one increments were encoded under —
    * re-encode the corpus after refining (codes are meaningless across
    * codebooks).
    *
    * Cost per round: one encode (narrow map) + one explode to
    * (sub, dim) granularity — rows × dim exploded rows through a hash
    * aggregate of at most m·k·subDim = dim·k cells. The aggregate is
    * map-side combinable (tiny key space), so the shuffle is
    * cells-sized, not corpus-sized.
    */
  def refine(df: DataFrame, idCol: String, vecCol: String, cb: Codebook,
      iters: Int = 1): Codebook = {
    var cur = cb
    var it = 0
    while (it < iters) {
      val enc = df
        .select(V.quantize(col(vecCol)).as("__qv"),
          encodeCol(vecCol, cb = cur).as("__codes"))
        .filter(col("__codes").isNotNull)
        .select(col("__qv"), posexplode(col("__codes")).as(Seq("sub", "code")))
        .select(col("sub"), col("code"),
          posexplode(slice(col("__qv"), col("sub") * cur.subDim + 1, lit(cur.subDim)))
            .as(Seq("d", "v")))
        .groupBy(col("sub"), col("code"), col("d"))
        .agg(sum(col("v")).as("__s"), count(lit(1)).as("__n"))
        .select(col("sub"), col("code"), col("d"),
          expr("__s div __n").as("mean"))
        .collect()
      val next = Array.tabulate(cur.m * cur.k)(i => cur.rows(i).toArray)
      enc.foreach { r =>
        next(r.getInt(0) * cur.k + r.getInt(1))(r.getInt(2)) = r.getLong(3)
      }
      cur = Codebook(cur.m, cur.k, cur.subDim, next.map(_.toIndexedSeq).toIndexedSeq)
      it += 1
    }
    cur
  }

  /** Corpus-total reconstruction error Σ distortion (exact integer) —
    * the convergence metric for [[refine]] and the compression-loss
    * telemetry beside [[recallAtK]].
    */
  def totalDistortion(df: DataFrame, idCol: String, vecCol: String,
      cb: Codebook): Long =
    encode(df, idCol, vecCol, cb)
      .agg(sum(col("distortion"))).head().getLong(0)

  /** Recall@k of ADC search against the exact quantized-cosine
    * brute force ([[Similarity.bruteForceTopKQuantized]]) — the
    * compression-quality telemetry, protocol-identical to
    * [[IvfIndex.recallAtK]] (q129): per-query `n_exact`/`n_hit`/
    * `recall` plus corpus-wide `micro_recall`. Run it on every
    * (m, k) candidate before committing a codebook shape.
    */
  def recallAtK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, cb: Codebook): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val adc = searchAdc(encode(corpus, idCol, vecCol, cb), queries,
        idCol, vecCol, cb, k)
      .select(col("query_id"), col("id"), lit(1L).as("__hit"))
    val exact = Similarity.bruteForceTopKQuantized(
        corpus, queries, vecCol, idCol, k)
      .select(col("query_id"), col("id"))
    exact.join(adc, Seq("query_id", "id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .withColumn("recall",
        round(col("n_hit").cast("double") / col("n_exact").cast("double"), 6))
      .withColumn("micro_recall",
        round(sum(col("n_hit")).over(Window.partitionBy())
            .cast("double") /
          sum(col("n_exact")).over(Window.partitionBy()).cast("double"), 6))
      .select(col("query_id"), col("n_exact"), col("n_hit"),
        col("recall"), col("micro_recall"))
  }

  /** Persist codebook + codes (`dir/codebook`, `dir/codes`). */
  def writeIndex(spark: SparkSession, cb: Codebook, codes: DataFrame,
      dir: String): Unit = {
    codebookDf(spark, cb).write.mode("overwrite").parquet(s"$dir/codebook")
    codes.write.mode("overwrite").parquet(s"$dir/codes")
  }

  /** Read back `(codebook, codes)`; increments encode new vectors with
    * [[encode]] against the returned FROZEN codebook and append —
    * `batch == old ∪ increment` by construction since codes are a
    * pure per-row function of (vector, codebook).
    */
  def readIndex(spark: SparkSession, dir: String): (Codebook, DataFrame) =
    (codebookFromDf(spark.read.parquet(s"$dir/codebook")),
      spark.read.parquet(s"$dir/codes"))
}
