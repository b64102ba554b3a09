package graft.operators

import graft.functions.{AuditableHash, VectorFunctions => V}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss dimensionality reduction for embedding
  * columns: project `dim`-dimensional vectors to `outDim` exact-integer
  * coordinates with a ±1 sign matrix derived from the auditable hash
  * family, estimate distances in the small space, and rescore
  * survivors exactly — the "project, shortlist, verify" pattern that
  * cuts the per-pair cost of brute-force shortlisting by dim/outDim
  * (Achlioptas, JCSS 2003; the ±1 construction satisfies the JL lemma
  * with the same distortion guarantees as Gaussian projections).
  *
  * Where this sits among the ANN surfaces: [[Similarity.lshBucketsDf]]
  * keeps only SIGNS (1 bit/plane — recall from bucket collision);
  * [[Pq]] quantizes to codebook cells (lossy, trained); this keeps
  * exact integer MAGNITUDES in a smaller space — untrained, exactly
  * re-derivable, with unbiased squared-distance estimates:
  * `E[(y_a−y_b)_j²] = ‖q_a−q_b‖²` per coordinate because the ±1 signs
  * are independent across d, so `Σ_j (δy_j)² / outDim` is an unbiased
  * estimator with JL concentration. Everything — signs, projections,
  * estimates — is integer arithmetic both engines reproduce
  * bit-for-bit (q200/q201).
  *
  * Scale shape: projection is a codegen'd narrow map
  * ([[graft.plans.RpProject]] — one multiply-accumulate loop per row,
  * no shuffle); the shortlist pass scores outDim-long integer vectors
  * instead of dim-long doubles; only the ≤ c·k shortlist per query
  * pays the full-dimension exact rescore.
  */
object RandomProjection {

  /** The ±1 sign matrix (outDim × dim): `+1` iff `h60("rp:j:d")` is
    * even — no stored planes, no seed shipping; any engine re-derives
    * every entry from the literal strings (the CountMin/Bloom constant
    * discipline).
    */
  def signs(outDim: Int, dim: Int): IndexedSeq[IndexedSeq[Long]] =
    IndexedSeq.tabulate(outDim)(j => IndexedSeq.tabulate(dim)(d =>
      if (AuditableHash.h60(s"rp:$j:$d") % 2 == 0) 1L else -1L))

  /** Project a vector column to `array<long>[outDim]` (NULL for
    * unscorable vectors — wrong length / NULL element, the ANN-family
    * drop contract).
    */
  def project(vec: Column, outDim: Int, dim: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.RpProject(
      ColumnBridge.expression(vec.cast("array<double>")),
      signs(outDim, dim).map(_.toSeq)))
  }

  /** Exact integer squared distance between two projected vectors:
    * `Σ_j (a_j − b_j)²` = dot(a,a) − 2·dot(a,b) + dot(b,b) — three
    * [[V.dotQ]] codegen kernels, no per-pair lambda. For PAIR JOINS use
    * [[projDistSqFromNorms]]: the self-dots depend on one side each, so
    * recomputing them per pair triples the hot-loop multiplies (the
    * first cut of the 100× scale point measured the JL shortlist
    * SLOWER than brute force for exactly this reason).
    */
  def projDistSq(a: Column, b: Column): Column =
    V.dotQ(a, a) - lit(2L) * V.dotQ(a, b) + V.dotQ(b, b)

  /** [[projDistSq]] with the per-ROW squared norms precomputed: one
    * outDim-long dot per pair — half of brute force's dim-long dot at
    * outDim = dim/2, which is where the JL speedup actually lives.
    */
  def projDistSqFromNorms(a: Column, b: Column, n2a: Column, n2b: Column): Column =
    n2a - lit(2L) * V.dotQ(a, b) + n2b

  /** Project-then-rescore top-k: shortlist `shortlist` candidates per
    * query by PROJECTED squared distance (outDim-long integer math per
    * pair), then rescore ONLY the shortlist with the exact
    * full-dimension quantized cosine (identical arithmetic and
    * tie-break to [[Similarity.bruteForceTopKQuantized]], so at
    * shortlist = corpus size the result IS brute force). Output
    * `(query_id, id, cosine, rank)` — the family schema.
    *
    * Recall honesty: two gaps separate this from exact. (1) JL
    * distortion shrinks with outDim — measured on the harness
    * embeddings (near-random vectors, cosines ≤ ~0.52, the HARDEST
    * case since the "true" top-k is barely separated): recall@10 0.34
    * at outDim=16 / shortlist=4·k, 0.70 at outDim=32 / shortlist=8·k;
    * corpora with genuine neighbor structure fare far better. (2) The
    * shortlist metric is EUCLIDEAN while the rescore is cosine —
    * identical only for normalized vectors. Pre-normalizing inside the
    * operator would put a float division ahead of the quantization and
    * break exact cross-engine reproducibility, so the operator keeps
    * raw vectors and documents the gap; normalize upstream when cosine
    * fidelity of the shortlist matters.
    */
  def topKProjected(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, outDim: Int, dim: Int,
      shortlist: Int, maxAbs: Double = 1.0): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    // signed-64 envelope of the shortlist arithmetic: projDistSq's
    // dot(a,a) − 2·dot(a,b) + dot(b,b) is at worst 4·outDim·y_max²
    // with y_max = dim·maxAbs·10⁶ — enforce it HERE rather than let a
    // big-dim corpus die mid-join on an ANSI overflow (the caller
    // asserts |x| ≤ maxAbs; violating that still fails loudly via ANSI)
    require(4.0 * outDim * math.pow(dim * maxAbs * 1e6, 2) < math.pow(2.0, 63),
      s"projected-distance arithmetic overflows signed-64 at outDim=$outDim, " +
        s"dim=$dim, maxAbs=$maxAbs — reduce outDim/dim or pre-scale the vectors")
    def pre(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id),
          V.quantize(col(vecCol)).as(s"${id}_qv"),
          project(col(vecCol), outDim, dim).as(s"${id}_rp"))
        .filter(col(s"${id}_rp").isNotNull)
        .withColumn(s"${id}_n2", V.dotQ(col(s"${id}_qv"), col(s"${id}_qv")))
        .withColumn(s"${id}_rpn2", V.dotQ(col(s"${id}_rp"), col(s"${id}_rp")))
    val c = pre(corpus, "id")
    val q = pre(queries, "query_id")
    // shortlist on NEGATED projected distance (TopKPerGroup keeps max),
    // per-row norms precomputed so each pair costs ONE outDim-long dot.
    // The aggregator's score rides as a double: dist² can reach ~2^58
    // (> 2^53 exact-double range), so shed the low 6 bits FIRST with an
    // exact integer div — the shed bits are far below JL noise, and the
    // shortlist stays a deterministic integer fact in both engines
    // (collisions introduced by the div break by id, same both sides)
    val scored = c.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("__negd",
        -shiftright(projDistSqFromNorms(col("id_rp"), col("query_id_rp"),
          col("id_rpn2"), col("query_id_rpn2")), 6)
          .cast("double"))
    val short = TopKPerGroup(
        scored.select(col("query_id"), col("__negd"), col("id")),
        Seq("query_id"), "__negd", "id", shortlist)
      .select(col("query_id"), col("id"))
    // exact rescore of the shortlist only — full-dimension cosine
    val rescored = short
      .join(c, "id")
      .join(broadcast(q), "query_id")
      .withColumn("cosine", round(V.cosineFromQuantized(
        col("id_qv"), col("query_id_qv"), col("id_n2"), col("query_id_n2")), 6))
    TopKPerGroup(rescored.select(col("query_id"), col("cosine"), col("id")),
        Seq("query_id"), "cosine", "id", k)
      .select(col("query_id"), col("id"), col("cosine"), col("rank"))
  }
}
