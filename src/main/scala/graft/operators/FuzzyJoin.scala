package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy self-matching: find pairs of records whose keys are
  * within `maxDist` edits — entity resolution over customer/supplier
  * names, near-identical URL or title detection — WITHOUT an all-pairs
  * comparison. The reference's matching surface is exact equality
  * (`22130124/data_warehouse_nhom8` upsert/SCD2 key joins); this is
  * the approximate-matching extension, built the way every operator
  * here is: equi-join blocking so the comparison count is bounded, a
  * cheap necessary-condition prefilter, then the exact verifier only
  * on surviving candidates.
  *
  * Blocking: each record emits two block keys — its first and its last
  * `blockLen` characters. Pairs sharing either block become
  * candidates. This is complete for `maxDist = 1` when keys are at
  * least `2·blockLen` long (one edit touches at most one of the two
  * disjoint blocks; the other survives verbatim — the PassJoin
  * pigeonhole at q = 2 segments), and high-recall-but-not-complete for
  * larger distances (edits at BOTH ends evade; [[blockStats]] plus a
  * q132-style sampled ground truth measure the gap). The length gap
  * `|len(a) − len(b)| ≤ maxDist` rides the join as a prefilter — it is
  * implied by edit distance, costs nothing, and kills most false
  * candidates before the DP verifier runs.
  *
  * Hot blocks: real keys share boilerplate ("Customer#0…" — every row
  * in one prefix block), and a degenerate block is quadratic. Blocks
  * larger than `maxBlock` are EXCLUDED from candidate generation — a
  * block that common discriminates nothing — and the cut is never
  * silent: [[blockStats]] reports every block's size and kept/dropped
  * status, so the recall trade is measured, not assumed. At 100 TB the
  * shape holds: block sizes come from one aggregate on the block key,
  * candidate generation is an equi-join on `(kind, block)` (AQE
  * skew-splittable), and the O(len²) verifier — Spark's banded
  * `levenshtein(l, r, threshold)`, which abandons a row at
  * `maxDist + 1` — runs only on candidates that share a block and a
  * length band.
  */
object FuzzyJoin {

  /** `(id, key, len, kind, blk)`: two rows per record — kind 'p'
    * (first `blockLen` chars) and 's' (last `blockLen` chars). Keys
    * shorter than `blockLen` use the whole key for both blocks (the
    * short-key fallback degenerates to an exact-prefix group, still
    * bounded by `maxBlock`).
    */
  private def blocks(df: DataFrame, keyCol: String, idCol: String,
      blockLen: Int): DataFrame =
    df.select(col(idCol).as("id"), col(keyCol).as("key"),
        length(col(keyCol)).as("len"))
      .filter(col("key").isNotNull)
      .select(col("id"), col("key"), col("len"), explode(array(
        struct(lit("p").as("kind"), substring(col("key"), 1, blockLen).as("blk")),
        // explicit start = max(len−blockLen+1, 1): negative-position
        // substring semantics differ between engines for keys shorter
        // than blockLen; this form is identical everywhere
        struct(lit("s").as("kind"),
          expr(s"substring(key, greatest(length(key) - $blockLen + 1, 1), $blockLen)")
            .as("blk")))).as("b"))
      .select(col("id"), col("key"), col("len"),
        col("b.kind").as("kind"), col("b.blk").as("blk"))

  /** Per-block telemetry: `(kind, blk, n_rows, kept)` — every block's
    * population and whether it participates in candidate generation
    * (`n_rows <= maxBlock`). The no-silent-caps contract: a pipeline
    * that drops a block sees exactly which and how big here.
    */
  def blockStats(df: DataFrame, keyCol: String, idCol: String,
      blockLen: Int, maxBlock: Long): DataFrame = {
    require(blockLen >= 1, s"blockLen must be >= 1, got $blockLen")
    blocks(df, keyCol, idCol, blockLen)
      .groupBy(col("kind"), col("blk"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("kept", col("n_rows") <= maxBlock)
  }

  /** Matched pairs `(id_a, id_b, key_a, key_b, dist)` with
    * `dist = levenshtein(key_a, key_b) ≤ maxDist`, `id_a < id_b`.
    * Candidates: share a kept block (equi-join on `(kind, blk)`) and a
    * length band; deduplicated (a pair sharing both blocks verifies
    * once) before the DP verifier.
    */
  def fuzzyPairs(df: DataFrame, keyCol: String, idCol: String,
      maxDist: Int, blockLen: Int = 4, maxBlock: Long = 1000L): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(blockLen >= 1, s"blockLen must be >= 1, got $blockLen")
    val b = blocks(df, keyCol, idCol, blockLen)
    val sizes = b.groupBy(col("kind"), col("blk"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBlock)
    val kept = b.join(sizes.select(col("kind"), col("blk")), Seq("kind", "blk"))
    val a = kept.select(col("kind"), col("blk"), col("id").as("id_a"),
      col("key").as("key_a"), col("len").as("len_a"))
    val c = kept.select(col("kind"), col("blk"), col("id").as("id_b"),
      col("key").as("key_b"), col("len").as("len_b"))
    a.join(c, Seq("kind", "blk"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= maxDist)
      .select(col("id_a"), col("id_b"), col("key_a"), col("key_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("key_a"), col("key_b"), maxDist))
      .filter(col("dist") >= 0)
  }

  /** The `blockLen ∝ log N` dial, derived deterministically from the
    * record count: `blockLen = max(minLen, ceil(bitlen(N)/4))` — i.e.
    * log₁₆ N rounded up, so the block-key space (≥ 16^blockLen for
    * text keys) grows at least as fast as the corpus and expected
    * block occupancy stays O(1) for hash-like key material (`maxBlock`
    * remains the backstop for skewed real keys). A FIXED blockLen at a
    * growing corpus is the fixed-k SemDeDup hazard: occupancy ∝ N ⇒
    * candidates ∝ N² (BASELINE.md r10). Derive once at index build,
    * persist in [[blockMeta]]; the dial is the index's PHYSICAL key
    * layout, so increments must keep it (blocks at a different length
    * would never equi-join) — [[blockMetaAfterIncrement]] flags when a
    * batch pushes N across a step so the pipeline re-blocks
    * deliberately instead of drifting silently.
    */
  def autoBlockLen(n: Long, minLen: Int = 2): Int = {
    require(n >= 0, s"record count must be >= 0, got $n")
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(math.max(n, 1L))
    math.max(minLen, (bitlen + 3) / 4)
  }

  /** 1-row index meta `(n_records, block_len)` — persist beside
    * [[blockRows]]; the stored dial every probe and increment reads.
    */
  def blockMeta(df: DataFrame, keyCol: String, minLen: Int = 2): DataFrame = {
    val n = df.filter(col(keyCol).isNotNull).count()
    val spark = df.sparkSession
    import spark.implicits._
    Seq((n, autoBlockLen(n, minLen))).toDF("n_records", "block_len")
  }

  /** [[fuzzyPairs]] at the auto-derived dial (one count + the blocked
    * join). The q168 correctness surface — the DuckDB oracle re-derives
    * the dial from the same count.
    */
  def fuzzyPairsAuto(df: DataFrame, keyCol: String, idCol: String,
      maxDist: Int, maxBlock: Long = 1000L, minLen: Int = 2): DataFrame = {
    val n = df.filter(col(keyCol).isNotNull).count()
    fuzzyPairs(df, keyCol, idCol, maxDist, autoBlockLen(n, minLen), maxBlock)
  }

  /** [[fuzzyPairsIncremental]] reading the dial from the PERSISTED
    * [[blockMeta]] instead of a caller parameter — the increment
    * cannot drift from the index's block layout.
    */
  def fuzzyPairsIncrementalMeta(oldBlocks: DataFrame, meta: DataFrame,
      newDf: DataFrame, keyCol: String, idCol: String, maxDist: Int,
      maxBlock: Long = 1000L): DataFrame = {
    val bl = meta.select(col("block_len")).head().getInt(0)
    fuzzyPairsIncremental(oldBlocks, newDf, keyCol, idCol, maxDist, bl, maxBlock)
  }

  /** Meta after absorbing a batch: `n_records` grows, `block_len`
    * KEEPS the stored layout, and `reblock_due` flags that the new
    * count recommends a longer dial — the cap-crossing surface. The
    * `batch == old ∪ increment` contract (FuzzyJoinSpec) holds at the
    * stored dial regardless of crossings; re-blocking is a rebuild the
    * pipeline schedules when this flag trips.
    */
  def blockMetaAfterIncrement(meta: DataFrame, newDf: DataFrame,
      keyCol: String, minLen: Int = 2): DataFrame = {
    val old = meta.select(col("n_records"), col("block_len")).head()
    val n = old.getLong(0) + newDf.filter(col(keyCol).isNotNull).count()
    val stored = old.getInt(1)
    val rec = autoBlockLen(n, minLen)
    val spark = meta.sparkSession
    import spark.implicits._
    Seq((n, stored, rec, rec > stored))
      .toDF("n_records", "block_len", "block_len_recommended", "reblock_due")
  }

  /** The PERSISTABLE fuzzy index: each record's block rows
    * `(id, key, len, kind, blk)`. Additive over disjoint id sets
    * (each record owns its two rows — plain union, the postings-index
    * contract); persist partitioned/bucketed by `(kind, blk)` so the
    * incremental probe's block join reads only the batch's blocks.
    * Takedown: anti-join on id, same as every index family.
    */
  def blockRows(df: DataFrame, keyCol: String, idCol: String,
      blockLen: Int): DataFrame =
    blocks(df, keyCol, idCol, blockLen)

  /** Daily increment: every matched pair INVOLVING the new batch —
    * `fuzzyPairs(old ∪ new) == fuzzyPairs(old) ∪ this` (disjoint by
    * construction: old-old pairs never appear here), EXACTLY while no
    * block crosses `maxBlock` between builds. A block that the new
    * rows push over the cap stops generating NEW candidates here
    * (sizes are computed over old ∪ new, matching the batch rebuild),
    * but the old-old pairs it produced in earlier builds remain in
    * the caller's accumulated pair state — the union is then a
    * SUPERSET of the batch rebuild by exactly those stale old-old
    * pairs (FuzzyJoinSpec pins both the equality and the crossing
    * divergence; [[blockStats]] over the union makes crossings
    * visible, so a pipeline can re-elect when one matters).
    * Cost: the batch's block rows join the corpus index on
    * `(kind, blk)` — increment-sized against a block-partitioned
    * index, never a corpus rescan.
    */
  def fuzzyPairsIncremental(oldBlocks: DataFrame, newDf: DataFrame,
      keyCol: String, idCol: String, maxDist: Int,
      blockLen: Int = 4, maxBlock: Long = 1000L): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val nb = blocks(newDf, keyCol, idCol, blockLen)
    val all = oldBlocks.unionByName(nb)
    val sizes = all.groupBy(col("kind"), col("blk"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBlock)
      .select(col("kind"), col("blk"))
    val keptAll = all.join(sizes, Seq("kind", "blk"))
      .select(col("kind"), col("blk"), col("id").as("__ia"),
        col("key").as("__ka"), col("len").as("__la"))
    val keptNew = nb.join(sizes, Seq("kind", "blk"))
      .select(col("kind"), col("blk"), col("id").as("__ib"),
        col("key").as("__kb"), col("len").as("__lb"))
    // corpus-side × batch-side; normalize pair order afterwards (a
    // new-new pair arrives in both orientations, an old-new pair in
    // one — the normalized distinct collapses both cases)
    keptAll.join(keptNew, Seq("kind", "blk"))
      .filter(col("__ia") =!= col("__ib") &&
        abs(col("__la") - col("__lb")) <= maxDist)
      .select(
        least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"),
        when(col("__ia") < col("__ib"), col("__ka")).otherwise(col("__kb"))
          .as("key_a"),
        when(col("__ia") < col("__ib"), col("__kb")).otherwise(col("__ka"))
          .as("key_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("key_a"), col("key_b"), maxDist))
      .filter(col("dist") >= 0)
  }
}
