package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation (SURVEY.md §7.4-7). AQE's skew-join handles
  * most cases at runtime; these are the explicit fallbacks for when it
  * can't — a first-stage aggregation on a pathological key (one
  * employer = 30% of rows at 100 TB), or a shuffled join whose hot keys
  * overflow a single task even after AQE splitting.
  */
object Salting {

  /** Salt from full row content, not `monotonically_increasing_id()`:
    * the id depends on partition layout and within-partition order, so
    * a retried task after a fetch failure could re-salt rows differently
    * and double-count/drop partials (the SPARK-23207 failure class).
    * Content hashing is retry-stable.
    *
    * Limitation (ADVICE r01): byte-identical rows all hash to the same
    * salt, so a hot key dominated by *duplicate* rows would still land
    * in one task. [[saltedSumCount]] closes this by collapsing exact
    * duplicates (with a weight) in a pre-phase whose shuffle key is the
    * full row content — uniformly distributed by construction — before
    * salting; [[saltedJoin]] documents it (join outputs can't be
    * weight-collapsed without changing cardinality).
    */
  private def contentSalt(df: DataFrame, salts: Int) =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts.toLong))

  /** Two-phase (salted) aggregation: rows scatter over `salts`
    * sub-keys, partially aggregate, then combine per real key. Results
    * identical to a direct groupBy for algebraic aggregates (count /
    * sum / min / max — everything decomposable); the hot key's work
    * spreads over `salts` tasks instead of one.
    *
    * Phase 0 collapses byte-identical rows to (row, weight): its
    * group-by key is the entire row content, so even a single
    * million-duplicate row spreads evenly across the cluster (hash of
    * content ≈ uniform), and the later salted phases see at most one
    * row per distinct content. count/sum then aggregate weighted.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
      salts: Int = 16): DataFrame = {
    val distinctRows = df.groupBy(df.columns.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("__w"))
    val salted = distinctRows.withColumn("__salt", contentSalt(df, salts))
    val partialAggs = sum(col("__w")).as("__cnt") +:
      sumCols.map(c => sum(col(c) * col("__w")).as(s"__sum_$c"))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = sum(col("__cnt")).as("n") +:
      sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c"))
    partial.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted inner equi-join for a skewed left side: left rows get a
    * random-but-deterministic salt in [0, salts); the (small but not
    * broadcastable) right side replicates `salts` times. The join key
    * space becomes (keys, salt) — hot keys split across `salts` tasks.
    *
    * Known limitation: the salt is a content hash (retry-stable — see
    * [[contentSalt]]), so byte-identical left rows share a salt and a
    * duplicate-dominated hot key stays in one task. If your skew is
    * duplicate rows rather than distinct rows sharing a key, collapse
    * them first (`groupBy(all columns).count()` → join → re-expand by
    * the weight), or rely on AQE skew-join splitting, which splits by
    * partition size and has no such blind spot.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      salts: Int = 16): DataFrame = {
    val left = skewed.withColumn("__salt", contentSalt(skewed, salts))
    val right = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    left.join(right, keys :+ "__salt").drop("__salt")
  }

  /** Measure before mitigating: per-key-space skew facts that decide
    * between doing nothing, AQE skew splitting, [[saltedSumCount]], or
    * pre-aggregation. One aggregate + a bounded top-k — safe to run on
    * the full fact. Returns a single row:
    * `n_rows, n_keys, max_key_rows, top<k>_rows, skew_ratio`
    * (max key count ÷ mean key count; ≳ 10–100 ⇒ one task owns the
    * hot key's whole shuffle partition without intervention).
    */
  def skewReport(df: DataFrame, keys: Seq[String], topK: Int = 5): DataFrame = {
    val perKey = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
    val top = perKey.orderBy(col("__n").desc).limit(topK)
      .agg(sum(col("__n")).as("__top"))
    perKey.agg(
        sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("__n")).as("max_key_rows"))
      .crossJoin(top)
      .select(col("n_rows"), col("n_keys"), col("max_key_rows"),
        col("__top").as(s"top${topK}_rows"),
        round(col("max_key_rows") * col("n_keys").cast("double") / col("n_rows"), 2)
          .as("skew_ratio"))
  }
}
