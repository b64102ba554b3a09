package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Guaranteed heavy hitters — every value whose frequency strictly
  * exceeds `N/k` — by the classic two-pass Misra–Gries recipe, the
  * shape that makes "find the hot keys" survive a 100 TB key space:
  *
  *  1. CANDIDATES: each partition runs a Misra–Gries summary with
  *     `k−1` counters over its own rows (bounded memory, one pass, no
  *     shuffle) and emits only its surviving keys. Pigeonhole gives
  *     the guarantee: a value with global count > N/k has count
  *     > N_p/k in at least one partition p, and MG with `k−1`
  *     counters never evicts a value holding more than a 1/k share of
  *     its partition — so the union of partition survivors is a
  *     SUPERSET of the true heavy hitters. The exchange after pass 1
  *     carries at most `(k−1) · partitions` rows, never the key
  *     space.
  *  2. VERIFY: re-scan with the (tiny, broadcast) candidate set as a
  *     semi-join filter and count exactly — only candidate keys reach
  *     the aggregate, so the shuffle is `O(k · tasks)` partial rows
  *     instead of one per distinct key. Keep `cnt · k > N`.
  *
  * A plain `GROUP BY value HAVING count(*) > N/k` shuffles a partial
  * row per distinct key per task — at corpus scale that is the
  * vocabulary, not the answer. Here the candidate stage's false
  * positives (MG keeps at most `k−1` keys per partition regardless)
  * cost only their exact-count rows; the output itself is EXACT and
  * partitioning-independent: whatever candidate superset a run
  * produces, the verify pass filters it to the same final set.
  *
  * NULL values are excluded up front (a NULL key is a data-quality
  * signal, not a heavy hitter); `N` counts non-NULL rows only.
  */
object HeavyHitters {

  /** Pass-1 Misra–Gries summaries: per-partition candidate keys plus
    * `(NULL, n_p)` partition-size meta rows — the bounded-memory,
    * shuffle-free half of [[exact]], exposed for consumers that persist
    * the candidate SUPERSET as incremental state (the skew advisory in
    * [[Salting]]): a value with global count > N/k holds > N_p/k of
    * some partition (pigeonhole), and the same argument makes
    * candidate-set UNION across daily batches a superset of the
    * period's heavy hitters — additive state, like every sketch here.
    */
  private[operators] def mgSummaries(df: DataFrame, valueCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(k >= 2, s"heavy hitters need k >= 2, got $k")
    val vals: Dataset[String] = df
      .select(col(valueCol).cast("string").as("value"))
      .filter(col("value").isNotNull)
      .as[String]
    // one MG summary per partition; meta rows (null, n_p)
    // carry the partition sizes so N needs no second scan
    val cap = k - 1
    vals.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      var n = 0L
      while (it.hasNext) {
        val v = it.next()
        n += 1L
        counters.get(v) match {
          case Some(c) => counters.update(v, c + 1L)
          case None if counters.size < cap => counters.update(v, 1L)
          case None =>
            // decrement-all: amortized O(1)/row — each trigger burns
            // `cap` units of previously-paid count
            val dead = counters.iterator
              .flatMap { case (key, c) => if (c == 1L) Some(key) else None }
              .toList
            dead.foreach(counters.remove)
            counters.keysIterator.toList
              .foreach(key => counters.update(key, counters(key) - 1L))
        }
      }
      Iterator.single((null: String, n)) ++
        counters.keysIterator.map(v => (v, 0L))
    }.toDF("value", "n_part")
  }

  /** `(value, cnt)` for every non-NULL `valueCol` (compared as string)
    * with `cnt · k > N`, exact counts, ordered `cnt` desc then value.
    * At most `k−1` rows by definition of the threshold.
    */
  def exact(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals: Dataset[String] = df
      .select(col(valueCol).cast("string").as("value"))
      .filter(col("value").isNotNull)
      .as[String]
    val summaries = mgSummaries(df, valueCol, k)
      .localCheckpoint(eager = true) // feeds both N and the candidates
    val nRow = summaries.filter(col("value").isNull)
      .agg(coalesce(sum(col("n_part")), lit(0L)).as("n_total"))
    val cands = summaries.filter(col("value").isNotNull)
      .select(col("value")).distinct()
    vals.toDF("value")
      .join(broadcast(cands), Seq("value"), "left_semi")
      .groupBy(col("value")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(nRow))
      .filter(col("cnt") * k > col("n_total"))
      .select(col("value"), col("cnt"))
      .orderBy(col("cnt").desc, col("value"))
  }
}
