package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over an event stream: funnel progression
  * and cohort retention — the two standard product-analytics rollups a
  * warehouse serves from its event fact (the reference's dashboards
  * aggregate one-dimensional counts only, `config.xml:86-123`; these
  * are their sequence-aware extension).
  *
  * Scale shape: every aggregation and join here keys on the user id —
  * one hash-partitioning reused across all stages (AQE coalesces the
  * exchanges), no windows over the full event table, no driver-side
  * state. Step count k adds k small joins of per-user aggregates
  * (row count = distinct users, not events).
  */
object Funnel {

  /** Strictly-ordered funnel: for each user, the earliest timestamp at
    * which each step completes, where step i+1 must occur strictly
    * after step i's completion time (the "earliest completion" funnel
    * — greedy earliest choice per step is optimal, so this finds a
    * valid ordered traversal iff one exists). Output: one row per user
    * that completed step 1, `t_<step>` columns (NULL once the funnel
    * breaks) and `depth` = number of completed steps.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val head = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as(s"t_${steps.head}"))
    val full = steps.zipWithIndex.tail.foldLeft(head) { case (acc, (step, i)) =>
      val prevTs = s"t_${steps(i - 1)}"
      val next = events.filter(col(typeCol) === step).as("e")
        .join(acc.select(col(userCol), col(prevTs)).as("p"),
          col(s"e.$userCol") === col(s"p.$userCol"))
        .filter(col(s"e.$tsCol") > col(s"p.$prevTs"))
        .groupBy(col(s"e.$userCol").as(userCol))
        .agg(min(col(s"e.$tsCol")).as(s"t_$step"))
      acc.join(next, Seq(userCol), "left")
    }
    val depth = steps.map(s => when(col(s"t_$s").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    full.withColumn("depth", depth)
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: for every ordered pair of event types, how often does
    * `from` lead directly to `to` in some user's history, and with
    * what probability — the "what do users do next" rollup behind
    * path-analysis sankeys and next-action models.
    *
    * Sequences order by `(tsCol, tieCol)` per user; `tieCol` must
    * make the order total (an event id), or same-timestamp pairs
    * would be partitioning-dependent. A user's LAST event emits no
    * transition (no synthetic terminal state — callers wanting one
    * can union a sentinel row per user). Probabilities are exact
    * fixed point: `p_fp = n · scale DIV Σ_to n`, rows ordered
    * `(from_type, to_type)`.
    *
    * Scale shape: the one window partitions by USER — each partition
    * is one user's history (the q39 sessionize carve-out: bounded by
    * per-user activity, never corpus-sized) — and everything after is
    * type-pair-cardinality: a count aggregate, a per-from total
    * re-aggregated FROM the pair counts (not a second corpus pass),
    * and one pair-sized join.
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String,
      scale: Long = 1000000L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n_trans")).as("__tot"))
    pairs.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n_trans"),
        expr(s"n_trans * CAST($scale AS BIGINT) DIV __tot").as("p_fp"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Cohort retention: users are cohorted by their first-ever event
    * date; each (cohort_day, day_offset) cell counts the distinct
    * users of that cohort active `day_offset` days later. The classic
    * retention triangle, as one user-keyed join of two user-keyed
    * aggregates.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firsts = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    val active = events
      .select(col(userCol), to_date(col(tsCol)).as("day"))
      .dropDuplicates(userCol, "day")
    active.join(firsts, userCol)
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }
}
