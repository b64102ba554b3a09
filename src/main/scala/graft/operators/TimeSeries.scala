package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series repair over PRE-AGGREGATED daily frames — the
  * resample/fill toolkit every metrics mart needs (a feed that skips
  * a day must not silently shorten averages or break charts).
  *
  * Scale contract: every operator here consumes a `(group…, day,
  * value)` frame that is already one row per (group, day) — i.e. the
  * OUTPUT of a daily aggregate, bounded by groups × days, never raw
  * corpus rows. The windows partition by group and hold ≤ #days rows
  * each (the q73 bounded-window carve-out); the spine explode adds at
  * most groups × span rows. Aggregate first, repair second.
  */
object TimeSeries {

  /** Dense per-group daily spine: one row per (group, day) for every
    * day in the group's OWN [min, max] span (a group that started
    * late is not back-filled with phantom days). One tiny aggregate +
    * a `sequence` explode.
    */
  def dateSpine(df: DataFrame, dayCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    df.groupBy(groupCols.map(col): _*)
      .agg(min(col(dayCol)).as("__lo"), max(col(dayCol)).as("__hi"))
      .select(groupCols.map(col) :+
        explode(sequence(col("__lo"), col("__hi"),
          expr("interval 1 day"))).as(dayCol): _*)
  }

  /** Fill the gaps of a sparse daily frame against its [[dateSpine]]:
    * every missing (group, day) gains a row with
    *  - `<valueCol>_filled`: the last seen value carried forward
    *    (NULL until the group's first observation — leading gaps are
    *    unknowable, not zero), and
    *  - `was_gap`: TRUE on spine-created rows — repairs stay visible
    *    to downstream consumers instead of masquerading as data.
    * Other columns survive with NULLs on gap rows.
    */
  def gapFill(df: DataFrame, dayCol: String, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val spine = dateSpine(df, dayCol, groupCols)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(df.withColumn("__obs", lit(true)),
        groupCols :+ dayCol, "left")
      .withColumn(s"${valueCol}_filled",
        last(col(valueCol), ignoreNulls = true).over(w))
      .withColumn("was_gap", coalesce(col("__obs"), lit(false)) === false)
      .drop("__obs")
  }

  /** Robust anomaly flagging by median / MAD (the modified z-score of
    * Iglewicz & Hoaglin): a point is anomalous when
    * `0.6745 · |x − median| > k · MAD`, with `MAD = median(|x −
    * median|)` — the robust-statistics outlier rule that, unlike
    * mean/stddev z-scores, is not itself dragged by the outliers it
    * is hunting (breakdown point 50%).
    *
    * Exact integer arithmetic throughout: `valueCol` must be integer
    * (fixed-point upstream, like every scored surface here). The two
    * medians are linear-interpolation percentiles over integers, so
    * `2·median` and `4·MAD` are exact integers — the output carries
    * `med_x2` and `mad_x4` in those doubled units, and the flag is
    * the division-free cross-multiplication
    * `0.6745·dev > k·MAD ⟺ 13490000·dev_x2 > 10000·k_fp3·mad_x4`
    * (dev = dev_x2/2, MAD = mad_x4/4, k = k_fp3/1000). `MAD = 0`
    * (over half the group identical) flags any deviation — the
    * documented degenerate case of the rule.
    *
    * Scale shape: two group-cardinality aggregates + two group-keyed
    * joins back onto the daily frame — no per-group sort window, so
    * the frame's own partitioning survives and a group with a million
    * days never single-tasks a sort.
    */
  def madOutliers(df: DataFrame, dayCol: String, groupCols: Seq[String],
      valueCol: String, kFp3: Long = 3500L): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(kFp3 >= 0, s"threshold must be nonnegative, got $kFp3")
    val med = df.groupBy(groupCols.map(col): _*)
      .agg((percentile(col(valueCol), lit(0.5)) * 2)
        .cast("long").as("med_x2"))
    val withMed = df.join(med, groupCols)
      .withColumn("__dev_x2", abs(col(valueCol) * 2 - col("med_x2")))
    val mad = withMed.groupBy(groupCols.map(col): _*)
      .agg((percentile(col("__dev_x2"), lit(0.5)) * 2)
        .cast("long").as("mad_x4"))
    withMed.join(mad, groupCols)
      .withColumn("is_outlier",
        lit(13490000L) * col("__dev_x2") > lit(10000L) * kFp3 * col("mad_x4"))
      .drop("__dev_x2")
  }

  /** Trailing `days`-day rolling aggregate over a (possibly sparse)
    * daily frame: a RANGE window on the day's epoch seconds, so
    * missing days genuinely shrink the window instead of stretching
    * it (ROWS BETWEEN over sparse data silently widens the time
    * span — the classic resample bug). Returns the input plus
    * `<valueCol>_roll` = the rolling mean rounded to 2dp (gap-fill
    * first with zeros if absent days should count as 0).
    *
    * The RANGE key is the CALENDAR day number (`datediff` from epoch),
    * not epoch seconds: a seconds-based span assumes 86400 s/day,
    * which a non-UTC DST session timezone breaks (fall-back days are
    * 90000 s — a trailing k-day window silently drops its boundary
    * day). Day arithmetic is timezone-free, so the operator is safe
    * for library callers regardless of `spark.sql.session.timeZone`.
    */
  def rolling(df: DataFrame, dayCol: String, groupCols: Seq[String],
      valueCol: String, days: Int): DataFrame = {
    require(days >= 1, "window must be at least one day")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(datediff(col(dayCol), lit("1970-01-01")))
      .rangeBetween(-(days.toLong - 1), 0L)
    df.withColumn(s"${valueCol}_roll",
      round(avg(col(valueCol)).over(w), 2))
  }
}
