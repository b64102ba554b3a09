package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    // user 1: full ordered funnel
    (1L, ts("2024-01-01 10:00:00"), "view"),
    (1L, ts("2024-01-01 10:05:00"), "click"),
    (1L, ts("2024-01-01 10:10:00"), "purchase"),
    // user 2: purchase BEFORE click — depth stops at click
    (2L, ts("2024-01-01 09:00:00"), "view"),
    (2L, ts("2024-01-01 09:01:00"), "purchase"),
    (2L, ts("2024-01-01 09:02:00"), "click"),
    // user 3: view only
    (3L, ts("2024-01-01 08:00:00"), "view"),
    // user 4: click without view — not in the funnel at all
    (4L, ts("2024-01-01 07:00:00"), "click"),
    // user 5: two views; the EARLIEST anchors the funnel, later click counts
    (5L, ts("2024-01-01 06:00:00"), "view"),
    (5L, ts("2024-01-01 06:30:00"), "view"),
    (5L, ts("2024-01-01 06:10:00"), "click"))
    .toDF("user_id", "ts", "event_type")

  test("strictly-ordered funnel depth") {
    val out = Funnel.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .select("user_id", "depth").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 3, 2L -> 2, 3L -> 1, 5L -> 2))
  }

  test("step timestamps are the earliest valid completion times") {
    val r = Funnel.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .filter($"user_id" === 2L)
      .select("t_view", "t_click", "t_purchase")
      .as[(Timestamp, Timestamp, Option[Timestamp])].head()
    assert(r._1 == ts("2024-01-01 09:00:00"))
    assert(r._2 == ts("2024-01-01 09:02:00"))
    assert(r._3.isEmpty) // the 09:01 purchase precedes the click
  }

  test("retention cohorts by first-event day") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-02 11:00:00")), // same day twice → one active cell
      (2L, ts("2024-01-01 12:00:00")),
      (3L, ts("2024-01-02 09:00:00"))).toDF("user_id", "ts")
    val out = Funnel.retention(ev, "user_id", "ts")
      .select($"cohort_day".cast("string"), $"day_offset", $"n_users")
      .as[(String, Int, Long)].collect().toSet
    assert(out == Set(
      ("2024-01-01", 0, 2L), // users 1,2 on their first day
      ("2024-01-01", 1, 1L), // user 1 returns next day
      ("2024-01-02", 0, 1L))) // user 3's cohort
  }

  test("transitions: counts, exact DIV probabilities, tie-break by " +
      "event id, last events emit nothing, users never interleave") {
    val ev = Seq(
      // user 1: a -> b -> a; user 2: a -> b (same ts: id order decides)
      (1L, 10L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 11L, ts("2024-01-01 10:01:00"), "b"),
      (1L, 12L, ts("2024-01-01 10:02:00"), "a"),
      (2L, 21L, ts("2024-01-01 09:00:00"), "a"),
      (2L, 22L, ts("2024-01-01 09:00:00"), "b"),
      // user 3: one event -> no transition at all
      (3L, 31L, ts("2024-01-01 08:00:00"), "c"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Funnel.transitions(ev, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq
    // a: 2 of 2 go to b -> 1e6; b: 1 of 1 to a; c emits nothing
    assert(out == Seq(
      ("a", "b", 2L, 1000000L),
      ("b", "a", 1L, 1000000L)))
    // uneven split: probabilities are floors that need not sum to 1e6
    val ev2 = (1 to 3).flatMap { u =>
      Seq((u.toLong, u * 10L, ts("2024-01-01 10:00:00"), "x"),
        (u.toLong, u * 10L + 1,
          ts("2024-01-01 10:01:00"), if (u == 1) "y" else "z"))
    }.toDF("user_id", "event_id", "ts", "event_type")
    val out2 = Funnel.transitions(ev2, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(out2 == Seq(
      ("x", "y", 1L, 333333L),
      ("x", "z", 2L, 666666L)))
  }
}
