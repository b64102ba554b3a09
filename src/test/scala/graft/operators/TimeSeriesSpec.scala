package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  private def frame = Seq(
    ("a", d("2020-01-01"), 10L),
    ("a", d("2020-01-02"), 20L),
    // 01-03, 01-04 missing
    ("a", d("2020-01-05"), 50L),
    // group b starts later — no phantom back-fill to 01-01
    ("b", d("2020-01-04"), 4L))
    .toDF("g", "day", "v")

  test("dateSpine: per-group [min, max] spans only — a late group is " +
      "not back-filled with phantom days") {
    val s = TimeSeries.dateSpine(frame, "day", Seq("g"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString)).toSet
    assert(s == Set(
      ("a", "2020-01-01"), ("a", "2020-01-02"), ("a", "2020-01-03"),
      ("a", "2020-01-04"), ("a", "2020-01-05"), ("b", "2020-01-04")))
  }

  test("gapFill: forward fill carries the LAST value, gap rows are " +
      "flagged, observations keep their own value") {
    val f = TimeSeries.gapFill(frame, "day", Seq("g"), "v")
      .orderBy($"g", $"day")
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(f.toSeq == Seq(
      ("a", "2020-01-01", 10L, false),
      ("a", "2020-01-02", 20L, false),
      ("a", "2020-01-03", 20L, true),
      ("a", "2020-01-04", 20L, true),
      ("a", "2020-01-05", 50L, false),
      ("b", "2020-01-04", 4L, false)))
  }

  test("gapFill: a leading gap is NULL — unknowable history is never " +
      "invented") {
    val withLead = frame.unionByName(
      Seq(("b", d("2020-01-06"), 6L)).toDF("g", "day", "v"))
      .filter(!($"g" === "b" && $"day" === d("2020-01-04")) || $"v" =!= 4L)
    // drop b's first observation so its spine starts mid-gap? instead:
    // force a spine wider than the data via an all-NULL first day
    val sparse = Seq(("c", d("2020-01-01"), null.asInstanceOf[java.lang.Long]),
      ("c", d("2020-01-03"), 3L: java.lang.Long)).toDF("g", "day", "v")
    val f = TimeSeries.gapFill(sparse, "day", Seq("g"), "v")
      .orderBy($"day").collect()
    assert(f(0).isNullAt(3) && f(1).isNullAt(3) && !f(2).isNullAt(3))
    assert(withLead.count() > 0) // fixture sanity
  }

  test("rolling: RANGE semantics — punched days SHRINK the window " +
      "(a ROWS frame would silently stretch the time span)") {
    val r = TimeSeries.rolling(frame.filter($"g" === "a"), "day",
        Seq("g"), "v", days = 3)
      .orderBy($"day")
      .collect().map(x => (x.getDate(1).toString, x.getDouble(3)))
    assert(r.toSeq == Seq(
      ("2020-01-01", 10.0),           // {10}
      ("2020-01-02", 15.0),           // {10, 20}
      ("2020-01-05", 50.0)))          // 01-03/04 absent → window = {50}
    // the naive ROWS-3 frame would have averaged {10,20,50} = 26.67 on
    // 01-05 — the bug the RANGE window exists to prevent
  }

  test("rolling: timezone-proof — calendar-day RANGE keys give the same " +
      "window across a DST fall-back under a non-UTC session timezone") {
    // 2021-11-07 is the US fall-back (25-hour day in America/New_York);
    // an epoch-seconds RANGE keyed at 86400 s/day silently drops the
    // boundary day of a trailing window that spans it (ADVICE r10)
    val rows = Seq(("g", d("2021-11-06"), 10L), ("g", d("2021-11-07"), 20L),
      ("g", d("2021-11-08"), 30L)).toDF("g", "day", "v")
    val tzBefore = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val r = TimeSeries.rolling(rows, "day", Seq("g"), "v", days = 2)
        .orderBy($"day")
        .collect().map(x => (x.getDate(1).toString, x.getDouble(3)))
      assert(r.toSeq == Seq(("2021-11-06", 10.0),
        ("2021-11-07", 15.0),   // {10,20} — the 25-h day must not evict 11-06
        ("2021-11-08", 25.0)))  // {20,30}
    } finally spark.conf.set("spark.sql.session.timeZone", tzBefore)
  }

  test("madOutliers: a planted spike flags, the median ignores it, " +
      "and the x2/x4 fixed-point units are exact on even counts") {
    // group a: values 10,12,14,16,18,1000 (n=6, even)
    // sorted: 10,12,14,16,18,1000 -> med = (14+16)/2 = 15, med_x2 = 30
    // devs:    5, 3, 1,  1, 3, 985 -> sorted 1,1,3,3,5,985
    //          mad = (3+3)/2 = 3, mad_x4 = 12
    // flag: 0.6745*dev > 3.5*3 = 10.5 -> only dev=985
    val rows = Seq(10L, 12L, 14L, 16L, 18L, 1000L).zipWithIndex
      .map { case (v, i) => ("a", d(s"2020-01-0${i + 1}"), v) }
      .toDF("g", "day", "v")
    val out = TimeSeries.madOutliers(rows, "day", Seq("g"), "v")
      .orderBy($"day")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
    assert(out.forall(r => r._2 == 30L && r._3 == 12L))
    assert(out.map(_._4).toSeq ==
      Seq(false, false, false, false, false, true))
  }

  test("madOutliers: MAD = 0 flags any deviation and never the " +
      "identical majority; groups are independent") {
    // group c: 7 identical + one barely-different point
    val rows = (1 to 7).map(i => ("c", d(s"2020-02-0$i"), 5L)) :+
      (("c", d("2020-02-08"), 6L)) :+ (("solo", d("2020-02-01"), 99L))
    val out = TimeSeries.madOutliers(rows.toDF("g", "day", "v"),
        "day", Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(5)))
    assert(out.count(_._3) == 1)
    assert(out.find(_._3).get._2 == 6L) // only the deviant flags
    assert(!out.find(_._1 == "solo").get._3) // single point: dev 0
  }
}
