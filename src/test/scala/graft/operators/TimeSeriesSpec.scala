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
}
