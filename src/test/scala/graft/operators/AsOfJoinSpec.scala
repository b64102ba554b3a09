package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val trades = Seq(
    (1L, "A", 100L),  // before any quote → null
    (2L, "A", 205L),  // after quote@200
    (3L, "A", 300L),  // exactly at quote@300 → ties match (<=)
    (4L, "B", 500L),  // other key
    (5L, "C", 100L),  // key with no quotes at all
  ).toDF("trade_id", "sym", "t")

  private val quotes = Seq(
    ("A", 200L, 10.0),
    ("A", 300L, 11.0),
    ("A", 400L, 12.0),  // in the future of every trade → never matches
    ("B", 400L, 20.0),
  ).toDF("sym", "qt", "px")

  test("as-of semantics: latest at-or-before per key; no match → null") {
    val out = AsOfJoin(trades, quotes, Seq("sym"), "t", "qt", Seq("px"))
      .orderBy("trade_id").collect()
    assert(out.map(r => r.getLong(r.fieldIndex("trade_id"))) sameElements
      Array(1L, 2L, 3L, 4L, 5L))
    assert(out(0).isNullAt(out(0).fieldIndex("px")))          // before first quote
    assert(out(1).getDouble(out(1).fieldIndex("px")) == 10.0) // quote@200
    assert(out(2).getDouble(out(2).fieldIndex("px")) == 11.0) // tie at 300 matches
    assert(out(3).getDouble(out(3).fieldIndex("px")) == 20.0)
    assert(out(4).isNullAt(out(4).fieldIndex("px")))          // key never quoted
  }

  test("every left row survives exactly once; schema = left + payload") {
    val out = AsOfJoin(trades, quotes, Seq("sym"), "t", "qt", Seq("px"))
    assert(out.count() == trades.count())
    assert(out.columns.toSeq == Seq("sym", "t", "trade_id", "px"))
  }

  test("differential: window form == quadratic reference on dense random-ish data") {
    // deterministic pseudo-random scenario with heavy ts collisions
    val ls = (1 to 300).map { i =>
      (i.toLong, s"k${i % 7}", (i * 31 % 50).toLong)
    }.toDF("lid", "k", "t")
    val rs = (1 to 120).map { i =>
      (s"k${i % 9}", (i * 17 % 50).toLong, i.toDouble)
    }.toDF("k", "qt", "v")
      // reference right side unique per (k, ts) — the operator's precondition
      .groupBy("k", "qt").agg(max($"v").as("v"))

    val fast = AsOfJoin(ls, rs, Seq("k"), "t", "qt", Seq("v"))
      .select("lid", "v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // quadratic oracle: per left row, max-qt right row with qt <= t
    val slow = ls.as("l").join(rs.as("r"),
        $"l.k" === $"r.k" && $"r.qt" <= $"l.t", "left_outer")
      .groupBy($"l.lid".as("lid"), $"l.k", $"l.t")
      .agg(max_by($"r.v", $"r.qt").as("v"))
      .select("lid", "v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fast == slow)
  }

  test("plan: one exchange on the key, no nested-loop product") {
    val out = AsOfJoin(trades, quotes, Seq("sym"), "t", "qt", Seq("px"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }
}
