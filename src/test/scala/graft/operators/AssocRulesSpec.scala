package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AssocRulesSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, String)], minSup: Long,
      minConf: Long = 0L, maxItems: Int = Int.MaxValue) =
    AssocRules.rules(rows.toDF("b", "i"), "b", "i", minSup, minConf, maxItems)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSeq

  test("hand-checked rules: support counts baskets, confidence and " +
      "lift are the integer DIV quotients, both directions emitted") {
    // 5 baskets: {m,b} x3, {m} x1, {b,e} x1
    // supp(m)=4, supp(b)=4, supp(e)=1, supp(mb)=3
    val rows = Seq(
      "1" -> "milk", "1" -> "bread",
      "2" -> "milk", "2" -> "bread",
      "3" -> "milk", "3" -> "bread",
      "4" -> "milk",
      "5" -> "bread", "5" -> "eggs")
    val got = run(rows, minSup = 2L)
    // conf(m->b) = 3*1e6 // 4 = 750000; lift = 3*5*1e6 // 16 = 937500
    assert(got.toSet == Set(
      ("bread", "milk", 3L, 750000L, 937500L),
      ("milk", "bread", 3L, 750000L, 937500L)))
    // eggs (supp 1) pruned by Apriori before pairs; a minConf gate
    // above 750000 empties the output
    assert(run(rows, 2L, minConf = 800000L).isEmpty)
  }

  test("duplicate incidence rows collapse; NULL baskets/items drop") {
    val rows = Seq(
      ("1", "a"), ("1", "a"), ("1", "b"), ("1", "b"),
      ("2", "a"), ("2", "b"),
      (null, "a"), ("3", null)).asInstanceOf[Seq[(String, String)]]
    val got = run(rows, minSup = 2L)
    // 2 baskets with {a,b}: supp(a)=supp(b)=supp(ab)=2, N=2 (null rows
    // never create baskets) -> conf 1e6, lift 2*2*1e6//4 = 1e6
    assert(got.toSet == Set(
      ("a", "b", 2L, 1000000L, 1000000L),
      ("b", "a", 2L, 1000000L, 1000000L)))
  }

  test("hot-basket guard drops oversized baskets after the prune, " +
      "deterministically — and scores over the POST-drop population") {
    // two "big" baskets hold 4 frequent items each, 8 small hold 2;
    // with the cap active, supports and N are recomputed over the kept
    // incidence (one population: dividing post-drop pair counts by
    // pre-drop supports would underestimate confidence for i1/i2,
    // which ride the dropped baskets — the ADVICE r10 mix)
    val rows = (1 to 2).flatMap(b => (1 to 4).map(i => s"big$b" -> s"i$i")) ++
      (1 to 8).flatMap(b => Seq(s"b$b" -> "i1", s"b$b" -> "i2"))
    val unguarded = run(rows, minSup = 2L)
    assert(unguarded.exists(r => r._1 == "i3")) // big pairs present
    val guarded = run(rows, minSup = 2L, maxItems = 3)
    // bigs dropped: only (i1,i2) survives — ps=8, supp(i1)=supp(i2)=8
    // and N=8 over the kept baskets, so conf = lift = exactly 1
    assert(guarded.toSet == Set(
      ("i1", "i2", 8L, 1000000L, 1000000L),
      ("i2", "i1", 8L, 1000000L, 1000000L)))
    intercept[IllegalArgumentException] { run(rows, 2L, maxItems = 1) }
    intercept[IllegalArgumentException] { run(rows, 0L) }
  }

  test("partitioning-invariant") {
    val rows = (1 to 50).flatMap { b =>
      val items = Seq("x", "y", "z").take(1 + b % 3)
      items.map(i => (s"b$b", i))
    }
    val base = run(rows, 5L)
    val re = AssocRules.rules(rows.toDF("b", "i").repartition(13), "b", "i", 5L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(base == re)
  }
}
