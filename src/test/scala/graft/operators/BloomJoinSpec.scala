package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloom-prefiltered join result == plain join (long key)") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val pre = BloomJoin.prefilteredJoin(items, orders, "o_orderkey",
      expectedItems = 10000)
    val plain = items.join(orders, "o_orderkey")
    assert(pre.count() == plain.count())
    assert(pre.exceptAll(plain).isEmpty && plain.exceptAll(pre).isEmpty)
  }

  test("bloom-prefiltered join result == plain join (string key)") {
    val big = Seq("a", "b", "c", "d", "e", "a").toDF("k")
    val small = Seq(("a", 1), ("c", 2)).toDF("k", "v")
    val pre = BloomJoin.prefilteredJoin(big, small, "k", expectedItems = 100)
      .as[(String, Int)].collect().sorted.toSeq
    assert(pre == Seq(("a", 1), ("a", 1), ("c", 2)))
  }

  test("probe never yields false negatives and drops most non-members") {
    val keys = (0L until 1000L).toDF("k")
    val members = (0L until 1000L by 100).toDF("k")
    val probe = BloomJoin.mightContain(members, "k", expectedItems = 10, fpp = 0.01)
    val kept = keys.filter(probe(col("k"))).as[Long].collect().toSet
    assert((0L until 1000L by 100).forall(kept.contains)) // no false negatives
    assert(kept.size < 100) // ~10 members + ~1% fp of 990
  }

  test("null keys never pass the probe") {
    val big = Seq(Some(1L), None, Some(2L)).toDF("k")
    val small = Seq(1L).toDF("k")
    val probe = BloomJoin.mightContain(small, "k", expectedItems = 10)
    assert(big.filter(probe(col("k"))).count() == 1)
  }

  test("integral key types all take the long probe (short keys would silently empty the join)") {
    import spark.implicits._
    val big = Seq(1, 2, 3, 4, 5).toDF("k").select($"k".cast("smallint").as("k"))
    val small = Seq(2, 4).toDF("k").select($"k".cast("smallint").as("k"))
    val out = BloomJoin.prefilteredJoin(big, small, "k", expectedItems = 10)
    assert(out.count() == 2L)
    intercept[IllegalArgumentException] {
      BloomJoin.mightContain(Seq(1.5).toDF("k"), "k", 10)
    }
  }
}
