package graft.operators

import graft.{SparkSpec, SparkEntry, Tables}
import graft.functions.AuditableHash
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private def skUdaf(k: Int) = udaf(new QuantileSketch.Agg(k),
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))

  test("partitioning-proof through Spark: 1 vs 13 partitions give the " +
      "byte-identical sketch row (level, sample digest, estimates)") {
    def run(parts: Int) = Tables.orders(spark, "/root/testdata/sf0.001")
      .repartition(parts)
      .select($"o_orderpriority",
        AuditableHash.h60($"o_orderkey").as("h"),
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("v"))
      .groupBy($"o_orderpriority")
      .agg(skUdaf(64)($"h", $"v").as("sk"))
      .select($"o_orderpriority", $"sk.n", $"sk.level",
        QuantileSketch.sampleXor($"sk").as("xh"),
        QuantileSketch.estimate($"sk", 50).as("p50"),
        QuantileSketch.estimate($"sk", 99).as("p99"))
      .orderBy($"o_orderpriority")
      .collect().map(_.toString).toSeq
    assert(run(1) == run(13))
  }

  test("rank error vs the exact q157 answer stays inside the sampling " +
      "bound 2.5/sqrt(m) at p50/p90/p99 for every priority") {
    val est = SparkEntry.q167_quantile_sketch(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(3), Seq(r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    val exact = Tables.orders(spark, sf)
      .select($"o_orderpriority",
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((prio, (n, m, ests)) <- est) {
      val sorted = exact(prio)
      assert(n == sorted.length)
      val eps = 2.5 / math.sqrt(m.toDouble)
      for ((q, e) <- Seq(50, 90, 99).zip(ests)) {
        // rank band of the estimate among the true values (ties → band)
        val lo = sorted.indexWhere(_ == e) + 1
        val hi = sorted.lastIndexWhere(_ == e) + 1
        assert(lo >= 1, s"$prio p$q estimate $e not a data value")
        val target = (n * q + 99) / 100
        val slack = math.ceil(eps * n).toLong + 1
        assert(target >= lo - slack && target <= hi + slack,
          s"$prio p$q: est $e rank band [$lo,$hi], target $target, " +
            s"slack $slack (m=$m, n=$n)")
      }
    }
  }

  test("Spark-side rollup: MergeAgg over per-month sketches == one-shot " +
      "sketch per priority (no fact rescan, no error growth on merge)") {
    val mergeUdaf = udaf(new QuantileSketch.MergeAgg(64),
      Encoders.product[QuantileSketch.QSketch])
    val base = Tables.orders(spark, "/root/testdata/sf0.001")
      .select($"o_orderpriority",
        trunc($"o_orderdate".cast("date"), "month").as("mon"),
        AuditableHash.h60($"o_orderkey").as("h"),
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("v"))
    def render(df: org.apache.spark.sql.DataFrame) = df
      .select($"o_orderpriority", $"sk.n", $"sk.level",
        QuantileSketch.sampleXor($"sk").as("xh"),
        QuantileSketch.estimate($"sk", 90).as("p90"))
      .orderBy($"o_orderpriority").collect().map(_.toString).toSeq
    val monthly = base.groupBy($"o_orderpriority", $"mon")
      .agg(skUdaf(64)($"h", $"v").as("sk"))
    val rolled = monthly.groupBy($"o_orderpriority")
      .agg(mergeUdaf($"sk.n", $"sk.level", $"sk.hashes", $"sk.values").as("sk"))
    val oneShot = base.groupBy($"o_orderpriority")
      .agg(skUdaf(64)($"h", $"v").as("sk"))
    assert(render(rolled) == render(oneShot))
    assert(monthly.count() > 5) // the rollup actually merged something
  }

  test("estimate degenerates to exact percentile_disc when nothing " +
      "compacts (n <= k, level 0)") {
    val rows = (1 to 100).map(i => (AuditableHash.h60(s"k$i"), i.toLong))
      .toDF("h", "v")
    val r = rows.agg(skUdaf(1024)($"h", $"v").as("sk"))
      .select($"sk.level",
        QuantileSketch.estimate($"sk", 50).as("p50"),
        QuantileSketch.estimate($"sk", 90).as("p90"),
        QuantileSketch.estimate($"sk", 100).as("p100")).head()
    assert(r.getInt(0) == 0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((50L, 90L, 100L)))
  }
}
