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

  test("ladder beats the plain sampler at equal persisted size: realized " +
      "rank error of LadderAgg(64,4) strictly below Agg(64) against the " +
      "exact sort, and inside its own combined bound") {
    val exact = Tables.orders(spark, sf)
      .select($"o_orderpriority",
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap

    // realized rank error of one estimate: distance (in ranks) from the
    // target rank to the estimate's tie band in the exact data, as a
    // fraction of n
    def err(sorted: Array[Long], n: Int, q: Int, e: Long): Double = {
      val lo = sorted.indexWhere(_ == e) + 1
      val hi = sorted.lastIndexWhere(_ == e) + 1
      assert(lo >= 1, s"estimate $e is not a data value")
      val target = (n.toLong * q + 99) / 100
      (math.max(0L, math.max(lo - target, target - hi))).toDouble / n
    }

    def errors(estRows: Array[(String, Seq[Long])]): Map[String, Double] =
      estRows.map { case (prio, ests) =>
        val sorted = exact(prio).toArray
        prio -> Seq(50, 90, 99).zip(ests)
          .map { case (q, e) => err(sorted, sorted.length, q, e) }.sum
      }.toMap

    val base = Tables.orders(spark, sf)
      .select($"o_orderpriority",
        AuditableHash.h60($"o_orderkey").as("h"),
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("v"))
    def run(agg: org.apache.spark.sql.Column) = base
      .groupBy($"o_orderpriority").agg(agg.as("sk"))
      .select($"o_orderpriority", size($"sk.values").as("m"),
        QuantileSketch.estimate($"sk", 50),
        QuantileSketch.estimate($"sk", 90),
        QuantileSketch.estimate($"sk", 99))
      .collect()
      .map(r => (r.getString(0), r.getInt(1),
        Seq(r.getLong(2), r.getLong(3), r.getLong(4))))

    val plain = run(skUdaf(64)($"h", $"v"))
    val ladUdaf = udaf(new QuantileSketch.LadderAgg(64, 4),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    val ladder = run(ladUdaf($"h", $"v"))

    // equal persisted size: both retain <= 64 pairs per group
    assert(plain.forall(_._2 <= 64) && ladder.forall(_._2 <= 64))

    val pe = errors(plain.map(t => (t._1, t._3)))
    val le = errors(ladder.map(t => (t._1, t._3)))
    val (pSum, lSum) = (pe.values.sum, le.values.sum)
    assert(lSum < pSum,
      s"ladder total rank error $lSum not below sampler's $pSum " +
        s"(per-group ladder=$le sampler=$pe)")
    // and the ladder sits inside its own combined bound: buffer
    // sampling (2.5/sqrt(1024)) + cascade (<= 2^rounds buffer-units
    // ~ 16/1024) per estimate
    val bound = 2.5 / math.sqrt(1024.0) + 16.0 / 1024.0
    for ((prio, e) <- le)
      assert(e / 3 <= bound, s"$prio ladder mean error ${e / 3} > $bound")
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
