package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation == direct aggregation (skewed key)") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_l_quantity"))
    val salted = Salting.saltedSumCount(li, Seq("l_returnflag"), Seq("l_quantity"), 8)
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("salted aggregation correct with duplicate-dominated hot key") {
    // a hot key made of byte-identical rows (the ADVICE r01 blind spot):
    // phase 0 collapses them to (row, weight), so counts/sums stay exact
    val dup = Seq.fill(5000)(("HOT", 2.0)) ++ Seq(("a", 1.0), ("b", 3.0), ("b", 4.0))
    val df = dup.toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum($"v").as("sum_v"))
    val salted = Salting.saltedSumCount(df, Seq("k"), Seq("v"), 8)
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("AQE splits a skewed join partition at runtime (the zero-code skew path)") {
    // Salting is the explicit mitigation; AQE skew-join is the ambient
    // one — this locks in that it actually engages. One hot key
    // dominates the left side; with the skew thresholds forced low, the
    // final adaptive plan must mark the sort-merge join skew=true (hot
    // partition split into parallel tasks).
    val conf = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val left = (Seq.tabulate(20000)(i => (1L, s"payload_left_$i")) ++
        Seq.tabulate(200)(i => (i.toLong + 2, s"cold_$i"))).toDF("k", "l")
      val right = Seq.tabulate(300)(i => (i.toLong, s"r_$i")).toDF("k", "r")
      val joined = left.join(right, "k")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p.take(3000))
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("salted join == plain join (row multiset)") {
    val dir = "/root/testdata/sf0.001"
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(spark, dir).select($"c_custkey".as("o_custkey"), $"c_mktsegment")
    val plain = o.join(c, Seq("o_custkey"))
    val salted = Salting.saltedJoin(o, c, Seq("o_custkey"), 8)
      .select(plain.columns.map(col).toIndexedSeq: _*)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("skewReport quantifies a planted hot key") {
    import spark.implicits._
    // 1000 rows on key 'hot', 10 each on 100 cold keys
    val df = (Seq.fill(1000)("hot") ++ (1 to 100).flatMap(k => Seq.fill(10)(s"k$k")))
      .toDF("k")
    val r = Salting.skewReport(df, Seq("k")).head
    assert(r.getAs[Long]("n_rows") == 2000L)
    assert(r.getAs[Long]("n_keys") == 101L)
    assert(r.getAs[Long]("max_key_rows") == 1000L)
    // max=1000 vs mean≈19.8 → ratio ≈ 50.5
    assert(r.getAs[Double]("skew_ratio") > 40.0)
    // uniform data reports ratio ≈ 1
    val uni = (1 to 100).flatMap(k => Seq.fill(10)(s"k$k")).toDF("k")
    assert(Salting.skewReport(uni, Seq("k")).head.getAs[Double]("skew_ratio") == 1.0)
  }
}
