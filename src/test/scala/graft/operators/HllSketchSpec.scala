package graft.operators

import graft.SparkSpec
import graft.functions.AuditableHash
import org.apache.spark.sql.functions._

class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("estimate tracks the exact distinct count within HLL error bounds") {
    // 3 groups with very different cardinalities; values overlap across
    // groups (registers must be per-group)
    val df = (1 to 60000).map { i =>
      val g = i % 3
      (s"g$g", (i / 3) % (500 * (g + 1) * (g + 1)))
    }.toDF("g", "v")
    val est = HllSketch.approxCountDistinct(df, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("estimate")).toMap
    val exact = df.groupBy("g").agg(countDistinct($"v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      val e = est(g)
      // 1.04/sqrt(256) ≈ 6.5% standard error; allow 4 sigma
      assert(math.abs(e - n).toDouble / n < 0.26,
        s"group $g: estimate $e vs exact $n off by ${math.abs(e - n).toDouble / n}")
    }
  }

  test("merge of daily sketches equals the sketch of the union — exactly") {
    val day1 = (1 to 5000).map(i => ("g", i)).toDF("g", "v")
    val day2 = (3000 to 9000).map(i => ("g", i)).toDF("g", "v")
    val merged = HllSketch.merge(
      HllSketch.registers(day1, Seq("g"), "v"),
      HllSketch.registers(day2, Seq("g"), "v"))(Seq("g"))
    val whole = HllSketch.registers(day1.union(day2), Seq("g"), "v")
    assert(merged.orderBy("register").collect().toSeq ==
      whole.orderBy("register").collect().toSeq)
    // and so do the estimates
    val a = HllSketch.estimate(merged, Seq("g")).select("estimate").head.getLong(0)
    val b = HllSketch.estimate(whole, Seq("g")).select("estimate").head.getLong(0)
    assert(a == b)
  }

  test("register math matches a driver-side reference on the same hash") {
    val vals = Seq("alpha", "beta", "7", "gamma-äöü")
    val got = HllSketch.registers(vals.toDF("v").withColumn("g", lit("x")),
        Seq("g"), "v")
      .select("register", "rank")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val want = vals.map { s =>
      val h = AuditableHash.h60(s)
      val w = h >>> 8
      val bitlen = if (w == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(w)
      ((h % 256).toInt, 53 - bitlen)
    }.groupBy(_._1).map { case (reg, xs) => (reg, xs.map(_._2).max) }.toSet
    assert(got == want)
  }

  test("null values contribute nothing; small-range linear counting engages") {
    val df = (Seq.fill(10)(None: Option[Int]) ++ (1 to 40).map(Some(_)))
      .toDF("v").withColumn("g", lit("x"))
    val out = HllSketch.approxCountDistinct(df, Seq("g"), "v").head
    val hit = out.getAs[Int]("n_registers_hit")
    assert(hit <= 40) // nulls added no registers
    // 40 distinct over 256 registers → raw ≈ small → linear counting path
    val est = out.getAs[Long]("estimate")
    assert(est >= 30 && est <= 50, s"linear-counting estimate $est for exact 40")
  }
}
