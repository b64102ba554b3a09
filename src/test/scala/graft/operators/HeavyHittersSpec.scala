package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def run(vals: Seq[String], k: Int, parts: Int = 4): Seq[(String, Long)] =
    HeavyHitters.exact(vals.toDF("v").repartition(parts), "v", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  private def brute(vals: Seq[String], k: Int): Seq[(String, Long)] =
    vals.filter(_ != null).groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
      .filter { case (_, c) => c * k > vals.count(_ != null) }
      .sortBy { case (v, c) => (-c, v) }

  test("exact matches brute force on a skewed stream, strict at the " +
      "N/k boundary, bounded by k-1 rows") {
    // 100 rows: a=40, b=25, c=10 (exactly N/10 -> excluded), rest singletons
    val vals = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(10)("c") ++
      (1 to 25).map(i => s"x$i")
    val got = run(vals, 10)
    assert(got == brute(vals, 10))
    assert(got == Seq(("a", 40L), ("b", 25L))) // c: 10*10 == 100, strict >
    assert(got.size <= 9)
  }

  test("a heavy hitter spread thin across partitions still survives " +
      "(the pigeonhole superset guarantee)") {
    // "h" is ~15% globally (150·8 = 1200 > N = 1030) but each
    // partition sees only a sliver of it amid partition-local noise
    val rng = new scala.util.Random(7)
    val vals = rng.shuffle(
      (Seq.fill(150)("h") ++ (1 to 880).map(i => s"n${i % 440}")).toList)
    for (parts <- Seq(1, 3, 8, 17)) {
      val got = run(vals, 8, parts)
      assert(got == brute(vals, 8), s"parts=$parts")
      assert(got.map(_._1).contains("h"), s"parts=$parts lost h")
    }
  }

  test("NULLs are excluded from both candidates and N; k is validated") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, null), (5L, null), (6L, "b"))
      .toDF("id", "v")
    val got = HeavyHitters.exact(df, "v", 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // non-null N = 4: a(3)*2 > 4 keeps, b(1)*2 <= 4 drops
    assert(got == Seq(("a", 3L)))
    intercept[IllegalArgumentException] {
      HeavyHitters.exact(df, "v", 1)
    }
  }

  test("empty and all-NULL inputs yield no rows") {
    assert(run(Seq.empty[String], 5).isEmpty)
    val allNull = spark.range(5).select(lit(null).cast("string").as("v"))
    assert(HeavyHitters.exact(allNull, "v", 5).count() == 0L)
  }

  test("non-string key types count via their canonical string form") {
    val df = spark.range(100).select((col("id") % 3).as("v"))
    val got = HeavyHitters.exact(df, "v", 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // 0:34, 1:33, 2:33 of 100; threshold 25 -> all three pass
    assert(got == Set(("0", 34L), ("1", 33L), ("2", 33L)))
  }
}
