package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = (1 to 3000).map { i =>
    // key 1 is a heavy hitter (~1/3 of rows); the rest long-tail
    if (i % 3 == 0) 1L else (i % 500).toLong
  }.toDF("k")

  test("estimates are upper bounds and exact sans collisions") {
    val df = skewed
    val sk = CountMin.sketch(df, Seq.empty, "k")
    val est = CountMin.estimate(sk, df.distinct(), Seq.empty, "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS estimate ${est(k)} below true count $n for key $k")
      // ε = e/1024 ≈ 0.27% of N=3000 ≈ 8 per row; min over 4 rows
      assert(est(k) <= n + 40, s"CMS estimate ${est(k)} way above $n for key $k")
    }
    // the heavy hitter surfaces by estimate alone
    assert(est.maxBy(_._2)._1 == 1L)
  }

  test("merge of partition sketches equals the whole-data sketch exactly") {
    val df = skewed
    val (a, b) = (df.filter($"k" < 100), df.filter($"k" >= 100))
    val merged = CountMin.merge(
      CountMin.sketch(a, Seq.empty, "k"),
      CountMin.sketch(b, Seq.empty, "k"))(Seq.empty)
    val whole = CountMin.sketch(df, Seq.empty, "k")
    assert(merged.orderBy("row", "bucket").collect().toSeq ==
      whole.orderBy("row", "bucket").collect().toSeq)
  }

  test("grouped sketches keep groups apart; weights add instead of 1") {
    val df = Seq(("g1", "x", 5L), ("g1", "x", 7L), ("g2", "x", 100L))
      .toDF("g", "k", "w")
    val sk = CountMin.sketch(df, Seq("g"), "k", weightCol = Some("w"))
    val est = CountMin.estimate(sk, df.select("g", "k").distinct(), Seq("g"), "k")
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(est("g1") == 12L && est("g2") == 100L)
  }
}
