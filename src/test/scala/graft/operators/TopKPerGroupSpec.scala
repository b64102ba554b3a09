package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator top-k == window top-k, including score ties") {
    import org.apache.spark.sql.expressions.Window
    // deterministic data with deliberate ties (score = i % 10)
    val df = (1 to 5000).map(i => (s"g${i % 13}", i.toLong, (i % 10).toDouble))
      .toDF("g", "id", "score")
    val viaAgg = TopKPerGroup(df, Seq("g"), "score", "id", k = 7)
      .select("g", "rank", "score", "id")
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id".asc)
    val viaWindow = df
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 7)
      .select("g", "rank", "score", "id")
    assert(viaAgg.count() == viaWindow.count())
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("groups smaller than k return all their rows, ranked") {
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 3.0), ("b", 3L, 1.0)).toDF("g", "id", "score")
    val out = TopKPerGroup(df, Seq("g"), "score", "id", k = 10)
      .orderBy("g", "rank").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("id") == 1L && out(0).getAs[Int]("rank") == 1)
    assert(out(1).getAs[Long]("id") == 2L && out(1).getAs[Int]("rank") == 2)
  }

  test("partial aggregation engages (the shuffle carries k per group per task, not all rows)") {
    val df = (1 to 1000).map(i => (s"g${i % 3}", i.toLong, i.toDouble)).toDF("g", "id", "score")
    val plan = TopKPerGroup(df, Seq("g"), "score", "id", k = 5)
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate|SortAggregate|HashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final aggregate: ${plan.take(2000)}")
  }
}
