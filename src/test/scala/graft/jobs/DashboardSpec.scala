package graft.jobs

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DashboardSpec extends SparkSpec {
  import spark.implicits._

  private def events = Tables.events(spark, "/root/testdata/sf0.001")

  test("cubeDaily: additive metrics roll up exactly from detail cells " +
      "to every subtotal; exact distincts deliberately do NOT") {
    val cube = Dashboard.cubeDaily(events).cache()
    try {
      val detail = cube.filter($"gid" === 0)
      // grouping_id is MSB-first over cube(event_type, day):
      // gid 1 = day aggregated away (per-type rollup), 2 = per-day
      val byType = cube.filter($"gid" === 1)
      val grand = cube.filter($"gid" === 3).head()
      // n_events is additive: each subtotal equals the sum of its details
      val rolled = detail.groupBy("event_type")
        .agg(sum("n_events").as("want")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      byType.collect().foreach { r =>
        assert(r.getAs[Long]("n_events") == rolled(r.getAs[String]("event_type")))
      }
      assert(grand.getAs[Long]("n_events") == rolled.values.sum)
      // n_users is NOT additive (same user on many days) — the reason
      // the cube materializes subtotals at all
      val naive = detail.groupBy("event_type").agg(sum("n_users").as("s"))
        .agg(max("s")).head().getLong(0)
      val trueMax = byType.agg(max("n_users")).head().getLong(0)
      assert(trueMax < naive, "distinct users must be < summed per-day distincts")
      // exactly 4 grouping sets; gid labels them
      assert(cube.select("gid").distinct().as[Int].collect().sorted.toSeq ==
        Seq(0, 1, 2, 3))
    } finally cube.unpersist()
  }

  test("pivotDaily: dense stable schema — absent types are 0 columns, " +
      "row counts reconcile with the unpivoted aggregate") {
    val types = Seq("click", "error", "purchase", "signup", "view", "nosuch")
    val p = Dashboard.pivotDaily(events, types)
    assert(p.columns.toSeq == "day" +: types, "explicit values pin the schema")
    assert(p.agg(sum("nosuch")).head().getLong(0) == 0L,
      "a type with no events is a dense zero column, not a missing one")
    val total = types.map(t => p.agg(sum(col(t))).head().getLong(0)).sum
    assert(total == events.count())
  }
}
