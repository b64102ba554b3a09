package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {

  import spark.implicits._

  test("byKey: added/removed/changed classed; null fps null-safe; unchanged dropped") {
    val old = Seq((1L, Some("x")), (2L, Some("y")), (3L, None: Option[String]),
      (4L, Some("z"))).toDF("id", "fp")
    val neu = Seq((2L, Some("y2")), (3L, None: Option[String]), (4L, Some("z")),
      (5L, Some("w"))).toDF("id", "fp")
    val got = SnapshotDiff.byKey(old, neu, "id", "fp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "changed", 5L -> "added"),
      s"got $got")
    // 3 (null fp both sides) and 4 (equal fp) must NOT appear
  }

  test("ofSnapshots: diffs two published zone versions") {
    val root = tmpDir("snapdiff")
    val v1 = graft.sources.Zone.writeSnapshot(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "fp"), root)
    val v2 = graft.sources.Zone.writeSnapshot(spark,
      Seq((2L, "b2"), (3L, "c")).toDF("id", "fp"), root)
    val got = SnapshotDiff.ofSnapshots(spark, root, v1, v2, "id", "fp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "changed", 3L -> "added"))
  }
}
