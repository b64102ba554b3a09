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

  test("byKey: schema evolution — added columns ignored; changed only when declared columns changed") {
    // a version that ADDS a column (e.g. a new annotation) must still
    // diff on the declared (key, fp) set: byKey prunes each side to
    // those columns before the join, so the extra column neither
    // breaks the full-outer union nor flips unchanged docs to changed
    val old = Seq((1L, "a"), (2L, "b")).toDF("id", "fp")
    val neu = Seq((1L, "a", "en"), (2L, "b2", "vi"), (3L, "c", "en"))
      .toDF("id", "fp", "lang")
    val got = SnapshotDiff.byKey(old, neu, "id", "fp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1: fp unchanged → dropped despite the new column; 2: fp changed;
    // 3: added. The evolved schema never classes a doc changed on its own.
    assert(got == Map(2L -> "changed", 3L -> "added"), s"got $got")
    // and symmetric: the OLD side may carry columns the new one dropped
    val got2 = SnapshotDiff.byKey(neu, old, "id", "fp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got2 == Map(2L -> "changed", 3L -> "removed"), s"got $got2")
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
