package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: counts, nulls, distincts, ranges; all-null column; subset") {
    val df = Seq((1L, Some("b")), (2L, None), (3L, Some("a")))
      .toDF("id", "s")
      .withColumn("z", lit(null).cast("string"))
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), Option(r.getString(5)))).toMap
    assert(p("id") == ((3L, 0L, 3L, Some("1"), Some("3"))))
    assert(p("s") == ((3L, 1L, 2L, Some("a"), Some("b"))))
    // an all-NULL column: 0 distincts, NULL range — the row must not
    // vanish or crash the cast
    assert(p("z") == ((3L, 3L, 0L, None, None)))
    // explicit subset profiles only what was asked
    assert(Profile.profile(df, Seq("id")).collect().map(_.getString(0)).toSeq
      == Seq("id"))
  }

  test("approxProfile: estimates track exact within HLL error; all-NULL estimates 0") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"lang", $"source")
      .withColumn("z", lit(null).cast("string"))
    val exact = Profile.profile(docs).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profile.approxProfile(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(5))).toMap
    // counts/nulls identical to the exact profile; estimates inside
    // ~3σ of the p=8 HLL (σ ≈ 1.04/√256 ≈ 6.5%) with an absolute
    // floor for tiny cardinalities (linear counting is near-exact
    // there, but floor() can still be off by a count or two)
    approx.foreach { case (c, (nr, nn, est)) =>
      assert(nr == docs.count())
      val ex = exact(c)
      if (c == "z") assert(est == 0L && nn == nr)
      else assert(math.abs(est - ex) <= math.max(2.0, 0.2 * ex),
        s"$c: est $est vs exact $ex")
    }
  }
}
