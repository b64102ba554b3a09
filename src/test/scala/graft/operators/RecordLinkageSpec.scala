package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._
  import RecordLinkage._

  test("weights are the exact fixed-point log-likelihoods; verdict " +
      "boundaries are inclusive") {
    val f = FieldSpec("x", 990000L, 1000L)
    import graft.plans.Log2Fp.log2Fp
    assert(f.agreeFp == log2Fp(990000L) - log2Fp(1000L))
    assert(f.disagreeFp == log2Fp(10000L) - log2Fp(999000L))
    assert(f.agreeFp > 0 && f.disagreeFp < 0)

    val a = Seq((1L, "k", "same"), (2L, "k", "same")).toDF("id", "blk", "x")
    val b = Seq((10L, "k", "same"), (11L, "k", "diff")).toDF("id", "blk", "x")
    // match exactly AT the agree weight; possible strictly below it
    val out = link(a, b, "id", Seq("blk"),
        Seq(f), matchFp = f.agreeFp, possibleFp = f.disagreeFp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(4))).toSet
    assert(out == Set((1L, 10L, "match"), (2L, 10L, "match"),
      (1L, 11L, "possible"), (2L, 11L, "possible")))
    // raise the floor: disagreements drop out entirely
    val strict = link(a, b, "id", Seq("blk"),
      Seq(f), matchFp = f.agreeFp, possibleFp = f.agreeFp)
    assert(strict.filter($"verdict" === "possible").isEmpty)
  }

  test("NULL fields: two NULLs agree under the default comparator; a " +
      "NULL fuzzy comparison counts as disagreement, never a NULL row") {
    val a = Seq((1L, "k", null.asInstanceOf[String])).toDF("id", "blk", "x")
    val b = Seq((2L, "k", null.asInstanceOf[String]),
      (3L, "k", "v")).toDF("id", "blk", "x")
    val eqF = FieldSpec("x", 900000L, 100000L)
    val got = link(a, b, "id", Seq("blk"), Seq(eqF),
        matchFp = eqF.agreeFp, possibleFp = Long.MinValue + 1)
      .collect().map(r => (r.getLong(1), r.getBoolean(2), r.getString(4)))
      .toSet
    assert(got == Set((2L, true, "match"), (3L, false, "possible")))
    val fuzzy = FieldSpec("x", 900000L, 100000L,
      (p, q) => levenshtein(p, q) <= 1) // NULL input → NULL → disagree
    val got2 = link(a, b, "id", Seq("blk"), Seq(fuzzy),
        matchFp = fuzzy.agreeFp, possibleFp = Long.MinValue + 1)
      .collect().map(r => (r.getLong(1), r.getBoolean(2))).toSet
    assert(got2 == Set((2L, false), (3L, false)))
  }

  test("blocking is a real equi-join: pairs never cross blocks, and " +
      "block-key choice bounds the candidate count") {
    val cust = Tables.customer(spark, "/root/testdata/sf0.001")
      .withColumn("bal_bucket", floor($"c_acctbal" / 1000.0).cast("long"))
    val cand = candidates(cust, cust, "c_custkey",
      Seq("c_nationkey", "c_mktsegment", "bal_bucket"))
    val n = cust.count()
    val c = cand.count()
    assert(c < n * n / 10, s"blocking must prune the cross product ($c of ${n * n})")
    // every pair shares all three block values by construction
    assert(cand.columns.count(_ == "c_nationkey") == 1)
  }

  test("estimateU: deterministic, bounded away from 0 and 1e6, and " +
      "tracks the field's real collision rate among random pairs") {
    val cust = Tables.customer(spark, "/root/testdata/sf0.001")
    val fields = Seq(
      FieldSpec("c_nationkey", 990000L, 40000L),
      FieldSpec("c_name", 990000L, 1000L))
    def run() = estimateU(cust, cust, "c_custkey", fields, nPairs = 500)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    val u = run()
    assert(u == run(), "estimate must be deterministic")
    assert(u.values.forall(v => v > 0 && v < 1000000L))
    // ~1/25 nations → u in the few-percent band; names never collide
    assert(u("c_nationkey") > 10000L && u("c_nationkey") < 120000L,
      s"nationkey u = ${u("c_nationkey")}")
    assert(u("c_name") < 10000L, s"name u = ${u("c_name")}")
  }
}
