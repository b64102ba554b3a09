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

  test("emFit recovers the planted match structure from vague priors; " +
      "fitted params reproduce the hand-set verdicts") {
    // sf0.01 + two-column blocking: ~12 rows per block side, so EM
    // sees a healthy cross-pair majority next to the true pairs
    // (sf0.001 blocks hold ~1 row — candidates degenerate to true
    // pairs and the u's are unidentifiable)
    val dir = "/root/testdata/sf0.01"
    val a = Tables.customer(spark, dir)
    val b = Tables.customer(spark, dir)
      .filter($"c_custkey" % 31 =!= 0)
      .withColumn("c_name", when($"c_custkey" % 7 === 0,
        concat(substring($"c_name", 1, 11), lit("x"),
          substring($"c_name", 13, 1000))).otherwise($"c_name"))
    val blockOn = Seq("c_nationkey", "c_mktsegment")
    val init = Seq(
      FieldSpec("c_name", 700000L, 300000L, (x, y) => levenshtein(x, y) <= 1),
      FieldSpec("c_acctbal", 700000L, 300000L))
    val (lam, fitted) = emFit(a, b, "c_custkey", blockOn, init)
    val (lam2, fitted2) = emFit(a, b, "c_custkey", blockOn, init)
    assert(lam == lam2 && fitted == fitted2, "EM must be deterministic")
    // planted structure: true pairs agree on both fields, cross pairs
    // on (almost) neither — EM must pull m up and u down for both
    fitted.foreach { f =>
      assert(f.mPpm > 900000L, s"${f.column} m=${f.mPpm}")
      assert(f.uPpm < 100000L, s"${f.column} u=${f.uPpm}")
    }
    // λ ≈ true-pair fraction of candidates (every A row meets its own
    // B copy; cross-pairs dominate the denominator)
    assert(lam > 1000L && lam < 500000L, s"lambda=$lam")
    // classification under fitted params matches the hand-set q150
    // parametrization on this corpus
    val hand = link(a, b, "c_custkey", blockOn,
      Seq(FieldSpec("c_name", 990000L, 1000L, (x, y) => levenshtein(x, y) <= 1),
        FieldSpec("c_acctbal", 995000L, 500L)),
      matchFp = 15360L, possibleFp = 2000L)
    val fit = link(a, b, "c_custkey", blockOn, fitted,
      matchFp = fitted.map(_.agreeFp).sum, possibleFp = 2000L)
    val handM = hand.filter($"verdict" === "match")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fitM = fit.filter($"verdict" === "match")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(handM == fitM, "fitted params must reproduce the match set")
  }

  test("persisted A index: union of batch increments == one-shot link; " +
      "the probe physically prunes to the batch's block partitions") {
    val dir = "/root/testdata/sf0.001"
    val cust = Tables.customer(spark, dir)
    val fields = Seq(
      FieldSpec("c_name", 990000L, 1000L, (x, y) => levenshtein(x, y) <= 1),
      FieldSpec("c_acctbal", 995000L, 500L))
    val blockOn = Seq("c_nationkey", "c_mktsegment")
    val idxDir = tmpDir("linkidx") + "/idx"
    writeIndex(cust, "c_custkey", blockOn, idxDir)
    val idx = spark.read.parquet(idxDir)
    val slices = Seq(cust.filter($"c_custkey" % 2 === 0),
      cust.filter($"c_custkey" % 2 =!= 0))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val incr = slices.map(s => linkIncrement(idx, s, "c_custkey", blockOn,
      fields, matchFp = 15360L, possibleFp = 2000L))
      .reduce(_ unionByName _)
    val batch = link(cust, cust, "c_custkey", blockOn, fields,
      15360L, 2000L)
    assert(rows(incr) == rows(batch))
    // partition pruning: a one-nation batch reads only that nation's
    // index partitions
    val one = linkIncrement(idx, cust.filter($"c_nationkey" === 3),
      "c_custkey", blockOn, fields, 15360L, 2000L)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("c_nationkey"), s"expected partition pruning:\n$plan")
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
