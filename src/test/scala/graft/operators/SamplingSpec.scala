package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, dir)

  test("bernoulli: deterministic under repartition and re-evaluation") {
    val a = Sampling.bernoulli(docs, "doc_id", 0.3).select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.bernoulli(docs.repartition(13), "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("bernoulli: samples are nested as rate grows (same salt)") {
    val small = Sampling.bernoulli(docs, "doc_id", 0.2).select("doc_id").collect().map(_.getLong(0)).toSet
    val big   = Sampling.bernoulli(docs, "doc_id", 0.6).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
    assert(small.size < big.size)
  }

  test("bernoulli: rate is approximately honored") {
    val n = docs.count().toDouble
    val kept = Sampling.bernoulli(docs, "doc_id", 0.5).count().toDouble
    assert(math.abs(kept / n - 0.5) < 0.1, s"kept ${kept / n}")
  }

  test("stratified: per-stratum rates; absent strata use default") {
    val out = Sampling.stratified(docs, "doc_id", "lang",
      rates = Map("en" -> 0.0), defaultRate = 1.0)
    val langs = out.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(!langs.contains("en"))
    // default 1.0 keeps every non-en row
    assert(out.count() == docs.filter(col("lang") =!= "en" || col("lang").isNull).count())
  }

  test("stratified == per-stratum bernoulli under the same salt (API coherence)") {
    val rates = Map("en" -> 0.3, "de" -> 0.7)
    val strat = Sampling.stratified(docs, "doc_id", "lang", rates, defaultRate = 0.5)
    val langs = docs.select("lang").distinct().collect().map(r => Option(r.getString(0)))
    langs.foreach { lang =>
      val rate = lang.flatMap(rates.get).getOrElse(0.5)
      val slice = docs.filter(col("lang") <=> lang.map(lit).getOrElse(lit(null)))
      val viaBern = Sampling.bernoulli(slice, "doc_id", rate, salt = "stratified")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val viaStrat = strat.filter(col("lang") <=> lang.map(lit).getOrElse(lit(null)))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(viaBern == viaStrat, s"stratum $lang")
    }
  }

  test("weighted: boundary weights behave; deterministic under repartition") {
    val df = docs.withColumn("w0", lit(0.0)).withColumn("w1", lit(1.0))
    assert(Sampling.weighted(df, "doc_id", "w0").isEmpty)
    assert(Sampling.weighted(df, "doc_id", "w1").count() == docs.count())
    val half = docs.withColumn("w", lit(0.5))
    val a = Sampling.weighted(half, "doc_id", "w").select("doc_id")
      .collect().map(_.getLong(0)).sorted
    val b = Sampling.weighted(half.repartition(7), "doc_id", "w").select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("mixture: rates derive from domain mass; cap and fractional branches") {
    val d = docs.withColumn("n_tokens",
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
    val totals = d.groupBy("source").agg(sum("n_tokens").as("dt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = 20000L
    val weights = Map("src0" -> 0.5, "src1" -> 0.3)
    val out = Sampling.mixture(d, "doc_id", "source", "n_tokens",
      weights, budget, defaultWeight = 0.01)

    // cap branch: src0's target (10000) exceeds its mass at sf0.001 —
    // rate 1, every src0 row survives
    assert(budget * 0.5 > totals("src0"))
    assert(out.filter(col("source") === "src0").count() ==
      d.filter(col("source") === "src0").count())

    // fractional branch: a tail domain keeps roughly budget·w tokens
    val tailKept = out.filter(col("source") === "src5")
      .agg(sum("n_tokens")).head().getLong(0)
    val tailTarget = budget * 0.01
    assert(tailKept < totals("src5"), "tail must actually downsample")
    assert(math.abs(tailKept - tailTarget) < totals("src5") * 0.2,
      s"tail kept $tailKept vs target $tailTarget")

    // mixture == per-domain bernoulli at the derived rate (API coherence)
    val viaBern = Sampling.bernoulli(
        d.filter(col("source") === "src5"), "doc_id",
        math.min(1.0, budget * 0.01 / totals("src5")), salt = "mixture")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaMix = out.filter(col("source") === "src5")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaMix == viaBern)

    // deterministic under repartition; schema preserved
    val again = Sampling.mixture(d.repartition(13), "doc_id", "source",
      "n_tokens", weights, budget, defaultWeight = 0.01)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted
      .sameElements(again.select("doc_id").collect().map(_.getLong(0)).sorted))
    assert(out.columns.sameElements(d.columns))
  }

  test("split: exhaustive, deterministic, and group-cohesive") {
    val out = Sampling.split(docs, "source", valFrac = 0.25, testFrac = 0.25)
    assert(out.count() == docs.count())
    val perGroup = out.groupBy("source").agg(countDistinct("split").as("n"))
    assert(perGroup.filter(col("n") > 1).isEmpty, "a source spans folds")
    val folds = out.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(folds.subsetOf(Set("train", "val", "test")))
  }

  test("split: changing the salt reshuffles membership") {
    val a = Sampling.split(docs, "source", 0.3, 0.3, salt = "s1")
    val b = Sampling.split(docs, "source", 0.3, 0.3, salt = "s2")
    val moved = a.select(col("doc_id"), col("split").as("sa"))
      .join(b.select(col("doc_id"), col("split").as("sb")), "doc_id")
      .filter(col("sa") =!= col("sb"))
    assert(moved.count() > 0)
  }

  test("capPerGroup: cap enforced, small groups untouched, deterministic") {
    import spark.implicits._
    val df = ((1 to 100).map(i => (i.toLong, "big")).toList ++
      List((200L, "small"), (201L, "small"))).toDF("id", "g")
    val a = Sampling.capPerGroup(df, "g", "id", cap = 10)
    val b = Sampling.capPerGroup(df, "g", "id", cap = 10)
    val byGroup = a.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGroup == Map("big" -> 10L, "small" -> 2L))
    // deterministic survivor SET (not dependent on partitioning/run)
    assert(a.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      b.repartition(7).select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("temperatureMixture: flattening upweights small domains; kept sets nest in alpha") {
    import spark.implicits._
    // big: 400 docs x 100 tokens; small: 10 docs x 100 tokens
    val docs = ((0 until 400).map(i => (i.toLong, "big", 100L)) ++
      (400 until 410).map(i => (i.toLong, "small", 100L)))
      .toDF("doc_id", "domain", "n_tokens")
    // budget 8000: at alpha=0.5 the small domain's rate is
    // 8000·(sqrt(1000)/(sqrt(40000)+sqrt(1000)))/1000 ≈ 1.09 → caps
    // at 1 (keeps everything) while big subsamples at ≈ 0.17
    def kept(alphaHalves: Int): Set[Long] =
      Sampling.temperatureMixture(docs, "doc_id", "domain", "n_tokens",
          budgetTokens = 8000L, alphaHalves = alphaHalves)
        .select("doc_id").as[Long].collect().toSet
    val k0 = kept(0); val k1 = kept(1); val k2 = kept(2)
    def frac(ks: Set[Long], lo: Long, hi: Long) =
      ks.count(i => i >= lo && i < hi).toDouble / (hi - lo)
    // alpha = 0.5: the small domain's acceptance rate is strictly
    // higher than the big one's (flattening), here hitting the cap
    assert(frac(k1, 400, 410) == 1.0, "small domain must keep everything at alpha=0.5")
    assert(frac(k1, 0, 400) < 1.0, "big domain must subsample")
    // rates for the BIG domain grow monotonically with alpha, and the
    // h60 draws are fixed, so its kept sets NEST: a0 ⊆ a0.5 ⊆ a1
    val big0 = k0.filter(_ < 400); val big1 = k1.filter(_ < 400)
    val big2 = k2.filter(_ < 400)
    assert(big0.subsetOf(big1) && big1.subsetOf(big2))
    assert(big0.size < big2.size)
    // determinism
    assert(kept(1) == k1)
  }

  test("mixture/temperatureMixture: zero-token and all-NULL-token domains drop, not keep-all") {
    import spark.implicits._
    val docs = Seq(
      (1L, "live", java.lang.Long.valueOf(100L)),
      (2L, "live", java.lang.Long.valueOf(100L)),
      (3L, "zero", java.lang.Long.valueOf(0L)),
      (4L, "zero", java.lang.Long.valueOf(0L)),
      (5L, "nul", null.asInstanceOf[java.lang.Long]),
    ).toDF("doc_id", "domain", "n_tokens")
    val t = Sampling.temperatureMixture(docs, "doc_id", "domain", "n_tokens",
        budgetTokens = 1000L)
      .select("doc_id").as[Long].collect().toSet
    assert(t.forall(_ <= 2L), s"zero-mass domains must drop entirely, got $t")
    assert(t.nonEmpty, "the live domain must survive (rate caps at 1)")
    val m = Sampling.mixture(docs, "doc_id", "domain", "n_tokens",
        weights = Map("live" -> 0.5, "zero" -> 0.3, "nul" -> 0.2),
        budgetTokens = 1000L)
      .select("doc_id").as[Long].collect().toSet
    assert(m.forall(_ <= 2L), s"zero-mass domains must drop entirely, got $m")
    assert(m.nonEmpty)
  }

  test("epochedMixture: repeat factors, cap, fractional draw, zero-target drop") {
    import spark.implicits._
    val d = docs
      .withColumn("n_tokens",
        graft.functions.TextFunctions.tokenCount($"text").cast("long"))
      .select($"doc_id", $"source", $"n_tokens")
    val dt = d.groupBy("source").agg(sum("n_tokens").as("dt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (s1, s2) = ("src1", "src2")
    // s1: rate pinned at the cap; s2: a genuinely fractional rate ~2.5
    val targets = Map(
      s1 -> dt(s1) * 100, s2 -> (dt(s2) * 5 / 2))
    val out = Sampling.epochedMixture(d, "doc_id", "source", "n_tokens",
      targets, maxEpochs = 4).cache()
    try {
      // absent domains drop entirely
      assert(out.filter(!$"source".isin(s1, s2)).count() == 0)
      // capped domain: every doc exactly maxEpochs copies, epochs 0..3
      val perDoc1 = out.filter($"source" === s1).groupBy("doc_id")
        .agg(count(lit(1)).as("n"), max("epoch").as("mx"), min("epoch").as("mn"))
        .collect()
      assert(perDoc1.nonEmpty)
      perDoc1.foreach { r =>
        assert(r.getLong(1) == 4L && r.getLong(2) == 3L && r.getLong(3) == 0L)
      }
      assert(out.filter($"source" === s1).count() ==
        d.filter($"source" === s1).count() * 4)
      // fractional domain: every doc 2 or 3 copies, both branches taken,
      // and the surviving token mass lands near the target
      val perDoc2 = out.filter($"source" === s2).groupBy("doc_id")
        .agg(count(lit(1)).as("n")).collect().map(_.getLong(1))
      assert(perDoc2.forall(n => n == 2L || n == 3L))
      assert(perDoc2.toSet == Set(2L, 3L), "both floor and frac branches")
      val mass2 = out.filter($"source" === s2)
        .agg(sum("n_tokens")).head().getLong(0).toDouble
      assert(math.abs(mass2 / targets(s2).toDouble - 1.0) < 0.2,
        s"expected ~${targets(s2)} tokens, got $mass2")
      // deterministic under repartition
      val again = Sampling.epochedMixture(d.repartition(13), "doc_id",
        "source", "n_tokens", targets, maxEpochs = 4)
        .select("doc_id", "epoch").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(again == out.select("doc_id", "epoch").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    } finally out.unpersist()
  }

  test("leakSafeSplit: no near-dup cluster straddles folds — and the " +
      "per-document split it replaces provably would") {
    import spark.implicits._
    // ids chosen so a DOC-keyed draw scatters the pair across folds
    // (the Lee et al. contamination counterexample), while the
    // CLUSTER-keyed draw cannot
    val ids = (0L until 400L)
    val docs = ids.map(i => (i, s"doc $i", 10L)).toList.toDF("doc_id", "text", "n_chars")
    // chain pairs (0,1), (2,3), ... — 200 two-doc clusters
    val pairs = ids.grouped(2).map(g => (g(0), g(1))).toList
      .toDF("id_a", "id_b")
    val out = Sampling.leakSafeSplit(docs, pairs, "doc_id", "id_a", "id_b",
      "n_chars", valFrac = 0.2, testFrac = 0.2)
    val straddling = out.groupBy("cluster_id")
      .agg(countDistinct("split").as("n"))
      .filter($"n" > 1)
    assert(straddling.isEmpty, "a cluster crossed folds")
    assert(out.select(countDistinct("split")).head().getLong(0) == 3L,
      "degenerate fixture: all clusters landed in one fold")
    // counterexample: the doc-keyed split DOES break at least one pair
    val naive = Sampling.split(
      Sampling.leakSafeSplit(docs, pairs, "doc_id", "id_a", "id_b",
        "n_chars", 0.2, 0.2).drop("split"),
      "doc_id", 0.2, 0.2)
    assert(naive.groupBy("cluster_id")
      .agg(countDistinct("split").as("n")).filter($"n" > 1).count() > 0,
      "fixture too small to show the doc-level hazard")
  }
}
