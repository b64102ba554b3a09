package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DomainMixtureSpec extends SparkSpec {
  import spark.implicits._

  // planted losses: domain "hard" is one bit (1024 Q10) above "easy"
  private def planted(nHard: Int = 40, nEasy: Int = 60) =
    ((1 to nHard).map(i => (s"h$i", "hard", 3072L)) ++
      (1 to nEasy).map(i => (s"e$i", "easy", 1024L)))
      .toDF("doc_id", "domain", "loss_fp")

  test("hard domains upweight: weight ratio tracks 2^(eta*excess), " +
      "weights sum to ~2^20, every domain keeps the smoothing floor") {
    val w = DomainMixture.weights(planted(), "domain", "loss_fp",
        etaNum = 1L, etaDen = 1L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("excess_fp"), r.getAs[Long]("weight_fp"))).toMap
    // corpus mean = (40*3072 + 60*1024) // 100 = 1843; excess(hard) = 1229
    assert(w("hard")._1 == 1229L && w("easy")._1 == 0L)
    val (wh, we) = (w("hard")._2, w("easy")._2)
    assert(wh > we, s"hard $wh must outweigh easy $we")
    // pre-smoothing ratio = 2^1.2002 ≈ 2.298; smoothing pulls both
    // toward 1/2 of the uniform share — bracket generously
    val ratio = wh.toDouble / we
    assert(ratio > 1.8 && ratio < 2.3, s"ratio $ratio")
    assert(math.abs((wh + we) - 1048576L) <= 4, s"sum ${wh + we}")
    // the floor: epsilon/D of the mixture even if a domain dominates
    assert(we >= 1048576L / 10 / 2 - 1)
  }

  test("uniform losses give exactly uniform weights; partitioning-proof") {
    val uni = (1 to 90).map(i => (s"d${i % 3}", 2048L))
      .toDF("domain", "loss_fp")
    def run(parts: Int) = DomainMixture.weights(
        uni.repartition(parts), "domain", "loss_fp")
      .orderBy($"domain").collect().map(_.toString).toSeq
    val r = run(1)
    assert(r == run(7))
    val ws = DomainMixture.weights(uni, "domain", "loss_fp")
      .select($"weight_fp").as[Long].collect().toSet
    assert(ws.size == 1 && math.abs(ws.head - 1048576L / 3) <= 1, s"$ws")
  }

  test("collectWeights feeds Sampling.mixture: the composed resample " +
      "keeps more of the hard domain than hand-uniform weights would") {
    val docs = planted(200, 300)
      .withColumn("n_tokens", lit(100L))
    val learned = DomainMixture.collectWeights(
      DomainMixture.weights(docs, "domain", "loss_fp",
        etaNum = 2L, etaDen = 1L))
    assert(learned.values.sum > 0.99 && learned.values.sum <= 1.0)
    val kept = Sampling.mixture(docs, "doc_id", "domain", "n_tokens",
        learned, budgetTokens = 20000L)
      .groupBy($"domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // budget = 200 docs' worth; the hard domain's learned share > easy's
    assert(learned("hard") > learned("easy"))
    assert(kept("hard") > kept.getOrElse("easy", 0L),
      s"hard must survive the resample harder: $kept")
  }

  test("persisted loss state: append-two-halves then weightsFromState " +
      "== one-shot weights, value-identical (exact integer sums)") {
    val docs = planted(40, 60).withColumn("doc_id",
      monotonically_increasing_id())
    val dir = tmpDir("lossstate")
    DomainMixture.writeLossState(docs.filter($"doc_id" % 2 === 0),
      "domain", "loss_fp", dir)
    DomainMixture.appendLossState(docs.filter($"doc_id" % 2 =!= 0),
      "domain", "loss_fp", dir)
    val inc = DomainMixture.weightsFromState(spark, dir)
      .orderBy($"domain").collect().map(_.toString).toSeq
    val batch = DomainMixture.weights(docs, "domain", "loss_fp")
      .orderBy($"domain").collect().map(_.toString).toSeq
    assert(inc == batch)
  }

  // ---- two-round iteration (q190, r12 verdict task 5) ----------------

  /** Scalar twin of [[graft.functions.FixedPoint.pow2fp]] (Q10 arg →
    * Q20 result) — the ten Q30 constants verbatim.
    */
  private def pow2fpRef(arg: Long): Long = {
    val consts = Seq(1518500249L, 1276901416L, 1170923761L, 1121280435L,
      1097253708L, 1085434105L, 1079572135L, 1076653033L, 1075196443L,
      1074468887L)
    val i = arg >> 10
    var r = 1073741824L
    for ((c, b) <- consts.zipWithIndex)
      if (((arg & 1023L) & (1L << (9 - b))) != 0) r = (r * c) >> 30
    if (i <= 20) r >> (20 - i).toInt else r << (i - 20).toInt
  }

  /** Plain-Scala reference of one EG round over (domain, n, sumLoss)
    * stats — mirrors weightsFromStats at eta, smoothing 1/10.
    */
  private def refRound(stats: Map[String, (Long, Long)],
      etaNum: Long, etaDen: Long): Map[String, (Long, Long)] = {
    val corpus = stats.values.map(_._2).sum / stats.values.map(_._1).sum
    val u = stats.map { case (d, (n, s)) =>
      val excess = math.max(0L, s / n - corpus)
      val arg = if (excess > 20480L * etaDen / etaNum) 20480L
        else math.min(20480L, excess * etaNum / etaDen)
      d -> (excess, pow2fpRef(arg))
    }
    val z = u.values.map(_._2).sum
    val dCount = stats.size
    u.map { case (d, (excess, uf)) =>
      d -> (excess,
        (9L * (uf * 1048576L / z) + (1048576L / dCount)) / 10L)
    }
  }

  test("two-round iteration == plain-Scala reference of the full " +
      "reweight -> deterministic resample -> reweight chain") {
    val docs = planted(40, 60).withColumn("n_tokens", lit(100L))
    // --- engine chain (the q190 shape) ---
    def stats(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"domain").agg(count(lit(1)).as("n"),
        sum($"loss_fp").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val w1 = DomainMixture.weights(docs, "domain", "loss_fp",
      etaNum = 1L, etaDen = 1L)
    val survivors = Sampling.mixture(docs, "doc_id", "domain", "n_tokens",
      DomainMixture.collectWeights(w1), budgetTokens = 5000L)
    val w2 = DomainMixture.weights(survivors, "domain", "loss_fp",
        etaNum = 1L, etaDen = 1L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("excess_fp"), r.getAs[Long]("weight_fp"))).toMap
    // --- reference chain (scalar longs + driver-side h60 draws) ---
    val ref1 = refRound(stats(docs), 1L, 1L)
    val tokens = Map("hard" -> 4000.0, "easy" -> 6000.0)
    val refSurvivors = docs.select($"doc_id", $"domain", $"loss_fp")
      .collect().filter { r =>
        val rate = math.min(1.0,
          5000.0 * (ref1(r.getString(1))._2.toDouble / 1048576.0) /
            tokens(r.getString(1)))
        graft.functions.AuditableHash.h60(
          "mixture:" + r.getString(0)).toDouble / (1L << 60).toDouble < rate
      }
    val refStats2 = refSurvivors.groupBy(_.getString(1)).map {
      case (d, rows) => d -> (rows.length.toLong, rows.map(_.getLong(2)).sum)
    }
    val ref2 = refRound(refStats2, 1L, 1L)
    assert(survivors.count() == refSurvivors.length,
      "resample survivor sets diverged")
    assert(w2 == ref2, s"round-2 weights diverged: $w2 vs $ref2")
  }

  test("two-round loop fed from persisted loss state == the batch-lazy " +
      "chain (q203 twin: weightsFromState over appended survivor stats)") {
    val docs = planted(40, 60)
      .withColumn("doc_id", monotonically_increasing_id())
      .withColumn("n_tokens", lit(100L))
    def lazyRound(pd: org.apache.spark.sql.DataFrame) =
      DomainMixture.weights(pd, "domain", "loss_fp", etaNum = 1L, etaDen = 1L)
    def stateRound(pd: org.apache.spark.sql.DataFrame, dir: String) = {
      DomainMixture.writeLossState(pd.filter($"doc_id" % 2 === 0),
        "domain", "loss_fp", dir)
      DomainMixture.appendLossState(pd.filter($"doc_id" % 2 =!= 0),
        "domain", "loss_fp", dir)
      DomainMixture.weightsFromState(spark, dir, etaNum = 1L, etaDen = 1L)
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"domain").collect().map(_.toString).toSeq
    val w1state = stateRound(docs, tmpDir("q203r1"))
    assert(rows(w1state) == rows(lazyRound(docs)),
      "round-1 state-fed weights diverged from the lazy recompute")
    val survivors = Sampling.mixture(docs, "doc_id", "domain", "n_tokens",
      DomainMixture.collectWeights(w1state), budgetTokens = 5000L)
    val pd2 = docs.join(survivors.select($"doc_id"), Seq("doc_id"), "left_semi")
    assert(rows(stateRound(pd2, tmpDir("q203r2"))) == rows(lazyRound(pd2)),
      "round-2 state-fed weights (survivors' appended stats) diverged")
  }

  test("planted hard domain: resampling toward it CLEARS its excess — " +
      "round-2 excess and weight are both below round 1's") {
    val docs = planted(40, 60).withColumn("n_tokens", lit(100L))
    def roundW(df: org.apache.spark.sql.DataFrame) =
      DomainMixture.weights(df, "domain", "loss_fp", etaNum = 1L, etaDen = 1L)
    val w1 = roundW(docs)
    val r1 = w1.collect().map(r => r.getString(0) ->
      (r.getAs[Long]("excess_fp"), r.getAs[Long]("weight_fp"))).toMap
    val survivors = Sampling.mixture(docs, "doc_id", "domain", "n_tokens",
      DomainMixture.collectWeights(w1), budgetTokens = 5000L)
    val r2 = roundW(survivors).collect().map(r => r.getString(0) ->
      (r.getAs[Long]("excess_fp"), r.getAs[Long]("weight_fp"))).toMap
    // the hard domain gains mixture share, so the corpus mean moves
    // toward it: its excess strictly shrinks and its weight relaxes
    // toward uniform — the DoReMi fixed-point direction
    assert(r2("hard")._1 < r1("hard")._1,
      s"excess must shrink: ${r2("hard")._1} vs ${r1("hard")._1}")
    assert(r2("hard")._2 < r1("hard")._2,
      s"weight must relax: ${r2("hard")._2} vs ${r1("hard")._2}")
    // every domain keeps the smoothing floor in both rounds
    assert((r1.values ++ r2.values).forall(_._2 >= 1048576L / 10 / 2 - 1))
  }

  test("NULL domains and NULL losses drop before aggregation") {
    val df = Seq(("a", Some(1024L)), ("a", None), (null, Some(9999L)))
      .toDF("domain", "loss_fp")
    val w = DomainMixture.weights(df, "domain", "loss_fp").collect()
    assert(w.length == 1 && w.head.getString(0) == "a" &&
      w.head.getAs[Long]("n_docs") == 1L)
  }
}
