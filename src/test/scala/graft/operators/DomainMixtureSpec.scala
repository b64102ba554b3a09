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

  test("NULL domains and NULL losses drop before aggregation") {
    val df = Seq(("a", Some(1024L)), ("a", None), (null, Some(9999L)))
      .toDF("domain", "loss_fp")
    val w = DomainMixture.weights(df, "domain", "loss_fp").collect()
    assert(w.length == 1 && w.head.getString(0) == "a" &&
      w.head.getAs[Long]("n_docs") == 1L)
  }
}
