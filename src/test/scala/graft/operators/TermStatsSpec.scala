package graft.operators

import graft.SparkSpec

class TermStatsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark shuffle join"),
    (2L, "spark join quantile"),
    (3L, null: String))
    .toDF("doc_id", "text")

  test("tf and corpus df are exact") {
    val out = TermStats.tfIdf(docs, "text", "doc_id")
      .select("doc_id", "term", "tf", "df_docs")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, "spark", 2L, 2L), (1L, "shuffle", 1L, 1L), (1L, "join", 1L, 2L),
      (2L, "spark", 1L, 2L), (2L, "join", 1L, 2L), (2L, "quantile", 1L, 1L)))
  }

  test("tfidf is tf * ln(N/df)") {
    val v = TermStats.tfIdf(docs, "text", "doc_id")
      .filter($"doc_id" === 1L && $"term" === "shuffle")
      .select("tfidf").as[Double].head()
    assert(math.abs(v - math.log(3.0 / 1.0)) < 1e-12)
  }

  test("topTerms ranks tf desc, then rarity, then term; k bounds output") {
    val top = TermStats.topTerms(docs, "text", "doc_id", k = 2)
      .select("doc_id", "term", "rnk").as[(Long, String, Int)].collect().toSet
    // doc 1: spark(tf2) first, then shuffle (df 1 beats join's df 2)
    // doc 2: all tf=1 → quantile (df 1), then join < spark alphabetically? no:
    //        join and spark both df=2, term asc → join
    assert(top == Set(
      (1L, "spark", 1), (1L, "shuffle", 2),
      (2L, "quantile", 1), (2L, "join", 2)))
  }
}
