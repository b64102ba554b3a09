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

  test("incremental vocabulary: merged df == full-corpus df; batch scoring identical") {
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val old = corpus.filter($"doc_id" % 5 =!= 0)
    val fresh = corpus.filter($"doc_id" % 5 === 0)
    def vmap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // additivity: df over disjoint doc sets sums exactly
    val full = vmap(TermStats.docFreq(corpus, "text", "doc_id"))
    val merged = vmap(TermStats.mergeDocFreq(
      TermStats.docFreq(old, "text", "doc_id"),
      TermStats.docFreq(fresh, "text", "doc_id")))
    assert(merged == full)

    // scoring a batch against the maintained vocabulary == the batch
    // form's rows for those docs (same tf, df, tfidf to the bit)
    val n = corpus.count()
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "term", "tf", "df_docs", "tfidf").collect()
        .map(r => (r.getLong(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val against = key(TermStats.tfIdfAgainst(fresh, "text", "doc_id",
      TermStats.mergeDocFreq(
        TermStats.docFreq(old, "text", "doc_id"),
        TermStats.docFreq(fresh, "text", "doc_id")), n))
    val batch = key(TermStats.tfIdf(corpus, "text", "doc_id")
      .filter($"doc_id" % 5 === 0))
    assert(against == batch)

    // a term the vocabulary never saw scores NULL, not a silent default
    val novel = TermStats.tfIdfAgainst(
      Seq((9999L, "zzzunseen zzzunseen")).toDF("doc_id", "text"),
      "text", "doc_id", TermStats.docFreq(old, "text", "doc_id"), n)
    val row = novel.filter($"term" === "zzzunseen").head()
    assert(row.isNullAt(row.fieldIndex("df_docs")) && row.isNullAt(row.fieldIndex("tfidf")))
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

  test("collocations: a planted always-adjacent pair outranks frequent " +
      "independent words; minCount drops rare pairs") {
    import spark.implicits._
    // "new york" always adjacent (8×); "the"/"data" frequent but in
    // varied contexts; "rare gem" adjacent only twice (below support 3)
    val docs = (1L to 8L).map(i =>
        (i, s"the data new york of the data run$i the end")) ++
      Seq((9L, "rare gem the data"), (10L, "rare gem data the"))
    val got = TermStats.collocations(docs.toDF("doc_id", "text"),
        "text", "doc_id", minCount = 3L, k = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.head._1 == "new" && got.head._2 == "york" && got.head._3 == 8L,
      s"planted collocation not top: ${got.toSeq}")
    assert(!got.exists(p => p._1 == "rare"), s"below-support pair kept: ${got.toSeq}")
    // determinism under repartition
    val again = TermStats.collocations(
        docs.toDF("doc_id", "text").repartition(7), "text", "doc_id",
        minCount = 3L, k = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == again.toSeq)
  }

  test("ngramDiversity: hand-computed distinct-n; repeats counted in " +
      "totals; empty/NULL docs contribute nothing; dial hygiene") {
    val docs = Seq(
      (1L, "the cat sat"),        // unigrams: the, cat, sat
      (2L, "the cat ran"),        // repeats 'the cat' bigram
      (3L, ""), (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TermStats.ngramDiversity(docs, "text", Seq(1, 2, 3))
      .orderBy("n").collect()
    // n=1: 6 tokens, 4 distinct (the×2, cat×2, sat, ran)
    assert((got(0).getAs[Long]("total_ngrams"),
      got(0).getAs[Long]("distinct_ngrams")) == ((6L, 4L)))
    assert(got(0).getAs[Long]("distinct_ppm") == 4L * 1000000L / 6L)
    // n=2: 4 bigrams, 3 distinct ('the cat'×2, 'cat sat', 'cat ran')
    assert((got(1).getAs[Long]("total_ngrams"),
      got(1).getAs[Long]("distinct_ngrams")) == ((4L, 3L)))
    // n=3: 2 trigrams, both distinct
    assert((got(2).getAs[Long]("total_ngrams"),
      got(2).getAs[Long]("distinct_ngrams")) == ((2L, 2L)))
    // a fully-repetitive corpus craters distinct-2 (the mode-collapse dial)
    val collapsed = Seq.fill(20)((1L, "same same same")).toDF("doc_id", "text")
    val d2 = TermStats.ngramDiversity(collapsed, "text", Seq(2)).head()
    assert(d2.getAs[Long]("distinct_ngrams") == 1L &&
      d2.getAs[Long]("total_ngrams") == 40L)
    intercept[IllegalArgumentException] {
      TermStats.ngramDiversity(docs, "text", Seq())
    }
    intercept[IllegalArgumentException] {
      TermStats.ngramDiversity(docs, "text", Seq(9))
    }
    // the one-scan form still reports one row per n even when every
    // doc is shorter than n (no (n, ngram) rows exist to group)
    val zeros = TermStats.ngramDiversity(docs, "text", Seq(1, 8))
      .orderBy("n").collect()
    assert(zeros.length == 2)
    assert(zeros(1).getAs[Long]("total_ngrams") == 0L &&
      zeros(1).getAs[Long]("distinct_ngrams") == 0L &&
      zeros(1).getAs[Long]("distinct_ppm") == 0L)
  }
}
