package graft.operators

import graft.SparkSpec

class SubstringDedupSpec extends SparkSpec {

  import spark.implicits._

  private def spans(rows: Seq[(Long, String)], k: Int) =
    SubstringDedup.duplicateSpans(
        rows.toDF("doc_id", "text"), "text", "doc_id", k)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("cross-document shared run becomes one maximal span per doc") {
    // docs 1 and 2 share the 5-token run "a b c d e"; doc 3 is unique
    val out = spans(Seq(
      1L -> "a b c d e f g h",
      2L -> "x y a b c d e z",
      3L -> "p q r s t u v w"), k = 3)
    assert(out == Set((1L, 1L, 5L, 5L), (2L, 3L, 7L, 5L)))
  }

  test("within-document repeat flags both occurrences, far apart stays split") {
    // "m n o" at positions 1 and 8 — gap 7 > k, two islands
    val out = spans(Seq(
      1L -> "m n o j1 j2 j3 j4 m n o"), k = 3)
    assert(out == Set((1L, 1L, 3L, 3L), (1L, 8L, 10L, 3L)))
  }

  test("touching windows merge: gap == k coalesces into one span") {
    // doc 1 repeats "a b c" at 1 and 4 (pos diff 3 == k): contiguous
    // duplicated coverage [1,6] merges into a single island
    val out = spans(Seq(1L -> "a b c a b c"), k = 3)
    assert(out == Set((1L, 1L, 6L, 6L)))
  }

  test("case-insensitive: shingles match through lowercasing") {
    val out = spans(Seq(
      1L -> "Foo Bar Baz tail1 tail2",
      2L -> "foo bar baz other stuff"), k = 3)
    assert(out.map(t => (t._1, t._2, t._3)) == Set((1L, 1L, 3L), (2L, 1L, 3L)))
  }

  test("short and empty docs emit nothing and do not break the guard") {
    val out = spans(Seq(
      1L -> "a b",         // shorter than k
      2L -> "",            // empty
      3L -> null.asInstanceOf[String],
      4L -> "a b c d",
      5L -> "a b c d"), k = 3)
    // only the two identical 4-token docs dup; whole doc is the span
    assert(out == Set((4L, 1L, 4L, 4L), (5L, 1L, 4L, 4L)))
  }

  test("excise: corpus-first occurrence survives, later copies cut") {
    val docs = Seq(
      1L -> "a b c d e tail1 tail2",
      2L -> "x y a b c d e z w",    // "a b c d e" is doc 1's — cut here
      3L -> "a b c d e tail1 tail2" // pure copy of doc 1 — collapses
    ).toDF("doc_id", "text")
    val out = SubstringDedup.excise(docs, "text", "doc_id", k = 3)
      .select("doc_id", "text_deduped", "n_tokens_removed")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "a b c d e tail1 tail2", 0L)),
      "first occurrence keeps everything")
    assert(out(1) == ((2L, "x y z w", 5L)))
    assert(out(2) == ((3L, "", 7L)), "pure copy collapses to empty")
  }

  test("excise: original casing preserved; matching is case-blind") {
    val docs = Seq(
      1L -> "Foo Bar Baz end",
      2L -> "pre foo bar baz").toDF("doc_id", "text")
    val out = SubstringDedup.excise(docs, "text", "doc_id", k = 3)
      .select("doc_id", "text_deduped")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "Foo Bar Baz end", "canonical keeps its casing")
    assert(out(2L) == "pre")
  }

  test("excise: input columns pass through; null/short docs untouched") {
    val docs = Seq(
      (1L, "a b", "k1"), (2L, null.asInstanceOf[String], "k2"))
      .toDF("doc_id", "text", "extra")
    val out = SubstringDedup.excise(docs, "text", "doc_id", k = 3)
    assert(out.columns.toSeq ==
      Seq("doc_id", "text", "extra", "text_deduped", "n_tokens_removed"))
    val rows = out.select("doc_id", "text_deduped", "n_tokens_removed")
      .as[(Long, String, Long)].collect().toSet
    assert(rows == Set((1L, "a b", 0L), (2L, "", 0L)))
  }

  test("incremental == batch nonCanonicalSpans restricted to the batch (monotonic split)") {
    val docs = (1L to 60L).map { i =>
      val base = if (i % 3 == 0) "the shared licence header tokens one two three four five"
                 else s"unique body $i text with tokens ${i * 13} ${i * 17} none shared"
      i -> base
    }
    val df = docs.toDF("doc_id", "text")
    val full = SubstringDedup.nonCanonicalSpans(df, "text", "doc_id", 4)
      .filter($"doc_id" > 30).as[(Long, Long, Long, Long)].collect().toSet
    val inc = SubstringDedup.nonCanonicalSpansIncremental(
        SubstringDedup.shingleIndex(df.filter($"doc_id" <= 30), "text", "doc_id", 4),
        df.filter($"doc_id" > 30), "text", "doc_id", 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(inc == full && inc.nonEmpty)
  }

  test("incremental: batch-first occurrence of an UNSEEN window stays canonical") {
    val index = SubstringDedup.shingleIndex(
      Seq(1L -> "completely different old corpus content here").toDF("doc_id", "text"),
      "text", "doc_id", 3)
    val batch = Seq(
      10L -> "new phrase alpha beta gamma",
      11L -> "also new phrase alpha beta gamma").toDF("doc_id", "text")
    val out = SubstringDedup.nonCanonicalSpansIncremental(
        index, batch, "text", "doc_id", 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 10 keeps canonicity; doc 11's copy of "new phrase alpha beta
    // gamma" is marked (positions 2..6 of its 6-token text)
    assert(out == Set((11L, 2L, 6L, 5L)))
  }

  test("incremental: a non-distinct index never multiplies marks") {
    val dupIndex = Seq("a b c d e", "a b c d e")
      .zipWithIndex.map { case (t, i) => i.toLong -> t }.toDF("doc_id", "text")
    val idx = SubstringDedup.shingleIndex(dupIndex, "text", "doc_id", 3)
      .union(SubstringDedup.shingleIndex(dupIndex, "text", "doc_id", 3))
    val out = SubstringDedup.nonCanonicalSpansIncremental(
        idx, Seq(10L -> "a b c d e tail").toDF("doc_id", "text"),
        "text", "doc_id", 3)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((10L, 1L, 5L, 5L)))
  }

  test("overlapSpans: benchmark ranges marked in corpus docs only") {
    val corpus = Seq(
      1L -> "intro words the quick brown fox ends here",
      2L -> "nothing shared with any benchmark at all").toDF("doc_id", "text")
    val bench = Seq(
      100L -> "THE QUICK BROWN FOX jumps").toDF("doc_id", "text")
    val out = Decontaminate.overlapSpans(corpus, bench, "text", "doc_id", k = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    // "the quick brown fox" = corpus doc 1 positions 3..6 (case-blind)
    assert(out == Set((1L, 3L, 6L, 4L)))
  }

  test("cutSpans composes: surgical decontamination keeps the remainder") {
    val corpus = Seq(
      1L -> "keep this part SECRET EVAL QUESTION HERE and this too")
      .toDF("doc_id", "text")
    val bench = Seq(100L -> "secret eval question here").toDF("doc_id", "text")
    val out = SubstringDedup.cutSpans(corpus,
        Decontaminate.overlapSpans(corpus, bench, "text", "doc_id", k = 4),
        "text", "doc_id")
      .select("doc_id", "text_deduped", "n_tokens_removed")
      .as[(Long, String, Long)].collect().head
    assert(out == ((1L, "keep this part and this too", 4L)))
  }

  test("deterministic under repartition") {
    val docs = (1L to 40L).map(i =>
      i -> (if (i % 4 == 0) "shared shingle run of eight tokens exactly here"
            else s"unique text $i with no repeats at all ${i * 7}"))
    val a = spans(docs, k = 5)
    val b = SubstringDedup.duplicateSpans(
        docs.toDF("doc_id", "text").repartition(13), "text", "doc_id", 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("aggregate-join marking == the row_number/count window forms") {
    // the stage-2 marking is an aggregate + join (hot hashes partial-
    // combine; the join skew-splits) — this pins it to the window
    // semantics it replaced, on a corpus with repeats, case folds,
    // within-doc duplicates, and unique tails
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = ((1L to 30L).map(i =>
        i -> (if (i % 3 == 0) "the Same Boilerplate phrase repeated many times across documents"
              else if (i % 3 == 1) s"unique words u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f"
              else "internal repeat go go go go go go go go internal repeat")) :+
      (31L -> "the same boilerplate PHRASE repeated many times across documents"))
      .toDF("doc_id", "text")
    val k = 4
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "span_start", "span_end", "span_tokens")
        .as[(Long, Long, Long, Long)].collect().toSet

    val occ = SubstringDedup.occurrences(docs, "text", "doc_id", k)
    val byHash = Window.partitionBy(col("__h"))
    val dupWindow = SubstringDedup.mergeSpans(
      occ.withColumn("__cnt", count(lit(1)).over(byHash))
        .filter(col("__cnt") >= 2).drop("__cnt"), "doc_id", k)
    assert(key(SubstringDedup.duplicateSpans(docs, "text", "doc_id", k))
      == key(dupWindow))

    val byHashOrd = byHash.orderBy(col("doc_id"), col("pos"))
    val firstWindow = SubstringDedup.mergeSpans(
      occ.withColumn("__rn", row_number().over(byHashOrd))
        .filter(col("__rn") >= 2).drop("__rn"), "doc_id", k)
    assert(key(SubstringDedup.nonCanonicalSpans(docs, "text", "doc_id", k))
      == key(firstWindow))
  }

  test("hot shingle: AQE skew-split activates on the mark join, results stay exact") {
    // 600 docs of EXACTLY k tokens of identical boilerplate → each
    // emits ONE window hash, so a single key holds 600 rows while the
    // unique docs' hashes spread thin over every reduce partition —
    // the concentration a boilerplate line produces at corpus scale.
    // The window form this replaced could never split (a window
    // partition must co-locate); the aggregate+join form must show
    // AQE's skew-split actually firing, result-invariant. Same conf
    // recipe as DedupSpec's band fixture (thresholds to test scale;
    // coalescing off so there is more than one mapper to split along).
    val hot = (0 until 600).map(i =>
      (i.toLong, "the exact same boilerplate sentence"))
    val cold = (600 until 650).map(i =>
      (i.toLong, s"unique document number $i carrying words w${i}a w${i * 7}b w${i * 13}c distinct"))
    // several input partitions: skew-split subdivides a reduce
    // partition at MAPPER boundaries, so a single-mapper local table
    // leaves nothing to split along (never the case at corpus scale)
    val docs = (hot ++ cold).toDF("doc_id", "text").repartition(8)
    def run() = SubstringDedup.nonCanonicalSpans(docs, "text", "doc_id", 5)
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ).map(k => k ->
      scala.util.Try(conf.get(k)).toOption.flatMap(Option(_))).toMap
    try {
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      // at corpus scale the firsts build side is vocabulary-sized — far
      // past any broadcast threshold — so the mark join is a shuffled
      // join; the fixture forces that regime (a broadcast join at test
      // scale is both correct and skew-immune, proving nothing)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val baseline = run().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(baseline.size >= 599, "hot docs must all mark their boilerplate span")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100b")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1k")
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val df = run()
      // collect df ITSELF (an .as[...] view owns a separate query
      // execution, and the adaptive plan only finalizes on execution)
      val skewed = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "skew-split did not activate:\n" + plan.take(4000))
      assert(skewed == baseline, "skew-split changed the result set")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("hot shingle, incremental leg: AQE skew-split activates, results stay exact") {
    // the r8-advice gap: without the decoy key the incremental firsts
    // aggregate sat between the exchange and the mark join, so a hot
    // boilerplate shingle inside one large daily batch re-created the
    // single-task hazard the batch path had already removed. Same
    // planted-hot fixture as above, driven through the index probe
    // path; the mark join must show skew=true with the result set
    // invariant. (AQE then re-plants its own exchange between the
    // split join and the seen left-join, so the index probe stays
    // co-partitioned — visible in the executed plan.)
    val prior = (0 until 40).map(i =>
      (i.toLong, s"old document $i with words o${i}x o${i * 3}y o${i * 11}z here"))
      .toDF("doc_id", "text")
    val index = SubstringDedup.shingleIndex(prior, "text", "doc_id", 5)
    val hot = (1000 until 1600).map(i =>
      (i.toLong, "the exact same boilerplate sentence"))
    val cold = (1600 until 1650).map(i =>
      (i.toLong, s"unique document number $i carrying words w${i}a w${i * 7}b w${i * 13}c distinct"))
    val batch = (hot ++ cold).toDF("doc_id", "text").repartition(8)
    def run() = SubstringDedup.nonCanonicalSpansIncremental(
      index, batch, "text", "doc_id", 5)
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ).map(k => k ->
      scala.util.Try(conf.get(k)).toOption.flatMap(Option(_))).toMap
    try {
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val baseline = run().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(baseline.size >= 599, "hot docs must all mark their boilerplate span")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100b")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1k")
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val df = run()
      val skewed = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "skew-split did not activate on the incremental leg:\n" + plan.take(4000))
      assert(skewed == baseline, "skew-split changed the result set")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
