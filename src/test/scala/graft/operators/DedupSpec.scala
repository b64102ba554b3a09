package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "s1"),
    (2L, "the quick brown fox jumps over the lazy dog", "s1"),   // exact dup of 1
    (3L, "The quick BROWN fox, jumps over the lazy dog!", "s1"), // canonical dup of 1
    (4L, "the quick brown fox jumps over the sleepy dog", "s1"), // near dup (1 word)
    (5L, "completely different content about spark engines", "s2"),
  ).toDF("doc_id", "text", "source")

  test("exact dedup groups byte-identical docs; canonical also catches case/punct") {
    val ex = Dedup.exact(docs, "text", "doc_id")
    assert(ex.filter($"is_duplicate").select("doc_id").as[Long].collect().toSet == Set(2L))
    val canon = Dedup.canonical(docs, "text", "doc_id")
    assert(canon.filter($"is_duplicate").select("doc_id").as[Long].collect().toSet == Set(2L, 3L))
    assert(canon.filter($"doc_id" === 3L).head().getAs[Long]("canonical_id") == 1L)
  }

  test("minhash LSH: identical docs est_jaccard 1.0; near-dups found; distinct not paired") {
    val pairs = Dedup.minHashLsh(docs, "text", "doc_id",
      shingleSize = 2, numHashes = 32, bands = 16, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 4L)) || pairs.contains((2L, 4L))) // near-dup surfaces
    assert(!pairs.keys.exists { case (a, b) => a == 5L || b == 5L }) // 5 is unrelated
  }

  test("lshQuality: exact dups score perfectly; no-pair corpus keeps metrics NULL; hits bounded") {
    // the fixture's only ≥0.9 pairs are the exact/near-identical trio —
    // a 64-hash estimate cannot miss jaccard-1.0 pairs, so both metrics
    // pin at 1.0
    val r = Dedup.lshQuality(docs.select($"doc_id", $"text"),
      "text", "doc_id", threshold = 0.9).head()
    assert(r.getAs[Long]("n_exact") > 0)
    assert(r.getAs[Long]("n_hit") <=
      math.min(r.getAs[Long]("n_exact"), r.getAs[Long]("n_lsh")))
    assert(r.getAs[Double]("precision") == 1.0 && r.getAs[Double]("recall") == 1.0)
    // a corpus with no similar pairs: both denominators empty → NULL
    // metrics, never a fake 1.0
    val lone = Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val r2 = Dedup.lshQuality(lone, "text", "doc_id", threshold = 0.9).head()
    assert(r2.getAs[Long]("n_exact") == 0 && r2.getAs[Long]("n_lsh") == 0)
    assert(r2.isNullAt(r2.fieldIndex("precision")) &&
      r2.isNullAt(r2.fieldIndex("recall")))
  }

  test("minhash losers form == pairs-derived loser set on real documents") {
    // the collision-row shortcut (no pair-level dropDuplicates) must
    // yield exactly the ids the pair form marks as non-minimum ends
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val fromPairs = Dedup.minHashLsh(real, "text", "doc_id",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.8)
      .select(greatest($"id_a", $"id_b").as("doc_id")).distinct()
      .as[Long].collect().toSet
    val losers = Dedup.minHashLshLosers(real, "text", "doc_id",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.8)
      .as[Long].collect().toSet
    assert(losers == fromPairs)
    assert(losers.nonEmpty) // sf0.001 documents contain seeded near-dups
  }

  test("simhash: identical → distance 0; near-dup within small hamming") {
    val sigs = docs.select($"doc_id", Dedup.simHash(col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    // the aggregate (fast) form computes the same signatures as the
    // column (reference) form
    val dfSigs = Dedup.simHashDf(docs, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(dfSigs == sigs)
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(4L)) <= 16)
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(5L)) > 16)
    val pairs = Dedup.simHashPairs(docs, "text", "doc_id", maxHamming = 3)
    assert(pairs.filter($"id_a" === 1L && $"id_b" === 2L).head().getAs[Long]("hamming") == 0L)
  }

  test("ngram jaccard: exact set arithmetic within block") {
    val out = Dedup.ngramJaccard(docs, "text", "doc_id", "source", n = 2, minJaccard = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) == 1.0)
    // doc4 differs in 1 of 9 words → shares 6 of 8 2-shingles: J = 6/10
    assert(math.abs(out((1L, 4L)) - 0.6) < 1e-9)
    assert(!out.contains((1L, 5L))) // different block
  }

  test("embedding near-dup finds same-direction vectors only") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f, 0.0f), 0),
      (4L, Array(1.0f, 0.0f, 0.0f), 1), // same dir as 1 but other block
    ).toDF("vec_id", "embedding", "label")
    val out = Dedup.embeddingNearDup(vecs, "embedding", "vec_id", "label", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L))) // 1-3 orthogonal, 1-4 blocked apart
  }

  test("incremental minhash == batch: old pairs ∪ new-involving pairs, exactly") {
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val old = corpus.filter($"doc_id" % 5 =!= 0)
    val fresh = corpus.filter($"doc_id" % 5 === 0)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val batch = key(Dedup.minHashLsh(corpus, "text", "doc_id",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.2))
    val oldPairs = key(Dedup.minHashLsh(old, "text", "doc_id",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.2))
    val idxSigs = Dedup.signatures(old, "text", "doc_id", 3, 64)
    val freshSigs = Dedup.signatures(fresh, "text", "doc_id", 3, 64)
    val inc = key(Dedup.minHashLshIncremental(
      Dedup.signatureBands(idxSigs, 64, 16), idxSigs,
      Dedup.signatureBands(freshSigs, 64, 16), freshSigs,
      numHashes = 64, threshold = 0.2))

    assert(inc.keySet.intersect(oldPairs.keySet).isEmpty,
      "incremental must only emit pairs involving a new doc")
    assert(oldPairs ++ inc == batch,
      s"batch=${batch.size} old=${oldPairs.size} inc=${inc.size}")
  }

  test("incremental simhash == batch: old pairs ∪ new-involving pairs, exactly") {
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val old = corpus.filter($"doc_id" % 5 =!= 0)
    val fresh = corpus.filter($"doc_id" % 5 === 0)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    val batch = key(Dedup.simHashPairs(corpus, "text", "doc_id", maxHamming = 3))
    val oldPairs = key(Dedup.simHashPairs(old, "text", "doc_id", maxHamming = 3))
    val inc = key(Dedup.simHashIncremental(
      Dedup.simHashChunks(Dedup.simHashDf(old, "text", "doc_id")),
      Dedup.simHashChunks(Dedup.simHashDf(fresh, "text", "doc_id")),
      maxHamming = 3))

    assert(inc.keySet.intersect(oldPairs.keySet).isEmpty,
      "incremental must only emit pairs involving a new doc")
    assert(oldPairs ++ inc == batch,
      s"batch=${batch.size} old=${oldPairs.size} inc=${inc.size}")
  }

  test("incremental embedding == batch: old pairs ∪ new-involving pairs, exactly") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding")
    val old = emb.filter($"vec_id" % 5 =!= 0)
    val fresh = emb.filter($"vec_id" % 5 === 0)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "cosine").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // batch form scores on the collision row, incremental fetches per
    // pair — the score is table-independent, so the maps agree exactly
    val batch = key(Dedup.embeddingNearDupLsh(emb, "embedding", "vec_id",
      minCosine = 0.2, dim = 64))
    val oldPairs = key(Dedup.embeddingNearDupLsh(old, "embedding", "vec_id",
      minCosine = 0.2, dim = 64))
    val (oldBk, oldV) = Dedup.embeddingIndex(old, "embedding", "vec_id", dim = 64)
    val (newBk, newV) = Dedup.embeddingIndex(fresh, "embedding", "vec_id", dim = 64)
    val inc = key(Dedup.embeddingNearDupIncremental(oldBk, oldV, newBk, newV, 0.2))

    assert(inc.keySet.intersect(oldPairs.keySet).isEmpty,
      "incremental must only emit pairs involving a new vector")
    assert(oldPairs ++ inc == batch,
      s"batch=${batch.size} old=${oldPairs.size} inc=${inc.size}")
  }

  test("band join under a hot band_key: AQE skew-split activates, results stay exact") {
    // 20% of docs byte-identical → their (band, band_key) collides in
    // EVERY band: one shuffle partition holds a quadratic pair blow-up
    // while the rest stay tiny — the skew shape a hot boilerplate/empty
    // document produces at corpus scale. The shuffle_hash pins keep the
    // join shuffled (spec'd elsewhere); this case asserts the AQE
    // skew-split path the pins rely on actually fires and is
    // result-invariant. Thresholds drop to test scale (the defaults
    // trigger at 256 MB partitions).
    val hot = (0 until 150).map(i =>
      (i.toLong, "the exact same boilerplate text repeated across the corpus every day"))
    val cold = (150 until 200).map(i =>
      (i.toLong, s"unique document number $i carrying words w${i}a w${i * 7}b w${i * 13}c distinct"))
    val docs = (hot ++ cold).toDF("doc_id", "text")
    def pairs() = Dedup.minHashLsh(docs, "text", "doc_id",
      shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.coalescePartitions.enabled",
    ).map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      // skew-split subdivides a reduce partition at MAPPER boundaries;
      // at test scale AQE coalesces every upstream stage to one task
      // (one mapper = nothing to split), which can never happen at the
      // corpus scale this guards — pin coalescing off for the fixture
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val baseline = pairs()
      assert(baseline.size >= 150 * 149 / 2, "hot docs must all pair up")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100b")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1k")
      // the pair dedup re-shuffles on (id_a,id_b) anyway, but AQE counts
      // the replacement exchange as "extra" — force keeps the split on
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val df = Dedup.minHashLsh(docs, "text", "doc_id",
        shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.5)
      val skewed = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), "skew-split did not activate:\n" + plan.take(4000))
      assert(skewed == baseline, "skew-split changed the result set")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("incremental band join under a hot batch: AQE skew-split activates, results stay exact") {
    // the incremental twin of the case above: a daily batch full of
    // boilerplate probes the persisted band index, and the candidate
    // join on (band, band_key) must stay skew-splittable through the
    // union-of-index-and-batch shape (round-9 audit: it does — both
    // join children sit directly on exchanges, unlike the span family's
    // pre-decoy aggregate-under-join shape)
    val prior = (0 until 50).map(i =>
      (i.toLong, s"old document $i with words o${i}x o${i * 3}y o${i * 11}z here"))
      .toDF("doc_id", "text")
    val iSigs = Dedup.signatures(prior, "text", "doc_id", 3, 32)
    val iBands = Dedup.signatureBands(iSigs, 32, 8)
    val hot = (1000 until 1300).map(i =>
      (i.toLong, "the exact same boilerplate sentence repeated through the corpus"))
    val batch = hot.toDF("doc_id", "text").repartition(8)
    val bSigs = Dedup.signatures(batch, "text", "doc_id", 3, 32)
    val bBands = Dedup.signatureBands(bSigs, 32, 8)
    def run() = Dedup.minHashLshIncremental(iBands, iSigs, bBands, bSigs, 32, 0.5)
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
      val baseline = run().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(baseline.size >= 300 * 299 / 2, "hot batch must pair up")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100b")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1k")
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val df = run()
      val skewed = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "skew-split did not activate on the incremental band join:\n" + plan.take(4000))
      assert(skewed == baseline, "skew-split changed the result set")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("rolling fingerprints: shared substrings overlap, short/empty docs yield none") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a different start but the quick brown fox appears here"),
      (3L, "zzzz"),             // shorter than the window after canon
      (4L, ""),
      (5L, "!!! ???"),          // canonicalizes to empty
    ).toDF("doc_id", "text")
    val fp = Dedup.rollingFingerprints(d, "text", "doc_id", w = 8)
    val byDoc = fp.groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.contains(1L) && byDoc.contains(2L))
    assert(!byDoc.contains(3L) && !byDoc.contains(4L) && !byDoc.contains(5L))
    // the shared phrase "the quick brown fox" gives shared window hashes
    val shared = fp.filter($"id" === 1L).select("rh")
      .intersect(fp.filter($"id" === 2L).select("rh"))
    assert(shared.count() >= 10)
    // a doc never shares all fingerprints with a different doc
    assert(shared.count() < byDoc(1L))
  }

  test("native shingles == relational window form on real documents + edges") {
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").limit(200)
    val edges = Seq(
      (9001L, null.asInstanceOf[String]),
      (9002L, ""), (9003L, "   "),
      (9004L, "one two"),            // shorter than n
      (9005L, "a a a a a"),          // repeated shingles collapse
      (9006L, "Thỏa  THUẬN\tcủa người dùng"),
    ).toDF("doc_id", "text")
    val docs = real.unionByName(edges)
    for (n <- Seq(2, 3)) {
      val native = Dedup.shingleRows(docs, "text", "doc_id", Nil, n)
      val rel = Dedup.shingleRowsRelational(docs, "text", "doc_id", Nil, n)
      assert(native.exceptAll(rel).isEmpty && rel.exceptAll(native).isEmpty, s"n=$n")
    }
  }

  test("CDC chunks: native expression == relational form on real documents") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
    val native = Dedup.cdcChunks(docs, "text", "doc_id", w = 8, avgSize = 64)
    val rel = Dedup.cdcChunksRelational(docs, "text", "doc_id", w = 8, avgSize = 64)
    assert(native.exceptAll(rel).isEmpty && rel.exceptAll(native).isEmpty)
  }

  test("CDC chunks: content-anchored boundaries survive an insertion; chars partition exactly") {
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val edited = "INSERTED TOKEN " + base // prepend — fixed-size blocks would shift everything
    val d = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val ch = Dedup.cdcChunks(d, "text", "doc_id", w = 8, avgSize = 32).cache()
    // chunks partition the text: lengths sum to the canonical char count
    val canonLen = d.select(sum(length(
      trim(regexp_replace(regexp_replace(lower($"text"), "[^a-z0-9 ]", " "), " +", " ")))))
      .head().getLong(0)
    assert(ch.agg(sum($"chunk_len")).head().getLong(0) == canonLen)
    // the tail chunks (past the insertion point) realign: most digests shared
    val a = ch.filter($"id" === 1L).select("chunk_md5").collect().map(_.getString(0)).toSet
    val b = ch.filter($"id" === 2L).select("chunk_md5").collect().map(_.getString(0)).toSet
    val shared = a.intersect(b).size
    assert(shared >= a.size / 2, s"only $shared of ${a.size} chunks survived the edit")
    assert(a != b) // but the edited chunk did change
    ch.unpersist()
  }

  test("LSH-blocked near-dup: high recall vs exact on real embeddings, no spurious pairs") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("all", lit(0))
    val exact = Dedup.embeddingNearDupQuantized(emb, "embedding", "vec_id", "all", 0.5)
      .select("id_a", "id_b", "cosine")
    val lsh = Dedup.embeddingNearDupLsh(emb, "embedding", "vec_id", 0.5,
      dim = 64, bits = 6, tables = 12)
    val exactPairs = exact.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshRows = lsh.collect()
    val lshPairs = lshRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    // every LSH pair is a true pair (exact verification) with the same cosine
    assert(lshPairs.subsetOf(exactPairs))
    val exactCos = exact.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    lshRows.foreach(r => assert(exactCos((r.getLong(0), r.getLong(1))) == r.getDouble(2)))
    // and recall is usable at these (bits, tables)
    if (exactPairs.nonEmpty) {
      val recall = lshPairs.size.toDouble / exactPairs.size
      assert(recall >= 0.6, s"recall $recall over ${exactPairs.size} true pairs")
    }
  }

  test("paragraph dedup: first occurrence survives, empties keep, rebuild is ordered") {
    val pd = Seq(
      (1L, "HEAD\n\nunique one\n\nFOOT"),
      (2L, "HEAD\n\nunique two\n\nFOOT"),   // loses HEAD + FOOT to doc 1
      (3L, "HEAD\n\n\n\nFOOT"),             // empty middle para is structure: kept
      (4L, null.asInstanceOf[String]),      // NULL passes through
      (5L, "HEAD\n\nFOOT"),                 // loses everything → ""
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(pd, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // nothing dropped ⇒ rebuild is the identity
    assert(out(1L) == (("HEAD\n\nunique one\n\nFOOT", 3L, 3L, 0L)))
    assert(out(2L) == (("unique two", 3L, 1L, 2L)))
    assert(out(3L) == (("", 3L, 1L, 2L)))
    assert(out(4L) == ((null, 0L, 0L, 0L)))
    assert(out(5L) == (("", 2L, 0L, 2L)))
  }

  test("semDedup: higher-id near-parallel clustermates marked; orthogonal/opposite kept") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.99, 0.01, 0.0, 0.0)),  // ~parallel to 1 → dup (same argmax cell as 1)
      (3L, Seq(0.0, 1.0, 0.0, 0.0)),
      (4L, Seq(-1.0, 0.0, 0.0, 0.0)),   // opposite direction: cosine -1, kept
      (5L, Seq(0.0, 0.98, 0.02, 0.0)),  // ~parallel to 3 → dup
    ).toDF("id", "vec")
    val out = Dedup.semDedup(vecs, "id", "vec", nClusters = 2, minCosine = 0.9)
    val dups = out.filter(col("sem_dup")).select("id").as[Long].collect().toSet
    assert(dups == Set(2L, 5L))
    // every row present exactly once; kept rows have NULL nn_cosine
    assert(out.count() == 5)
    assert(out.filter(!col("sem_dup")).filter(col("nn_cosine").isNotNull).count() == 0)
  }

  test("incremental paragraph dedup == one-shot restricted to the batch; takedown re-elects") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("text").isNotNull)
      // plant cross-doc structure: shared header + text-derived paras
      .select(col("doc_id"), concat_ws("\n\n",
        lit("hdr"), substring(col("text"), 1, 50),
        substring(col("text"), 51, 50)).as("body"))
    val old = docs.filter(col("doc_id") < 80)
    val fresh = docs.filter(col("doc_id") >= 80)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // monotonic contract: batch verdicts == one-shot restricted
    val inc = key(Dedup.paragraphDedupIncremental(
      Dedup.paraPostings(old, "body", "doc_id"), fresh, "body", "doc_id"))
    val full = key(Dedup.paragraphDedup(docs, "body", "doc_id")
      .filter(col("doc_id") >= 80))
    assert(inc == full)
    assert(inc.nonEmpty)
    // takedown: postings minus deleted docs ⇒ probe == build-without
    val tomb = old.filter(col("doc_id") % 5 === 2).select(col("doc_id"))
    val live = Dedup.paraPostings(old, "body", "doc_id")
      .join(tomb, col("id") === tomb("doc_id"), "left_anti")
    val afterDelete = key(Dedup.paragraphDedupIncremental(live, fresh, "body", "doc_id"))
    val without = key(Dedup.paragraphDedup(
        old.join(tomb, Seq("doc_id"), "left_anti").unionByName(fresh),
        "body", "doc_id")
      .filter(col("doc_id") >= 80))
    assert(afterDelete == without)
    // the takedown must actually move at least one election
    assert(afterDelete != inc)
  }

  test("incremental semDedup == frozen-codebook one-shot; cell takedown re-elects") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val old = emb.filter(col("vec_id") < 80)
    val fresh = emb.filter(col("vec_id") >= 80)
    val (cents, cells) = IvfIndex.buildIndex(old, "vec_id", "embedding", 8)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getBoolean(2), Option(r.get(3)))).toMap
    val inc = key(Dedup.semDedupIncremental(cents, cells, fresh,
      "vec_id", "embedding", 0.2))
    // one-shot with the SAME frozen codebook: empty index, probe everyone
    val oneShot = key(Dedup.semDedupIncremental(cents, cells.limit(0),
        old.unionByName(fresh), "vec_id", "embedding", 0.2)
      .filter(col("vec_id") >= 80))
    assert(inc == oneShot)
    assert(inc.exists(_._2._2), "expected at least one semantic dup in the batch")
    // takedown: anti-join cells, probe again == build-without (q97 shape)
    val tomb = old.filter(col("vec_id") % 5 === 2).select(col("vec_id"))
    val liveCells = cells.join(tomb, cells("id") === tomb("vec_id"), "left_anti")
    val afterDelete = key(Dedup.semDedupIncremental(cents, liveCells, fresh,
      "vec_id", "embedding", 0.2))
    val without = key(Dedup.semDedupIncremental(cents, cells.limit(0),
        old.join(tomb, Seq("vec_id"), "left_anti").unionByName(fresh),
        "vec_id", "embedding", 0.2)
      .filter(col("vec_id") >= 80))
    assert(afterDelete == without)
  }

  test("semDedup with one cluster == brute-force lower-id neighbor rule") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Dedup.semDedup(emb, "vec_id", "embedding", nClusters = 1, minCosine = 0.2)
      .filter(col("sem_dup")).select("vec_id").as[Long].collect().toSet
    // brute force: quantized pair cosine over ALL pairs (one cluster ⇒ no blocking)
    val brute = Dedup.embeddingNearDupQuantized(
        emb.withColumn("all", lit(0)), "embedding", "vec_id", "all", 0.2)
      .select(greatest($"id_a", $"id_b").as("loser")).distinct()
      .as[Long].collect().toSet
    assert(out == brute)
    assert(out.nonEmpty) // sf0.001 embeddings contain seeded near-dups
  }

  test("chunkOverlapPairs maxChunkDf: boilerplate chunks stop pairing, distinctive ones still do") {
    import spark.implicits._
    val boiler = "alpha beta gamma delta epsilon zeta eta theta " * 8
    val distinct2 = "one two three four five six seven eight nine ten " * 8
    val docs = ((1L to 10L).map(i => (i, boiler)) ++
      Seq((20L, distinct2), (21L, distinct2)) ++
      Seq((30L, "totally unrelated words entirely different content here now"))
    ).toDF("doc_id", "text")
    def pairs(cap: Int) = Dedup.chunkOverlapPairs(docs, "text", "doc_id",
        minShared = 1, maxChunkDf = cap)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val uncapped = pairs(0)
    assert(uncapped.size == 45 + 1, s"10-doc boilerplate group → 45 pairs: $uncapped")
    val capped = pairs(5)
    // the df-10 boilerplate chunks drop from evidence; the df-2 pair keeps
    assert(capped == Set((20L, 21L)), s"capped pairs: $capped")
  }
}
