package graft.jobs

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CorpusJobSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs away fast", "en"),
    (2L, "the quick brown fox jumps over the lazy dog and runs away fast", "en"), // exact dup
    (3L, "The QUICK brown fox jumps over the lazy dog and runs away fast!", "en"), // canonical dup
    (4L, "the quick brown fox jumps over the lazy dog and runs away quickly", "en"), // near dup
    (5L, "tiny", "en"), // too short
    (6L, "a completely different document about the spark engine and its catalyst optimizer internals", "en"),
  ).toDF("doc_id", "text", "lang")

  test("annotate marks exact/canonical/near dups, quality, language") {
    val ann = CorpusJob.annotate(corpus,
      CorpusJob.Config(shingleSize = 2, nearDupThreshold = 0.5))
    val byId = ann.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!byId(1L).getAs[Boolean]("is_duplicate"))
    assert(byId(2L).getAs[Boolean]("is_duplicate"))
    assert(byId(3L).getAs[Boolean]("is_duplicate"), "canonical dedup catches case/punct")
    assert(byId(4L).getAs[Boolean]("is_near_duplicate"), "minhash catches 1-word edit")
    assert(!byId(6L).getAs[Boolean]("is_near_duplicate"))
    assert(byId(6L).getAs[String]("lang_pred") == "en")
  }

  test("normalizeText config: encoding variants and markup wrappers collapse to one canonical") {
    // the same visible sentence three ways: precomposed é, combining
    // e+U+0301, and an HTML wrapper — plus a genuinely different doc
    val base = "café menu deluxe offers the finest seasonal dishes daily"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("é", "é")),
      (3L, s"<p>$base</p>"),
      (4L, "a completely unrelated document about engines and optimizers"),
    ).toDF("doc_id", "text")
    // default (raw) pipeline: the three encodings fingerprint apart
    val raw = CorpusJob.annotate(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_duplicate")).toMap
    assert(raw.values.forall(_ == false),
      "raw pipeline must NOT unify the variants (that's the gap normalizeText closes)")
    // normalized pipeline: 2 and 3 collapse onto 1
    val norm = CorpusJob.annotate(docs, CorpusJob.Config(normalizeText = true))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_duplicate")).toMap
    assert(!norm(1L) && norm(2L) && norm(3L) && !norm(4L),
      s"expected 2,3 to dedup onto 1, got $norm")
  }

  test("runIncremental over monotonic daily batches == one-shot annotate; state converges") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val n = docs.agg(max($"doc_id")).head().getLong(0)
    // monotonic id slices — the daily-extract arrival order the operator
    // documents (losers always land in the current batch)
    val slices = Seq(
      docs.filter($"doc_id" <= n / 3),
      docs.filter($"doc_id" > n / 3 && $"doc_id" <= 2 * n / 3),
      docs.filter($"doc_id" > 2 * n / 3))
    val state = tmpDir("corpusinc")
    val cfg = CorpusJob.Config(nearDupThreshold = 0.5)
    slices.foreach(s => CorpusJob.runIncremental(spark, s, state, cfg))

    val cols = Seq("doc_id", "canonical_id", "is_duplicate",
      "is_near_duplicate", "n_tokens", "quality", "lang_pred")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.head, cols.tail: _*).collect()
        .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val daily = key(spark.read.parquet(s"$state/annotated"))
    val oneShot = key(CorpusJob.annotate(docs, cfg))
    assert(daily == oneShot, s"daily=${daily.size} oneShot=${oneShot.size}")

    // folded state equals its batch twin
    val labels = spark.read.parquet(s"$state/folded/labels")
      .as[(Long, Long)].collect().toMap
    val batchLabels = graft.operators.DedupCluster.connectedComponents(
        graft.operators.Dedup.minHashLsh(docs, "text", "doc_id",
          cfg.shingleSize, cfg.numHashes, cfg.bands, cfg.nearDupThreshold),
        "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(labels == batchLabels)
    val vocab = spark.read.parquet(s"$state/folded/vocab")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchVocab = graft.operators.TermStats.docFreq(docs, "text", "doc_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab == batchVocab)
    assert(spark.read.parquet(s"$state/folded/meta").head().getLong(0) == docs.count())

    // the span leg: union of daily span appends == the one-shot
    // non-canonical span build over the whole corpus
    def spanSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "span_start", "span_end", "span_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val dailySpans = spanSet(spark.read.parquet(s"$state/spans"))
    assert(dailySpans == spanSet(graft.operators.SubstringDedup
      .nonCanonicalSpans(docs, "text", "doc_id", cfg.spanTokens)))

    // replaying a batch rewrites identical annotated rows (the appends
    // duplicate, which downstream consumers dedupe on doc_id — assert
    // the VALUES are stable, the effectively-once contract)
    CorpusJob.runIncremental(spark, slices.last, state, cfg)
    val replayed = spark.read.parquet(s"$state/annotated")
      .select(cols.head, cols.tail: _*).distinct()
    assert(replayed.count() == oneShot.size)
    // ...including the spans: the attributed index keeps the replay
    // from seeing its own crashed-attempt hashes, so the re-appended
    // span values are byte-identical (distinct == the batch build)
    assert(spanSet(spark.read.parquet(s"$state/spans")) == dailySpans)

    // the audited wrapper makes completed-date re-runs TRUE no-ops
    // (vocab/meta cannot double-count): first run brackets Success,
    // second run skips without touching state
    val audit = new graft.control.Audit(spark, tmpDir("corpusinc-audit"),
      () => new java.sql.Timestamp(1700000000000L))
    val state2 = tmpDir("corpusinc2")
    val n1 = CorpusJob.runIncrementalAudited(spark, slices.head, state2, audit,
      "2025-11-24", cfg)
    assert(n1 == slices.head.count())
    val vocabBefore = spark.read.parquet(s"$state2/folded/vocab").count()
    assert(CorpusJob.runIncrementalAudited(spark, slices.head, state2, audit,
      "2025-11-24", cfg) == 0L)
    assert(spark.read.parquet(s"$state2/folded/vocab").count() == vocabBefore)

    // maintenance: three days of appends compact to one file per table,
    // content untouched
    val pairsBefore = spark.read.parquet(s"$state/pairs")
      .collect().map(_.toSeq).toSet
    val compacted = CorpusJob.compactState(spark, state)
    assert(compacted.keySet ==
      Set("index/sigs", "index/bands", "index/shingles", "fps", "pairs",
        "annotated", "spans"))
    assert(compacted.values.forall(_ == 1), compacted.toString)
    assert(spark.read.parquet(s"$state/pairs")
      .collect().map(_.toSeq).toSet == pairsBefore)
  }

  test("fold replay marker: same-batchId replay cannot double-count vocab/meta") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val n = docs.agg(max($"doc_id")).head().getLong(0)
    val (d1, d2) = (docs.filter($"doc_id" <= n / 2), docs.filter($"doc_id" > n / 2))
    val state = tmpDir("corpusfold")
    val cfg = CorpusJob.Config(nearDupThreshold = 0.5)
    CorpusJob.runIncremental(spark, d1, state, cfg, batchId = Some("2025-11-24"))
    CorpusJob.runIncremental(spark, d2, state, cfg, batchId = Some("2025-11-25"))
    def folded() = {
      val vocab = spark.read.parquet(s"$state/folded/vocab")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val meta = spark.read.parquet(s"$state/folded/meta").head()
      (vocab, meta.getLong(0), meta.getString(1))
    }
    val before = folded()
    assert(before._2 == docs.count() && before._3 == "2025-11-25")
    // the window the audit gate can't see: the fold committed (marker
    // swapped atomically with it) but the batch crashed before reaching
    // audit Success — the replay re-runs runIncremental with the SAME
    // batch id, and the marker must turn the additive fold into a no-op
    CorpusJob.runIncremental(spark, d2, state, cfg, batchId = Some("2025-11-25"))
    assert(folded() == before, "replayed fold double-counted")
    // a genuinely NEW batch id still folds forward
    CorpusJob.runIncremental(spark, d2.limit(0), state, cfg, batchId = Some("2025-11-26"))
    assert(folded()._3 == "2025-11-26")
    assert(folded()._2 == docs.count(), "empty day must not change n_docs")
  }

  test("selection-count state: daily folds == one-shot; replay-gated; takedown subtracts; weights fit from state") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val n = docs.agg(max($"doc_id")).head().getLong(0)
    val (d1, d2) = (docs.filter($"doc_id" <= n / 2), docs.filter($"doc_id" > n / 2))
    val state = tmpDir("corpussel")
    val cfg = CorpusJob.Config(nearDupThreshold = 0.5,
      maintainSelectionCounts = true, selectionDim = 1024)
    CorpusJob.runIncremental(spark, d1, state, cfg, batchId = Some("d1"))
    CorpusJob.runIncremental(spark, d2, state, cfg, batchId = Some("d2"))
    def sel(): Map[Long, Long] = spark.read.parquet(s"$state/folded/selcounts")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def oneShot(d: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      graft.operators.Dsir.bucketCountsDf(d, "text", 1024)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sel() == oneShot(docs), "daily folds must equal the one-shot count")
    // replay with the same batch id: the marker gates the additive fold
    CorpusJob.runIncremental(spark, d2, state, cfg, batchId = Some("d2"))
    assert(sel() == oneShot(docs), "replayed fold double-counted selcounts")
    // takedown subtracts exactly the deleted docs' contribution
    val delIds = docs.filter($"doc_id" % 7 === 3).select($"doc_id")
    CorpusJob.deleteDocs(spark, delIds, state, Some("del-1"), cfg)
    assert(sel() == oneShot(docs.filter($"doc_id" % 7 =!= 3)),
      "selcounts after takedown must equal the survivors' one-shot count")
    // and the state is directly usable: weights fit from the
    // maintained table == weights fit from the live corpus
    val target = docs.filter($"doc_id" % 7 =!= 3).limit(50)
    val viaState = graft.operators.Dsir.weightsFrom(
      graft.operators.Dsir.bucketCountsDf(target, "text", 1024),
      spark.read.parquet(s"$state/folded/selcounts"), 1024)
    val scratch = graft.operators.Dsir.fitWeights(
      target, docs.filter($"doc_id" % 7 =!= 3), "text", 1024)
    assert(viaState.sameElements(scratch))
  }

  test("advisory-state legs (r13): daily folds of mixture loss + skew " +
      "state == one-shot state, replay-gated, readable by their consumers") {
    val docs = Tables.documents(spark, sfDir()).select($"doc_id", $"text")
    val n = docs.agg(max($"doc_id")).head().getLong(0)
    val (d1, d2) = (docs.filter($"doc_id" <= n / 2), docs.filter($"doc_id" > n / 2))
    val state = tmpDir("corpusadv")
    val cfg = CorpusJob.Config(nearDupThreshold = 0.5,
      maintainMixtureState = true, maintainSkewState = true)
    CorpusJob.runIncremental(spark, d1, state, cfg, batchId = Some("d1"))
    CorpusJob.runIncremental(spark, d2, state, cfg, batchId = Some("d2"))

    // mixture leg: the folded stats equal the one-shot stats over the
    // whole corpus (per-doc lang/loss are pure functions of the text),
    // and the state is directly consumable by weightsFromState
    def lossFrame(d: org.apache.spark.sql.DataFrame) =
      CorpusJob.annotate(d, cfg).withColumn("__loss_fp",
        when($"n_tokens" > 0, expr("length(text) * 1024L div n_tokens"))
          .otherwise(lit(0L)))
    val oneShotStats = graft.operators.DomainMixture.lossStats(
        lossFrame(docs), "lang_pred", "__loss_fp")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val foldedStats = spark.read.parquet(s"$state/folded/mixloss")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(foldedStats == oneShotStats,
      s"folded mixture stats diverged: $foldedStats vs $oneShotStats")
    val viaState = graft.operators.DomainMixture.weightsFromState(
        spark, s"$state/folded/mixloss")
      .orderBy($"domain").collect().map(_.toString).toSeq
    val scratch = graft.operators.DomainMixture.weights(
        lossFrame(docs), "lang_pred", "__loss_fp")
      .orderBy($"domain").collect().map(_.toString).toSeq
    assert(viaState == scratch)

    // skew leg: folded state reads like a one-shot writeSkewState over
    // the union's content_fp key space — n_rows EXACT, n_keys exact
    // (canonical theta merge), hot-key ub within one resolution (the
    // MG candidate superset may differ by partitioning, the documented
    // envelope)
    val fps = docs.withColumn("content_fp",
      graft.functions.TextFunctions.contentFingerprint($"text"))
    val oneDir = tmpDir("advskew")
    graft.operators.Salting.writeSkewState(
      fps.select($"content_fp"), Seq("content_fp"), oneDir)
    val folded = graft.operators.Salting.skewReportFromState(
      spark, s"$state/folded/skew").head
    val oneShot = graft.operators.Salting.skewReportFromState(
      spark, oneDir).head
    assert(folded.getAs[Long]("n_rows") == oneShot.getAs[Long]("n_rows"))
    assert(folded.getAs[Long]("n_keys") == oneShot.getAs[Long]("n_keys"))
    val res = oneShot.getAs[Long]("cm_resolution")
    assert(math.abs(folded.getAs[Long]("max_key_rows_ub") -
      oneShot.getAs[Long]("max_key_rows_ub")) <= res)

    // replay gate: a same-batchId re-run must not double-count either
    CorpusJob.runIncremental(spark, d2, state, cfg, batchId = Some("d2"))
    val replayStats = spark.read.parquet(s"$state/folded/mixloss")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(replayStats == oneShotStats, "replayed fold double-counted mixloss")
    assert(graft.operators.Salting.skewReportFromState(
        spark, s"$state/folded/skew").head.getAs[Long]("n_rows") ==
      oneShot.getAs[Long]("n_rows"), "replayed fold double-counted skew state")

    // takedown: the folded-root swap in deleteDocs must CARRY the
    // advisory tables (any table not re-listed is dropped by the swap —
    // the state survives unchanged; sketches aren't subtractive and the
    // advisory informs partitioning, the documented contract)
    CorpusJob.deleteDocs(spark,
      docs.filter($"doc_id" % 11 === 0).select($"doc_id"),
      state, Some("del-1"), cfg)
    val afterDelete = spark.read.parquet(s"$state/folded/mixloss")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(afterDelete == oneShotStats,
      "takedown must not drop or alter the mixture-loss state")
    assert(graft.operators.Salting.skewReportFromState(
        spark, s"$state/folded/skew").head.getAs[Long]("n_rows") ==
      oneShot.getAs[Long]("n_rows"),
      "takedown must not drop or alter the skew state")
  }

  test("bloom leg (r13): daily folds == one-shot filter bit-for-bit; " +
      "replay and takedown leave the bits; novelty served from state") {
    import graft.operators.PortableBloom
    val docs = Tables.documents(spark, sfDir()).select($"doc_id", $"text")
    val n = docs.agg(max($"doc_id")).head().getLong(0)
    val (d1, d2) = (docs.filter($"doc_id" <= n / 2), docs.filter($"doc_id" > n / 2))
    val state = tmpDir("corpusbloom")
    val cfg = CorpusJob.Config(nearDupThreshold = 0.5, maintainBloomState = true)
    CorpusJob.runIncremental(spark, d1, state, cfg, batchId = Some("d1"))
    CorpusJob.runIncremental(spark, d2, state, cfg, batchId = Some("d2"))
    def words(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      PortableBloom.collectWords(df).toSeq
    val oneShot = words(
      PortableBloom.shingleSketch(docs, "text", "doc_id", cfg.shingleSize))
    assert(words(spark.read.parquet(s"$state/folded/bloom")) == oneShot,
      "two daily folds must equal the one-shot corpus filter bit-for-bit")
    // replay: the batchId gate makes it a no-op — and OR idempotence
    // would make even an ungated replay a bit-level no-op
    CorpusJob.runIncremental(spark, d2, state, cfg, batchId = Some("d2"))
    assert(words(spark.read.parquet(s"$state/folded/bloom")) == oneShot)
    // takedown: membership state is not subtractive — the swap carries
    // the bits unchanged (the advisory-state contract)
    CorpusJob.deleteDocs(spark,
      docs.filter($"doc_id" % 11 === 0).select($"doc_id"),
      state, Some("del-1"), cfg)
    assert(words(spark.read.parquet(s"$state/folded/bloom")) == oneShot,
      "takedown must not drop or alter the bloom state")
    // the maintained state answers novelty with NO corpus re-read:
    // already-folded docs probe fully contained (no false negatives)
    val replayProbe = PortableBloom.contaminationByBloom(d1.limit(20),
      PortableBloom.collectWords(spark.read.parquet(s"$state/folded/bloom")),
      "text", "doc_id", n = cfg.shingleSize)
    assert(replayProbe.filter($"n_bloom_hits" =!= $"n_shingles").count() == 0L,
      "seen documents must probe fully contained in the corpus filter")
    // geometry pin (ADVICE r13): the fold records (m, k, shingle n)
    // beside the words, and a run at a different shingle size must fail
    // loudly instead of ORing mismatched bits into the old state
    val meta = spark.read.parquet(s"$state/folded/bloommeta").head()
    assert((meta.getAs[Int]("m"), meta.getAs[Int]("k"), meta.getAs[Int]("shingle_n")) ==
      ((PortableBloom.DefaultM, PortableBloom.DefaultK, cfg.shingleSize)))
    val e = intercept[IllegalArgumentException] {
      CorpusJob.runIncremental(spark, d1.limit(5), state,
        cfg.copy(shingleSize = cfg.shingleSize + 2), batchId = Some("d3"))
    }
    assert(e.getMessage.contains("mismatched bits"))
  }

  test("bloom lifecycle (r14): a fresh state never rebuilds; a takedown " +
      "trips the dial and compaction rebuilds from live docs BIT-FOR-BIT, " +
      "resetting the meter") {
    import graft.operators.PortableBloom
    // unsaturated slice: the WHOLE sf corpus pushes bits_set past m/2,
    // which (correctly) trips the saturation dial on its own — this
    // test needs the no-takedown compaction to genuinely NOT rebuild,
    // so the takedown flip below is proven to come from the meter
    val docs = Tables.documents(spark, sfDir())
      .select($"doc_id", $"text").filter($"doc_id" <= 30)
    val n = docs.agg(max($"doc_id")).head().getLong(0)
    val state = tmpDir("bloomlife")
    val cfg = CorpusJob.Config(nearDupThreshold = 0.5, maintainBloomState = true)
    CorpusJob.runIncremental(spark, docs.filter($"doc_id" <= n / 2),
      state, cfg, batchId = Some("d1"))
    CorpusJob.runIncremental(spark, docs.filter($"doc_id" > n / 2),
      state, cfg, batchId = Some("d2"))
    def words(): Seq[Long] = PortableBloom.collectWords(
      spark.read.parquet(s"$state/folded/bloom")).toSeq
    def takedowns(): Long = spark.read.parquet(s"$state/folded/bloommeta")
      .head().getAs[Long]("takedown_docs")
    val oneShot = words()
    assert(takedowns() == 0L)
    // fresh state: neither dial trips (PROVEN on the decision itself —
    // a same-docs rebuild would be bit-identical, so words-unchanged
    // alone could not distinguish rebuild from no-rebuild)
    assert(!PortableBloom.needsRebuild(
      spark.read.parquet(s"$state/folded/bloom")),
      "an unsaturated no-takedown filter must not trip the decision")
    CorpusJob.compactState(spark, state)
    assert(words() == oneShot, "a fresh filter must not rebuild")
    assert(takedowns() == 0L)
    // takedown: the logical delete carries bits but meters the dial
    val deleted = docs.filter($"doc_id" % 7 === 0).select($"doc_id")
    val nDel = CorpusJob.deleteDocs(spark, deleted, state, Some("del-1"), cfg)
    assert(nDel > 0L)
    assert(takedowns() == nDel, "deleteDocs must meter takedown_docs")
    assert(words() == oneShot, "logical delete must carry the bits")
    // compaction: the dial trips, the filter rebuilds from live docs —
    // equal to build-without-deleted bit-for-bit — and the meter resets
    CorpusJob.compactState(spark, state)
    val live = docs.join(deleted, Seq("doc_id"), "left_anti")
    assert(words() == PortableBloom.collectWords(
      PortableBloom.shingleSketch(live, "text", "doc_id", cfg.shingleSize)).toSeq,
      "rebuild must equal build-without-deleted bit-for-bit")
    assert(takedowns() == 0L, "rebuild must reset the takedown meter")
    // deleted docs' unique shingles no longer claim membership
    val gone = PortableBloom.contaminationByBloom(
      docs.filter($"doc_id" % 7 === 0), PortableBloom.collectWords(
        spark.read.parquet(s"$state/folded/bloom")),
      "text", "doc_id", n = cfg.shingleSize)
    val still = PortableBloom.contaminationByBloom(live.limit(20),
      PortableBloom.collectWords(spark.read.parquet(s"$state/folded/bloom")),
      "text", "doc_id", n = cfg.shingleSize)
    assert(still.filter($"n_bloom_hits" =!= $"n_shingles").count() == 0L,
      "live documents must still probe fully contained")
    assert(gone.filter($"n_bloom_hits" < $"n_shingles").count() > 0L,
      "at least one deleted doc must have dropped a shingle claim")
  }

  test("stateReport (r14): one normalized health row per maintained " +
      "family; verdicts echo the deciding operators") {
    import graft.operators.{Bm25, FuzzyJoin, IvfIndex}
    // a small slice: the WHOLE sf corpus genuinely saturates the
    // default-m filter (verdict "rebuild" — correct, but this test
    // wants the fresh-"ok" path first; the takedown flip covers the
    // alarm direction)
    val docs = Tables.documents(spark, sfDir())
      .select($"doc_id", $"text").filter($"doc_id" <= 30)
    val state = tmpDir("statereport")
    val cfg = CorpusJob.Config(nearDupThreshold = 0.5,
      maintainBloomState = true, maintainMixtureState = true,
      maintainSkewState = true)
    CorpusJob.runIncremental(spark, docs, state, cfg, batchId = Some("d1"))
    val bm25Dir = tmpDir("srbm25")
    Bm25.writeIndex(docs, "text", "doc_id", bm25Dir)
    val emb = Tables.embeddings(spark, sfDir())
    val ivfDir = tmpDir("srivf")
    val (cents, cells) = IvfIndex.buildIndex(emb, "vec_id", "embedding",
      nCentroids = 8)
    IvfIndex.writeIndex(cents, cells, ivfDir)
    val blocks = FuzzyJoin.blockStats(
      docs.select($"doc_id", substring($"text", 1, 12).as("k")),
      "k", "doc_id", blockLen = 3, maxBlock = 4)
    val rep = CorpusJob.stateReport(spark, Some(state), Some(bm25Dir),
      Some(ivfDir), Some(blocks), ivfImbalanceLimit = 1000.0)
    val byFam = rep.collect().map(r => r.getString(0) -> r).toMap
    assert(byFam.keySet == Set("bloom", "mixloss", "skew", "bm25_index",
      "ivf_index", "fuzzy_blocks"))
    assert(byFam("bloom").getAs[String]("verdict") == "ok")
    assert(byFam("bloom").getAs[Long]("size_rows") > 0L)
    assert(byFam("bloom").getAs[Long]("saturation_ppm") > 0L)
    assert(byFam("skew").getAs[String]("verdict") == "uniform",
      "unique fingerprints must read uniform (lb-based decision)")
    assert(byFam("mixloss").getAs[Long]("staleness") == docs.count())
    assert(byFam("bm25_index").getAs[Long]("size_rows") > 0L)
    assert(byFam("bm25_index").getAs[Long]("staleness") == docs.count())
    assert(byFam("ivf_index").getAs[String]("verdict") == "ok")
    assert(byFam("ivf_index").getAs[Long]("staleness") == emb.count())
    // every report read is state-sized; a subset of inputs reports a
    // subset of rows (report what you maintain)
    assert(CorpusJob.stateReport(spark, bm25Dir = Some(bm25Dir)).count() == 1L)
    // a takedown flips the bloom verdict to rebuild (the lifecycle dial)
    CorpusJob.deleteDocs(spark,
      docs.filter($"doc_id" % 9 === 0).select($"doc_id"), state,
      Some("del-1"), cfg)
    val rep2 = CorpusJob.stateReport(spark, Some(state))
    assert(rep2.filter($"family" === "bloom").head()
      .getAs[String]("verdict") == "rebuild")
    assert(rep2.filter($"family" === "bloom").head()
      .getAs[Long]("staleness") > 0L)
  }

  test("stateReport over a STREAM-maintained advisory state == the " +
      "batch-folded rows over the same documents (r14 verdict task 6)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").filter($"doc_id" <= 30)
    val base = tmpDir("srstream")
    val inDir = s"$base/in"
    docs.filter($"doc_id" % 2 === 0).write.parquet(inDir)
    docs.filter($"doc_id" % 2 === 1).write.mode("append").parquet(inDir)
    graft.streaming.CorpusStream.runIncrementalAdvisories(spark,
      spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1)
        .parquet(inDir),
      s"$base/state", s"$base/ckpt").awaitTermination()
    val jobState = s"$base/job"
    val cfg = CorpusJob.Config(nearDupThreshold = 0.5,
      maintainBloomState = true, maintainMixtureState = true,
      maintainSkewState = true)
    (0 to 1).foreach { i =>
      CorpusJob.runIncremental(spark, docs.filter($"doc_id" % 2 === i),
        jobState, cfg, Some(s"d$i"))
    }
    def rows(rep: org.apache.spark.sql.DataFrame) =
      rep.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    val batch = rows(CorpusJob.stateReport(spark, Some(jobState)))
      .view.filterKeys(Set("bloom", "mixloss", "skew")).toMap
    val streamed = rows(CorpusJob.stateReport(spark,
      advisoryStateDir = Some(s"$base/state")))
    assert(streamed.keySet == Set("bloom", "mixloss", "skew"))
    assert(streamed == batch,
      "stream-maintained state must report identically to the batch fold")
    // a dir the stream never committed to contributes nothing (the
    // optional-input contract — no fail, no rows)
    assert(CorpusJob.stateReport(spark,
      advisoryStateDir = Some(s"$base/nothere")).count() == 0L)
  }

  test("retrievalQualityReport (r14 task 8): day-over-day ranking-quality " +
      "drift — first run has NULL prior, the second diffs exactly against " +
      "the persisted fold, a k mismatch refuses") {
    val state = tmpDir("rqr")
    val qrels = Seq((1L, 11L, 2L), (1L, 99L, 1L), (2L, 20L, 3L))
      .toDF("query_id", "doc_id", "grade")
    val day1 = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1))
      .toDF("query_id", "doc_id", "rank")
    val r1 = CorpusJob.retrievalQualityReport(spark, day1, qrels, state)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(r1.keySet ==
      Set("n_queries", "mrr_ppm", "mean_ndcg_ppm", "hit_rate_ppm"))
    assert(r1.values.forall(r => r.isNullAt(2) && r.isNullAt(3)),
      "first run must report NO baseline, not a zero delta")
    // q1 first hit at rank 2, q2 at rank 1 → MRR = (500000+1000000) DIV 2
    assert(r1("mrr_ppm").getLong(1) == 750000L)
    assert(r1("hit_rate_ppm").getLong(1) == 1000000L)
    // day 2: query 1 loses its judged hit — the regression the ops
    // surface exists to catch
    val day2 = Seq((1L, 10L, 1), (2L, 20L, 1)).toDF("query_id", "doc_id", "rank")
    val r2 = CorpusJob.retrievalQualityReport(spark, day2, qrels, state)
      .collect().map(r => r.getString(0) -> r).toMap
    for (m <- r2.keySet) {
      assert(r2(m).getLong(2) == r1(m).getLong(1),
        s"$m: prior must be day 1's persisted current")
      assert(r2(m).getLong(3) == r2(m).getLong(1) - r2(m).getLong(2),
        s"$m: delta must be exact current − prior")
    }
    assert(r2("mrr_ppm").getLong(1) == 500000L)
    assert(r2("mrr_ppm").getLong(3) == -250000L)
    assert(r2("hit_rate_ppm").getLong(3) == -500000L)
    assert(r2("n_queries").getLong(3) == 0L)
    // the dial pin: a delta across k values is refused loudly
    val e = intercept[IllegalArgumentException] {
      CorpusJob.retrievalQualityReport(spark, day2, qrels, state, k = 5)
    }
    assert(e.getMessage.contains("k="))
  }

  test("closed-loop canonical election (r13): a state-PROVEN viral " +
      "duplicate flips the election to the skew-safe aggregate form, " +
      "value-identical to the windowed run") {
    // planted viral duplicate: one text owns ~83% of the corpus — the
    // content_fp window's one-task worst case and a provable lb alarm
    val viral = ((1L to 500L).map(i => (i, "the viral boilerplate page " +
      "that every mirror site serves unchanged")) ++
      (501L to 600L).map(i => (i, s"unique document number $i about " +
        s"topic ${i % 17} with its own words")))
      .toDF("doc_id", "text")
    val cfg = CorpusJob.Config(nearDupThreshold = 0.5,
      maintainSkewState = true)
    val state = tmpDir("corpusviral")
    // day 1 builds the skew state (election still windowed — no state
    // yet); day 2's election must flip (the state now PROVES the hot
    // fingerprint) and still produce exactly what a windowed fresh run
    // over the same batch produces
    val d1 = viral.filter($"doc_id" % 2 === 1)
    val d2 = viral.filter($"doc_id" % 2 === 0)
    CorpusJob.runIncremental(spark, d1, state, cfg, batchId = Some("d1"))
    assert(graft.operators.Salting.saltsFromState(
        spark, s"$state/folded/skew") > 1,
      "the planted viral duplicate must be lb-provable from day-1 state")
    val day2 = CorpusJob.runIncremental(spark, d2, state, cfg,
        batchId = Some("d2"))
      .select($"doc_id", $"content_fp", $"canonical_id", $"is_duplicate")
      .collect().map(_.toString).toSet
    // reference: the same logical day 2 against a FRESH state copy
    // built without skew maintenance (windowed election throughout)
    val refState = tmpDir("corpusviralref")
    val plainCfg = CorpusJob.Config(nearDupThreshold = 0.5)
    CorpusJob.runIncremental(spark, d1, refState, plainCfg,
      batchId = Some("d1"))
    val ref = CorpusJob.runIncremental(spark, d2, refState, plainCfg,
        batchId = Some("d2"))
      .select($"doc_id", $"content_fp", $"canonical_id", $"is_duplicate")
      .collect().map(_.toString).toSet
    assert(day2 == ref,
      "the aggregate-form election must be value-identical to the window")
  }

  test("paragraph leg: daily rebuilds == one-shot; replay stable; takedown re-elects after compaction") {
    // multi-paragraph corpus: shared header + text slices (cross-doc
    // collisions from the corpus's seeded duplicate texts)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"text".isNotNull)
      .select($"doc_id", concat_ws("\n\n",
        lit("hdr"), substring($"text", 1, 50),
        substring($"text", 51, 50)).as("text"))
    val n = docs.agg(max($"doc_id")).head().getLong(0)
    val slices = Seq(
      "d1" -> docs.filter($"doc_id" <= n / 3),
      "d2" -> docs.filter($"doc_id" > n / 3 && $"doc_id" <= 2 * n / 3),
      "d3" -> docs.filter($"doc_id" > 2 * n / 3))
    val state = tmpDir("corpuspara")
    val cfg = CorpusJob.Config(nearDupThreshold = 0.5, dedupParagraphs = true)
    slices.foreach { case (id, s) =>
      CorpusJob.runIncremental(spark, s, state, cfg, batchId = Some(id)) }

    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "text_dedup", "n_paras", "n_kept", "n_dropped")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val daily = key(spark.read.parquet(s"$state/paradedup"))
    val oneShot = key(graft.operators.Dedup.paragraphDedup(docs, "text", "doc_id"))
    assert(daily == oneShot, s"daily=${daily.size} oneShot=${oneShot.size}")
    assert(daily.exists(_._5 > 0), "expected cross-batch paragraph drops")

    // replay of the last batch: the replay exclusion (doc_id < batch
    // min) keeps its verdicts identical — the value SET is stable
    CorpusJob.runIncremental(spark, slices.last._2, state, cfg,
      batchId = Some("d3"))
    assert(key(spark.read.parquet(s"$state/paradedup")) == daily,
      "replay changed paragraph verdicts")

    // takedown + compaction: postings physically purge, and a new
    // batch's election falls to the next-earliest SURVIVOR
    val delIds = docs.filter($"doc_id" % 7 === 3).select($"doc_id")
    CorpusJob.deleteDocs(spark, delIds, state, Some("del-1"), cfg)
    CorpusJob.compactState(spark, state)
    val purged = spark.read.parquet(s"$state/index/paras")
    assert(purged.join(delIds.withColumnRenamed("doc_id", "id"), Seq("id"))
      .count() == 0, "deleted docs' postings survived compaction")
    val d4 = docs.withColumn("doc_id", $"doc_id" + lit(n + 1))
    val rebuilt4 = CorpusJob.runIncremental(spark, d4, state, cfg,
      batchId = Some("d4"))
    val live = docs.filter($"doc_id" % 7 =!= 3)
    val expect4 = key(graft.operators.Dedup.paragraphDedup(
        live.unionByName(d4), "text", "doc_id")
      .filter($"doc_id" > n))
    assert(key(spark.read.parquet(s"$state/paradedup")
      .filter($"doc_id" > n)) == expect4,
      "post-takedown election differs from build-without")
    assert(rebuilt4.columns.contains("is_duplicate")) // annotate output intact
  }

  test("soak: 10 audited days at sf0.1 — state growth linear in increments, day-10 == one-shot") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .select($"doc_id", $"text")
    val n = docs.agg(max($"doc_id")).head().getLong(0)
    val state = tmpDir("corpussoak")
    val audit = new graft.control.Audit(spark, tmpDir("corpussoak-audit"),
      () => new java.sql.Timestamp(1700000000000L))
    val cfg = CorpusJob.Config(nearDupThreshold = 0.5)

    def tableCount(t: String): Long =
      graft.sources.Zone.readIfExists(spark, s"$state/$t").map(_.count()).getOrElse(0L)

    var cum = 0L
    (0 until 10).foreach { d =>
      val batch = docs.filter(
        $"doc_id" >= d * (n + 1) / 10 && $"doc_id" < (d + 1) * (n + 1) / 10)
      val batchRows = batch.count()
      val batchSigs = graft.operators.Dedup.signatures(batch, "text", "doc_id",
        cfg.shingleSize, cfg.numHashes).count()
      val (annBefore, sigsBefore) = (tableCount("annotated"), tableCount("index/sigs"))
      val nRows = CorpusJob.runIncrementalAudited(spark, batch, state, audit,
        f"2026-01-${d + 1}%02d", cfg)
      assert(nRows == batchRows)
      cum += batchRows
      // linear growth: each day's append is exactly the increment —
      // a corpus re-append would blow these deltas up by the
      // accumulated size
      assert(tableCount("annotated") - annBefore == batchRows,
        s"day $d annotated delta")
      assert(tableCount("index/sigs") - sigsBefore == batchSigs,
        s"day $d sigs delta")
      assert(tableCount("annotated") == cum)
    }
    assert(cum == docs.count(), "slices must cover the corpus")

    // day-10 state == the one-shot batch build
    val cols = Seq("doc_id", "canonical_id", "is_duplicate",
      "is_near_duplicate", "n_tokens", "quality", "lang_pred")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.head, cols.tail: _*).collect()
        .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(key(spark.read.parquet(s"$state/annotated")) ==
      key(CorpusJob.annotate(docs, cfg)))
    assert(spark.read.parquet(s"$state/folded/labels").as[(Long, Long)].collect().toMap ==
      graft.operators.DedupCluster.connectedComponents(
        graft.operators.Dedup.minHashLsh(docs, "text", "doc_id",
          cfg.shingleSize, cfg.numHashes, cfg.bands, cfg.nearDupThreshold),
        "id_a", "id_b").as[(Long, Long)].collect().toMap)
    assert(spark.read.parquet(s"$state/folded/vocab")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      graft.operators.TermStats.docFreq(docs, "text", "doc_id")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    assert(spark.read.parquet(s"$state/folded/meta").head().getLong(0) == cum)

    // ten days of span appends == the one-shot non-canonical build
    def spanSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "span_start", "span_end", "span_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(spanSet(spark.read.parquet(s"$state/spans")) ==
      spanSet(graft.operators.SubstringDedup.nonCanonicalSpans(
        docs, "text", "doc_id", cfg.spanTokens)))
  }

  test("deletion soak: 10 days at sf0.1 with interleaved takedowns + compactions") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .select($"doc_id", $"text")
    val n = docs.agg(max($"doc_id")).head().getLong(0)
    val state = tmpDir("corpussoakdel")
    val cfg = CorpusJob.Config(nearDupThreshold = 0.5)

    def tableCount(t: String): Long =
      graft.sources.Zone.readIfExists(spark, s"$state/$t").map(_.count()).getOrElse(0L)

    // days 0..9 insert monotonic slices; after days 3, 6, 9 a takedown
    // deletes a residue class of everything inserted so far, then
    // compaction purges physically — the retention lifecycle a real
    // pipeline runs, which the insert-only soak can't witness
    var deleted = Set.empty[Long]
    (0 until 10).foreach { d =>
      val lo = d * (n + 1) / 10; val hi = (d + 1) * (n + 1) / 10
      val batch = docs.filter($"doc_id" >= lo && $"doc_id" < hi)
      CorpusJob.runIncremental(spark, batch, state, cfg,
        batchId = Some(f"2026-02-${d + 1}%02d"))
      if (d % 3 == 2) {
        val insertedHi = (d + 1) * (n + 1) / 10
        val residue = 2 * (d / 3) + 1 // 1, 3, 5 — disjoint delete sets
        val delList = docs
          .filter($"doc_id" < insertedHi && $"doc_id" % 9 === residue)
          .select("doc_id")
        val delIds = delList.as[Long].collect().toSet -- deleted
        val nDel = CorpusJob.deleteDocs(spark, delList, state,
          Some(s"del-day$d"))
        assert(nDel == delIds.size, s"day $d takedown count")
        deleted ++= delIds
        val before = Seq("annotated", "index/sigs", "spans", "pairs")
          .map(t => t -> tableCount(t)).toMap
        CorpusJob.compactState(spark, state)
        assert(!graft.sources.Zone.exists(spark, s"$state/tombstones"),
          s"day $d compaction must clear tombstones")
        assert(tableCount("annotated") == before("annotated") - delIds.size,
          s"day $d annotated must shrink by the takedown")
        assert(tableCount("index/sigs") < before("index/sigs"),
          s"day $d sigs must shrink")
      }
    }

    // final state == from-scratch build over the SURVIVORS, on every
    // order-independent surface (the deleteDocs equality, held through
    // ten days of interleaved inserts, takedowns, and compactions)
    val survivors = docs.filter(!$"doc_id".isin(deleted.toSeq: _*))
    assert(spark.read.parquet(s"$state/annotated")
      .select("doc_id").as[Long].collect().toSet ==
      survivors.select("doc_id").as[Long].collect().toSet)
    assert(spark.read.parquet(s"$state/folded/meta").head().getLong(0)
      == survivors.count())
    assert(spark.read.parquet(s"$state/folded/vocab")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      graft.operators.TermStats.docFreq(survivors, "text", "doc_id")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    assert(spark.read.parquet(s"$state/folded/labels")
      .as[(Long, Long)].collect().toMap ==
      graft.operators.DedupCluster.connectedComponents(
        graft.operators.Dedup.minHashLsh(docs, "text", "doc_id",
            cfg.shingleSize, cfg.numHashes, cfg.bands, cfg.nearDupThreshold)
          .filter(!$"id_a".isin(deleted.toSeq: _*) &&
            !$"id_b".isin(deleted.toSeq: _*)),
        "id_a", "id_b").as[(Long, Long)].collect().toMap)
    import graft.functions.{TextFunctions => TF}
    assert(spark.read.parquet(s"$state/fps")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      survivors.withColumn("content_fp", TF.contentFingerprint($"text"))
        .groupBy("content_fp").agg(min($"doc_id").as("canonical_id"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  test("deleteDocs: state == from-scratch build without the deleted docs") {
    import graft.functions.{TextFunctions => T}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val n = docs.agg(max($"doc_id")).head().getLong(0)
    val state = tmpDir("corpusdel")
    val cfg = CorpusJob.Config(nearDupThreshold = 0.5)
    CorpusJob.runIncremental(spark, docs.filter($"doc_id" <= n / 2), state, cfg,
      batchId = Some("d1"))
    CorpusJob.runIncremental(spark, docs.filter($"doc_id" > n / 2), state, cfg,
      batchId = Some("d2"))

    val deleted = docs.filter($"doc_id" % 7 === 3).select("doc_id")
    val delIds = deleted.as[Long].collect().toSet
    assert(CorpusJob.deleteDocs(spark, deleted, state, Some("del-1")) == delIds.size)
    val remaining = docs.filter(!$"doc_id".isin(delIds.toSeq: _*))

    // fps == from-scratch canonical election over the remaining corpus
    def fpsMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expectFps = fpsMap(remaining
      .withColumn("content_fp", T.contentFingerprint($"text"))
      .groupBy("content_fp").agg(min($"doc_id").as("canonical_id")))
    assert(fpsMap(spark.read.parquet(s"$state/fps")) == expectFps)

    // vocab == docFreq(remaining); meta tracks count + marker
    def vmap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vmap(spark.read.parquet(s"$state/folded/vocab")) ==
      vmap(graft.operators.TermStats.docFreq(remaining, "text", "doc_id")))
    val meta = spark.read.parquet(s"$state/folded/meta").head()
    assert(meta.getLong(0) == remaining.count() && meta.getString(1) == "del-1")

    // labels == cc over the pair graph minus edges touching deleted
    val batchPairs = graft.operators.Dedup.minHashLsh(docs, "text", "doc_id",
        cfg.shingleSize, cfg.numHashes, cfg.bands, cfg.nearDupThreshold)
      .select("id_a", "id_b")
      .filter(!$"id_a".isin(delIds.toSeq: _*) && !$"id_b".isin(delIds.toSeq: _*))
    val expectLabels = graft.operators.DedupCluster
      .connectedComponents(batchPairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(spark.read.parquet(s"$state/folded/labels")
      .as[(Long, Long)].collect().toMap == expectLabels)

    // replaying the SAME delete batch id re-runs the idempotent repairs
    // (tombstones/fps) but the marker blocks a second vocab/meta
    // subtraction
    assert(CorpusJob.deleteDocs(spark, deleted, state, Some("del-1")) == delIds.size)
    assert(spark.read.parquet(s"$state/folded/meta").head().getLong(0)
      == remaining.count())
    assert(vmap(spark.read.parquet(s"$state/folded/vocab")) ==
      vmap(graft.operators.TermStats.docFreq(remaining, "text", "doc_id")))

    // cross-id idempotence (ADVICE): a DIFFERENT takedown list naming
    // only already-deleted docs attributes zero and leaves the folded
    // state untouched — no double-subtraction
    assert(CorpusJob.deleteDocs(spark, deleted.limit(20), state, Some("del-1b")) == 0L)
    assert(spark.read.parquet(s"$state/folded/meta").head().getLong(0)
      == remaining.count())
    assert(vmap(spark.read.parquet(s"$state/folded/vocab")) ==
      vmap(graft.operators.TermStats.docFreq(remaining, "text", "doc_id")))

    // forward semantics: a new doc copying a FULLY deleted group's
    // content is genuinely new; one copying a survivor is a duplicate
    val fpOf = docs.withColumn("fp", T.contentFingerprint($"text"))
    val fullyDeletedText = fpOf
      .groupBy("fp").agg(collect_set($"doc_id").as("ids"), first($"text").as("text"))
      .filter(size(filter($"ids", i => !i.isin(delIds.toSeq: _*))) === 0)
      .select($"text").head().getString(0)
    val survivor = remaining.orderBy($"doc_id").head()
    val day3 = Seq((n + 1, fullyDeletedText), (n + 2, survivor.getString(1)))
      .toDF("doc_id", "text")
    val ann3 = CorpusJob.runIncremental(spark, day3, state, cfg, batchId = Some("d3"))
      .select("doc_id", "canonical_id", "is_duplicate")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(ann3(n + 1) == (n + 1, false), "copy of fully-deleted content must be new")
    assert(ann3(n + 2)._2 && ann3(n + 2)._1 <= survivor.getLong(0),
      "copy of surviving content must be a duplicate of a remaining canonical")

    // span leg: the post-deletion batch's spans == the from-scratch
    // keep-one-copy marking over the LIVE corpus restricted to the
    // batch — a window hash whose only holders were deleted stops
    // marking (the postings anti-join IS the retraction)
    def spanSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "span_start", "span_end", "span_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(
      spanSet(spark.read.parquet(s"$state/spans").filter($"doc_id" > n)) ==
        spanSet(graft.operators.SubstringDedup.nonCanonicalSpans(
            remaining.unionByName(day3), "text", "doc_id", cfg.spanTokens)
          .filter($"doc_id" > n)),
      "post-deletion span probe must equal build-without")

    // compactState purges the tombstoned rows physically and clears the set
    CorpusJob.compactState(spark, state)
    assert(!graft.sources.Zone.exists(spark, s"$state/tombstones"))
    assert(spark.read.parquet(s"$state/index/sigs")
      .filter($"id".isin(delIds.toSeq: _*)).count() == 0)
    assert(spark.read.parquet(s"$state/pairs")
      .filter($"id_a".isin(delIds.toSeq: _*) || $"id_b".isin(delIds.toSeq: _*))
      .count() == 0)
    assert(spark.read.parquet(s"$state/annotated")
      .filter($"doc_id".isin(delIds.toSeq: _*)).count() == 0)
    assert(spark.read.parquet(s"$state/index/shingles")
      .filter($"doc_id".isin(delIds.toSeq: _*)).count() == 0,
      "compaction must purge deleted docs' shingle postings")
  }

  test("deleteDocs: crash replay re-attributes own tombstones; overlapping ids subtract once") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").filter($"doc_id" <= 200)
    val state = tmpDir("corpusdelcrash")
    val cfg = CorpusJob.Config(nearDupThreshold = 0.5)
    CorpusJob.runIncremental(spark, docs, state, cfg, batchId = Some("d1"))
    def vmap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def expectState(deletedIds: Set[Long]): Unit = {
      val remaining = docs.filter(!$"doc_id".isin(deletedIds.toSeq: _*))
      assert(spark.read.parquet(s"$state/folded/meta").head().getLong(0)
        == remaining.count())
      assert(vmap(spark.read.parquet(s"$state/folded/vocab")) ==
        vmap(graft.operators.TermStats.docFreq(remaining, "text", "doc_id")))
    }

    // del-A commits normally
    val aIds = (1L to 200L).filter(_ % 10 == 1).toSet
    assert(CorpusJob.deleteDocs(spark, docs.filter($"doc_id" % 10 === 1)
      .select("doc_id"), state, Some("del-A")) == aIds.size)
    expectState(aIds)

    // del-B overlaps del-A (ids ≡ 1 mod 5 ⊃ ids ≡ 1 mod 10): only the
    // genuinely new docs attribute, each subtracted exactly once
    val bIds = (1L to 200L).filter(_ % 5 == 1).toSet
    assert(CorpusJob.deleteDocs(spark, docs.filter($"doc_id" % 5 === 1)
      .select("doc_id"), state, Some("del-B")) == (bIds -- aIds).size)
    expectState(aIds ++ bIds)

    // del-C "crashed" between the tombstone append and the folded
    // swap: simulate by appending its tombstone rows directly, folding
    // nothing. The replay must find its own tombstones, attribute
    // them, and subtract them exactly once.
    val cIds = (1L to 200L).filter(_ % 7 == 0).toSet -- aIds -- bIds
    cIds.toSeq.toDF("doc_id")
      .withColumn("batch_id", lit("del-C"))
      .write.mode("append").parquet(s"$state/tombstones")
    expectState(aIds ++ bIds) // fold not yet run — vocab still has del-C docs
    assert(CorpusJob.deleteDocs(spark, (1L to 200L).filter(_ % 7 == 0).toSeq
      .toDF("doc_id"), state, Some("del-C")) == cIds.size)
    expectState(aIds ++ bIds ++ cIds)

    // committed replay of del-C: same attributed count, state unchanged
    assert(CorpusJob.deleteDocs(spark, (1L to 200L).filter(_ % 7 == 0).toSeq
      .toDF("doc_id"), state, Some("del-C")) == cIds.size)
    expectState(aIds ++ bIds ++ cIds)
  }

  test("runVersionDelta: folded + fps state == built from the new version directly") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val v1 = docs.filter($"doc_id" % 5 =!= 0)
    val v2 = docs.filter($"doc_id" % 7 =!= 3)
      .withColumn("text",
        when($"doc_id" % 11 === 0,
          concat(coalesce($"text", lit("")), lit(" revised")))
          .otherwise($"text"))
    val cfg = CorpusJob.Config(nearDupThreshold = 0.5)
    val stateA = tmpDir("vdelta_a")
    val stateB = tmpDir("vdelta_b")
    // v1 state accretes over two monotonic daily batches, then the
    // version transition reconciles it to v2 in one call
    val n = v1.agg(max($"doc_id")).head().getLong(0)
    CorpusJob.runIncremental(spark, v1.filter($"doc_id" <= n / 2), stateA, cfg,
      batchId = Some("a1"))
    CorpusJob.runIncremental(spark, v1.filter($"doc_id" > n / 2), stateA, cfg,
      batchId = Some("a2"))
    val counts = CorpusJob.runVersionDelta(spark, v1, v2, stateA, cfg,
      batchId = Some("v1v2"))
    // the diff itself: v2 added back the %5=0 docs (minus %7=3 ones),
    // removed the %7=3 docs v1 had, changed the %11=0 survivors
    assert(counts.getOrElse("added", 0L) > 0 &&
      counts.getOrElse("removed", 0L) > 0 && counts.getOrElse("changed", 0L) > 0,
      s"delta should class all three kinds, got $counts")

    CorpusJob.runIncremental(spark, v2, stateB, cfg, batchId = Some("b1"))

    def vmap(path: String) = spark.read.parquet(path)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vmap(s"$stateA/folded/vocab") == vmap(s"$stateB/folded/vocab"),
      "reconciled vocabulary must equal the direct v2 build")
    assert(spark.read.parquet(s"$stateA/folded/meta").head().getLong(0)
      == v2.count())
    def fpsSet(path: String) = spark.read.parquet(path)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(fpsSet(s"$stateA/fps") == fpsSet(s"$stateB/fps"),
      "fingerprint index must re-elect to the direct v2 build")
    def labelMap(path: String) = spark.read.parquet(path)
      .as[(Long, Long)].collect().toMap
    assert(labelMap(s"$stateA/folded/labels") == labelMap(s"$stateB/folded/labels"),
      "cluster labels must equal the direct v2 build")
  }

  test("runVersionDelta refuses to compact over an unfolded foreign delete batch") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val v1 = docs.filter($"doc_id" <= 100)
    val v2 = v1.filter($"doc_id" % 7 =!= 3)
    val cfg = CorpusJob.Config(nearDupThreshold = 0.5)
    val state = tmpDir("vdelta_guard")
    CorpusJob.runIncremental(spark, v1, state, cfg, batchId = Some("a1"))
    // a crashed delete batch: tombstones appended, fold never committed
    Seq(5L).toDF("doc_id").withColumn("batch_id", lit("del-X"))
      .write.mode("append").parquet(s"$state/tombstones")
    assert(CorpusJob.unfoldedDeleteBatches(spark, state) == Seq("del-X"))
    val e = intercept[IllegalStateException] {
      CorpusJob.runVersionDelta(spark, v1, v2, state, cfg, Some("v1v2"))
    }
    assert(e.getMessage.contains("del-X"))
    // replay commits del-X's fold; the delta then proceeds and its
    // compaction clears the (now fully attributed) tombstones
    CorpusJob.deleteDocs(spark, Seq(5L).toDF("doc_id"), state, Some("del-X"))
    assert(CorpusJob.unfoldedDeleteBatches(spark, state).isEmpty)
    val counts = CorpusJob.runVersionDelta(spark, v1.filter($"doc_id" =!= 5),
      v2, state, cfg, Some("v1v2"))
    assert(counts.getOrElse("removed", 0L) > 0)
    assert(CorpusJob.unfoldedDeleteBatches(spark, state).isEmpty)
  }

  test("run keeps survivors only and writes corpus + stats") {
    val out = tmpDir("corpus")
    val (kept, dropped) = CorpusJob.run(spark, corpus,
      out, CorpusJob.Config(shingleSize = 2, nearDupThreshold = 0.5, minTokens = 5))
    assert(kept == 2L, s"expect docs 1 and 6 to survive, kept=$kept")
    assert(dropped == 4L)
    val ids = spark.read.parquet(s"$out/corpus").select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 6L))
    val stats = spark.read.parquet(s"$out/stats")
    assert(stats.agg(sum($"n_docs")).head().getLong(0) == 6L)
  }

  test("IVF ANN: recall vs exact baseline on real embeddings, fewer scans") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter($"vec_id" < 5)
    val exact = graft.operators.Similarity
      .bruteForceTopKQuantized(emb, queries, "embedding", "vec_id", 10)
    val ivf = graft.operators.IvfIndex
      .topK(emb, queries, "embedding", "vec_id", 10, nCentroids = 8, nProbe = 4)
    val recall = graft.operators.Similarity.recallAgainstExact(exact, ivf)
      .agg(avg($"recall")).head().getDouble(0)
    assert(recall > 0.3, s"IVF mean recall $recall")
    // probing half the cells scans roughly half the corpus per query
    assert(ivf.count() <= 50)
  }

  // --- ordered curation pipeline -----------------------------------------

  private val blockedDomains = Seq("spam.example").toDF("domain")

  test("curate: each stage drops for its own reason; first failing stage wins") {
    val pA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val pB = "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq(
      (1L, s"unique first paragraph words here\n\n$pA\n\n$pB", "en", "web", "ok.example"),
      (2L, null.asInstanceOf[String], "en", "web", "ok.example"),
      (3L, s"a blocked document paragraph\n\n$pA extended further", "en", "web", "a.spam.example"),
      (4L, s"$pB rep\n\n$pB rep\n\n$pB rep", "en", "web", "ok.example"),
      (5L, s"unique first paragraph words here\n\n$pA\n\n$pB", "en", "web", "ok.example"),
      (6L, "another distinct body paragraph entirely\n\nwith more fresh words beyond", "en", "web", "ok.example"),
    ).toDF("doc_id", "text", "lang", "source", "host")
    val cfg = CorpusJob.CurationConfig(pplGate = false, budgetTokens = 100000L)
    val out = CorpusJob.curate(docs, cfg, Some(blockedDomains), None)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("drop_reason")).toMap
    assert(out(1L) == null, s"doc 1 must survive, got ${out(1L)}")
    assert(out(2L) == "lang", "NULL text scores 'und' and drops at LID")
    assert(out(3L) == "blocked_url")
    assert(out(4L) == "repetitive", "dup-line mass gate fires before corpus dedup")
    assert(out(5L) == "empty", "exact copy of doc 1 loses every paragraph")
    assert(out(6L) == null)
  }

  test("curate: store-materialized staging == local-checkpoint staging, " +
      "row for row; runCuration's export matches both") {
    val pA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val pB = "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq(
      (1L, s"unique first paragraph words here\n\n$pA\n\n$pB", "en", "web", "ok.example"),
      (2L, null.asInstanceOf[String], "en", "web", "ok.example"),
      (3L, s"a blocked document paragraph\n\n$pA extended further", "en", "web", "a.spam.example"),
      (4L, s"$pB rep\n\n$pB rep\n\n$pB rep", "en", "web", "ok.example"),
      (5L, s"unique first paragraph words here\n\n$pA\n\n$pB", "en", "web", "ok.example"),
      (6L, "another distinct body paragraph entirely\n\nwith more fresh words beyond", "en", "web", "ok.example"),
    ).toDF("doc_id", "text", "lang", "source", "host")
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (3L, Array(0.99f, 0.1f)),
      (6L, Array(0.0f, 1.0f))).toDF("doc_id", "embedding")
    def run(budget: Long) = CorpusJob.curate(docs,
        CorpusJob.CurationConfig(pplGate = false, budgetTokens = 100000L,
          semClusters = 2, stagingBudgetBytes = budget),
        Some(blockedDomains), Some(emb))
      .orderBy($"doc_id").collect().map(_.toString).toSeq
    val local = run(Long.MaxValue) // never store-stages
    val store = run(0L)            // always store-stages (auto temp dir)
    assert(local == store)
    // runCuration (the production export) under the store regime writes
    // exactly the same verdict frame
    val dir = tmpDir("curate_store")
    CorpusJob.runCuration(spark, docs,
      dir, CorpusJob.CurationConfig(pplGate = false, budgetTokens = 100000L,
        semClusters = 2, stagingBudgetBytes = 0L),
      Some(blockedDomains), Some(emb))
    val annotated = spark.read.parquet(s"$dir/annotated")
      .select(CorpusJob.curate(docs,
        CorpusJob.CurationConfig(pplGate = false, budgetTokens = 100000L,
          semClusters = 2, stagingBudgetBytes = Long.MaxValue),
        Some(blockedDomains), Some(emb)).columns.map(col): _*)
      .orderBy($"doc_id").collect().map(_.toString).toSeq
    assert(annotated == local)
  }

  test("curate: host-authority floor drops low-rank hosts, keeps unknown " +
      "hosts, and is inert without a rank table") {
    val docs = Seq(
      (1L, "unique first paragraph words here entirely fresh", "en", "web", "strong.example"),
      (2L, "another distinct body paragraph with more new words", "en", "web", "weak.example"),
      (3L, "a third wholly different document body of words", "en", "web", "unranked.example"),
    ).toDF("doc_id", "text", "lang", "source", "host")
    val ranks = Seq(("strong.example", 5000000L), ("weak.example", 1000L))
      .toDF("host", "rank_fp")
    val cfg = CorpusJob.CurationConfig(pplGate = false,
      budgetTokens = 100000L, minHostRank = 100000L)
    val out = CorpusJob.curate(docs, cfg, None, None, Some(ranks))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("drop_reason")).toMap
    assert(out(1L) == null, s"high-authority host must keep, got ${out(1L)}")
    assert(out(2L) == "low_authority")
    assert(out(3L) == null, "absent-from-ranks host must keep (no link evidence != negative)")
    // same config, no rank table → the gate never fires
    val off = CorpusJob.curate(docs, cfg, None, None)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("drop_reason")).toMap
    assert(off.values.forall(_ == null), s"gate fired without ranks: $off")
  }

  test("curate: perplexity gate drops the worst tercile under the seed LM") {
    // ids all % 10 == 0 so the whole corpus seeds the LM; six distinct
    // texts rank 6 ways, k = 2n/3 = 4 → ranks 5..6 fall below the cut
    val docs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (20L, "the quick brown fox runs through the green field every single day"),
      (30L, "a slow grey wolf walks across the frozen lake at night alone"),
      (40L, "qqq zzz xxx jjj vvv www kkk qqq zzz xxx jjj unseen rare trigrams"),
      (50L, "zxqj wvkq pzzx jqqv xwzk qjvp kzxw vqjz unusual letter soup entirely"),
      (60L, "the quick brown dog and the lazy fox trade places near the bank"),
    ).map { case (i, t) => (i, t, "en", "web", "ok.example") }
      .toDF("doc_id", "text", "lang", "source", "host")
    val cfg = CorpusJob.CurationConfig(budgetTokens = 100000L)
    val out = CorpusJob.curate(docs, cfg, None, None).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("drop_reason"), r.getAs[java.lang.Long]("lm_avg"))).toMap
    val dropped = out.filter(_._2._1 == "perplexity").keySet
    assert(dropped.size == 2,
      s"expect exactly the worst tercile (2 of 6) to drop, got $out")
    // the dropped pair must be the two smallest lm_avg values
    val avgs = out.view.mapValues(_._2).toMap
    val worst2 = avgs.toSeq.sortBy { case (id, a) => (a.longValue, id) }.take(2).map(_._1).toSet
    assert(dropped == worst2, s"dropped $dropped but worst-scored are $worst2")
  }

  test("curate: hygiene precedes dedup; dedup precedes sampling") {
    val filler = "fresh distinct filler words number %d for the paragraph body"
    val dupBody = "the very same duplicated document body repeated verbatim many times over\n\nsecond paragraph of the duplicated body with plenty more words inside"
    val docs = (Seq(
      // markup / NFC variants of ONE paragraph: dedup can only unify
      // them because hygiene runs first
      (1L, "<b>café subscription offers</b>\n\n" + filler.format(1), "en", "uniq", "ok.example"),
      (2L, "café subscription offers\n\n" + filler.format(2), "en", "uniq", "ok.example"),
      (3L, filler.format(3) + "\n\n" + filler.format(4), "en", "uniq", "ok.example"),
    ) ++ (10L to 19L).map(i =>
      // a domain whose RAW token mass is inflated 10× by exact copies —
      // only the first survives paragraph dedup
      (i, dupBody, "en", "dup", "ok.example"))
    ).toDF("doc_id", "text", "lang", "source", "host")
    val cfg = CorpusJob.CurationConfig(pplGate = false, budgetTokens = 150L)
    val dir = tmpDir("curstate")
    val rows = CorpusJob.fitCurationState(spark, docs, dir, cfg, None, None)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("drop_reason"), r.getAs[java.lang.Long]("n_kept"))).toMap
    val ann = rows.view.mapValues(_._1).toMap
    // hygiene→dedup: doc 2's first paragraph is a combining-mark NFC
    // variant of doc 1's markup-wrapped one — it dedups away (n_kept
    // drops to 1) ONLY because hygiene normalized both first
    assert(ann(1L) == null, s"doc 1 should keep, got ${ann(1L)}")
    assert(rows(2L)._2 == 1L,
      s"doc 2's NFC-variant paragraph must dedup against doc 1 post-hygiene, got ${rows(2L)}")
    assert((10L to 19L).count(i => ann(i) == "empty") == 9,
      "9 of 10 exact copies lose every paragraph")
    // dedup→sampling: the budget (150) covers the DEDUPED corpus, so
    // every rate is 1.0 — had sampling seen the raw 10× mass, the dup
    // domain's rate would be ≈ budget/rawTokens < 1
    val st = CorpusJob.loadCurationState(spark, dir, cfg)
    assert(st.rates.values.forall(_ == 1.0),
      s"rates must derive from post-dedup mass (all 1.0), got ${st.rates}")
    val rawDupTokens = docs.filter($"source" === "dup")
      .agg(sum(graft.functions.TextFunctions.tokenCount($"text"))).head().getLong(0)
    assert(rawDupTokens > cfg.budgetTokens,
      "fixture sanity: raw mass must exceed the budget for the order to matter")
    assert(ann.values.count(_ == "sampled_out") == 0)
  }

  test("runCurationIncremental: monotonic batches == curateWithState one-shot") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
      .withColumn("host",
        concat(lit("h"), $"doc_id" % 7, lit(".example.com")))
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id".as("doc_id"), $"embedding")
    val bl = Seq("h3.example.com").toDF("domain")
    val cfg = CorpusJob.CurationConfig(budgetTokens = 20000L)
    val n = docs.agg(max($"doc_id")).head().getLong(0)
    val a = docs.filter($"doc_id" <= n / 2)
    val b = docs.filter($"doc_id" > n / 2)
    val state = tmpDir("curinc")
    val annA = CorpusJob.fitCurationState(spark, a, state, cfg, Some(bl), Some(emb))
      .collect().map(_.toString).toSeq
    val annB = CorpusJob.runCurationIncremental(spark, b, state, cfg, Some(bl), Some(emb))
      .collect().map(_.toString).toSeq
    val st = CorpusJob.loadCurationState(spark, state, cfg)
    val cents = spark.read.parquet(s"$state/curation/cents")
    val ref = CorpusJob.curateWithState(docs, st, cfg, Some(bl), Some(emb), Some(cents))
      .collect().map(_.toString).toSeq
    assert((annA ++ annB).sorted == ref.sorted,
      s"batch union (${annA.size}+${annB.size}) != one-shot (${ref.size})")
  }

  test("runCuration: complete export — annotated/corpus/shards/packed/funnel coherent") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
      .withColumn("host",
        concat(lit("h"), $"doc_id" % 7, lit(".example.com")))
    val bl = Seq("h3.example.com").toDF("domain")
    val out = tmpDir("curjob")
    val funnel = CorpusJob.runCuration(spark, docs, out,
      CorpusJob.CurationConfig(budgetTokens = 20000L), Some(bl),
      embeddings = None, shardTokens = 4000L, packTokens = Some(512L))
    val ann = spark.read.parquet(s"$out/annotated")
    val corpus = spark.read.parquet(s"$out/corpus")
    // funnel == the annotated frame's own census; kept == corpus rows
    assert(funnel == ann
      .groupBy(coalesce($"drop_reason", lit("kept")).as("s"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    assert(funnel("kept") == corpus.count() && funnel("kept") > 0)
    assert(corpus.count() == ann.filter($"kept").count())
    // shard manifest certifies the whole kept corpus, nothing else
    val manifest = spark.read.parquet(s"$out/shards/_manifest")
    assert(manifest.agg(sum($"n_docs")).head().getLong(0) == corpus.count())
    // packing map covers the kept corpus exactly, with the tiling
    // property (total offsets span = total tokens)
    val packed = spark.read.parquet(s"$out/packed")
    assert(packed.count() == corpus.count())
    assert(packed.agg(max($"tok_start" +
        coalesce($"n_tokens", lit(0L)))).head().getLong(0) ==
      corpus.agg(sum(coalesce($"n_tokens", lit(0L)))).head().getLong(0))
  }

  test("refitRates: a new domain admitted from the verdict log alone; arithmetic == stage-9 fit") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
      .withColumn("host",
        concat(lit("h"), $"doc_id" % 7, lit(".example.com")))
    val cfg = CorpusJob.CurationConfig(budgetTokens = 20000L)
    val n = docs.agg(max($"doc_id")).head().getLong(0)
    val state = tmpDir("currefit")
    CorpusJob.fitCurationState(spark, docs.filter($"doc_id" <= n / 2),
      state, cfg, None, None)
    // the incremental batch arrives under a domain the frozen rate
    // table has never seen: every doc that reaches the mixture stage
    // must drop as sampled_out (the documented contract)
    val b = docs.filter($"doc_id" > n / 2)
      .withColumn("source", lit("newdomain"))
    val annB = CorpusJob.runCurationIncremental(spark, b, state, cfg, None, None)
    assert(annB.filter($"kept").count() == 0)
    assert(annB.filter($"drop_reason" === "sampled_out").count() > 0,
      "some batch docs must have survived to the mixture stage")

    // refit from the verdict log: the new domain gets a positive rate,
    // and every rate equals the stage-9 arithmetic over the logged mass
    val rates = CorpusJob.refitRates(spark, state, cfg)
    assert(rates.get("newdomain").exists(_ > 0))
    val mass = spark.read.parquet(s"$state/curation/annotated")
      .dropDuplicates("doc_id")
      .filter($"n_tokens".isNotNull)
      .groupBy($"source").agg(sum($"n_tokens").as("dt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ps = mass.map { case (s, dt) =>
      s -> math.floor(math.sqrt(dt.toDouble * 1048576.0)).toLong
    }
    val wsum = ps.values.sum
    val expected = mass.map { case (s, dt) =>
      s -> math.min(1.0,
        cfg.budgetTokens.toDouble * ps(s).toDouble / wsum.toDouble / dt.toDouble)
    }
    assert(rates == expected)
    // the persisted table is what loadCurationState now serves, and a
    // FRESH batch of the new domain gets kept rows under it
    assert(CorpusJob.loadCurationState(spark, state, cfg).rates == rates)
    // fresh ids AND fresh text: a byte-identical re-send would dedup to
    // empty against the postings the B batch just appended
    val c = docs.filter($"doc_id" > n / 2)
      .withColumn("doc_id", $"doc_id" + n + 1)
      .withColumn("source", lit("newdomain"))
      .withColumn("text", concat($"text", lit(" uniq"), $"doc_id"))
    val annC = CorpusJob.runCurationIncremental(spark, c, state, cfg, None, None)
    assert(annC.filter($"kept").count() > 0,
      "admitted domain must keep documents after the refit")
  }

  test("deleteCurationDocs: delete-then-probe == probe against live-only index; verdict log purged; replay no-op") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
      .withColumn("host",
        concat(lit("h"), $"doc_id" % 7, lit(".example.com")))
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id".as("doc_id"), $"embedding")
    val bl = Seq("h3.example.com").toDF("domain")
    val cfg = CorpusJob.CurationConfig(budgetTokens = 20000L)
    val n = docs.agg(max($"doc_id")).head().getLong(0)
    val a = docs.filter($"doc_id" <= n / 2)
    val b = docs.filter($"doc_id" > n / 2)
    val state = tmpDir("curdel")
    CorpusJob.fitCurationState(spark, a, state, cfg, Some(bl), Some(emb))
    val cdir = s"$state/curation"
    // pre-delete index snapshots — the reference anti-joins these in
    // memory (the deletion rewrites the on-disk tables underneath)
    def snap(p: String) = spark.read.parquet(p).localCheckpoint(true)
    val (paras0, shing0, cells0) =
      (snap(s"$cdir/paras"), snap(s"$cdir/shingles"), snap(s"$cdir/cells"))
    val tomb = a.filter($"doc_id" % 5 === 2).select($"doc_id")
      .localCheckpoint(true)
    val removed = CorpusJob.deleteCurationDocs(spark, tomb, state)
    assert(removed > 0, "takedown should remove index + log rows")
    // the verdict log carries text_final — it must purge too
    assert(spark.read.parquet(s"$cdir/annotated")
      .join(tomb, Seq("doc_id"), "left_semi").count() == 0)
    // idempotent: a replay finds nothing
    assert(CorpusJob.deleteCurationDocs(spark, tomb, state) == 0L)
    // delete-then-probe == probing an index built without the docs:
    // the incremental batch against the redacted state equals curateCore
    // under the same frozen state with the priors filtered in memory
    val annB = CorpusJob.runCurationIncremental(spark, b, state, cfg,
        Some(bl), Some(emb))
      .collect().map(_.toString).toSeq
    val st = CorpusJob.loadCurationState(spark, state, cfg)
    val cents = spark.read.parquet(s"$cdir/cents")
    def live(df: org.apache.spark.sql.DataFrame, idName: String) =
      df.join(tomb, df(idName) === tomb("doc_id"), "left_anti")
    val ref = CorpusJob.curateCore(b, cfg, Some(bl), Some(emb), Some(st),
        Some(cents), Some(live(paras0, "id")), Some(live(shing0, "doc_id")),
        Some(live(cells0, "id")))
      .annotated.collect().map(_.toString).toSeq
    assert(annB.sorted == ref.sorted,
      s"post-takedown probe (${annB.size}) != live-only reference (${ref.size})")
  }

  test("curationDrift: a faithful batch reads stable; a planted domain/" +
      "length shift lights up exactly the shifted lenses") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
      .withColumn("host",
        concat(lit("h"), $"doc_id" % 7, lit(".example.com")))
    val cfg = CorpusJob.CurationConfig(budgetTokens = 20000L)
    val n = docs.agg(max($"doc_id")).head().getLong(0)
    val state = tmpDir("curdrift")
    CorpusJob.fitCurationState(spark, docs.filter($"doc_id" <= n / 2),
      state, cfg, None, None)

    // faithful increment: same distributions → every lens near zero
    val okBatch = CorpusJob.runCurationIncremental(spark,
      docs.filter($"doc_id" > n / 2 && $"doc_id" % 3 === 0),
      state, cfg, None, None)
    val ok = CorpusJob.curationDrift(spark, state, okBatch)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(ok.keySet == Set("lid_pred", "outcome", "source", "tokens_bin"))
    assert(ok.values.forall(_ < 0.5), s"faithful batch drifted: $ok")

    // planted shift: one domain only, texts truncated → source and
    // tokens_bin must light up well above the faithful baseline
    val skew = docs.filter($"doc_id" > n / 2 && $"doc_id" % 3 === 1)
      .withColumn("source", lit("src0"))
      .withColumn("text", substring($"text", 1, 80))
    val badBatch = CorpusJob.runCurationIncremental(spark, skew,
      state, cfg, None, None)
    val bad = CorpusJob.curationDrift(spark, state, badBatch)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(bad("source") > 10 * ok("source").max(0.001),
      s"domain shift not detected: $bad vs $ok")
    assert(bad("tokens_bin") > ok("tokens_bin"),
      s"length shift not detected: $bad vs $ok")
  }
}
