package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "banana banana banana durian"),
    (4L, null.asInstanceOf[String]),
    (5L, ""))

  private def docs = corpus.toDF("doc_id", "text")

  /** Independent fixed-point reference (plain Scala longs, no Spark)
    * — guards the operator's expr-string arithmetic against typos.
    */
  private def refScores(query: Seq[String]): Map[Long, Long] = {
    val toks = corpus.map { case (id, t) =>
      id -> Option(t).map(_.toLowerCase.trim).filter(_.nonEmpty)
        .map(_.split("\\s+").toSeq).getOrElse(Seq.empty)
    }
    val n = toks.size.toLong
    val tl = toks.map(_._2.size.toLong).sum
    val avg = (tl * 256L) / n
    val q = query.map(_.toLowerCase).distinct
    val dfT = q.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    val idf = q.map(t =>
      t -> (Dsir.log2Fp(2 * n + 2) - Dsir.log2Fp(2 * dfT(t) + 1))).toMap
    toks.flatMap { case (id, tk) =>
      val dl = tk.size.toLong
      val s = q.map { t =>
        val tf = tk.count(_ == t).toLong
        if (tf == 0) 0L
        else idf(t) * ((22528L * tf * avg) / (10L * tf * avg + 3L * avg + 2304L * dl))
      }.sum
      if (s > 0) Some(id -> s) else None
    }.toMap
  }

  test("scores match the independent fixed-point reference exactly") {
    val q = Seq("apple", "durian", "zzz")
    val got = Bm25.search(docs, "text", "doc_id", q, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val ref = refScores(q)
    assert(got.map(r => r._1 -> r._2).toMap == ref)
    // deterministic rank: score desc, then doc_id
    val expected = ref.toSeq.sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, s), i) => (id, s, i + 1) }
    assert(got.sortBy(_._3).toSeq == expected)
  }

  test("k truncates; duplicate query terms collapse (set semantics)") {
    val top1 = Bm25.search(docs, "text", "doc_id", Seq("apple"), k = 1).collect()
    assert(top1.length == 1)
    val a = Bm25.search(docs, "text", "doc_id", Seq("apple", "apple"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Bm25.search(docs, "text", "doc_id", Seq("apple"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("postings are additive: merge of disjoint slices == batch build") {
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 === 1)
    val merged = Bm25.mergePostings(
      Bm25.postings(a, "text", "doc_id"), Bm25.postings(b, "text", "doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val batch = Bm25.postings(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(merged == batch)
  }

  test("takedown: delete-then-search == build-without") {
    val deleted = Seq(1L).toDF("doc_id")
    val post = Bm25.deleteDocs(Bm25.postings(docs, "text", "doc_id"), deleted, "doc_id")
    val lens = Bm25.deleteDocs(Bm25.docLens(docs, "text", "doc_id"), deleted, "doc_id")
    val got = Bm25.searchPostings(post, lens, "doc_id", Seq("apple", "banana"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val without = Bm25.search(docs.filter($"doc_id" =!= 1L), "text", "doc_id",
      Seq("apple", "banana"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == without)
  }

  test("batch search: each query's rows == the single-query search; " +
      "no-match queries vanish; case-variant duplicate terms collapse") {
    val queries = Seq((10L, "apple"), (10L, "APPLE"), (10L, "durian"),
      (20L, "banana"), (30L, "zzz")).toDF("query_id", "term")
    val post = Bm25.postings(docs, "text", "doc_id")
    val lens = Bm25.docLens(docs, "text", "doc_id")
    val got = Bm25.searchManyPostings(post, lens, "doc_id",
        queries, "query_id", "term", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(!got.exists(_._1 == 30L)) // all-absent query yields nothing
    def single(q: Seq[String]) =
      Bm25.searchPostings(post, lens, "doc_id", q, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.filter(_._1 == 10L).map(r => (r._2, r._3, r._4)).toSet ==
      single(Seq("apple", "durian")))
    assert(got.filter(_._1 == 20L).map(r => (r._2, r._3, r._4)).toSet ==
      single(Seq("banana")))
  }

  test("batch search: an oversized query batch fails LOUDLY at " +
      "MaxQueryTerms instead of collecting unbounded terms") {
    val big = (0 to Bm25.MaxQueryTerms) // one past the cap
      .map(i => (1L, s"term$i")).toDF("query_id", "term")
    val post = Bm25.postings(docs, "text", "doc_id")
    val lens = Bm25.docLens(docs, "text", "doc_id")
    val e1 = intercept[IllegalArgumentException] {
      Bm25.searchManyPostings(post, lens, "doc_id",
        big, "query_id", "term", k = 10).collect()
    }
    assert(e1.getMessage.contains("MaxQueryTerms") ||
      e1.getMessage.contains("distinct terms"))
    val e2 = intercept[IllegalArgumentException] {
      Bm25.searchManyPostingsPruned(post, lens, "doc_id",
        big, "query_id", "term", k = 10).collect()
    }
    assert(e2.getMessage.contains("distinct terms"))
  }

  test("phrase search: consecutive-only, overlap-counted, " +
      "case-insensitive, 3-token chains") {
    val d = Seq(
      (1L, "order order order fast"),   // two overlapping "order order"
      (2L, "order fast order"),         // non-consecutive: no hit
      (3L, "ORDER Order"),              // case-folded hit
      (4L, "sort merge join sort merge"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val bg = Bm25.phraseSearch(d, "text", "doc_id", Seq("order", "order"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(bg == Map(1L -> 2L, 3L -> 1L))
    val tri = Bm25.phraseSearch(d, "text", "doc_id",
        Seq("sort", "merge", "join"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(tri == Map(4L -> 1L)) // the trailing "sort merge" doesn't chain
  }

  test("empty/NULL docs count toward N and avgdl but never match") {
    // dropping docs 4/5 changes N (6→... here 5→3) and so every idf —
    // scores must differ even though the matching docs are identical
    val withEmpties = Bm25.search(docs, "text", "doc_id", Seq("apple"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val withoutEmpties = Bm25.search(docs.filter($"doc_id" <= 3), "text",
      "doc_id", Seq("apple"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(withEmpties.keySet == withoutEmpties.keySet)
    assert(withEmpties != withoutEmpties)
    assert(!withEmpties.contains(4L) && !withEmpties.contains(5L))
  }

  /** A corpus where impact pruning genuinely bites: one rare term and
    * one flooded term (many low-impact postings), so small head
    * budgets exercise both the accept path and the fallback path.
    */
  private def bigDocs = (
    (1 to 60).map(i => (i.toLong, "common filler filler")) ++  // flood
    Seq((100L, "rare common"), (101L, "rare rare common word"),
      (102L, "word common"))
  ).toDF("doc_id", "text")

  test("pruned probe is rank-safe: == full scoring across head budgets, " +
      "k values, and the forced-fallback regime") {
    val post = Bm25.postings(bigDocs, "text", "doc_id")
    val lens = Bm25.docLens(bigDocs, "text", "doc_id")
    val q = Seq("rare", "common", "word")
    def full(k: Int) = Bm25.searchPostings(post, lens, "doc_id", q, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    for (k <- Seq(1, 3, 10); b <- Seq(2, 4, 16, 1024)) {
      // b=2 with k=3 cannot prove the bound → must fall back, silently
      val pruned = Bm25.searchPostingsPruned(post, lens, "doc_id", q, k, b)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      assert(pruned == full(k), s"k=$k b=$b diverged")
    }
    // one-shot form too (the q135 surface)
    assert(Bm25.searchPruned(bigDocs, "text", "doc_id", q, 5)
      .collect().map(_.toString).toSeq ==
      Bm25.search(bigDocs, "text", "doc_id", q, 5)
        .collect().map(_.toString).toSeq)
  }

  test("pruned BATCH retrieval is rank-safe per query: == the full batch " +
      "path across head budgets, incl. mixed accept/fallback batches") {
    val post = Bm25.postings(bigDocs, "text", "doc_id")
    val lens = Bm25.docLens(bigDocs, "text", "doc_id")
    // query 1 leans on the rare term (prunes well); query 2 is all
    // flooded terms (small budgets force ITS fallback while query 1
    // stays accepted — the mixed-batch split); query 3 matches nothing
    val queries = Seq((1L, "rare"), (1L, "word"), (2L, "common"),
      (2L, "filler"), (3L, "absent")).toDF("query_id", "term")
    def full(k: Int) = Bm25.searchManyPostings(post, lens, "doc_id",
        queries, "query_id", "term", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    for (k <- Seq(1, 3, 10); b <- Seq(2, 4, 16, 1024);
         mat <- Seq(false, true)) {
      // both frame-sharing regimes: eager bounded checkpoints (persisted
      // index) and lazy persists with the shared-weighted fallback
      // (one-shot) must give the identical row set
      val pruned = Bm25.searchManyPostingsPruned(post, lens, "doc_id",
          queries, "query_id", "term", k, b, materializeCandidates = mat)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .toSet
      assert(pruned == full(k), s"k=$k b=$b mat=$mat diverged")
    }
  }

  test("pruned batch: a saturated zero-idf term cannot fake exhaustion — " +
      "the zero cutoff sum routes to fallback and results == full") {
    // N = 748: log2fp(2N+2) == log2fp(2N+1) in Q10, so idf_fp = 0 and
    // every posting of the saturated term weighs 0. With b < N the
    // term's head is FULL (not exhausted) yet all cutoffs are 0 —
    // accepting on "ub == 0" would return an incomplete candidate set;
    // the count-based exhaustion check must dispatch the fallback.
    val docs = (1L to 748L).map(i => (i, "every doc has this word"))
      .toDF("doc_id", "text")
    val post = Bm25.postings(docs, "text", "doc_id")
    val lens = Bm25.docLens(docs, "text", "doc_id")
    val queries = Seq((1L, "every")).toDF("query_id", "term")
    val full = Bm25.searchManyPostings(post, lens, "doc_id",
        queries, "query_id", "term", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(full.size == 10 && full.forall(_._3 == 0L), // the premise holds
      s"expected 10 zero-score rows, got $full")
    val pruned = Bm25.searchManyPostingsPruned(post, lens, "doc_id",
        queries, "query_id", "term", k = 10, b = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(pruned == full)
  }

  test("impact meta: additive merge == batch; bounds stay sound after " +
      "deletes; exhausted-corpus shortcut dispatches the plain probe") {
    val a = bigDocs.filter($"doc_id" % 2 === 0)
    val b = bigDocs.filter($"doc_id" % 2 === 1)
    val merged = Bm25.mergeImpactMeta(
        Bm25.impactMeta(Bm25.postings(a, "text", "doc_id")),
        Bm25.impactMeta(Bm25.postings(b, "text", "doc_id")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val post = Bm25.postings(bigDocs, "text", "doc_id")
    val batch = Bm25.impactMeta(post)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(merged == batch)
    // delete docs, keep STALE meta: df_ub/max_tf only over-bound, min_dl
    // only under-bounds — the pruned probe with stale meta must still
    // equal full scoring over the post-delete index
    val deleted = Seq(101L).toDF("doc_id")
    val post2 = Bm25.deleteDocs(post, deleted, "doc_id")
    val lens2 = Bm25.deleteDocs(Bm25.docLens(bigDocs, "text", "doc_id"),
      deleted, "doc_id")
    val staleMeta = Bm25.impactMeta(post) // built BEFORE the delete
    val q = Seq("rare", "common")
    assert(Bm25.searchPostingsPruned(post2, lens2, "doc_id", q, 5,
        meta = Some(staleMeta)).collect().map(_.toString).toSeq ==
      Bm25.searchPostings(post2, lens2, "doc_id", q, 5)
        .collect().map(_.toString).toSeq)
    // tiny corpus + meta: every term exhausted at the default b → the
    // shortcut answers identically (and trivially exactly)
    val smallPost = Bm25.postings(docs, "text", "doc_id")
    val smallLens = Bm25.docLens(docs, "text", "doc_id")
    assert(Bm25.searchPostingsPruned(smallPost, smallLens, "doc_id",
        Seq("apple", "banana"), 3,
        meta = Some(Bm25.impactMeta(smallPost))).collect().map(_.toString).toSeq ==
      Bm25.searchPostings(smallPost, smallLens, "doc_id",
        Seq("apple", "banana"), 3).collect().map(_.toString).toSeq)
  }

  test("persisted impact index: probe == full batch scoring across head " +
      "budgets incl. forced fallback; single-query twin == searchPostings") {
    val queries = Seq((1L, "rare"), (1L, "word"), (2L, "common"),
      (2L, "filler"), (3L, "absent")).toDF("query_id", "term")
    val post = Bm25.postings(bigDocs, "text", "doc_id")
    val lens = Bm25.docLens(bigDocs, "text", "doc_id")
    def full(k: Int) = Bm25.searchManyPostings(post, lens, "doc_id",
        queries, "query_id", "term", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    // headB = 2 forces the flooded query's fallback (stored cutoffs
    // can't prove its top-k) while the rare-term query stays accepted —
    // both paths must equal the full scoring over the SAME stored index
    for (headB <- Seq(2, 4, 1024)) {
      val dir = tmpDir(s"bm25idx$headB")
      Bm25.writeIndex(bigDocs, "text", "doc_id", dir,
        headB = headB, buckets = 8)
      for (k <- Seq(1, 3, 10)) {
        val got = Bm25.searchManyIndexPruned(spark, dir, queries,
            "query_id", "term", k)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
          .toSet
        assert(got == full(k), s"headB=$headB k=$k diverged")
      }
      // single-query twin rides the same code path
      assert(Bm25.searchIndexPruned(spark, dir, Seq("rare", "common"), 5)
        .select("doc_id", "score_fp").collect().map(_.toString).toSet ==
        Bm25.searchPostings(post, lens, "doc_id", Seq("rare", "common"), 5)
          .select("doc_id", "score_fp").collect().map(_.toString).toSet)
    }
  }

  test("persisted impact index: append + impact refresh == rebuild from " +
      "everything (champion/cutoff consistency after growth)") {
    val queries = Seq((1L, "rare"), (1L, "common"), (2L, "word"))
      .toDF("query_id", "term")
    val oldDocs = bigDocs.filter($"doc_id" % 3 =!= 2)
    val newDocs = bigDocs.filter($"doc_id" % 3 === 2)
    val incrDir = tmpDir("bm25incr")
    Bm25.writeIndex(oldDocs, "text", "doc_id", incrDir,
      headB = 4, buckets = 8)
    Bm25.appendToIndex(newDocs, "text", "doc_id", incrDir)
    val rebuiltDir = tmpDir("bm25rebuild")
    Bm25.writeIndex(bigDocs, "text", "doc_id", rebuiltDir,
      headB = 4, buckets = 8)
    def probe(dir: String) = Bm25.searchManyIndexPruned(spark, dir,
        queries, "query_id", "term", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(probe(incrDir) == probe(rebuiltDir))
    // the refreshed stats themselves are value-identical (not just the
    // probe results): df/idf/cutoffs match the rebuild's
    def stats(dir: String) = spark.read.parquet(s"$dir/termstats")
      .select("term", "df", "idf_fp", "cut_fp", "exhausted")
      .collect().map(_.toString).toSet
    assert(stats(incrDir) == stats(rebuiltDir))
  }

  test("persisted impact index: deleteFromIndex's atomic swap == rebuild " +
      "without the deleted docs (stats refreshed, cutoffs rank-safe)") {
    val queries = Seq((1L, "rare"), (1L, "common"), (2L, "word"))
      .toDF("query_id", "term")
    val dir = tmpDir("bm25del")
    Bm25.writeIndex(bigDocs, "text", "doc_id", dir, headB = 4, buckets = 8)
    val deleted = Seq(101L, 5L).toDF("doc_id")
    Bm25.deleteFromIndex(spark, dir, deleted, "doc_id")
    val cleanDir = tmpDir("bm25delclean")
    Bm25.writeIndex(bigDocs.filter(!$"doc_id".isin(101L, 5L)),
      "text", "doc_id", cleanDir, headB = 4, buckets = 8)
    def probe(d: String) = Bm25.searchManyIndexPruned(spark, d,
        queries, "query_id", "term", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(probe(dir) == probe(cleanDir))
    // the refreshed stats equal the clean build's — deletes RAISED idf
    // (df shrank), so live stale stats would have been rank-unsafe
    def stats(d: String) = spark.read.parquet(s"$d/termstats")
      .select("term", "df", "idf_fp", "cut_fp", "exhausted")
      .collect().map(_.toString).toSet
    assert(stats(dir) == stats(cleanDir))
  }

  test("indexStats: the head-budget dial reads vocab/df/exhaustion " +
      "from the stored stats, never the postings") {
    val dir = tmpDir("bm25stats")
    Bm25.writeIndex(bigDocs, "text", "doc_id", dir, headB = 4, buckets = 8)
    val r = Bm25.indexStats(spark, dir).head()
    assert(r.getAs[Long]("n_docs") == 63L) // 60 flood + 3 tail docs
    // vocab: common, filler, rare, word
    assert(r.getAs[Long]("vocab_size") == 4L)
    assert(r.getAs[Long]("max_df") == 63L) // "common" rides every doc
    // at headB=4: rare (df 2) and word (df 2) are exhausted; common and
    // filler are not → 2/4 = 500 per mille
    assert(r.getAs[Long]("exhausted_frac_fp") == 500L,
      s"exhaustion dial off: $r")
    assert(r.getAs[Int]("head_b") == 4 && r.getAs[Int]("buckets") == 8)
  }

  test("crashed delete swap: a missing index root beside a complete " +
      "__rewrite staging promotes on the next probe") {
    val queries = Seq((1L, "rare"), (1L, "common")).toDF("query_id", "term")
    val dir = tmpDir("bm25crash") + "/idx"
    Bm25.writeIndex(bigDocs, "text", "doc_id", dir, headB = 4, buckets = 8)
    val expected = Bm25.searchManyIndexPruned(spark, dir,
      queries, "query_id", "term", 5).collect().map(_.toString).toSet
    // simulate the delete→rename crash window: the live root vanished,
    // the completed staging root is still under the __rewrite name
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(s"${dir}__rewrite")))
    assert(!fs.exists(p))
    val healed = Bm25.searchManyIndexPruned(spark, dir,
      queries, "query_id", "term", 5).collect().map(_.toString).toSet
    assert(healed == expected, "promotion must restore the staged index")
    assert(fs.exists(p) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"${dir}__rewrite")))
  }

  test("persisted positional index: indexed phrase probe == one-shot " +
      "phraseSearch; appends are plain additive (append == rebuild)") {
    val docs = (Seq((1L, "order order order placed"),
      (2L, "the order order desk"), (3L, "order placed order")) ++
      (10L to 40L).map(i => (i, s"filler text number $i order")))
      .toDF("doc_id", "text")
    def oneShot(d: org.apache.spark.sql.DataFrame) =
      Bm25.phraseSearch(d, "text", "doc_id", Seq("order", "order"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dir = tmpDir("posidx")
    Bm25.writePositions(docs, "text", "doc_id", dir, buckets = 8)
    def probe() = Bm25.phraseSearchIndexed(spark, dir, Seq("order", "order"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe() == oneShot(docs))
    // overlap convention: doc 1's three consecutive "order"s hold TWO
    // occurrences; doc 3's non-adjacent pair holds none (absent row)
    assert(probe() == Set((1L, 2L), (2L, 1L)),
      s"overlap convention drifted: ${probe()}")
    // increment: append a doc that introduces new matches
    val more = Seq((100L, "order order")).toDF("doc_id", "text")
    Bm25.appendPositions(more, "text", "doc_id", dir)
    assert(probe() == oneShot(docs.unionByName(more)))
  }
}
