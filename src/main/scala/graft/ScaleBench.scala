package graft

import graft.operators.{BpeVocab, Dedup, DedupCluster, SubstringDedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up evidence run: the heavy operator families (substring-span
  * dedup, near-dup clustering, MinHash LSH, BPE training) measured at
  * 1× and R× (default 10×) of the input corpus, R× synthesized by
  * id-offset replication — converting the "would survive 100×"
  * plan-shape arguments into measured numbers, since no sf above 0.1
  * exists in the harness testdata.
  *
  * Replication contract: replica k offsets `doc_id` by `k × 1e8` and
  * prepends a replica token `rk` to the text. The token contains a
  * digit, so it is OUTSIDE the BPE alphabet — the type table stays
  * IDENTICAL at 10× (counts ×10), isolating the corpus-pass cost.
  * For the pair-generating families the replicas are deliberate
  * near-duplicates of each other: every document gains ~R-1 near-dup
  * copies, so cross-replica pairs grow ~R²/2 per original document —
  * the boilerplate-heavy worst case (report row counts next to walls;
  * the superlinear pair growth is the WORKLOAD's doing, not the
  * plan's). The span family sees every shingle's document frequency
  * multiply by R — the hot-shingle skew the AQE decoy-key shape
  * exists for.
  *
  * Output: one JSON line (stdout, last line) + a durable copy at
  * SPARK_GRAFT_SCALE_OUT (default `SCALE_r9.json`).
  */
object ScaleBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // let AQE re-plan CACHED frames too: a persisted bounded frame
      // otherwise pins its pre-AQE 32-partition layout and every
      // downstream stage pays a full task wave over dozens of rows
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)

    // Two replication modes (SPARK_GRAFT_SCALE_MODE):
    //  - "neardup" (default, the SCALE_r9 semantics): replicas differ
    //    only by a prefix token, so every doc gains ~R-1 near-dup
    //    copies — pair counts GROW ~R² by construction (the
    //    boilerplate worst case; superlinear output is the workload's
    //    doing and is reported next to the wall)
    //  - "decorrelated" (the 100× fixed-output-shape point): replica k
    //    additionally interleaves an `rK` token after every 8 words,
    //    which breaks every 8-token window and drops 3-shingle Jaccard
    //    to ~0.6 < the 0.8 threshold — cross-replica docs stop being
    //    near-dups, output shape stays ~linear in R, and the measured
    //    ratio isolates the PLAN's scaling (the brief's "would it
    //    survive 100×" question) instead of a synthetic R² workload
    val mode = sys.env.getOrElse("SPARK_GRAFT_SCALE_MODE", "neardup")
    def corpusKeep(r: Int, extra: Seq[String]): DataFrame = {
      val docs = Tables.documents(spark, sfDir)
        .select((Seq("doc_id") ++ extra ++ Seq("text")).map(col): _*)
      if (r <= 1) docs
      else {
        val rep = docs.crossJoin(spark.range(r).select(col("id").as("__r")))
          .withColumn("doc_id", col("doc_id") + col("__r") * lit(100000000L))
        val varied =
          if (mode == "decorrelated")
            rep.withColumn("text",
              when(col("__r") === 0, col("text"))
                .otherwise(regexp_replace(
                  concat(lit("r"), col("__r"), lit(" "), col("text")),
                  lit("((\\S+\\s+){8})"),
                  concat(lit("$1r"), col("__r"), lit(" ")))))
          else
            rep.withColumn("text",
              when(col("__r") === 0, col("text"))
                .otherwise(concat(lit("r"), col("__r"), lit(" "), col("text"))))
        varied.drop("__r")
      }
    }
    def corpus(r: Int): DataFrame = corpusKeep(r, Nil)

    // q117's five-paragraph synthesis (constant header/footer + text
    // slices + 7-way share line) over any doc frame
    def paraBody(d: DataFrame): DataFrame =
      d.withColumn("body", concat_ws("\n\n",
          lit("subscribe to our newsletter"),
          substring(col("text"), 1, 60),
          concat(lit("share-"), col("doc_id") % 7),
          substring(col("text"), 61, 60),
          lit("copyright 2026")))
        .select(col("doc_id"), col("body"))

    // each workload returns the row count it materialized (count() is
    // the execution trigger, and the count CONTEXTUALIZES the wall —
    // pair blowup at R× must be visible next to its cost)
    val workloads: Seq[(String, DataFrame => Long)] = Seq(
      "span_mark" -> (d =>
        SubstringDedup.duplicateSpans(d, "text", "doc_id", k = 8).count()),
      "span_noncanonical" -> (d =>
        SubstringDedup.nonCanonicalSpans(d, "text", "doc_id", k = 8).count()),
      "minhash_lsh" -> (d =>
        Dedup.minHashLsh(d, "text", "doc_id", shingleSize = 3,
          numHashes = 64, bands = 16, threshold = 0.8).count()),
      "cluster" -> { d =>
        // maxChunkDf = 256: the hot-chunk stop list (pairs per chunk
        // ≤ 32k) — without it, tiny CDC chunks shared corpus-wide
        // generate ~df²/2 pairs and the 100× point measured 7.3M
        // verified pairs / 684 s of pure pair materialization
        val pairs = Dedup.chunkOverlapPairs(d, "text", "doc_id",
            w = 8, avgSize = 64, minShared = 1, maxChunkDf = 256)
          .filter(col("containment") >= 0.5)
        DedupCluster.clusters(d.withColumn("n_chars", length(col("text"))),
          pairs, "doc_id", "id_a", "id_b", "n_chars").count()
      },
      "bpe_train32_b8" -> (d =>
        BpeVocab.train(spark, d, "text", 32, batchSize = 8).count()),
      "sentence_chunks" -> (d =>
        graft.operators.Chunker.sentenceChunks(d, "text", "doc_id", 64).count()),
      // selection family (round 9): fit + one narrow scoring scan +
      // windowless rank — expected ~linear in corpus size
      "dsir_select" -> { d =>
        graft.operators.Dsir.selectLikeTarget(
            d.filter(col("doc_id") % 10 === 0),
            d.filter(col("doc_id") % 10 =!= 0),
            "text", "doc_id", dim = 1024, num = 20, den = 100)
          .filter(col("selected")).count()
      },
      "charlm_terciles" -> { d =>
        val model = graft.operators.CharLm.fit(
          d.filter(col("doc_id") % 10 === 0), "text")
        graft.operators.CharLm.perplexityBuckets(d, "text", "doc_id", model)
          .filter(col("ppl_bucket") === lit("head")).count()
      },
      // paragraph dedup (round 9): constant header/footer paragraphs
      // are shared by EVERY doc at every scale — the hot-digest worst
      // case the aggregate election's map-side combine exists for.
      // The length() guard forces the rebuilt strings to materialize
      // (a bare count would prune the concat_ws away).
      "paragraph_dedup" -> (d =>
        Dedup.paragraphDedup(paraBody(d), "body", "doc_id")
          .filter(col("n_dropped") > 0 && length(col("text_dedup")) >= 0)
          .count()),
      // BM25 retrieval (round 10, q135): two corpus passes (postings +
      // lens meta) + tiny broadcast aggregates + a candidate-row sum —
      // expected ~linear in corpus size at fixed output (k = 20)
      "bm25_search" -> (d =>
        graft.operators.Bm25.search(d, "text", "doc_id",
          Seq("dup", "vector", "merge", "zzz"), 20).count()),
      // fuzzy matching (round 10, q137): names derived from a HASH of
      // the doc id, so replicas decorrelate (cross-replica names differ
      // everywhere — no synthetic R² pair blowup); planted one-edit
      // companions for id % 11 keep a linear stream of true matches.
      // blockLen = 6 over 13-char names: block-key SPACE (10^5/10^6)
      // stays well above occupancy at 30× — the blockLen ∝ log N dial
      // (fixed blockLen at a growing corpus is the fixed-k SemDeDup
      // hazard: occupancy ∝ N ⇒ candidates ∝ N²; q137's maxBlock cap
      // is the other half of the same discipline)
      "fuzzy_pairs" -> { d =>
        val base = d.select(col("doc_id").as("id"),
          concat(lit("N"), lpad(pmod(xxhash64(col("doc_id")),
            lit(1000000000000L)).cast("string"), 12, "0")).as("name"))
        val typo = base.filter(col("id") % 11 === 0)
          .select((col("id") + 50000000000L).as("id"),
            concat(substring(col("name"), 1, 6), lit("x"),
              substring(col("name"), 8, 100)).as("name"))
        graft.operators.FuzzyJoin.fuzzyPairs(base.unionByName(typo),
          "name", "id", maxDist = 2, blockLen = 6, maxBlock = 1000L).count()
      },
    )

    // SemDeDup scale pair: replicas are CIRCULAR-SHIFTED so
    // cross-replica vectors decorrelate (identical copies would be the
    // degenerate all-pairs-dup case) — true near-dups stay
    // within-replica, but cell OCCUPANCY still grows R×, so the
    // within-cell join generates ~R² candidate pairs at FIXED k. The
    // operator's documented discipline is k ∝ N (cluster size is the
    // caller's knob, per the SemDeDup paper's ~100k clusters at web
    // scale): the `_kscaled` twin holds cell size constant and must
    // scale ~linearly while `_k16` exhibits the fixed-k hazard.
    def corpusEmb(r: Int): DataFrame = {
      val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
      if (r <= 1) emb
      else emb.crossJoin(spark.range(r).select(col("id").as("__r")))
        .withColumn("vec_id", col("vec_id") + col("__r") * lit(100000000L))
        .withColumn("__s", (col("__r") % 64).cast("int"))
        .withColumn("embedding",
          concat(slice(col("embedding"), col("__s") + 1, lit(64) - col("__s")),
            slice(col("embedding"), lit(1), col("__s"))))
        .drop("__r", "__s")
    }
    // PRODUCTION-width synthetic embeddings (r13 verdict task 3): the
    // harness's 64-dim vectors bound JL's advantage at dim/outDim = 2,
    // where the operator's motivation is 768–4096-dim production
    // embeddings. 12 deterministic rotations of the 64-dim base
    // concatenate to 768 dims (same quantizable float values, distinct
    // per replica via corpusEmb's rotation) — the brute leg pays a
    // 768-dim quantized cosine per pair, the JL leg a 64-long integer
    // dot (dim/outDim = 12) + full-width rescore of only the shortlist.
    // Scaled by 1/8 (cosine is scale-invariant): the projected-distance
    // signed-64 envelope is 4·outDim·(dim·maxAbs·10⁶)² — at dim=768 it
    // needs |x| ≤ 0.125 for outDim=64 (base values are ≤ 0.578)
    def wideEmb(r: Int): DataFrame =
      corpusEmb(r).withColumn("embedding",
        transform(
          concat((0 until 12).map { jj =>
            val s = (jj * 17) % 64
            concat(slice(col("embedding"), s + 1, 64 - s),
              slice(col("embedding"), 1, s))
          }: _*),
          x => x / lit(8.0d)))
    def linkageCandidates(r: Int, scaledKey: Boolean): Long = {
      val base = Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_mktsegment"), col("c_acctbal"))
      val cust =
        if (r <= 1) base
        else base.crossJoin(spark.range(r).select(col("id").as("__r")))
          .withColumn("c_custkey", col("c_custkey") + col("__r") * lit(100000000L))
          .withColumn("c_name", concat(lit("r"), col("__r"), col("c_name")))
      val withKeys = cust
        .withColumn("bal_bucket", floor(col("c_acctbal") / 1000.0).cast("long"))
        .withColumn("name_blk", substring(col("c_name"), 1, 3))
        .drop(if (r <= 1) "__nope" else "__r")
      val blockOn = Seq("c_nationkey", "c_mktsegment", "bal_bucket") ++
        (if (scaledKey) Seq("name_blk") else Nil)
      graft.operators.RecordLinkage.link(withKeys, withKeys, "c_custkey",
        blockOn,
        Seq(graft.operators.RecordLinkage.FieldSpec("c_name", 990000L, 1000L,
          (x, y) => levenshtein(x, y) <= 1)),
        matchFp = 0L, possibleFp = 0L).count()
    }

    val semWorkloads: Seq[(String, Int => Long)] = Seq(
      "semdedup_k16" -> (r =>
        Dedup.semDedup(corpusEmb(r), "vec_id", "embedding",
          nClusters = 16, minCosine = 0.5).filter(col("sem_dup")).count()),
      "semdedup_kscaled" -> (r =>
        Dedup.semDedup(corpusEmb(r), "vec_id", "embedding",
          nClusters = 16 * r, minCosine = 0.5).filter(col("sem_dup")).count()),
      // the COMPOSED nine-stage curation job (q126's production form):
      // every corpus-global stage has its own row above — this row
      // measures the ASSEMBLY (stage joins, checkpoint
      // materializations, model fits) growing with R. SemDeDup rides
      // the k ∝ N discipline (semClusters = 16r) and the token budget
      // scales with R so the mixture stage keeps proportional mass.
      "curation_pipeline" -> { r =>
        val d = corpusKeep(r, Seq("lang", "source"))
          .withColumn("host",
            concat(lit("h"), col("doc_id") % 997, lit(".example.com")))
        val bl = spark.range(7).select(
          concat(lit("h"), (col("id") * 131) % 997, lit(".example.com"))
            .as("domain"))
        val emb = corpusEmb(r).select(col("vec_id").as("doc_id"), col("embedding"))
        graft.jobs.CorpusJob.curate(d,
            graft.jobs.CorpusJob.CurationConfig(
              budgetTokens = 500000L * r, semClusters = 16 * r),
            Some(bl), Some(emb))
          .filter(col("kept") && length(col("text_final")) >= 0).count()
      },
      // JL throughput pair (round 13): both legs are one linear pass
      // over the R× corpus for the same 50 queries — the RATIO isolates
      // the per-pair cost (a 32-long integer dot + div-64 shortlist vs
      // a 64-dim quantized cosine per pair); the rescore leg touches
      // only 80 rows/query at any R
      "ann_brute50" -> { r =>
        val e = corpusEmb(r)
        graft.operators.Similarity.bruteForceTopKQuantized(
          e, e.filter(col("vec_id") < 50), "embedding", "vec_id", 10).count()
      },
      "ann_jl50" -> { r =>
        val e = corpusEmb(r)
        graft.operators.RandomProjection.topKProjected(
          e, e.filter(col("vec_id") < 50), "embedding", "vec_id",
          k = 10, outDim = 32, dim = 64, shortlist = 80).count()
      },
      // the JL pair at PRODUCTION width (768 dims — r13 task 3): same
      // 200 queries, same corpus rows, 12× wider vectors. The brute
      // leg pays N·Q 768-dim cosines; the JL leg projects once per row
      // (narrow codegen map, dim·outDim ops), shortlists by 64-long
      // integer dots, and rescores 80 rows/query at full width. The
      // regime is explicit: one-shot JL pays off iff Q ≫ outDim
      // (per-row cost Q·dim brute vs dim·outDim + Q·outDim·3 JL) — at
      // Q = 50 the projection alone outweighs brute, measured; at
      // Q = 200 the 768-dim advantage is real, and the serving path
      // (projection persisted as an index, the q202 discipline)
      // amortizes the projection to zero
      "ann_brute200_wide768" -> { r =>
        val e = wideEmb(r)
        graft.operators.Similarity.bruteForceTopKQuantized(
          e, e.filter(col("vec_id") < 200), "embedding", "vec_id", 10).count()
      },
      "ann_jl200_wide768" -> { r =>
        val e = wideEmb(r)
        graft.operators.RandomProjection.topKProjected(
          e, e.filter(col("vec_id") < 200), "embedding", "vec_id",
          k = 10, outDim = 64, dim = 768, shortlist = 80,
          maxAbs = 0.125).count()
      },
      // batch MMR (q199's shape): the candidate cut is the corpus-sized
      // part (pluggable — swap in the IVF probe to make it index-sized);
      // the k−1 greedy rounds run over Q×N candidate frames, constant
      // in R, so total wall must track the ONE scan, never k scans
      "mmr_batch3" -> { r =>
        val e = corpusEmb(r)
        graft.operators.Mmr.selectBatch(
          e, e.filter(col("vec_id").isin(3L, 5L, 9L)), "embedding", "vec_id",
          nCandidates = 16, k = 5).count()
      },
      // PQ compression family (q144/q145): encode is the pure narrow
      // map that must track the scan; ADC search is the 10-query
      // broadcast over the codes column — both should scale ~linearly
      // in R (replicas are rotations, so the codebook sample and the
      // per-query candidate sets stay decorrelated)
      "pq_encode" -> { r =>
        val e = corpusEmb(r)
        val cb = graft.operators.Pq.train(e, "vec_id", "embedding", 8, 16)
        graft.operators.Pq.encode(e, "vec_id", "embedding", cb)
          .filter(col("codes").isNotNull).count()
      },
      "pq_adc_search" -> { r =>
        val e = corpusEmb(r)
        val cb = graft.operators.Pq.train(e, "vec_id", "embedding", 8, 16)
        graft.operators.Pq.searchAdc(
          graft.operators.Pq.encode(e, "vec_id", "embedding", cb),
          e.filter(col("vec_id") < 10), "vec_id", "embedding", cb, 10).count()
      },
      // record-linkage blocking: replicas get DISTINCT names (rK
      // prefix) so true-match structure stays linear. The _fixed row
      // keeps q150's three block keys — FIXED key cardinality, so
      // block occupancy ∝ R and candidates ∝ R² (the fixed-k SemDeDup
      // hazard restated for linkage); the _scaled row adds a
      // replica-varying fourth key (in production: a name prefix /
      // geohash / zip), restoring ∝ R candidates. Report both — the
      // RATIO between them is the lesson.
      "linkage_fixed" -> (r => linkageCandidates(r, scaledKey = false)),
      "linkage_scaled" -> (r => linkageCandidates(r, scaledKey = true)),
      // hybrid retrieval ONE-SHOT (q186's shape): corpus tokenize for
      // the BM25 leg + a brute-force N·1 cosine for the vector leg —
      // linear in R by construction; the persisted-index twin below
      // (incr_hybrid_fused) must stay ~FLAT against it (r13 task 4)
      "hybrid_oneshot" -> { r =>
        val d = corpus(r)
        val e = corpusEmb(r)
        val lex = graft.operators.Bm25.search(d, "text", "doc_id",
            Seq("dup", "vector", "merge", "zzz"), 20)
          .select(col("doc_id"), col("rank"))
        val vec = graft.operators.Similarity.bruteForceTopKQuantized(
            e, e.filter(col("vec_id") === 0), "embedding", "vec_id", 20)
          .select(col("id").as("doc_id"), col("rank"))
        graft.operators.Similarity.rrfFuse(Seq(lex, vec),
          "doc_id", "rank", 10).count()
      },
      // the ITERATIVE connected-components regime on its own curve
      // (round 11): edges LINEAR in R (fixed 64-node chain components,
      // R× more of them — no clique-pair blowup anywhere), and
      // collectThreshold = 0 forces the iterative path at BOTH points,
      // so the ratio measures pointer-jumping propagation itself —
      // fixed O(log diameter) rounds of edge-sized joins — not a
      // driver/iterative regime flip and not a synthetic R² workload
      "cc_iterative" -> { r =>
        val edges = spark.range(50000L * r)
          .filter(col("id") % 64 =!= 63)
          .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
        DedupCluster.connectedComponents(edges, "id_a", "id_b",
            collectThreshold = 0L)
          .select(col("comp")).distinct().count()
      },
      // embedding-drift FROM-SCRATCH form (round 15, task 3): derives
      // the codebook AND re-assigns/counts the REFERENCE snapshot
      // every run. The reference is the R× corpus and the monitored
      // snapshot a FIXED 1× slice (the production shape: the frozen
      // reference is the big historical corpus, the daily snapshot is
      // an increment) — so this row grows ~linearly in R while its
      // state-fed twin (incr_drift_state below, reference persisted
      // as untimed setup) must stay ~FLAT
      "drift_scratch" -> { r =>
        graft.operators.Drift.embedding(corpusEmb(r), corpusEmb(1),
          "vec_id", "embedding", nCells = 16).count()
      },
      // n-gram diversity pair (round 15, task 5): the one-scan form
      // (a single explode emitting (n, ngram) for n = 1..3) against
      // the r14 shape (one full corpus pass PER n) — same values, the
      // ratio is the two corpus scans removed per daily report
      "ngram_one_scan" -> (r =>
        graft.operators.TermStats.ngramDiversity(corpus(r), "text",
          Seq(1, 2, 3)).count()),
      "ngram_per_n" -> (r =>
        Seq(1, 2, 3).map(n =>
          graft.operators.TermStats.ngramDiversity(corpus(r), "text",
            Seq(n)).count()).sum),
      // hard-negative mining BRUTE form (round 15, task 2): anchors ×
      // the R× corpus; the persisted-IVF seam twin lives in the
      // incremental harness below (incr_hardneg_probe)
      "hardneg_brute" -> { r =>
        val e = corpusEmb(r)
        val anchors = e.filter(col("vec_id") < 8)
        val pos = e.select(col("vec_id").as("id"))
          .crossJoin(spark.range(8).select(col("id").as("query_id")))
          .filter((col("id") + col("query_id")) % 19 === 0)
        graft.operators.Similarity.hardNegatives(e, anchors, pos,
          "embedding", "vec_id", k = 10, maxCosinePpm = 450000L).count()
      },
      // link-graph authority (round 10, q158): the host space grows
      // WITH the corpus (100·R hosts — the corpus-varying-key
      // discipline again), so degree stays ~constant (4 out-edges per
      // doc) and each of the 5 fixed PageRank rounds is one
      // node-sized contribution join against stationary edge
      // partitions + one edge-sized GROUP BY dst → wall must track R,
      // never R². The dst space is disjoint from src (bipartite), so
      // every round also pays the dangling-mass redistribution.
      "pagerank5" -> { r =>
        val nHosts = lit(100L * r)
        val edges = corpus(r).select(col("doc_id"),
            explode(array((0 to 3).map(k =>
              pmod(xxhash64(col("doc_id") + lit(k * 7919L)), nHosts)): _*))
              .as("dst0"))
          .select(pmod(xxhash64(col("doc_id")), nHosts).as("src"),
            (col("dst0") + lit(1000000000L)).as("dst"))
        graft.operators.LinkGraph.pageRank(edges, "src", "dst", iters = 5)
          .count()
      },
    )



    // optional workload subset (comma-separated) — the 100× point runs
    // the five heaviest families rather than the whole matrix
    val only = sys.env.get("SPARK_GRAFT_SCALE_WORKLOADS")
      .map(_.split(",").map(_.trim).toSet)
    def keep(name: String) = only.forall(_.contains(name))

    def run(r: Int): Map[String, (Double, Long)] = {
      val d = corpus(r)
      (workloads.filter(w => keep(w._1))
        .map { case (name, f) => name -> (() => f(d)) } ++
        semWorkloads.filter(w => keep(w._1))
          .map { case (name, f) => name -> (() => f(r)) })
        .map { case (name, f) =>
          val t0 = System.nanoTime()
          val n = f()
          val w = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[scale] ${name}%-18s x$r%-3d rows=$n%-10d ${w}%.1fs")
          name -> (w, n)
        }.toMap
    }

    // Incremental claim, measured: a FIXED 500-doc daily batch probed
    // against persisted indexes built from the 1× vs R× corpus. Daily
    // cost must track the batch, not the corpus — the index side is one
    // narrow parquet column (span) / band rows (MinHash), so the R×
    // probe may read more index bytes but must not approach R× wall.
    // (Index builds are untimed setup; a full-corpus recompute at R× is
    // reported alongside as the cost incremental AVOIDS paying.)
    val batch = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .limit(500)
      .withColumn("doc_id", col("doc_id") + lit(10000000000L))
    def incrRun(r: Int, tmp: String): Map[String, (Double, Long)] = {
      val d = corpus(r)
      // index builds are untimed setup — build only what a kept probe
      // will read (the workload-subset runs would otherwise pay the
      // full index matrix at R×)
      if (keep("incr_span_probe"))
        graft.operators.SubstringDedup.shingleIndex(d, "text", "doc_id", 8)
          .write.mode("overwrite").parquet(s"$tmp/spanidx")
      if (keep("incr_minhash_probe")) {
        val sigs = graft.operators.Dedup.signatures(d, "text", "doc_id", 3, 64)
        sigs.write.mode("overwrite").parquet(s"$tmp/sigs")
        graft.operators.Dedup.signatureBands(sigs, 64, 16)
          .write.mode("overwrite").parquet(s"$tmp/bands")
      }
      if (keep("incr_para_probe"))
        graft.operators.Dedup.paraPostings(paraBody(d), "body", "doc_id")
          .write.mode("overwrite").parquet(s"$tmp/paraidx")
      if (keep("incr_bm25_query") || keep("incr_bm25_pruned")) {
        // postings PARTITIONED BY TERM — the Lucene access path: the
        // probe's term filter becomes partition pruning, so it reads
        // the query's postings lists, not the corpus
        graft.operators.Bm25.postings(d, "text", "doc_id")
          .write.mode("overwrite").partitionBy("term").parquet(s"$tmp/bm25post")
        graft.operators.Bm25.docLens(d, "text", "doc_id")
          .write.mode("overwrite").parquet(s"$tmp/bm25lens")
        // WAND-style per-term impact stats, stored beside the postings
        graft.operators.Bm25.impactMeta(
            spark.read.parquet(s"$tmp/bm25post"))
          .write.mode("overwrite").parquet(s"$tmp/bm25meta")
      }
      // advisory/mixture state (round 12): the EXACT forms scan the R×
      // corpus; the state probes read sketch-sized / domain-sized state
      // regardless of R — the flat-vs-linear pair is the claim. The
      // skew key is CONTENT-derived (first text token) so the exact
      // report must read the fact — a dimension-column key would be
      // column-pruned into a near-free scan and hide the asymmetry
      lazy val dSrc = corpusKeep(r, Seq("source"))
      lazy val dKeyed = dSrc.withColumn("k",
        substring(col("text"), 1, 12))
      def lossFrame(df: DataFrame): DataFrame = df
        .withColumn("__t", coalesce(col("text"), lit("")))
        .withColumn("__ntok", when(trim(col("__t")) === "", lit(0L))
          .otherwise(size(split(trim(col("__t")), "\\s+")).cast("long")))
        .withColumn("loss_fp", when(col("__ntok") > 0,
          expr("length(__t) * 1024L div __ntok")).otherwise(lit(0L)))
      if (keep("incr_skew_advisory") || keep("incr_autosalt_decision"))
        graft.operators.Salting.writeSkewState(dKeyed, Seq("k"),
          s"$tmp/skewstate")
      if (keep("incr_hybrid_fused")) {
        // the two persisted indexes the production hybrid path serves
        // from: BM25 impact index (champion lists + cutoffs) and the
        // IVF index under the k ∝ N cell discipline (16r centroids, so
        // a fixed nProbe reads a CONSTANT number of vectors at any R)
        graft.operators.Bm25.writeIndex(corpus(r), "text", "doc_id",
          s"$tmp/bm25idx", headB = 64, buckets = 64)
        val e = corpusEmb(r)
        val (cents, cells) = graft.operators.IvfIndex.buildIndex(
          e, "vec_id", "embedding", nCentroids = 16 * r)
        graft.operators.IvfIndex.writeIndex(cents, cells, s"$tmp/ivfidx")
      }
      if (keep("incr_mixture_weights"))
        graft.operators.DomainMixture.writeLossState(lossFrame(dSrc),
          "source", "loss_fp", s"$tmp/lossstate")
      if (keep("incr_bloom_probe"))
        // the R× corpus's seen-shingle Bloom: state is ⌈m/32⌉ word rows
        // at ANY R (the membership analogue of the skew/mixture states)
        graft.operators.PortableBloom.writeShingleState(d, "text", "doc_id",
          s"$tmp/bloomstate")
      if (keep("incr_hardneg_probe")) {
        // the mining seam's index (round 15, task 2): k ∝ N cells so a
        // fixed nProbe reads a constant number of vectors at any R —
        // build untimed, the q202 amortization
        val e = corpusEmb(r)
        val (cents, cells) = graft.operators.IvfIndex.buildIndex(
          e, "vec_id", "embedding", nCentroids = 16 * r)
        graft.operators.IvfIndex.writeIndex(cents, cells, s"$tmp/hnivf")
      }
      if (keep("incr_drift_state"))
        // the frozen drift reference (round 15, task 3): codebook +
        // reference cell masses of the R× corpus persisted ONCE —
        // untimed setup, the cost a daily monitoring run amortizes
        // away entirely (the state is ≤ nCells rows at any R)
        graft.operators.Drift.writeEmbeddingReference(corpusEmb(r),
          "vec_id", "embedding", s"$tmp/driftref", nCells = 16)
      val bSigs = graft.operators.Dedup.signatures(batch, "text", "doc_id", 3, 64)
      val bBands = graft.operators.Dedup.signatureBands(bSigs, 64, 16)
      Seq[(String, () => Long)](
        s"incr_span_probe" -> (() =>
          graft.operators.SubstringDedup.nonCanonicalSpansIncremental(
            spark.read.parquet(s"$tmp/spanidx"), batch, "text", "doc_id", 8)
            .count()),
        s"incr_minhash_probe" -> (() =>
          graft.operators.Dedup.minHashLshIncremental(
            spark.read.parquet(s"$tmp/bands"), spark.read.parquet(s"$tmp/sigs"),
            bBands, bSigs, 64, 0.8).count()),
        s"incr_para_probe" -> (() =>
          graft.operators.Dedup.paragraphDedupIncremental(
            spark.read.parquet(s"$tmp/paraidx"), paraBody(batch),
            "body", "doc_id")
            .filter(length(col("text_dedup")) >= 0).count()),
        // not "incremental" state maintenance but the same claim shape:
        // a FIXED query against the R× index must cost ~the query's
        // postings lists (which do grow ~R — matching docs are a fixed
        // fraction of the corpus), never the full-corpus tokenize
        s"incr_bm25_query" -> (() =>
          graft.operators.Bm25.searchPostings(
            spark.read.parquet(s"$tmp/bm25post"),
            spark.read.parquet(s"$tmp/bm25lens"), "doc_id",
            Seq("dup", "vector", "merge", "zzz"), 20).count()),
        // the rank-safe pruned probe against the same persisted index:
        // candidate postings never ride a per-doc exchange — per-term
        // impact heads (bounded-buffer agg) + broadcast-semi-join
        // rescore of <= |q|·b docs; results provably identical to
        // incr_bm25_query (Bm25Spec), cost tracks the head budget, not
        // the R×-grown postings lists
        s"incr_bm25_pruned" -> (() =>
          graft.operators.Bm25.searchPostingsPruned(
            spark.read.parquet(s"$tmp/bm25post"),
            spark.read.parquet(s"$tmp/bm25lens"), "doc_id",
            Seq("dup", "vector", "merge", "zzz"), 20,
            meta = Some(spark.read.parquet(s"$tmp/bm25meta"))).count()),
        // the SERVED hybrid probe: rank-safe BM25 impact-index probe +
        // IVF cell probe (fixed nProbe over k ∝ N cells) + RRF — both
        // legs are pruned index reads, so the fused probe must stay
        // ~FLAT while hybrid_oneshot grows linearly with R
        s"incr_hybrid_fused" -> (() => {
          val lex = graft.operators.Bm25.searchIndexPruned(spark,
              s"$tmp/bm25idx", Seq("dup", "vector", "merge", "zzz"), 20)
            .select(col("doc_id"), col("rank"))
          val (cents, cells) =
            graft.operators.IvfIndex.readIndex(spark, s"$tmp/ivfidx")
          val vec = graft.operators.IvfIndex.probe(cells, cents,
              Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0),
              "embedding", "vec_id", 20, nProbe = 4)
            .select(col("id").as("doc_id"), col("rank"))
          graft.operators.Similarity.rrfFuse(Seq(lex, vec),
            "doc_id", "rank", 10).count()
        }),
        // the mining SEAM against the persisted index (round 15, task
        // 2): probe nProbe = 4 of 16r cells (constant vectors read at
        // any R), mine from the top-512 — daily-training-batch cost vs
        // hardneg_brute's full-corpus scan
        s"incr_hardneg_probe" -> (() => {
          val (cents, cells) =
            graft.operators.IvfIndex.readIndex(spark, s"$tmp/hnivf")
          val e = Tables.embeddings(spark, sfDir)
          val anchors = e.filter(col("vec_id") < 8)
          val pos = e.select(col("vec_id").as("id"))
            .crossJoin(spark.range(8).select(col("id").as("query_id")))
            .filter((col("id") + col("query_id")) % 19 === 0)
          val cands = graft.operators.IvfIndex.probe(cells, cents, anchors,
              "embedding", "vec_id", k = 512, nProbe = 4)
            .select(col("query_id"), col("id"), col("cosine"))
          graft.operators.Similarity.hardNegativesFromCandidates(cands, pos,
            k = 10, maxCosinePpm = 450000L).count()
        }),
        // the state-fed drift report (round 15, task 3): one assignment
        // scan of the FIXED 1× daily snapshot + cell-sized joins — the
        // R× reference appears in NO plan (flat in R); vs drift_scratch
        // which re-derives its codebook + cell counts every run (linear)
        s"incr_drift_state" -> (() =>
          graft.operators.Drift.embeddingAgainstReference(spark,
            s"$tmp/driftref", corpusEmb(1), "vec_id", "embedding").count()),
        s"skew_exact" -> (() =>
          graft.operators.Salting.skewReport(dKeyed, Seq("k")).count()),
        s"incr_skew_advisory" -> (() =>
          graft.operators.Salting.skewReportFromState(spark,
            s"$tmp/skewstate").count()),
        // closed-loop decision (r13 task 7): "rows" IS the chosen salt
        // count — the content-derived key space is uniform, so the
        // lb-based decision must stay 1 (never engage) at every R even
        // though the collision-inflated ub reads as skew at 30x+
        s"incr_autosalt_decision" -> (() =>
          graft.operators.Salting.saltsFromState(spark,
            s"$tmp/skewstate").toLong),
        s"mixture_batch" -> (() =>
          graft.operators.DomainMixture.weights(lossFrame(dSrc),
            "source", "loss_fp").count()),
        s"incr_mixture_weights" -> (() =>
          graft.operators.DomainMixture.weightsFromState(spark,
            s"$tmp/lossstate").count()),
        // membership pair (round 13): the exact overlap broadcasts the
        // R×-corpus shingle set against the fixed batch (the cost the
        // Bloom replaces — grows ~R in build+broadcast), while the
        // Bloom probe reads ⌈m/32⌉ state rows and scans only the batch
        // — must stay ~FLAT at any R
        // both legs force the CONTAMINATION VALUES (sum, not count):
        // count() after groupBy(id) lets the optimizer prune the
        // benchmark join / probe expression away and both legs would
        // measure only the batch shingling (observed: the 100× exact
        // leg timed FASTER than 1× before this was caught)
        s"bloom_exact_overlap" -> (() =>
          graft.operators.Decontaminate.overlap(batch, d,
            "text", "doc_id").agg(sum(col("n_contaminated"))).head().getLong(0)),
        s"incr_bloom_probe" -> (() => {
          val (merged, m, k) =
            graft.operators.PortableBloom.readMergedState(spark,
              s"$tmp/bloomstate")
          val words = graft.operators.PortableBloom.collectWords(merged, m)
          graft.operators.PortableBloom.contaminationByBloom(batch, words,
            "text", "doc_id", m = m, k = k)
            .agg(sum(col("n_bloom_hits"))).head().getLong(0)
        }),
      ).filter(p => keep(p._1)).map { case (name, f) =>
        val t0 = System.nanoTime()
        val n = f()
        val w = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[scale] ${name}%-18s x$r%-3d rows=$n%-10d ${w}%.1fs")
        name -> (w, n)
      }.toMap
    }

    run(1) // warmup: JIT + parquet footer caches on the small pass
    val base = run(1)
    val big = run(factor)
    val tmpRoot = java.nio.file.Files
      .createTempDirectory("graft_scale_incr").toString
    val incrBase = incrRun(1, s"$tmpRoot/x1")
    val incrBig = incrRun(factor, s"$tmpRoot/xR")
    def j(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val body = ((workloads.map(_._1) ++ semWorkloads.map(_._1))
      .filter(keep)
      .map { name =>
      val (t1, n1) = base(name)
      val (tR, nR) = big(name)
      s""""$name":{"t1":${j(t1)},"t$factor":${j(tR)},"ratio":${j(tR / t1)},"rows1":$n1,"rows$factor":$nR}"""
    } ++ incrBase.keys.toSeq.sorted.map { name =>
      val (t1, n1) = incrBase(name)
      val (tR, nR) = incrBig(name)
      s""""$name":{"t1":${j(t1)},"t$factor":${j(tR)},"ratio":${j(tR / t1)},"rows1":$n1,"rows$factor":$nR}"""
    }).mkString("{", ",", "}")
    val line =
      s"""{"metric":"scale_ratio","factor":$factor,"mode":"$mode","sf":"$sfDir","cpus":$cpus,"workloads":$body}"""
    println(line)
    scala.util.Try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "SCALE_r9.json"))
      java.nio.file.Files.write(out, line.getBytes("UTF-8"))
    }.failed.foreach(t => System.err.println(s"scalebench: durable copy failed: $t"))
    spark.stop()
  }
}
