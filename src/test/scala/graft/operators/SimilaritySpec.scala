package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("brute-force top-k: known geometry, deterministic ranks") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.8f, 0.6f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val q = corpus.filter($"vec_id" === 1L)
    val out = Similarity.bruteForceTopK(corpus, q, "embedding", "vec_id", k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(2L, 3L, 4L))
    assert(math.abs(out(0).getAs[Double]("cosine") - 0.8) < 1e-6)
  }

  test("LSH ANN achieves usable recall vs exact on the real embeddings") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter($"vec_id" < 5)
    val exact  = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", 10)
    val approx = Similarity.lshTopK(emb, queries, "embedding", "vec_id", 10,
      dim = 64, bits = 4, tables = 8)
    val recall = Similarity.recallAgainstExact(exact, approx)
      .agg(avg($"recall")).head().getDouble(0)
    // 8 tables × 4 bits on 500 weakly-clustered vectors
    assert(recall > 0.4, s"mean recall $recall too low")
  }

  test("incremental IVF: index ∪ increment cells == one-shot assignment; probe identical") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val index = emb.filter($"vec_id" % 5 =!= 0)
    val fresh = emb.filter($"vec_id" % 5 === 0)
    val (cents, idxCells) = IvfIndex.buildIndex(index, "vec_id", "embedding", 8)
    val newCells = IvfIndex.assignIncrement(fresh, "vec_id", "embedding", cents)
    // batch form: the WHOLE corpus assigned against the same frozen codebook
    val oneShot = IvfIndex.assignIncrement(emb, "vec_id", "embedding", cents)
    val incCells = idxCells.unionByName(newCells)
    assert(incCells.count() == oneShot.count())
    assert(incCells.select("id", "centroid_id")
      .except(oneShot.select("id", "centroid_id")).isEmpty)
    // and the probe operator over either cell table returns the same top-k
    val queries = fresh.filter($"vec_id" < 50)
    val inc = IvfIndex.probe(incCells, cents, queries, "embedding", "vec_id", 5)
    val batch = IvfIndex.probe(oneShot, cents, queries, "embedding", "vec_id", 5)
    assert(inc.count() == batch.count())
    assert(inc.except(batch).isEmpty)
  }

  test("IvfIndex.assign accepts non-dense centroid ids (filtered/re-keyed table)") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding").limit(100)
    val cents = IvfIndex.centroids(emb, "vec_id", "embedding", 4)
    val dense = IvfIndex.assign(emb, "vec_id", "embedding", cents)
      .select($"vec_id", $"centroid_id".as("dense_id"))
    // re-key 0..3 → 2,5,8,11: order-preserving, so ties must land on the
    // same centroid and every assignment is the dense one remapped
    val rekeyed = cents.withColumn("centroid_id", $"centroid_id" * 3 + 2)
    val sparse = IvfIndex.assign(emb, "vec_id", "embedding", rekeyed)
      .select($"vec_id", $"centroid_id".as("sparse_id"))
    val mismatches = dense.join(sparse, "vec_id")
      .filter($"sparse_id" =!= $"dense_id" * 3 + 2).count()
    assert(mismatches == 0)
  }

  test("persisted IVF index: probe dynamic-prunes cell partitions; results == in-memory") {
    val dir = tmpDir("ivfidx")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding")
    val (cents, cells) = IvfIndex.buildIndex(emb, "vec_id", "embedding", 8)
    IvfIndex.writeIndex(cents, cells, dir)
    val (c2, cl2) = IvfIndex.readIndex(spark, dir)
    val queries = emb.filter($"vec_id" < 3)
    val persisted = IvfIndex.probe(cl2, c2, queries, "embedding", "vec_id", 5, nProbe = 2)
    val rows = persisted.collect()
    // the layout contract: cells/ is partitioned by centroid_id, so the
    // probe's broadcast join on the partition column plants a dynamic
    // partition-pruning filter on the scan — non-probed cells' files
    // are never read (at 256 cells / 4 probes that's ~98% of the corpus
    // skipped per query batch)
    val plan = persisted.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      "probe scan is not partition-pruned:\n" + plan.take(3000))
    // and the persisted round-trip changes nothing
    val direct = IvfIndex.probe(cells, cents, queries, "embedding", "vec_id", 5, nProbe = 2)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ==
      direct.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
  }

  test("IVF probe achieves usable recall vs exact on the real embeddings") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val queries = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", 10)
    val approx = IvfIndex.topK(emb, queries, "embedding", "vec_id", 10,
      nCentroids = 16, nProbe = 4)
    val recall = Similarity.recallAgainstExact(exact, approx)
      .agg(avg($"recall")).head().getDouble(0)
    // 4-of-16 cells probed on 500 weakly-clustered vectors: the classic
    // IVF trade — well above chance (0.25 of the corpus scanned), not 1.0
    assert(recall > 0.5, s"mean recall $recall too low")
  }

  test("recallAtK: monotone in nProbe; probing every cell == brute force (recall 1)") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding").cache()
    try {
      val queries = emb.filter($"vec_id" < 5)
      def micro(np: Int) = IvfIndex.recallAtK(emb, queries, "embedding",
          "vec_id", k = 10, nCentroids = 16, nProbe = np)
        .agg(max($"micro_recall")).head().getDouble(0)
      val (r1, r4, r16) = (micro(1), micro(4), micro(16))
      // candidate sets nest as nProbe grows, and a true top-k member
      // can never be displaced by growth (its displacers would have to
      // outrank it globally) — so recall is monotone, and at nProbe =
      // nCentroids the candidate set IS the corpus: exactly brute force
      assert(r1 <= r4 && r4 <= r16, s"recall not monotone: $r1 / $r4 / $r16")
      assert(r16 == 1.0, s"full probe must equal brute force, got $r16")
      assert(r1 < 1.0, s"1-of-16 cells on weakly-clustered vectors should miss something")
    } finally emb.unpersist()
  }

  test("Lloyd-refined rebuild raises recall over the frozen-sample codebook") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding").cache()
    try {
      val queries = emb.filter($"vec_id" < 20)
      val exact = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", 10)
      def recallOf(iters: Int): Double = {
        val (cents, cells) = IvfIndex.rebuild(emb, "vec_id", "embedding", 16, iters)
        val approx = IvfIndex.probe(cells, cents, queries, "embedding", "vec_id", 10, nProbe = 4)
        Similarity.recallAgainstExact(exact, approx).agg(avg($"recall")).head().getDouble(0)
      }
      val frozen = recallOf(0)
      val refined = recallOf(2)
      // measured on this corpus: frozen 0.48, refined ~0.575 (means
      // average in floating point, so leave slack under the wobble)
      assert(refined > frozen + 0.03,
        s"Lloyd refinement should beat the hash-sample seed: $frozen -> $refined")
      assert(refined > 0.52, s"refined recall $refined below the operating bar")
    } finally emb.unpersist()
  }

  test("cellStats: counts per cell, imbalance = max/mean (rebuild trigger)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding")
    val (_, cells) = IvfIndex.buildIndex(emb, "vec_id", "embedding", 8)
    val stats = IvfIndex.cellStats(cells).collect()
    assert(stats.map(_.getAs[Long]("n_vectors")).sum == emb.count())
    val counts = stats.map(_.getAs[Long]("n_vectors").toDouble)
    val want = counts.max / (counts.sum / counts.length)
    assert(math.abs(stats.head.getAs[Double]("imbalance") - want) < 1e-3)
    assert(stats.forall(_.getAs[Double]("imbalance") == stats.head.getAs[Double]("imbalance")))
  }

  test("quantized cosine ≈ float cosine (1e-4) and is exactly reproducible") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir).limit(50)
    val pairs = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        V.cosine(col("a.embedding"), col("b.embedding")).as("c1"),
        V.cosineQuantized(col("a.embedding"), col("b.embedding")).as("c2"))
    val maxDiff = pairs.agg(max(abs($"c1" - $"c2"))).head().getDouble(0)
    assert(maxDiff < 1e-4, s"quantization error $maxDiff")
  }

  test("rerankByVector == interpreted-kernel reference; no-vector " +
      "candidates drop") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    // candidates 0..29 plus one id with no embedding row
    val cands = (0L to 29L).map(i => (i, i * 10)).toDF("vec_id", "carried")
      .unionByName(Seq((999999L, 0L)).toDF("vec_id", "carried"))
    val probe = emb.filter($"vec_id" === 7).select($"embedding")
    val got = Similarity.rerankByVector(cands, "vec_id", emb, "vec_id",
        "embedding", probe, k = 5)
      .orderBy($"rank")
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("carried"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank")))
    assert(got.length == 5 && !got.exists(_._1 == 999999L))
    // independent reference via the interpreted (Slow) kernel forms
    val ref = emb.filter($"vec_id" <= 29)
      .crossJoin(broadcast(emb.filter($"vec_id" === 7)
        .select(V.quantizeSlow($"embedding").as("pq"))))
      .select($"vec_id", round(V.cosineFromQuantized(
          V.quantizeSlow($"embedding"), $"pq",
          V.dotQSlow(V.quantizeSlow($"embedding"), V.quantizeSlow($"embedding")),
          V.dotQSlow($"pq", $"pq")), 6).as("cosine"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, c) => (-c, id) }.take(5)
    assert(got.map(r => (r._1, r._3)).toSeq == ref.toSeq)
    // carried columns survive the rerank; ranks are 1..5
    assert(got.forall(r => r._2 == r._1 * 10))
    assert(got.map(_._4).toSeq == (1 to 5))
  }

  test("rrfFuse matches the hand-computed RRF sums; docs in one list " +
      "only score from it; ties break by id; n_lists counts lists") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val b = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("doc_id", "rank")
    val out = Similarity.rrfFuse(Seq(a, b), "doc_id", "rank", k = 10)
      .orderBy($"rank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_lists"),
        r.getAs[Long]("rrf_fp"), r.getAs[Int]("rank")))
    def s(rs: Int*) = rs.map(r => 1000000L / (60 + r)).sum
    // 10: ranks 1+2 -> 16393+16129=32522; 20: 2+1 -> same sum (tie!)
    // -> id tie-break puts 10 first; 30/40: single-list 15873 each,
    // 30 before 40 by id
    assert(out.toSeq == Seq(
      (10L, 2, s(1, 2), 1), (20L, 2, s(2, 1), 2),
      (30L, 1, s(3), 3), (40L, 1, s(3), 4)))
    // k truncates after fusion
    assert(Similarity.rrfFuse(Seq(a, b), "doc_id", "rank", k = 2)
      .count() == 2)
    // partitioning-proof
    val p = Similarity.rrfFuse(Seq(a.repartition(5), b.repartition(3)),
      "doc_id", "rank", k = 10).orderBy($"rank")
      .collect().map(_.toString).toSeq
    assert(p == out.map(t => s"[${t._1},${t._2},${t._3},${t._4}]").toSeq)
  }

  test("rrfFuse enforceDistinct: a duplicate id within one list fails " +
      "loudly; distinct lists pass unchanged") {
    val a = Seq((10L, 1), (20L, 2)).toDF("doc_id", "rank")
    val dup = Seq((10L, 1), (10L, 2)).toDF("doc_id", "rank")
    // clean inputs: flag on == flag off, value-identical
    assert(Similarity.rrfFuse(Seq(a), "doc_id", "rank", k = 10,
        enforceDistinct = true).collect().map(_.toString).toSeq ==
      Similarity.rrfFuse(Seq(a), "doc_id", "rank", k = 10)
        .collect().map(_.toString).toSeq)
    val e = intercept[Exception] {
      Similarity.rrfFuse(Seq(dup), "doc_id", "rank", k = 10,
        enforceDistinct = true).collect()
    }
    assert(e.getMessage.contains("duplicate id"),
      s"wrong failure: ${e.getMessage}")
  }

  test("rrfFuseByKey: per-key fusion == rrfFuse run per key; a key " +
      "covered by one list only fuses that list (mixed coverage)") {
    val lex = Seq((1L, 10L, 1), (1L, 20L, 2), (2L, 30L, 1))
      .toDF("query_id", "doc_id", "rank")
    val vec = Seq((1L, 20L, 1), (1L, 40L, 2), (3L, 50L, 1))
      .toDF("query_id", "doc_id", "rank")
    val out = Similarity.rrfFuseByKey(Seq(lex, vec), "query_id", "doc_id",
        "rank", k = 10, enforceDistinct = true)
      .orderBy($"query_id", $"rank").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("n_lists"), r.getAs[Long]("rrf_fp"),
        r.getAs[Int]("rank")))
    // per-key reference: run the single-key fuser on each key's slices
    val perKey = Seq(1L, 2L, 3L).flatMap { q =>
      Similarity.rrfFuse(
          Seq(lex.filter($"query_id" === q).drop("query_id"),
            vec.filter($"query_id" === q).drop("query_id"))
            .map(_.filter(lit(true))),
          "doc_id", "rank", k = 10)
        .orderBy($"rank").collect()
        .map(r => (q, r.getAs[Long]("doc_id"), r.getAs[Int]("n_lists"),
          r.getAs[Long]("rrf_fp"), r.getAs[Int]("rank")))
    }
    assert(out.toSeq == perKey)
    // keys 2 and 3 each appear in ONE list only — still fused, n_lists 1
    assert(out.filter(t => t._1 == 2L || t._1 == 3L)
      .forall(_._3 == 1))
  }

  test("hardNegatives: labeled positives and the near-positive band " +
      "excluded BEFORE the cut; hardest admissible negative first") {
    val emb = Seq(
      (1L, Array(1f, 0f, 0f)),        // the anchor
      (10L, Array(0.8f, 0.6f, 0f)),   // labeled positive (cos 0.8)
      (11L, Array(0.98f, 0.17f, 0f)), // UNLABELED near-copy (cos ≈ .985)
      (12L, Array(0.7f, 0.7f, 0f)),   // hard negative (cos ≈ .707)
      (13L, Array(0f, 1f, 0f)),       // easy negative (cos 0)
      (14L, Array(0.6f, 0.8f, 0f))    // medium negative (cos 0.6)
    ).toDF("vec_id", "embedding")
    val anchors = emb.filter($"vec_id" === 1)
    val positives = Seq((1L, 10L)).toDF("query_id", "id")
    val got = Similarity.hardNegatives(emb, anchors, positives,
        "embedding", "vec_id", k = 3, maxCosinePpm = 950000L)
      .orderBy("rank").collect()
    // 10 excluded by label (its cos 0.8 < the band — the label did it);
    // 11 excluded by the band (unlabeled near-positive); anchor by id;
    // the k=3 slots then go to 12, 14, 13 hardest-first
    assert(got.map(_.getAs[Long]("id")).toSeq == Seq(12L, 14L, 13L),
      got.mkString(", "))
    assert(got.head.getAs[Double]("cosine") > 0.70 &&
      got.head.getAs[Double]("cosine") < 0.72)
    // positives free their slot rather than masking a negative below:
    // with k covering the whole pool, neither excluded id ever appears
    val all = Similarity.hardNegatives(emb, anchors, positives,
      "embedding", "vec_id", k = 5, maxCosinePpm = 950000L)
    assert(all.count() == 3L)
    assert(all.filter($"id".isin(10L, 11L, 1L)).count() == 0L)
    // dial hygiene
    intercept[IllegalArgumentException] {
      Similarity.hardNegatives(emb, anchors, positives, "embedding",
        "vec_id", k = 0)
    }
  }

  test("probeDials: one scored pass == an independent probe at every dial " +
      "(the telemetry shape, r15)") {
    import graft.Tables
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val (cents, cells) = IvfIndex.buildIndex(emb, "vec_id", "embedding", 8)
    val queries = emb.filter($"vec_id" < 5)
    val dialed = IvfIndex.probeDials(cells, cents, queries,
      "embedding", "vec_id", k = 10, dials = Seq(1, 3, 8))
    for (p <- Seq(1, 3, 8)) {
      val one = IvfIndex.probe(cells, cents, queries, "embedding", "vec_id",
          k = 10, nProbe = p)
        .select("query_id", "id", "cosine", "rank")
      val slice = dialed.filter($"n_probe" === p)
        .select("query_id", "id", "cosine", "rank")
      assert(slice.count() == one.count(), s"dial $p count")
      assert(slice.except(one).isEmpty && one.except(slice).isEmpty,
        s"dial $p: the slice diverges from the independent probe")
    }
    intercept[IllegalArgumentException] {
      IvfIndex.probeDials(cells, cents, queries, "embedding", "vec_id",
        k = 10, dials = Seq.empty)
    }
  }

  test("hardNegatives candidate seam: the IVF-probe composition == the brute " +
      "form at an exhaustive probe (r14 verdict task 2)") {
    import graft.Tables
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    val anchors = emb.filter($"vec_id".isin(3L, 7L))
    val positives = emb.select($"vec_id".as("id"))
      .crossJoin(Seq(3L, 7L).toDF("query_id"))
      .filter(($"id" + $"query_id") % 19 === 0)
    val brute = Similarity.hardNegatives(emb, anchors, positives,
      "embedding", "vec_id", k = 10, maxCosinePpm = 450000L)
    // the production composition: persisted-index probe → seam. At
    // nProbe = nCentroids with k = corpus size the probe scores every
    // pair with the same round-6 quantized kernel, so the mined set is
    // identical to the brute scorer's by construction (the q202/q210
    // argument)
    val (cents, cells) = IvfIndex.buildIndex(emb, "vec_id", "embedding", 8)
    val cands = IvfIndex.probe(cells, cents, anchors, "embedding", "vec_id",
        k = 600, nProbe = 8)
      .select($"query_id", $"id", $"cosine")
    val seam = Similarity.hardNegativesFromCandidates(cands, positives,
      k = 10, maxCosinePpm = 450000L)
    assert(seam.count() == brute.count())
    assert(seam.except(brute).isEmpty && brute.except(seam).isEmpty,
      "seam over the exhaustive probe diverges from the brute form")
    // and the seam is self-excluding even when a candidate frame
    // carries the anchor row itself
    val withSelf = cands.unionByName(
      Seq((3L, 3L, 1.0)).toDF("query_id", "id", "cosine"))
    assert(Similarity.hardNegativesFromCandidates(withSelf, positives,
        k = 10, maxCosinePpm = 1000000L) // band wide open: only the id filter can drop self
      .filter($"id" === $"query_id").count() == 0L)
  }
}
