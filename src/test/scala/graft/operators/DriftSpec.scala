package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical snapshots → PSI exactly 0; PSI is never negative") {
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    val r = Drift.report(o, o, Seq("o_orderstatus", "o_orderpriority"))
      .collect()
    assert(r.forall(_.getDecimal(4).signum == 0), "identical snapshots must give 0")
    // a drifted pair: every term must still be >= 0 (sign-aligned factors)
    val detail = Drift.categorical(
      o.filter($"o_orderkey" % 3 === 0), o.filter($"o_orderkey" % 3 =!= 0),
      "o_orderpriority")
    assert(detail.filter($"psi_term_fp" < 0).isEmpty)
  }

  test("new / vanished category accounting; smoothing keeps disjoint " +
      "snapshots finite") {
    val ref = Seq("a", "a", "b").toDF("c")
    val cur = Seq("b", "x", "x", "y").toDF("c")
    val r = Drift.report(ref, cur, Seq("c")).head()
    assert(r.getLong(1) == 4L) // categories: a, b, x, y
    assert(r.getLong(2) == 2L) // new: x, y
    assert(r.getLong(3) == 1L) // vanished: a
    assert(r.getDecimal(4).signum > 0 && !r.isNullAt(5))
    // fully disjoint: every category one-sided, still finite and positive
    val d = Drift.report(Seq("a").toDF("c"), Seq("z", "z").toDF("c"), Seq("c"))
      .head()
    assert(d.getDecimal(4).signum > 0 && !d.isNullAt(5))
  }

  test("binned labels are stable fixed-width intervals; NULL becomes " +
      "its own category") {
    val df = Seq[java.lang.Double](0.0, 49999.99, 50000.0, 123456.78, null)
      .toDF("v").select(Drift.binned("v", 50000.0).as("b"))
    assert(df.as[String].collect().toSeq == Seq(
      "[0.00,50000.00)", "[0.00,50000.00)", "[50000.00,100000.00)",
      "[100000.00,150000.00)", "__null__"))
  }

  test("persisted reference counts: reportAgainstReference == report " +
      "(batch == frozen-state), including categories only one side has") {
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    val ref = o.filter($"o_orderkey" % 2 === 0)
      .withColumn("price_bin", Drift.binned("o_totalprice", 100000.0))
    val cur = o.filter($"o_orderkey" % 2 =!= 0)
      // planted truncation: top bins vanish from the current side
      .filter($"o_totalprice" < 250000.0)
      .withColumn("price_bin", Drift.binned("o_totalprice", 100000.0))
    val cols = Seq("o_orderstatus", "price_bin")
    val dir = tmpDir("driftref")
    Drift.writeReference(ref, cols, dir)
    val incr = Drift.reportAgainstReference(
        spark.read.parquet(dir), cur, cols)
      .collect().map(_.toString).toSeq
    val batch = Drift.report(ref, cur, cols).collect().map(_.toString).toSeq
    assert(incr == batch)
    assert(batch.exists(_.contains("price_bin")))
  }

  test("strong drift at billions of rows: the term product exceeds " +
      "signed-64 and the decimal path carries it exactly") {
    // counts injected via the incremental form — no need to materialize
    // 2e9 rows to prove the arithmetic headroom. One category almost
    // entirely in each snapshot: the worst case ADVICE r10 flagged,
    // where (cr·tc − cc·tr)·Δlog ≈ 1.2e23 wrapped (or ANSI-threw) as long.
    val refC = Seq(("a", 2000000000L), ("b", 1L)).toDF("category", "n_ref")
    val curC = Seq(("a", 1L), ("b", 2000000000L)).toDF("category", "n_cur")
    val terms = Drift.categoricalFromCounts(refC, curC)
      .select($"psi_term_fp").as[java.math.BigDecimal].collect()
    assert(terms.forall(_.signum > 0))
    val maxLong = new java.math.BigDecimal(Long.MaxValue)
    assert(terms.exists(_.compareTo(maxLong) > 0),
      s"expected a term past Long.MaxValue, got ${terms.toSeq}")
    // the guard trips loudly past the documented log-argument bound
    val hugeRef = Seq(("a", 4000000000L)).toDF("category", "n_ref")
    val hugeCur = Seq(("a", 1L)).toDF("category", "n_cur")
    val e = intercept[Exception] {
      Drift.categoricalFromCounts(hugeRef, hugeCur).collect()
    }
    assert(e.getMessage != null)
  }

  test("psi_fp is exact-integer deterministic across partitionings") {
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    val ref = o.filter($"o_orderkey" % 2 === 0)
    val cur = o.filter($"o_orderkey" % 2 =!= 0)
    val a = Drift.report(ref, cur, Seq("o_orderstatus")).head().getDecimal(4)
    val b = Drift.report(ref.repartition(13), cur.repartition(7),
      Seq("o_orderstatus")).head().getDecimal(4)
    assert(a == b && a.signum >= 0)
  }

  test("embedding drift: identical snapshots read zero per cell; a " +
      "semantic shift moves mass and the PSI terms say so") {
    import graft.Tables
    val emb = Tables.embeddings(spark, sfDir()).select($"vec_id", $"embedding")
    // identical snapshots: every cell's smoothed products are equal →
    // every per-cell term is exactly 0
    val same = Drift.embedding(emb, emb, "vec_id", "embedding", nCells = 8)
      .collect()
    assert(same.nonEmpty)
    assert(same.forall(_.getDecimal(3).signum == 0),
      "identical snapshots must read PSI 0 in every cell")
    // the new crawl arrives rotated: vectors land in other cells, so
    // at least one cell's mass moves and its term is non-zero; totals
    // are conserved (assignment is total on both sides)
    val cur = emb.withColumn("embedding",
      concat(slice($"embedding", 9, 56), slice($"embedding", 1, 8)))
    val drifted = Drift.embedding(emb, cur, "vec_id", "embedding", nCells = 8)
      .collect()
    assert(drifted.map(_.getAs[Long]("n_ref")).sum ==
      drifted.map(_.getAs[Long]("n_cur")).sum)
    assert(drifted.exists(_.getDecimal(3).signum != 0),
      "a rotated snapshot must register drift in at least one cell")
    // the frozen-codebook contract: the categories come from the
    // REFERENCE snapshot's cells, so both runs share the cell universe
    assert(drifted.map(_.getString(0)).toSet
      .subsetOf((0 until 8).map(_.toString).toSet))
  }

  test("embedding drift state: embeddingAgainstReference over a persisted " +
      "reference == embedding from scratch (r14 verdict task 3)") {
    import graft.Tables
    val emb = Tables.embeddings(spark, sfDir()).select($"vec_id", $"embedding")
    val cur = emb.withColumn("embedding",
      concat(slice($"embedding", 9, 56), slice($"embedding", 1, 8)))
    val dir = java.nio.file.Files.createTempDirectory("drift-embref").toString
    Drift.writeEmbeddingReference(emb, "vec_id", "embedding", dir, nCells = 8)
    val fromScratch = Drift.embedding(emb, cur, "vec_id", "embedding", nCells = 8)
    val stateFed = Drift.embeddingAgainstReference(spark, dir, cur,
      "vec_id", "embedding")
    assert(stateFed.count() == fromScratch.count())
    assert(stateFed.except(fromScratch).isEmpty &&
      fromScratch.except(stateFed).isEmpty,
      "state-fed drift diverges from the from-scratch derivation")
    // and the state really is increment-shaped: the persisted side is
    // cell-sized (≤ nCells rows per table), not a snapshot copy
    assert(spark.read.parquet(s"$dir/refcounts").count() <= 8L)
    assert(spark.read.parquet(s"$dir/centroids").count() == 8L)
  }
}
