package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PortableBloomSpec extends SparkSpec {
  import spark.implicits._

  private def keys = (1 to 1500).map(i => s"key:$i").toDF("k")

  test("no false negatives: every inserted key probes member on both paths") {
    val df = keys
    val sk = PortableBloom.sketch(df, Seq.empty, "k")
    // join path
    val joined = PortableBloom.mightContain(sk, df, Seq.empty, "k")
    assert(joined.filter($"member" =!= 1).count() == 0L)
    // embedded-array path
    val words = PortableBloom.collectWords(sk)
    assert(df.filter(!PortableBloom.probe(words)($"k")).count() == 0L)
  }

  test("measured FP rate stays within ~2.5x of the analytic bound") {
    val sk = PortableBloom.sketch(keys, Seq.empty, "k")
    val words = PortableBloom.collectWords(sk)
    // 20k non-members (disjoint value space)
    val nonMembers = (1 to 20000).map(i => s"other:$i").toDF("k")
    val fp = nonMembers.filter(PortableBloom.probe(words)($"k")).count()
    val kNum = PortableBloom.DefaultK.toDouble
    val bound = math.pow(1.0 - math.exp(-kNum * 1500 / PortableBloom.DefaultM), kNum)
    assert(fp.toDouble / 20000 <= bound * 2.5,
      s"fp rate ${fp / 20000.0} vs analytic bound $bound")
    // and it is not degenerate: some bits ARE set
    assert(words.exists(_ != 0L))
  }

  test("merge of partition filters equals the whole-data filter exactly; re-OR is a no-op") {
    val df = keys
    val (a, b) = (df.filter(length($"k") <= 6), df.filter(length($"k") > 6))
    val merged = PortableBloom.merge(
      PortableBloom.sketch(a, Seq.empty, "k"),
      PortableBloom.sketch(b, Seq.empty, "k"),
      PortableBloom.sketch(b, Seq.empty, "k"))(Seq.empty) // b twice: OR idempotence
    val whole = PortableBloom.sketch(df, Seq.empty, "k")
    assert(merged.orderBy("word").collect().toSeq ==
      whole.orderBy("word").collect().toSeq)
  }

  test("grouped filters keep groups apart") {
    val df = Seq(("g1", "x"), ("g2", "y")).toDF("g", "k")
    val sk = PortableBloom.sketch(df, Seq("g"), "k")
    val probes = Seq(("g1", "x"), ("g1", "y"), ("g2", "x"), ("g2", "y")).toDF("g", "k")
    val got = PortableBloom.mightContain(sk, probes, Seq("g"), "k")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(got(("g1", "x")) == 1 && got(("g2", "y")) == 1)
    // single-key filters at m=16384: a cross-group hit would need a
    // 4-position collision (~1e-13) — treat as exact
    assert(got(("g1", "y")) == 0 && got(("g2", "x")) == 0)
  }

  test("state: append-then-read equals one-shot rebuild; geometry mismatch fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bloomstate").toString
    val (d1, d2) = (keys.filter(length($"k") <= 6), keys.filter(length($"k") > 6))
    PortableBloom.writeState(d1, "k", dir)
    PortableBloom.appendState(d2, "k", dir)
    val (merged, m, k) = PortableBloom.readMergedState(spark, dir)
    assert((m, k) == (PortableBloom.DefaultM, PortableBloom.DefaultK))
    val whole = PortableBloom.sketch(keys, Seq.empty, "k")
    assert(merged.orderBy("word").collect().toSeq ==
      whole.orderBy("word").collect().toSeq)
    val e = intercept[IllegalArgumentException] {
      PortableBloom.appendState(d1, "k", dir, m = 8192)
    }
    assert(e.getMessage.contains("would corrupt"))
  }

  test("frame geometry tag: mismatched probes fail loudly instead of silently missing") {
    val sk = PortableBloom.sketch(keys, Seq.empty, "k", m = 8192, k = 3)
    assert(PortableBloom.frameGeometry(sk).contains((8192, 3)))
    // collectWords at a LARGER m: every word index fits the bigger
    // array, so the old bounds check passed and probes silently missed
    // (the ADVICE r13 gap) — the tag turns it into a loud failure
    val e1 = intercept[IllegalArgumentException] {
      PortableBloom.collectWords(sk, m = 16384)
    }
    assert(e1.getMessage.contains("false negatives"))
    val e2 = intercept[IllegalArgumentException] {
      PortableBloom.mightContain(sk, keys, Seq.empty, "k", m = 8192, k = 4)
    }
    assert(e2.getMessage.contains("false negatives"))
    val e3 = intercept[IllegalArgumentException] {
      PortableBloom.merge(sk, PortableBloom.sketch(keys, Seq.empty, "k"))(Seq.empty)
    }
    assert(e3.getMessage.contains("mismatched geometries"))
    // the tag survives merge and a parquet round-trip (the state path)
    val dir = java.nio.file.Files.createTempDirectory("graft-bloomtag").toString
    PortableBloom.merge(sk, sk)(Seq.empty).write.parquet(s"$dir/words")
    assert(PortableBloom.frameGeometry(spark.read.parquet(s"$dir/words"))
      .contains((8192, 3)))
    // matched geometry still probes clean end-to-end
    val words = PortableBloom.collectWords(sk, m = 8192)
    assert(keys.filter(!PortableBloom.probe(words, m = 8192, k = 3)($"k")).count() == 0L)
  }

  test("merge with an UNTAGGED input yields an untagged output — the tagged " +
      "side's geometry is not laundered onto unvalidated bits (ADVICE r14)") {
    val tagged = PortableBloom.sketch(keys, Seq.empty, "k", m = 8192, k = 3)
    // a pre-tagging frame built under a DIFFERENT geometry: strip the
    // tag the way a re-aggregate or an old writer would
    val untagged = PortableBloom.sketch(keys, Seq.empty, "k", m = 16384, k = 3)
      .select(col("word"),
        col("bits").as("bits", org.apache.spark.sql.types.Metadata.empty))
    assert(PortableBloom.frameGeometry(untagged).isEmpty)
    // the mixed merge must NOT pass the tagged (m, k) through: the
    // untagged side makes no geometry claim, so the output makes none
    // either — downstream probes keep their bounds-check backstop
    // instead of a false validation
    val mixed = PortableBloom.merge(tagged, untagged)(Seq.empty)
    assert(PortableBloom.frameGeometry(mixed).isEmpty,
      "tagged geometry laundered onto a mixed merge")
    // all-tagged merges still propagate the tag (the state fold path)
    assert(PortableBloom.frameGeometry(
      PortableBloom.merge(tagged, tagged)(Seq.empty)).contains((8192, 3)))
  }

  test("needsRebuild: fires on saturation or takedown volume, never on a fresh filter") {
    // fresh, lightly loaded, no takedowns: neither dial trips
    val fresh = PortableBloom.sketch(Seq("a", "b", "c").toDF("k"), Seq.empty, "k")
    assert(!PortableBloom.needsRebuild(fresh))
    // an empty filter never needs a rebuild
    assert(!PortableBloom.needsRebuild(fresh.filter(lit(false))))
    // saturation: a tiny geometry (m = 64, k = 2) packed with keys
    // pushes bits_set past half of m
    val sat = PortableBloom.sketch(keys, Seq.empty, "k", m = 64, k = 2)
    assert(PortableBloom.needsRebuild(sat, m = 64))
    // takedown volume trips regardless of load
    assert(PortableBloom.needsRebuild(fresh, takedownsSinceBuild = 1L))
    assert(!PortableBloom.needsRebuild(fresh, takedownsSinceBuild = 2L,
      takedownLimit = 5L))
    intercept[IllegalArgumentException] {
      PortableBloom.needsRebuild(fresh, loadFactor = 0.0)
    }
  }

  test("contaminationByBloom bounds the exact overlap from above (no false negatives)") {
    val bench = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "the quick brown fox jumps high"), // shares shingles
      (11L, "entirely different words here today")).toDF("doc_id", "text")
    val benchShingles = Dedup.shingleRows(bench, "text", "doc_id", Nil, 3)
      .select($"shingle").distinct()
    val words = PortableBloom.collectWords(
      PortableBloom.sketch(benchShingles, Seq.empty, "shingle"))
    val byBloom = PortableBloom.contaminationByBloom(corpus, words, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Decontaminate.overlap(corpus, bench, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    byBloom.foreach { case (id, (nSh, hits)) =>
      assert(hits >= exact(id), s"doc $id: bloom hits $hits below exact ${exact(id)}")
      assert(hits <= nSh)
    }
    assert(byBloom(10L)._2 >= 2L) // the genuinely shared shingles hit
  }

  test("mightContain of a NULL key is NULL, not a definite miss") {
    val sk = PortableBloom.sketch(Seq("x").toDF("k"), Seq.empty, "k")
    val probes = Seq(Some("x"), Some("y"), None).toDF("k")
    val got = PortableBloom.mightContain(sk, probes, Seq.empty, "k").collect()
      .map(r => Option(r.get(0)).map(_.toString) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(got(Some("x")) == Some(1))
    assert(got(Some("y")) == Some(0))
    assert(got(None).isEmpty, "NULL key must make no membership claim")
  }

  test("probe of NULL is NULL (no membership claim); sketch skips NULLs") {
    val sk = PortableBloom.sketch(Seq(Some("x"), None).toDF("k"), Seq.empty, "k")
    val words = PortableBloom.collectWords(sk)
    val r = Seq(Some("x"), None).toDF("k")
      .select(PortableBloom.probe(words)($"k").as("p")).collect()
    assert(r.exists(row => !row.isNullAt(0) && row.getBoolean(0)))
    assert(r.exists(_.isNullAt(0)))
  }
}
