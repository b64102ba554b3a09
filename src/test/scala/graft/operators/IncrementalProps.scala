package graft.operators

import graft.TestSpark
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants of the incremental index family over
  * RANDOM corpora and RANDOM disjoint splits — the differential specs
  * (DedupSpec etc.) pin the real-data cases; these pin the algebra:
  * for ANY corpus and ANY index/increment partition of it,
  * `batch pairs == old pairs ∪ increment pairs` exactly, with the
  * increment emitting precisely the pairs that touch a new doc.
  *
  * Corpora draw from a 12-word alphabet so shingle/token collisions
  * (and therefore real candidate pairs, including near-misses) are
  * dense at tiny sizes.
  */
object IncrementalProps extends Properties("IncrementalIndexes") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private val words =
    Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")

  private val corpusGen: Gen[(List[(Long, String)], Set[Long])] = for {
    n <- Gen.choose(6, 24)
    docs <- Gen.sequence[List[(Long, String)], (Long, String)](
      (0 until n).map { i =>
        for {
          len <- Gen.choose(3, 10)
          toks <- Gen.listOfN(len, Gen.oneOf(words))
        } yield (i.toLong, toks.mkString(" "))
      })
    newIds <- Gen.someOf(0 until n)
  } yield (docs, newIds.map(_.toLong).toSet)

  private def pairKey(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  property("minhash: batch == old ∪ incremental; increment touches new docs only") =
    forAll(corpusGen) { case (docs, newIds) =>
      val all = docs.toDF("doc_id", "text")
      val old = all.filter(!$"doc_id".isin(newIds.toSeq: _*))
      val fresh = all.filter($"doc_id".isin(newIds.toSeq: _*))
      def lsh(df: org.apache.spark.sql.DataFrame) =
        Dedup.minHashLsh(df, "text", "doc_id",
          shingleSize = 2, numHashes = 16, bands = 8, threshold = 0.3)
      val oldSigs = Dedup.signatures(old, "text", "doc_id", 2, 16)
      val newSigs = Dedup.signatures(fresh, "text", "doc_id", 2, 16)
      val inc = pairKey(Dedup.minHashLshIncremental(
        Dedup.signatureBands(oldSigs, 16, 8), oldSigs,
        Dedup.signatureBands(newSigs, 16, 8), newSigs,
        numHashes = 16, threshold = 0.3))
      val batch = pairKey(lsh(all))
      val oldPairs = pairKey(lsh(old))
      inc.forall { case (a, b) => newIds.contains(a) || newIds.contains(b) } &&
        (oldPairs ++ inc) == batch && inc.intersect(oldPairs).isEmpty
    }

  property("simhash: batch == old ∪ incremental; increment touches new docs only") =
    forAll(corpusGen) { case (docs, newIds) =>
      val all = docs.toDF("doc_id", "text")
      val old = all.filter(!$"doc_id".isin(newIds.toSeq: _*))
      val fresh = all.filter($"doc_id".isin(newIds.toSeq: _*))
      def pairs(df: org.apache.spark.sql.DataFrame) =
        Dedup.simHashPairs(df, "text", "doc_id", maxHamming = 3)
      val inc = pairKey(Dedup.simHashIncremental(
        Dedup.simHashChunks(Dedup.simHashDf(old, "text", "doc_id")),
        Dedup.simHashChunks(Dedup.simHashDf(fresh, "text", "doc_id")),
        maxHamming = 3))
      val batch = pairKey(pairs(all))
      val oldPairs = pairKey(pairs(old))
      inc.forall { case (a, b) => newIds.contains(a) || newIds.contains(b) } &&
        (oldPairs ++ inc) == batch && inc.intersect(oldPairs).isEmpty
    }

  property("clusters: incremental(cc(old), newPairs) == cc(all pairs)") =
    forAll(corpusGen) { case (docs, newIds) =>
      val all = docs.toDF("doc_id", "text")
      val pairs = Dedup.minHashLsh(all, "text", "doc_id",
        shingleSize = 2, numHashes = 16, bands = 8, threshold = 0.3)
        .select("id_a", "id_b").cache()
      try {
        val isNew = (c: org.apache.spark.sql.Column) => c.isin(newIds.toSeq: _*)
        val oldPairs = pairs.filter(!isNew($"id_a") && !isNew($"id_b"))
        val newPairs = pairs.filter(isNew($"id_a") || isNew($"id_b"))
        val inc = DedupCluster.incremental(
            DedupCluster.connectedComponents(oldPairs, "id_a", "id_b"),
            newPairs, "id_a", "id_b")
          .as[(Long, Long)].collect().toMap
        val full = DedupCluster.connectedComponents(pairs, "id_a", "id_b")
          .as[(Long, Long)].collect().toMap
        inc == full
      } finally pairs.unpersist()
    }

  property("clusters: deleteNodes(cc(P), P, D) == cc(P ∖ edgesTouching(D))") =
    forAll(corpusGen) { case (docs, delIds) =>
      // reuse the random subset as the DELETE set this time
      val all = docs.toDF("doc_id", "text")
      val pairs = Dedup.minHashLsh(all, "text", "doc_id",
        shingleSize = 2, numHashes = 16, bands = 8, threshold = 0.3)
        .select("id_a", "id_b").cache()
      try {
        val isDel = (c: org.apache.spark.sql.Column) =>
          if (delIds.isEmpty) org.apache.spark.sql.functions.lit(false)
          else c.isin(delIds.toSeq: _*)
        val labels = DedupCluster.connectedComponents(pairs, "id_a", "id_b")
        val viaDelete = DedupCluster.deleteNodes(labels, pairs,
            delIds.toSeq.toDF("doc_id"), "id_a", "id_b")
          .as[(Long, Long)].collect().toMap
        val scratch = DedupCluster.connectedComponents(
            pairs.filter(!isDel($"id_a") && !isDel($"id_b")), "id_a", "id_b")
          .as[(Long, Long)].collect().toMap
        viaDelete == scratch
      } finally pairs.unpersist()
    }

  property("minhash: tombstone-excluded index == from-scratch build without deleted") =
    forAll(corpusGen) { case (docs, newIds) =>
      // fresh = the random subset; deleted = every 3rd of the REST — the
      // takedown shape: index minus a slice, then a new batch arrives
      val delIds = docs.map(_._1).filterNot(newIds).filter(_ % 3 == 1).toSet
      val all = docs.toDF("doc_id", "text")
      val remaining = all.filter(
        if (delIds.isEmpty) $"doc_id".isNotNull else !$"doc_id".isin(delIds.toSeq: _*))
      val old = all.filter(!$"doc_id".isin((newIds ++ delIds).toSeq: _*))
      val fresh = all.filter($"doc_id".isin(newIds.toSeq: _*))
      val idxSigs0 = Dedup.signatures(
        all.filter(!$"doc_id".isin(newIds.toSeq: _*)), "text", "doc_id", 2, 16)
      // tombstone exclusion on the PERSISTED index (built before the
      // deletion), not a rebuilt index over `old`
      val live = (df: org.apache.spark.sql.DataFrame) =>
        if (delIds.isEmpty) df else df.filter(!$"id".isin(delIds.toSeq: _*))
      val newSigs = Dedup.signatures(fresh, "text", "doc_id", 2, 16)
      val inc = pairKey(Dedup.minHashLshIncremental(
        live(Dedup.signatureBands(idxSigs0, 16, 8)), live(idxSigs0),
        Dedup.signatureBands(newSigs, 16, 8), newSigs,
        numHashes = 16, threshold = 0.3))
      val batch = pairKey(Dedup.minHashLsh(remaining, "text", "doc_id",
        shingleSize = 2, numHashes = 16, bands = 8, threshold = 0.3))
      val oldPairs = pairKey(Dedup.minHashLsh(old, "text", "doc_id",
        shingleSize = 2, numHashes = 16, bands = 8, threshold = 0.3))
      inc.forall { case (a, b) => newIds.contains(a) || newIds.contains(b) } &&
        (oldPairs ++ inc) == batch
    }

  property("vocabulary: mergeDocFreq(old, new) == docFreq(all)") =
    forAll(corpusGen) { case (docs, newIds) =>
      val all = docs.toDF("doc_id", "text")
      val old = all.filter(!$"doc_id".isin(newIds.toSeq: _*))
      val fresh = all.filter($"doc_id".isin(newIds.toSeq: _*))
      def vmap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      vmap(TermStats.mergeDocFreq(
        TermStats.docFreq(old, "text", "doc_id"),
        TermStats.docFreq(fresh, "text", "doc_id"))) ==
        vmap(TermStats.docFreq(all, "text", "doc_id"))
    }

  property("substring spans: index-probe incremental == full build restricted to batch") =
    forAll(corpusGen) { case (docs, newIds) =>
      // the operator's contract is MONOTONIC daily ids — derive a
      // random cut (newIds.size is uniform in [0, n]) instead of using
      // the random-subset split the other indexes accept
      val cutId = (docs.size - newIds.size).toLong
      val all = docs.toDF("doc_id", "text")
      val old = all.filter($"doc_id" < cutId)
      val fresh = all.filter($"doc_id" >= cutId)
      def spans(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_id", "span_start", "span_end", "span_tokens")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      spans(SubstringDedup.nonCanonicalSpansIncremental(
          SubstringDedup.shingleIndex(old, "text", "doc_id", 2),
          fresh, "text", "doc_id", 2)) ==
        spans(SubstringDedup.nonCanonicalSpans(all, "text", "doc_id", 2)
          .filter($"doc_id" >= cutId))
    }

  property("substring spans: tombstone-excluded postings == from-scratch build without deleted") =
    forAll(corpusGen) { case (docs, _) =>
      // monotonic cut (the operator's id contract); deleted = every 3rd
      // of the indexed side — the takedown shape: postings built BEFORE
      // the deletion, then excluded by anti-join, then a batch probes
      val cutId = (docs.size * 4 / 5).toLong
      val all = docs.toDF("doc_id", "text")
      val old = all.filter($"doc_id" < cutId)
      val fresh = all.filter($"doc_id" >= cutId)
      val delIds = docs.map(_._1).filter(i => i < cutId && i % 3 == 1).toSet
      val tomb = delIds.toSeq.toDF("doc_id")
      val livePostings = SubstringDedup
        .shinglePostings(old, "text", "doc_id", 2)
        .join(tomb, Seq("doc_id"), "left_anti")
      val liveAll = all.filter(
        if (delIds.isEmpty) $"doc_id".isNotNull
        else !$"doc_id".isin(delIds.toSeq: _*))
      def spans(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_id", "span_start", "span_end", "span_tokens")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      spans(SubstringDedup.nonCanonicalSpansIncremental(
          livePostings, fresh, "text", "doc_id", 2)) ==
        spans(SubstringDedup.nonCanonicalSpans(liveAll, "text", "doc_id", 2)
          .filter($"doc_id" >= cutId))
    }

  property("shards: union of daily continueShards == one-shot day-major cumsum") =
    forAll(corpusGen) { case (docs, newIds) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{concat, floor, lit, sum, when}
      // token weights from word counts; two monotonic days at a random cut
      val cutId = (docs.size - newIds.size).toLong
      val all = docs.toDF("doc_id", "text")
        .withColumn("n_tokens",
          graft.functions.TextFunctions.tokenCount($"text").cast("long"))
        .select($"doc_id", $"n_tokens")
      val budget = 7L
      val state = java.nio.file.Files
        .createTempDirectory("shardprop").toString
      Sharding.continueShards(spark, all.filter($"doc_id" < cutId), state,
        "doc_id", "n_tokens", budget, batchId = 0L)
      Sharding.continueShards(spark, all.filter($"doc_id" >= cutId), state,
        "doc_id", "n_tokens", budget, batchId = 1L)
      val u = graft.functions.AuditableHash.h60(
        concat(lit("shard:"), $"doc_id".cast("string")))
      val w = Window
        .orderBy(when($"doc_id" < cutId, 0).otherwise(1), u, $"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val reference = all
        .withColumn("cum", sum($"n_tokens").over(w))
        .withColumn("shard_id", floor(($"cum" - $"n_tokens") / budget).cast("long"))
        .select("doc_id", "shard_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = spark.read.parquet(s"$state/shards")
        .select($"doc_id", $"shard_id".cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == reference
    }

  property("packing: union of daily continuePack == one-shot day-major offsets") =
    forAll(corpusGen) { case (docs, newIds) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{concat, lit, sum, when}
      val cutId = (docs.size - newIds.size).toLong
      val all = docs.toDF("doc_id", "text")
        .withColumn("n_tokens",
          graft.functions.TextFunctions.tokenCount($"text").cast("long"))
        .select($"doc_id", $"n_tokens")
      val b = 5L
      val state = java.nio.file.Files
        .createTempDirectory("packprop").toString
      Sharding.continuePack(spark, all.filter($"doc_id" < cutId), state,
        "doc_id", "n_tokens", b, batchId = 0L)
      Sharding.continuePack(spark, all.filter($"doc_id" >= cutId), state,
        "doc_id", "n_tokens", b, batchId = 1L)
      val u = graft.functions.AuditableHash.h60(
        concat(lit("pack:"), $"doc_id".cast("string")))
      val w = Window
        .orderBy(when($"doc_id" < cutId, 0).otherwise(1), u, $"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val reference = all
        .withColumn("cum", sum($"n_tokens").over(w))
        .select($"doc_id", ($"cum" - $"n_tokens").as("tok_start"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = spark.read.parquet(s"$state/packed")
        .select($"doc_id", $"tok_start")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == reference
    }

  // token stream → ≤3-token paragraphs: the 12-word alphabet makes
  // cross-doc paragraph collisions dense at tiny sizes
  private def paraText(text: String): String =
    text.split(" ").grouped(3).map(_.mkString(" ")).mkString("\n\n")

  private def paraKey(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long, Long, Long)] =
    df.select("doc_id", "text_dedup", "n_paras", "n_kept", "n_dropped")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  property("paragraphs: index-probe incremental == full build restricted to batch") =
    forAll(corpusGen) { case (docs, newIds) =>
      // monotonic cut — the paragraph index's id contract (spans' rule)
      val cutId = (docs.size - newIds.size).toLong
      val all = docs.map { case (i, t) => (i, paraText(t)) }.toDF("doc_id", "text")
      val old = all.filter($"doc_id" < cutId)
      val fresh = all.filter($"doc_id" >= cutId)
      paraKey(Dedup.paragraphDedupIncremental(
          Dedup.paraPostings(old, "text", "doc_id"), fresh, "text", "doc_id")) ==
        paraKey(Dedup.paragraphDedup(all, "text", "doc_id")
          .filter($"doc_id" >= cutId))
    }

  property("paragraphs: tombstone-excluded postings == from-scratch build without deleted") =
    forAll(corpusGen) { case (docs, _) =>
      val cutId = (docs.size * 4 / 5).toLong
      val all = docs.map { case (i, t) => (i, paraText(t)) }.toDF("doc_id", "text")
      val old = all.filter($"doc_id" < cutId)
      val fresh = all.filter($"doc_id" >= cutId)
      val delIds = docs.map(_._1).filter(i => i < cutId && i % 3 == 1).toSet
      val tomb = delIds.toSeq.toDF("doc_id")
      val livePostings = Dedup.paraPostings(old, "text", "doc_id")
        .join(tomb, $"id" === tomb("doc_id"), "left_anti")
      val liveAll = all.filter(
        if (delIds.isEmpty) $"doc_id".isNotNull
        else !$"doc_id".isin(delIds.toSeq: _*))
      paraKey(Dedup.paragraphDedupIncremental(
          livePostings, fresh, "text", "doc_id")) ==
        paraKey(Dedup.paragraphDedup(liveAll, "text", "doc_id")
          .filter($"doc_id" >= cutId))
    }
}
