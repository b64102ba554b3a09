package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala hard-EM reference (no Spark) — guards the distributed
    * seed/E/M plumbing and the Viterbi kernel against each other.
    */
  private object Ref {
    def wordCounts(docs: Seq[String]): Map[String, Long] =
      docs.flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
        .filter(w => w.matches("^[a-z]+$") && w.length <= UnigramLm.MaxWordLen)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap

    def seed(types: Map[String, Long], maxL: Int, topM: Int): Map[String, Long] = {
      val subs = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for ((w, c) <- types; l <- 1 to math.min(maxL, w.length);
           i <- 0 to w.length - l)
        subs(w.substring(i, i + l)) += c
      val singles = subs.filter(_._1.length == 1)
      val multis = subs.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(topM)
      (singles ++ multis).toMap
    }

    def costs(vocab: Map[String, Long]): Map[String, Long] = {
      val t = vocab.values.sum
      val lt = Dsir.log2Fp(t)
      vocab.map { case (p, c) => p -> (lt - Dsir.log2Fp(c)) }
    }

    def viterbi(w: String, cost: Map[String, Long], maxL: Int): Seq[String] = {
      if (w.isEmpty || w.length > UnigramLm.MaxWordLen) return Seq(w)
      val INF = Long.MaxValue / 4
      val dc = Array.fill(w.length + 1)(INF)
      val dp = new Array[String](w.length + 1)
      dc(0) = 0; dp(0) = ""
      for (j <- 1 to w.length; l <- 1 to math.min(maxL, j)) {
        if (dc(j - l) < INF) cost.get(w.substring(j - l, j)).foreach { c =>
          val cand = dc(j - l) + c
          if (cand <= dc(j)) {
            val p = dp(j - l) + " " + w.substring(j - l, j)
            if (cand < dc(j) || p.compareTo(dp(j)) < 0) { dc(j) = cand; dp(j) = p }
          }
        }
      }
      if (dc(w.length) >= INF) Seq(w) else dp(w.length).trim.split(" ").toSeq
    }

    def train(docs: Seq[String], maxL: Int, topM: Int,
        rounds: Int): Map[String, Long] = {
      val types = wordCounts(docs)
      val seeded = seed(types, maxL, topM)
      val singles = seeded.keySet.filter(_.length == 1)
      var vocab = seeded
      for (_ <- 1 to rounds) {
        val cost = costs(vocab)
        val recount = scala.collection.mutable.Map[String, Long]()
          .withDefaultValue(0L)
        for ((w, c) <- types; p <- viterbi(w, cost, maxL)) recount(p) += c
        vocab = recount.toMap ++
          singles.filterNot(recount.contains).map(_.toString -> 1L).toMap
      }
      vocab
    }
  }

  private val corpus = Seq(
    "the cat sat on the mat", "the cats sat", "a catalog of cats",
    "mat and cat and hat", "the the the", "zebra zealot zeal",
    "internationalization is long", "hat mat rat splat",
    "catamaran catalog cat", "on and on and on")

  test("train matches the plain-Scala hard-EM reference (seed cut, Q10 " +
      "costs, Viterbi tie-break, recount, singles floor)") {
    val ref = Ref.train(corpus, maxL = 4, topM = 32, rounds = 2)
    val got = UnigramLm.train(spark, corpus.zipWithIndex.map(_.swap).toDF("id", "text"),
        "text", maxPieceLen = 4, topM = 32, rounds = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.view.mapValues(_._1).toMap == ref,
      s"counts diverged: got=${got.view.mapValues(_._1).toMap}\nref=$ref")
    val refCosts = Ref.costs(ref)
    assert(got.view.mapValues(_._2).toMap == refCosts)
  }

  test("segmentation is lossless: stripping </w> markers and joining " +
      "pieces reproduces the lowercased token stream (incl. non-alpha " +
      "and over-length words via the unsplit fallback)") {
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "Hello, WORLD! 42 times"),                // non-alpha fallback
      (3L, "internationalizations considered harmful"), // 20 chars: fallback
      (4L, null.asInstanceOf[String]),
      (5L, "")).toDF("doc_id", "text")
    val vocab = UnigramLm.collectCosts(UnigramLm.train(spark,
      corpus.zipWithIndex.map(_.swap).toDF("id", "text"), "text",
      maxPieceLen = 4, topM = 32, rounds = 2))
    val out = UnigramLm.segment(docs, "text", "doc_id", vocab)
      .select(col("doc_id"), col("unigram_tokens")).collect()
      .map(r => r.getLong(0) ->
        Option(r.getSeq[String](1)).getOrElse(Seq.empty)).toMap
    for ((id, text) <- Seq(1L -> "the cat sat",
        2L -> "Hello, WORLD! 42 times",
        3L -> "internationalizations considered harmful")) {
      val words = text.toLowerCase.trim.split("\\s+").toSeq
      // rebuild words by cutting at </w> markers
      val rebuilt = out(id).foldLeft((Seq.empty[String], "")) {
        case ((done, cur), UnigramLm.EndOfWord) => (done :+ cur, "")
        case ((done, cur), piece) => (done, cur + piece)
      }._1
      assert(rebuilt == words, s"doc $id: $rebuilt != $words")
    }
    assert(out(4L).isEmpty && out(5L).isEmpty)
  }

  test("trainFromCounts over a shared type table == train, at every " +
      "sweep dial (the q180 shared-scan form)") {
    val df = corpus.zipWithIndex.map(_.swap).toDF("id", "text")
    val types = UnigramLm.wordTypes(df, "text").cache()
    val subs = UnigramLm.substringCounts(types, 4).cache()
    try for (m <- Seq(8, 32, 64)) {
      val shared = UnigramLm.trainFromCounts(spark, types, subs, m, 2)
        .orderBy(col("cnt").desc, col("piece")).collect().map(_.toString).toSeq
      val plain = UnigramLm.train(spark, df, "text",
          maxPieceLen = 4, topM = m, rounds = 2)
        .orderBy(col("cnt").desc, col("piece")).collect().map(_.toString).toSeq
      assert(shared == plain, s"shared-counts training diverged at topM=$m")
    } finally { subs.unpersist(); types.unpersist(): Unit }
  }

  test("partitioning-invariant: 1 vs 13 partitions train the identical " +
      "vocabulary and segment identically") {
    val df = corpus.zipWithIndex.map(_.swap).toDF("id", "text")
    def run(parts: Int) = UnigramLm.train(spark, df.repartition(parts),
        "text", maxPieceLen = 4, topM = 32, rounds = 2)
      .orderBy(col("cnt").desc, col("piece"))
      .collect().map(_.toString).toSeq
    assert(run(1) == run(13))
  }

  test("EM actually moves: round-2 vocabulary differs from the seed and " +
      "drops unused pieces while keeping the singles floor") {
    val df = corpus.zipWithIndex.map(_.swap).toDF("id", "text")
    val types = UnigramLm.wordTypes(df, "text")
    val seed = UnigramLm.seedVocab(types, 4, 32)
      .collect().map(r => r.getString(0)).toSet
    val trained = UnigramLm.train(spark, df, "text", 4, 32, 2)
      .collect().map(r => r.getString(0)).toSet
    assert(trained.size < seed.size) // pruning happened
    val alphabet = seed.filter(_.length == 1)
    assert(alphabet.subsetOf(trained)) // coverage floor holds
  }
}
