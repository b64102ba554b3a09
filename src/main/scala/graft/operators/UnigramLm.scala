package graft.operators

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Unigram-LM subword tokenizer (Kudo 2018 — the SentencePiece model)
  * beside [[BpeVocab]]'s BPE: seed a substring vocabulary, run EM to
  * fit piece probabilities, segment by Viterbi-best path. Where BPE
  * GROWS a vocabulary by greedy merges, unigram PRUNES one by
  * re-estimation — the two tokenizer families production pipelines
  * choose between.
  *
  * Deliberate divergence from reference SentencePiece, for the repo's
  * determinism rule (the [[BpeVocab]] replace-quirk precedent): the EM
  * here is HARD EM (Viterbi E-step — each word type re-segments to its
  * single best path under the current costs; the M-step recounts piece
  * usage over those paths). Soft EM's forward-backward expected counts
  * are sums of float products that no SQL oracle reproduces
  * bit-for-bit; hard EM keeps every statistic an integer COUNT and
  * every score the exact fixed-point `cost_fp(piece) = log2fp(T) −
  * log2fp(cnt)` (the [[graft.plans.Log2Fp]] Q10 kernel, same units as
  * BM25 idf), so q169/q170 are DuckDB-hash-matched end-to-end. Hard EM
  * is itself standard (Viterbi training); expect slightly sparser
  * piece distributions than soft-EM SentencePiece.
  *
  * Scale shape — the corpus is touched once: [[BpeVocab.wordCounts]]
  * collapses it to the word-TYPE table, and every E/M step is one
  * aggregate over that table (the type/token gap that makes tokenizer
  * training tractable at 100 TB):
  *
  *  - E-step: the [[graft.plans.UnigramViterbi]] kernel — one
  *    expression node carrying the bounded vocabulary, O(len·L) per
  *    type — segments every type in a narrow map;
  *  - M-step: explode path pieces weighted by type count, one hash
  *    aggregate. Single-character pieces of the seed alphabet are
  *    retained with count 1 if EM stops using them, so every [a-z]
  *    word stays coverable and the per-round vocabulary (and its
  *    driver collect — the IvfIndex-codebook discipline) stays bounded
  *    by `topM + alphabet`, never by the type table.
  *
  * Words longer than [[MaxWordLen]] or containing out-of-alphabet
  * characters segment as one unsplit piece (the kernel fallback, which
  * the oracle reproduces as a coalesce over an unreachable DP).
  */
object UnigramLm {

  /** Word-length cap: longer words pass through unsplit. Matches the
    * oracle's DP unroll depth (and SentencePiece's own
    * max_sentencepiece_length ballpark).
    */
  val MaxWordLen = 16

  /** End-of-word marker appended per word at SEGMENTATION time (the
    * [[BpeVocab.EndOfWord]] convention), so a document's flattened
    * piece stream is lossless — word boundaries survive.
    */
  val EndOfWord: String = BpeVocab.EndOfWord

  /** The training type table: lowercased `^[a-z]+$` word types within
    * [[MaxWordLen]], with counts — one corpus pass.
    */
  def wordTypes(docs: DataFrame, textCol: String): DataFrame =
    BpeVocab.wordCounts(docs, textCol)
      .filter(length(col("word")) <= MaxWordLen)

  /** The seed's substring-count aggregate on its own: every substring
    * of every admitted word type up to `maxPieceLen` chars, weighted by
    * type count — `(piece, cnt)`, one aggregate over the type table.
    * Split out of [[seedVocab]] so a multi-dial sweep (q180) computes
    * it ONCE and cuts each dial's seed from the same cached frame: the
    * aggregate is identical for every `topM`, only the cut differs.
    */
  def substringCounts(types: DataFrame, maxPieceLen: Int): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    types
      .select(col("cnt"), explode(expr(
        s"flatten(transform(sequence(1, least(length(word), $maxPieceLen)), " +
          "l -> transform(sequence(1, length(word) - l + 1), " +
          "i -> substring(word, i, l))))")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))
  }

  /** The deterministic seed cut over a [[substringCounts]] frame: ALL
    * single characters (coverage floor) plus the `topM` highest-count
    * multi-character pieces (ties on the piece string ascending).
    */
  def seedFromCounts(subs: DataFrame, topM: Int): DataFrame = {
    require(topM >= 1, s"topM must be >= 1, got $topM")
    val singles = subs.filter(length(col("piece")) === 1)
    val multis = subs.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece")).limit(topM)
    singles.unionByName(multis)
  }

  /** Seed vocabulary `(piece, cnt)`: every substring of every admitted
    * word type up to `maxPieceLen` chars, weighted by type count —
    * ALL single characters (coverage floor) plus the `topM`
    * highest-count multi-character pieces (ties on the piece string
    * ascending, the deterministic cut).
    */
  def seedVocab(types: DataFrame, maxPieceLen: Int, topM: Int): DataFrame =
    seedFromCounts(substringCounts(types, maxPieceLen), topM)

  /** Fixed-point piece costs from a collected vocabulary:
    * `cost_fp = log2fp(T) − log2fp(cnt)` with `T = Σ cnt` — the
    * negative log-probability in Q10 bits, ≥ 0, exact. Bounded driver
    * work: the vocabulary is ≤ topM + alphabet rows by construction.
    */
  def costs(vocab: Seq[(String, Long)]): Seq[(String, Long)] = {
    val t = vocab.iterator.map(_._2).sum
    val lt = Dsir.log2Fp(t)
    vocab.map { case (p, c) => p -> (lt - Dsir.log2Fp(c)) }
  }

  private def collectVocab(vocab: DataFrame): Seq[(String, Long)] =
    vocab.select(col("piece"), col("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toIndexedSeq

  /** Viterbi-segmentation column under `pieceCosts` — one kernel node. */
  def viterbi(word: Column, pieceCosts: Seq[(String, Long)]): Column =
    ColumnBridge.column(graft.plans.UnigramViterbi(
      ColumnBridge.expression(word), pieceCosts, MaxWordLen))

  /** One hard-EM round: Viterbi-resegment every type under the current
    * costs, recount piece usage, restore any dropped single characters
    * of `singles` at count 1 (coverage floor). Pure per-type
    * aggregates — no corpus access.
    */
  def emRound(types: DataFrame, pieceCosts: Seq[(String, Long)],
      singles: DataFrame): DataFrame = {
    val recount = types
      .select(col("cnt"), viterbi(col("word"), pieceCosts).as("s"))
      .select(col("cnt"), explode(split(trim(col("s")), " ")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))
    recount.unionByName(
      singles.join(recount, Seq("piece"), "left_anti")
        .select(col("piece"), lit(1L).as("cnt")))
  }

  /** Train: seed + `rounds` hard-EM rounds. Returns the final
    * vocabulary `(piece, cnt, cost_fp)` — the q169 surface (costs are
    * what [[segment]] consumes; cnt is the training trace).
    */
  def train(spark: SparkSession, docs: DataFrame, textCol: String,
      maxPieceLen: Int = 4, topM: Int = 512, rounds: Int = 2): DataFrame = {
    val types = wordTypes(docs, textCol).cache()
    try trainFromCounts(spark, types, substringCounts(types, maxPieceLen),
      topM, rounds)
    finally types.unpersist()
  }

  /** [[train]] from a PREBUILT (typically cached) type table and its
    * [[substringCounts]] frame — the shared-scan form for multi-dial
    * sweeps (q180: three `topM` dials re-aggregated the same corpus
    * six times through [[train]]; this form pays one type-table scan
    * and one substring aggregate for ANY dial count). Value-identical
    * to [[train]] by construction — the seed cut, the EM rounds, and
    * the cost table are the same code (UnigramLmSpec pins equality).
    */
  def trainFromCounts(spark: SparkSession, types: DataFrame,
      subs: DataFrame, topM: Int, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val seed = seedFromCounts(subs, topM).cache()
    try {
      var vocab = collectVocab(seed)
      val singles = seed.filter(length(col("piece")) === 1).select(col("piece"))
      var r = 0
      while (r < rounds) {
        vocab = collectVocab(emRound(types, costs(vocab), singles))
        r += 1
      }
      val withCosts = costs(vocab)
      val cnts = vocab.toMap
      import spark.implicits._
      withCosts.map { case (p, cf) => (p, cnts(p), cf) }
        .toDF("piece", "cnt", "cost_fp")
    } finally seed.unpersist()
  }

  /** Final trained vocabulary as the cost list [[segment]] embeds. */
  def collectCosts(trained: DataFrame): Seq[(String, Long)] =
    trained.select(col("piece"), col("cost_fp")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toIndexedSeq

  /** Segment a corpus with a trained vocabulary: distinct word TYPES
    * segment once through the kernel (lowercased; out-of-alphabet and
    * over-length words pass through unsplit), each word's pieces gain
    * the [[EndOfWord]] marker (lossless boundaries), then tokens join
    * the type→pieces map and reassemble in position order — the
    * [[BpeVocab.segment]] shape: one explode, one join, one doc-id
    * aggregate, never a per-token DP.
    */
  def segment(df: DataFrame, textCol: String, idCol: String,
      pieceCosts: Seq[(String, Long)]): DataFrame = {
    val toks = df.select(col(idCol),
      posexplode(T.tokens(lower(col(textCol)))).as(Seq("pos", "word")))
    val types = toks.select(col("word")).distinct()
      .withColumn("s",
        concat(viterbi(col("word"), pieceCosts), lit(EndOfWord + " ")))
      .select(col("word"), split(trim(col("s")), " ").as("subwords"))
    toks.join(types, Seq("word"))
      .groupBy(col(idCol))
      .agg(flatten(array_sort(collect_list(struct(col("pos"), col("subwords"))))
        .getField("subwords")).as("unigram_tokens"))
      .withColumn("n_unigram_tokens", size(col("unigram_tokens")).cast("long"))
      .join(df, Seq(idCol), "right")
  }
}
