package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term statistics: per-document term frequency, corpus
  * document frequency, TF-IDF, and top-k distinctive terms per
  * document — the keyword/topic surface of a training-data pipeline
  * (used for topic balancing and quality filtering over web corpora).
  *
  * Scale shape: tokenize is a narrow map; `(doc, term)` TF is one
  * shuffle keyed on (doc, term); document frequency aggregates the TF
  * rows (already distinct per doc) keyed on term. The TF⋈DF join
  * shuffles on term — at web scale the DF side is the vocabulary
  * (millions of rows, not billions), so AQE turns it into a broadcast.
  * Ranking windows partition per document (bounded groups, no global
  * sort).
  */
object TermStats {

  /** One row per (document, term): `tf` (occurrences in the doc),
    * `df_docs` (documents containing the term), and `tfidf`
    * (tf · ln(N/df), the classic smoothed-free form). NULL/empty text
    * contributes no rows.
    */
  /** Per-(doc, term) occurrence counts — the shared first stage of
    * [[tfIdf]], [[docFreq]] and [[tfIdfAgainst]]. Tokenize is a narrow
    * map ([[Spread]]-parallelized on one-row-group corpora); one
    * shuffle keyed on (doc, term).
    */
  private def termFreq(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    Spread.auto(docs, col(idCol)).select(col(idCol),
        explode(split(lower(coalesce(col(textCol), lit(""))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  def tfIdf(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    // corpus size as a LAZY broadcast scalar (1-row cross join), not an
    // eager .count() — a construction-time job would run the full scan
    // even for callers that drop the tfidf column entirely (q58's
    // topTerms ranks on integer facts alone)
    val n = docs.agg(countDistinct(col(idCol)).cast("double").as("__n_docs"))
    val tf = termFreq(docs, textCol, idCol)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df_docs"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", col("tf") * log(col("__n_docs") / col("df_docs")))
      .select(col(idCol), col("term"), col("tf"), col("df_docs"), col("tfidf"))
  }

  /** The persistable vocabulary table `(term, df_docs)` — the
    * corpus-global half of TF-IDF, and the piece a daily pipeline must
    * NOT recompute from scratch: document frequency over disjoint
    * corpora is ADDITIVE (a term's df in old ∪ new = df(old) +
    * df(new), because df counts documents and the id sets are
    * disjoint), so the vocabulary maintains by [[mergeDocFreq]] with
    * the increment's own [[docFreq]] — one tokenize over the increment,
    * zero corpus work. Track corpus size (`n_docs`) alongside in the
    * caller's audit/control table, exactly like the watermark counts
    * the pipeline already keeps.
    */
  def docFreq(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    termFreq(docs, textCol, idCol)
      .groupBy(col("term")).agg(count(lit(1)).as("df_docs"))

  /** Additive vocabulary merge: `docFreq(a ∪ b) == mergeDocFreq(docFreq(a),
    * docFreq(b))` exactly for disjoint doc-id sets (TermStatsSpec
    * property). Union + one sum keyed on term — mergeable the same way
    * the HLL/Count-Min sketches are, so increments can also fold in a
    * streaming `foreachBatch`.
    */
  def mergeDocFreq(vocabs: DataFrame*): DataFrame = {
    require(vocabs.nonEmpty, "nothing to merge")
    vocabs.reduce(_ unionByName _)
      .groupBy(col("term")).agg(sum(col("df_docs")).as("df_docs"))
  }

  /** TF-IDF of a batch against a MAINTAINED vocabulary: the batch pays
    * its own tokenize + TF; the corpus-global statistic arrives as the
    * persisted `(term, df_docs)` table + the tracked corpus size. At
    * web scale the vocabulary is millions of rows against the batch's
    * billions — AQE broadcasts it. Terms the vocabulary has never seen
    * score NULL (no df fact to weigh them with — callers either treat
    * NULL as "novel term" or refresh the vocabulary first; silently
    * defaulting df=1 would overweight typos into every downstream
    * topic ranking).
    */
  def tfIdfAgainst(batch: DataFrame, textCol: String, idCol: String,
      vocab: DataFrame, nDocs: Long): DataFrame =
    tfIdfAgainstN(batch, textCol, idCol, vocab,
      batch.sparkSession.range(1).select(lit(nDocs.toDouble).as("__n_docs")))

  /** [[tfIdfAgainst]] with the corpus size as a LAZY 1-row frame
    * (column `__n_docs`, double) instead of an eager scalar — the
    * production path reads it from the persisted meta table, and a
    * query constructor can pass an aggregate (e.g.
    * `docs.agg(count(lit(1)).cast("double").as("__n_docs"))`) without
    * running a driver-blocking job at construction time. The 1-row
    * frame rides a broadcast cross join, same as [[tfIdf]]'s own
    * corpus-size scalar.
    */
  def tfIdfAgainstN(batch: DataFrame, textCol: String, idCol: String,
      vocab: DataFrame, nDocs: DataFrame): DataFrame =
    termFreq(batch, textCol, idCol)
      .join(vocab, Seq("term"), "left")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", col("tf") * log(col("__n_docs") / col("df_docs")))
      .select(col(idCol), col("term"), col("tf"), col("df_docs"), col("tfidf"))

  /** Intra-document n-gram repetition — the Gopher/RefinedWeb-family
    * quality rule that single-token stats can't see: templated or
    * looping text has many *repeated* n-grams. Per document: total
    * n-gram occurrences, distinct n-grams, and
    * `rep_ratio = round((total − distinct) / total, 6)` (NULL when the
    * document has fewer than `n` tokens — no n-grams to judge).
    * Shape: token explode (`Spread`-parallelized) → window leads keyed
    * on the doc id → one aggregate on the same key. Duplicates matter
    * here, so this counts raw grams, not [[Dedup.shingleRows]]'s sets.
    */
  def nGramRepetition(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame = {
    import graft.functions.{TextFunctions => T}
    val toks = Spread.auto(docs, col(idCol))
      .select(col(idCol), posexplode(T.tokens(lower(col(textCol)))))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "tok")
    val w = Window.partitionBy(col(idCol)).orderBy(col("p"))
    val parts = col("tok") +: (1 until n).map(j => lead(col("tok"), j).over(w))
    val grams = toks
      .withColumn("gram", concat_ws(" ", parts: _*))
      .withColumn("__full", lead(col("tok"), n - 1).over(w).isNotNull)
      .filter(col("__full"))
    val agg = grams.groupBy(col(idCol)).agg(
      count(lit(1)).as("total"),
      countDistinct(col("gram")).as("dist"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("total"), lit(0L)).as("n_grams"),
        coalesce(col("dist"), lit(0L)).as("n_distinct"),
        round((col("total") - col("dist")).cast("double") / col("total"), 6)
          .as("rep_ratio"))
  }

  /** Top-k most distinctive terms per document, ranked by pure integer
    * facts — tf descending (most frequent), then df ascending (most
    * distinctive), then term — so the ranking is exact and
    * engine-portable (the double `tfidf` orders identically when tf
    * ties break by df, but floats never decide a rank here).
    */
  def topTerms(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df_docs").asc, col("term").asc)
    tfIdf(docs, textCol, idCol)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  private def log2fp(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.Log2Fp(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))

  /** PMI collocation mining: the top-k adjacent word pairs by
    * pointwise mutual information — the lexicon-induction /
    * multiword-expression surface ("new york", "machine learning") a
    * corpus analyst asks for before building tokenizers or phrase
    * filters. `pmi = log2(p(ab) / (p(a)·p(b)))` with `p(ab) =
    * c_ab/T_bi`, `p(w) = c_w/T_uni`, DEFINED in fixed point as the
    * sum/difference of [[graft.plans.Log2Fp]] floors —
    * `log2fp(c_ab) + 2·log2fp(T_uni) − log2fp(T_bi) − log2fp(c_a) −
    * log2fp(c_b)` — so the score is exact integer arithmetic, order-free
    * and oracle-reproducible (floors of factors, not floor of the
    * ratio; both engines compute the identical expression). `minCount`
    * is the standard PMI degeneracy guard: rare pairs otherwise
    * dominate (a hapax bigram of two hapax words maxes the score).
    *
    * Scale shape: tokenize + adjacent-pair zip are narrow maps riding
    * the corpus scan ([[Spread]]-parallelized); unigram and bigram
    * counts are two vocabulary-keyed hash aggregates (map-side
    * partials kill the per-document duplication); the two unigram
    * joins key on words — vocabulary-sized, AQE broadcasts them; the
    * corpus totals ride a broadcast 1-row cross join; top-k is
    * TakeOrderedAndProject, never a global sort.
    */
  def collocations(docs: DataFrame, textCol: String, idCol: String,
      minCount: Long = 5L, k: Int = 100): DataFrame = {
    val toks = Spread.auto(docs, col(idCol)).select(
      filter(split(lower(coalesce(col(textCol), lit(""))), "\\s+"),
        t => t =!= "").as("__w"))
    val pairLen = greatest(size(col("__w")) - 1, lit(0))
    // the two count tables are read three ways each (totals, the w1
    // join, the w2 join) — lazily local-checkpointed so the corpus is
    // tokenized exactly TWICE (once per n-gram order), not five times,
    // and the reuses hit vocabulary-sized cached blocks (the
    // DedupCluster.iterative precedent for query-path checkpoints)
    val uni = toks.select(explode(col("__w")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    val bi = toks.select(explode(zip_with(
        slice(col("__w"), lit(1), pairLen), slice(col("__w"), lit(2), pairLen),
        (a, b) => concat(a, lit(" "), b))).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c_ab"))
      .localCheckpoint(eager = false)
    // totals BEFORE the support filter — probabilities are over the
    // whole corpus, not the surviving candidates
    val totals = broadcast(
      uni.agg(sum(col("cnt")).as("__tu"))
        .crossJoin(broadcast(bi.agg(sum(col("c_ab")).as("__tb")))))
    bi.filter(col("c_ab") >= minCount)
      .select(substring_index(col("b"), " ", 1).as("w1"),
        substring_index(col("b"), " ", -1).as("w2"), col("c_ab"))
      .join(uni.select(col("w").as("w1"), col("cnt").as("__ca")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cnt").as("__cb")), Seq("w2"))
      .crossJoin(totals)
      .select(col("w1"), col("w2"), col("c_ab"),
        (log2fp(col("c_ab")) + lit(2L) * log2fp(col("__tu")) -
          log2fp(col("__tb")) - log2fp(col("__ca")) - log2fp(col("__cb")))
          .as("pmi_fp"))
      .orderBy(col("pmi_fp").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Corpus n-gram DIVERSITY report — distinct-n (Li et al., NAACL
    * 2016) per n: total n-gram occurrences (repeats included — the
    * repetition signal), distinct n-grams, and their exact-integer
    * ratio in ppm. The dial synthetic/generated training data is
    * audited with: mode-collapsed generations repeat n-grams, so
    * distinct-2/distinct-3 crater long before any metadata column
    * notices; rising totals with flat distincts on a crawl mean
    * boilerplate growth (the dedup families remove it — this measures
    * it). Tokenizer is the family convention (lowercase, whitespace,
    * empty docs contribute nothing).
    *
    * Scale shape: ONE corpus scan for ALL ns (r14 verdict task 5 —
    * the per-n form paid one full pass per entry): a single explode
    * emits `(n, ngram)` pairs for every n at once, then one grouped
    * partial/final aggregate per n-value (the `countDistinct` expands
    * once; no joins, nothing driver-side). PlanQualitySpec pins the
    * one-FileScan shape.
    */
  def ngramDiversity(docs: DataFrame, textCol: String,
      ns: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    import graft.functions.{TextFunctions => T}
    require(ns.nonEmpty && ns.forall(n => n >= 1 && n <= 8),
      s"ns must be non-empty with every n in [1, 8], got $ns")
    // per doc: concat of each n's (n, ngram) struct array — one pass
    // emits every n's multiset; rows explode to Σ_n (len − n + 1)
    val perN = ns.distinct.sorted.map { n =>
      s"CASE WHEN size(tk) < $n THEN array() " +
        s"ELSE transform(sequence(0, size(tk) - $n), " +
        s"i -> struct(CAST($n AS INT) AS n, " +
        s"array_join(slice(tk, i + 1, $n), ' ') AS ngram)) END"
    }
    val byN = docs.select(T.tokens(lower(col(textCol))).as("tk"))
      .select(explode(expr(perN.mkString("concat(", ", ", ")"))).as("g"))
      .groupBy(col("g.n").as("n"))
      .agg(count(lit(1)).as("total_ngrams"),
        countDistinct(col("g.ngram")).as("distinct_ngrams"))
    // a corpus whose every doc is shorter than n emits no (n, ngram)
    // rows at all — re-seat those ns as explicit zero rows so the
    // report's shape is the ns list, not the data (the per-n form
    // always returned one row per n; value-identical contract)
    import docs.sparkSession.implicits._
    ns.distinct.sorted.toDF("n")
      .join(byN, Seq("n"), "left")
      .select(col("n"),
        coalesce(col("total_ngrams"), lit(0L)).as("total_ngrams"),
        coalesce(col("distinct_ngrams"), lit(0L)).as("distinct_ngrams"))
      .withColumn("distinct_ppm",
        when(col("total_ngrams") > 0,
          expr("distinct_ngrams * 1000000 DIV total_ngrams"))
          .otherwise(lit(0L)))
  }
}
