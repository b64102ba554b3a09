package graft.operators

import graft.functions.{AuditableHash => H, TextFunctions => T, VectorFunctions => V}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus deduplication operators for training-data pipelines, designed
  * shuffle-light for 100 TB:
  *
  *  - exact / canonical-form dedup: one hash-partition shuffle on a
  *    16-byte digest — the only all-to-all exchange, on tiny keys.
  *  - MinHash + LSH: signatures are per-row narrow maps; only the
  *    (band, bandHash) pairs shuffle, and candidate verification joins
  *    band buckets, never the cross product.
  *  - SimHash: per-row 64-bit signature; candidates via chunk buckets.
  *  - n-gram Jaccard / embedding cosine: exact verification within
  *    blocked candidate groups only.
  *
  * Sketch hashing (MinHash, SimHash) uses the md5-derived
  * [[graft.functions.AuditableHash]] family — stable across runs,
  * executors, and engines (no RNG at runtime), so signatures are
  * reproducible by the SQL oracle bit-for-bit. Interior join keys that
  * never surface in results (n-gram shingle ids) stay on xxhash64.
  */
object Dedup {

  /** Signature-agreement count via the native codegen'd
    * [[graft.plans.LongArrayEqCount]] — the per-candidate-pair kernel
    * of MinHash verification (the HOF form
    * `size(filter(zip_with(a,b,_===_),p=>p))` interprets per pair).
    */
  private def eqCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.LongArrayEqCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Exact duplicate marking: every row keeps its identity, gains its
    * content digest, the canonical (minimum) id of its duplicate group,
    * and an `is_duplicate` flag. One shuffle on the digest.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = md5(col(textCol).cast("binary"))
    val w  = Window.partitionBy(col("content_md5"))
    df.withColumn("content_md5", fp)
      .withColumn("canonical_id", min(col(idCol)).over(w))
      .withColumn("is_duplicate", col(idCol) =!= col("canonical_id"))
  }

  /** Canonical-form dedup: same, keyed on the normalized-text
    * fingerprint (case/punctuation/whitespace-insensitive).
    */
  def canonical(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("content_fp"))
    df.withColumn("content_fp", T.contentFingerprint(col(textCol)))
      .withColumn("canonical_id", min(col(idCol)).over(w))
      .withColumn("is_duplicate", col(idCol) =!= col("canonical_id"))
  }

  /** Corpus-wide exact PARAGRAPH dedup with text rebuild (the
    * RefinedWeb / Falcon recipe: boilerplate paragraphs — nav bars,
    * cookie banners, newsletter footers — repeat across millions of
    * pages; only the first occurrence corpus-wide survives).
    *
    * Shape for 100 TB: split is a narrow map; the first-occurrence
    * election is ONE hash aggregate on the 16-byte paragraph digest
    * (map-side combine collapses hot boilerplate before the exchange —
    * the same reasoning as the span-dedup stage-2 mark), the keep
    * decision is an equi-join on that digest (AQE skew-splittable),
    * and the rebuild is one aggregate on the doc id. No windows over
    * unpartitioned data, no driver materialization.
    *
    * Keep rule: a paragraph occurrence survives iff it is empty
    * (structure, never deduped) or it is the minimum `(id, position)`
    * occurrence of its digest corpus-wide. Output: one row per doc —
    * `id, text_dedup, n_paras, n_kept, n_dropped`. Documents with NULL
    * text are passed through with NULL `text_dedup` and zero counts.
    *
    * @param sep paragraph separator LITERAL (default two newlines);
    *   split and rebuild both use it, so `n_dropped == 0` implies
    *   `text_dedup == text`.
    */
  def paragraphDedup(df: DataFrame, textCol: String, idCol: String,
      sep: String = "\n\n"): DataFrame = {
    val paras = explodedParas(df, textCol, idCol, sep)
    // min(struct) elects the lexicographically first (id, pos) per
    // digest — an aggregate, not a window, so partial aggregation
    // collapses boilerplate paragraphs map-side.
    val firsts = paras.filter(col("para") =!= "")
      .groupBy(col("para_md5"))
      .agg(min(struct(col("id"), col("pos"))).as("first"))
    rebuildParas(df, idCol, paras, firsts, sep)
  }

  /** Occurrence rows of [[paragraphDedup]]'s split: `(id, pos, para,
    * para_md5)`, one per paragraph per doc, empties included (the keep
    * rule needs them), NULL docs excluded.
    */
  private def explodedParas(df: DataFrame, textCol: String, idCol: String,
      sep: String): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep), -1))
          .as(Seq("pos", "para")))
      .withColumn("para_md5", md5(col("para").cast("binary")))

  /** Shared keep-join + ordered-rebuild tail of the paragraph-dedup
    * family: occurrences left-join the elected firsts, survivors
    * reassemble per doc, docs outside `paras` (NULL text) pass through
    * with NULL `text_dedup`.
    */
  private def rebuildParas(df: DataFrame, idCol: String, paras: DataFrame,
      firsts: DataFrame, sep: String): DataFrame = {
    val kept = paras
      .join(firsts, Seq("para_md5"), "left")
      .withColumn("keep", col("para") === "" ||
        (col("first.id") === col("id") && col("first.pos") === col("pos")))
    val rebuilt = kept
      .groupBy(col("id"))
      .agg(
        concat_ws(sep,
          array_sort(collect_list(when(col("keep"), struct(col("pos"), col("para")))))
            .getField("para")).as("text_dedup"),
        count(lit(1)).as("n_paras"),
        sum(col("keep").cast("long")).as("n_kept"),
        sum((!col("keep")).cast("long")).as("n_dropped"))
    df.select(col(idCol).as("id"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id").as(idCol),
        col("text_dedup"),
        coalesce(col("n_paras"), lit(0L)).as("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
  }

  /** The persistable state of incremental paragraph dedup: one row per
    * non-empty `(paragraph digest, doc, position)` occurrence — the
    * [[SubstringDedup.shinglePostings]] discipline at paragraph
    * granularity. Full attribution is what buys the two production
    * properties the bare first-occurrence map cannot give:
    * **deletion** (a takedown anti-joins its doc ids off the postings
    * and the next probe's election falls to the next-earliest
    * occurrence automatically) and **replay safety** (a replayed
    * batch's own rows are excludable by id). Persist partitioned /
    * bucketed by `para_md5` so probes shuffle only the increment.
    */
  def paraPostings(df: DataFrame, textCol: String, idCol: String,
      sep: String = "\n\n"): DataFrame =
    explodedParas(df, textCol, idCol, sep)
      .filter(col("para") =!= "")
      .select(col("para_md5"), col("id"), col("pos"))

  /** Incremental [[paragraphDedup]]: rebuild a daily `batch` of NEW
    * documents against the accumulated corpus without re-reading it —
    * the election runs over the persisted [[paraPostings]] RESTRICTED
    * to the batch's digests (one semi-join; everything downstream is
    * increment-sized) unioned with the batch's own occurrences. Under
    * the monotonic-id contract (new ids exceed indexed ids, the
    * CorpusJob discipline) batch verdicts equal the one-shot
    * [[paragraphDedup]] over index ∪ batch restricted to the batch.
    * Callers append [[paraPostings]] of the batch to the state table.
    */
  def paragraphDedupIncremental(postings: DataFrame, batch: DataFrame,
      textCol: String, idCol: String, sep: String = "\n\n"): DataFrame = {
    val paras = explodedParas(batch, textCol, idCol, sep)
    val bpost = paras.filter(col("para") =!= "")
      .select(col("para_md5"), col("id"), col("pos"))
    val relevant = postings.select(col("para_md5"), col("id"), col("pos"))
      .join(bpost.select(col("para_md5")).distinct(), Seq("para_md5"), "left_semi")
    val firsts = relevant.unionByName(bpost)
      .groupBy(col("para_md5"))
      .agg(min(struct(col("id"), col("pos"))).as("first"))
    rebuildParas(batch, idCol, paras, firsts, sep)
  }

  /** Word n-gram shingle rows: (id, keepCols…, shingle), one row per
    * *distinct* shingle per document — now a pure narrow map: the
    * native one-pass [[graft.plans.WordShingles]] emits each document's
    * finished shingle set, so shingling rides the scan and the first
    * exchange of every consumer (q22 signatures, q24 pair join, q37/q50
    * annotate) is the join/aggregate itself. Output strings are
    * byte-identical to the relational window form below
    * (differential-tested), so downstream hashes and oracles are
    * unchanged. NULL text coalesces to "" first (the relational form
    * kept one "" shingle for null docs — no row may vanish).
    */
  private[operators] def shingleRows(
      df: DataFrame, textCol: String, idCol: String,
      keepCols: Seq[String], n: Int, spreadByKey: Boolean = true): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val sh = ColumnBridge.column(graft.plans.WordShingles(
      ColumnBridge.expression(lower(coalesce(col(textCol), lit("")))), n))
    // Spread BEFORE the explosion: shingling multiplies both row count
    // and per-row CPU, so an under-partitioned scan (one row group =
    // one task) serializes the whole pipeline; keying by id lets the
    // consumers' groupBy(id) reuse the partitioning (no-op at real
    // scale). spreadByKey=false round-robins instead, for the one
    // consumer (Dedup.signatures) that WANTS its aggregate to insert
    // an exchange as a multi-consumer stage-reuse point.
    val spread = if (spreadByKey) Spread.auto(df, col(idCol))
                 else Spread.autoRoundRobin(df)
    spread
      .select(col(idCol).as("id") +: keepCols.map(col) :+ explode(sh).as("shingle"): _*)
  }

  /** Reference relational form of [[shingleRows]] (posexplode + window
    * leads + dropDuplicates) — kept for the differential test; the
    * round-1 measurement that motivated it (HOF `transform`/`slice`
    * lambdas interpret at ~20µs/shingle) still holds, the native
    * expression just removes this form's id-exchange and two window
    * passes as well.
    */
  private[operators] def shingleRowsRelational(
      df: DataFrame, textCol: String, idCol: String,
      keepCols: Seq[String], n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keep = keepCols.map(col)
    val toksRaw = T.tokens(lower(col(textCol)))
    // empty docs emit one "" token so they keep their (single, empty)
    // shingle row — no row vanishes from dedup (wordShingles contract)
    val toksAll = when(size(toksRaw) === 0, array(lit(""))).otherwise(toksRaw)
    val toks = df.select(col(idCol).as("id") +: keep :+ posexplode(toksAll): _*)
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "tok")
    val w = Window.partitionBy(col("id")).orderBy(col("p"))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val grams = col("tok") +: (1 until n).map(j => lead(col("tok"), j).over(w))
    // Documents shorter than n tokens contribute one whole-text shingle:
    // on their p=0 row every token is within the first n-1 leads and
    // concat_ws skips the null tail, so the same expression yields the
    // joined text. Keeping this in ONE branch (vs. the old union of a
    // separate short-doc scan) preserves the id-partitioning end-to-end:
    // the n-gram window, the token count, dropDuplicates, and every
    // downstream per-id aggregate all reuse the single exchange the
    // explode introduced — a union would erase the partitioning and
    // force a second full shuffle of the shingle set.
    val cnt = count(lit(1)).over(wAll)
    toks
      .select(col("id") +: keep :+ concat_ws(" ", grams: _*).as("shingle")
        :+ (grams.last.isNotNull || (col("p") === 0 && cnt < n)).as("__keep"): _*)
      .filter(col("__keep")).drop("__keep")
      .dropDuplicates("id", "shingle")
  }

  /** Karp–Rabin rolling-hash fingerprints: one 30-bit hash per
    * `w`-character window of the *canonical* text (lowercased,
    * non-alphanumerics collapsed to single spaces — keeps every code
    * point in ASCII so the char→int map is identical in every engine).
    * `h(pos) = (Σ_{j<w} code(c_{pos+j})·31^(w-1-j)) mod 2^30` — the
    * full polynomial is ≤ 122·31^(w-1)·w < 2^63 for w ≤ 10, so both
    * engines compute the exact integer and mod once; no simulated
    * modular arithmetic to keep in sync.
    *
    * Returns one row per distinct window hash per document
    * `(id, rh)` — the substring-level fingerprint set (chunk-level
    * containment/overlap detection, where the document-level
    * [[exact]]/[[canonical]] digests can't see partial copies). Same
    * relational shape as [[shingleRows]]: posexplode chars + window
    * leads, codegen end-to-end, one exchange on `id`.
    */
  def rollingFingerprints(
      df: DataFrame, textCol: String, idCol: String, w: Int = 8): DataFrame = {
    require(w >= 2 && w <= 10, s"window $w outside [2,10] (2^63 overflow bound)")
    val canon = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", " "), " +", " "))
    val chars = Spread.auto(df, col(idCol))
      .select(col(idCol).as("id"), posexplode(split(canon, "")))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "ch")
    val win = Window.partitionBy(col("id")).orderBy(col("p"))
    val codes = ascii(col("ch")).cast("long") +:
      (1 until w).map(j => ascii(lead(col("ch"), j).over(win)).cast("long"))
    val poly = codes.zipWithIndex.map { case (c, j) =>
      c * math.pow(31, w - 1 - j).toLong
    }.reduce(_ + _)
    chars
      .select(col("id"), col("p"), lead(col("ch"), w - 1).over(win).isNotNull.as("__full"),
        (poly % lit(1073741824L)).as("rh"))
      .filter(col("__full"))
      .select("id", "rh")
      .dropDuplicates("id", "rh")
  }

  /** Content-defined chunking over the canonical text: a chunk
    * boundary falls after character `q+w-1` wherever the rolling hash
    * of the window starting at `q` satisfies `rh % avgSize == avgSize-1`
    * — so chunk borders move WITH the content (insert one word and
    * only the containing chunk's digest changes; fixed-size blocks
    * would shift every subsequent block). The chunk-digest set is the
    * storage/dataset dedup primitive for partially-overlapping
    * documents.
    *
    * Returns `(id, chunk_no, chunk_md5, chunk_len)`, one row per chunk
    * in document order. All integer/window logic over the same char
    * explode as [[rollingFingerprints]] — engine-exact, so the SQL
    * oracle reproduces chunk identity bit-for-bit.
    */
  def cdcChunks(
      df: DataFrame, textCol: String, idCol: String,
      w: Int = 8, avgSize: Int = 64): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val canon = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", " "), " +", " "))
    val chunks = ColumnBridge.column(graft.plans.CdcChunks(
      ColumnBridge.expression(canon), w, avgSize))
    Spread.auto(df, col(idCol))
      .select(col(idCol).as("id"), posexplode(chunks))
      .select(col("id"), col("pos").cast("long").as("chunk_no"),
        col("col.chunk_md5").as("chunk_md5"), col("col.chunk_len").as("chunk_len"))
  }

  /** Reference relational form of [[cdcChunks]] — char explode + two
    * windows + sort-aggregate. Kept for differential testing (the
    * native expression must reproduce it row-for-row); at corpus scale
    * the narrow-map expression replaces ~1500 intermediate rows per
    * document with one.
    */
  def cdcChunksRelational(
      df: DataFrame, textCol: String, idCol: String,
      w: Int = 8, avgSize: Int = 64): DataFrame = {
    require(w >= 2 && w <= 10, s"window $w outside [2,10]")
    require(avgSize >= 2 && (avgSize & (avgSize - 1)) == 0, "avgSize must be a power of two")
    val canon = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", " "), " +", " "))
    val chars = df
      .select(col(idCol).as("id"), posexplode(split(canon, "")))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "ch")
      .filter(col("ch") =!= "") // empty canon explodes to one "" row
    val win = Window.partitionBy(col("id")).orderBy(col("p"))
    val codes = ascii(col("ch")).cast("long") +:
      (1 until w).map(j => ascii(lead(col("ch"), j).over(win)).cast("long"))
    val poly = codes.zipWithIndex.map { case (c, j) =>
      c * math.pow(31, w - 1 - j).toLong
    }.reduce(_ + _)
    // marker at window-START positions; the boundary it defines closes
    // after char p+w-1, so a char's chunk counts markers ≤ its p-w
    val marked = chars.withColumn("m",
      when((poly % lit(1073741824L)) % avgSize === (avgSize - 1), 1L).otherwise(0L))
    val chunkNo = sum(col("m")).over(
      win.rowsBetween(Window.unboundedPreceding, -w))
    marked
      .withColumn("chunk_no", coalesce(chunkNo, lit(0L)))
      .groupBy(col("id"), col("chunk_no"))
      .agg(count(lit(1)).as("chunk_len"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("p"), col("ch")))),
            x => x.getField("ch")), "")).as("chunk_md5"))
      .select("id", "chunk_no", "chunk_md5", "chunk_len")
  }

  /** Partial-copy candidate pairs from shared CDC chunks: two documents
    * pair iff they share ≥ `minShared` chunk digests; `containment` =
    * shared / min(chunks_a, chunks_b) — 1.0 when one document's chunk
    * set is inside the other's (the quote/excerpt case document-level
    * digests and even MinHash resemblance underweight). Same join shape
    * as [[ngramJaccard]] (chunk_md5 keys instead of shingle hashes —
    * far fewer rows per doc, so the candidate space shrinks with
    * `avgSize`); set sizes ride the chunk rows as a window count so the
    * self-join's sides stay identical plans (one exchange, reused).
    */
  def chunkOverlapPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      w: Int = 8,
      avgSize: Int = 64,
      minShared: Int = 2,
      maxChunkDf: Int = 0): DataFrame = {
    val ch = cdcChunks(df, textCol, idCol, w, avgSize)
      .select(col("id"), col("chunk_md5"))
      .dropDuplicates("id", "chunk_md5")
      .withColumn("n_chunks", count(lit(1)).over(Window.partitionBy(col("id"))))
    // `maxChunkDf` is the hot-chunk stop list — the self-join emits
    // ~df²/2 pairs PER CHUNK, so one boilerplate chunk held by a
    // million documents is a trillion-pair bomb no amount of shuffle
    // tuning survives. Chunks above the cap carry no dedup signal
    // anyway (evidence shared by that many documents is boilerplate,
    // not duplication — the similarity-join stop-word discipline), so
    // they drop from the PAIR EVIDENCE while still counting in each
    // doc's `n_chunks` denominator (containment stays honest: a doc
    // that shares only boilerplate scores low, not undefined).
    // 0 = uncapped (the exact form the q48/q52 oracles pin); at corpus
    // scale pass a bound — pairs per chunk are then ≤ maxChunkDf²/2,
    // and SCALE_r10 measures the 100× point with it.
    val evidence =
      if (maxChunkDf <= 0) ch
      else {
        val hot = ch.groupBy(col("chunk_md5"))
          .agg(count(lit(1)).as("__df"))
          .filter(col("__df") > maxChunkDf)
          .select(col("chunk_md5"))
        ch.join(hot, Seq("chunk_md5"), "left_anti")
      }
    // SHUFFLE_HASH on both sides: left alone Spark broadcasts one side
    // at small scale, planning the two sides as different subtrees — the
    // whole chunk pipeline (native CDC expression + dedup + window)
    // executes twice, and a corpus-sized chunk table can never broadcast
    // at real scale anyway. Hash-exchanged identically, the pipeline
    // materializes once and both join sides read the reused stage.
    evidence.hint("shuffle_hash").as("a").join(
        evidence.hint("shuffle_hash").as("b"),
        col("a.chunk_md5") === col("b.chunk_md5") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"),
        first(col("a.n_chunks")).as("ca"), first(col("b.n_chunks")).as("cb"))
      .filter(col("n_shared") >= minShared)
      .withColumn("containment",
        round(col("n_shared").cast("double") / least(col("ca"), col("cb")), 6))
      .select("id_a", "id_b", "n_shared", "containment")
  }

  /** MinHash + LSH near-duplicate pairs.
    *
    * Banding: `numHashes` values → `bands` bands of `numHashes/bands`
    * rows; documents sharing any band key become candidates; candidates
    * are verified by the fraction of agreeing minhashes (the unbiased
    * Jaccard estimate). Only (bandIdx, bandKey, id, sig) tuples are
    * shuffled — the join key space is band buckets, so the cross product
    * never materializes. Returns pairs `id_a < id_b` with `est_jaccard
    * >= threshold` (exact k/numHashes rationals — with numHashes a
    * power of two they are dyadic, so the doubles are exact and
    * oracle-comparable unrounded).
    */
  /** Banded MinHash signature rows `(id, sig, band, band_key)` — the
    * persistable LSH *index* form: write it once per corpus (partition
    * by `band` at scale), and incremental batches join against it
    * ([[minHashLshIncremental]]) instead of recomputing the corpus.
    *
    * signature = numHashes simulated permutations of the auditable
    * universal family: ONE md5 per shingle reduced to 30 bits, then
    * numHashes integer multiply-adds, min-aggregated per doc
    * (codegen'd hash agg; a per-row array-expression form would
    * interpret its lambdas). Cheaper than numHashes independent
    * hashes AND reproducible by the SQL oracle.
    *
    * band key = the raw `rows`-value slice (literal offsets — stays in
    * codegen; no lambda). Joining on the value tuple instead of a hash
    * of it costs rows*8 bytes of shuffle key and buys exactness: no
    * band-hash collision can manufacture a candidate pair.
    */
  /** MinHash signatures `(id, sig)` — one half of the two-table LSH
    * index ([[signatureBands]] is the other), and the shared stage of
    * every batch LSH consumer.
    *
    * signature = numHashes simulated permutations of the auditable
    * universal family: ONE md5 per shingle reduced to 30 bits, then
    * numHashes integer multiply-adds, min-aggregated per doc
    * (codegen'd hash agg; a per-row array-expression form would
    * interpret its lambdas). Cheaper than numHashes independent
    * hashes AND reproducible by the SQL oracle.
    *
    * Plan shape: the min-aggregate's OWN id-exchange is the
    * stage-sharing point — the shingle explode runs over a round-robin
    * spread (NOT id-keyed: a key-compatible input would let the
    * aggregate skip its exchange, leaving no reusable stage boundary),
    * the partial 64-min aggregate combines map-side (each doc's
    * shingles live in one task, so partial state is one compact row
    * per doc), and everything above `Exchange(id)` — the final
    * aggregate is a cheap docs-row pass — re-executes per consumer
    * while the expensive shingle→md5→minhash pipeline materializes
    * exactly once. Consumers: the band explode and both per-pair
    * signature fetches of [[withSignatures]]. At real scale the spread
    * no-ops and this is the plan a raw scan produces anyway.
    */
  def signatures(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64): DataFrame = {
    val sh = shingleRows(df, textCol, idCol, Nil, shingleSize, spreadByKey = false)
      .withColumn("hx", H.base30(col("shingle")))
    val mins = (0 until numHashes).map(i =>
      min(H.minhashPerm(i, col("hx"))).as(s"m$i"))
    sh.groupBy(col("id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** NARROW banded rows `(id, band, band_key)` of a [[signatures]] set
    * — the other half of the two-table LSH index: persist both (bands
    * partitioned by `band` at scale, sigs by id bucket) and incremental
    * batches join against them ([[minHashLshIncremental]]) instead of
    * recomputing the corpus. The signature array deliberately does NOT
    * ride the band rows — embedded per band row it multiplies both the
    * index's storage and every band join's shuffle by ~bands× for
    * payload that is only needed per (rare) candidate pair.
    *
    * band key = the raw `rows`-value slice (literal offsets — stays in
    * codegen; no lambda). Joining on the value tuple instead of a hash
    * of it costs rows*8 bytes of shuffle key and buys exactness: no
    * band-hash collision can manufacture a candidate pair.
    */
  def signatureBands(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    sigs.select(
        col("id"),
        posexplode(array((0 until bands).map(b =>
          slice(col("sig"), b * rows + 1, rows)): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
  }

  /** Distinct candidate pairs `(id_a < id_b)` from a NARROW band
    * self-join: only `(id, band, band_key)` rides the band exchange —
    * never the signature. The batch self-join form used to shuffle the
    * full numHashes-long signature embedded in every one of its `bands`
    * band rows (~9 KB/doc at the 64/16 defaults); candidates are rare
    * by construction, so fetching signatures per DEDUPED pair
    * ([[withSignatures]]) moves that payload off the dominant exchange
    * (~7× fewer shuffled bytes/doc) and runs the signature comparison
    * once per pair instead of once per collision row.
    *
    * The SHUFFLE_HASH hint matters: left to itself Spark broadcasts one
    * side at small scale, which plans the two sides as *different*
    * subtrees (no stage reuse — the band pipeline would execute twice),
    * and is never the plan you'd get at corpus scale anyway.
    */
  private def candidatePairs(sigs: DataFrame, numHashes: Int,
      bands: Int): DataFrame = {
    val banded = signatureBands(sigs, numHashes, bands)
    banded.hint("shuffle_hash").as("a")
      .join(banded.hint("shuffle_hash").as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Attach both endpoints' signatures to a pair list — two equi-joins
    * against the one materialized [[signatures]] stage. Pair
    * rows are few (near-dups above a threshold are rare), so these
    * joins move signatures per PAIR, not per band row.
    */
  private def withSignatures(pairs: DataFrame, sigs: DataFrame): DataFrame =
    pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))

  def minHashLsh(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    val sigs = signatures(df, textCol, idCol, shingleSize, numHashes)
    withSignatures(candidatePairs(sigs, numHashes, bands), sigs)
      .select(col("id_a"), col("id_b"),
        (eqCount(col("sig_a"), col("sig_b"))
          .cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Distinct near-dup *loser* ids (the non-minimum end of every
    * verified pair) — the consumer form [[graft.jobs.CorpusJob.annotate]]
    * wants. Same loser set as
    * `minHashLsh(...).select(greatest(id_a, id_b)).distinct()`, skipping
    * the pair-level artifacts that consumer discards. Equality with the
    * pair-derived set is property-tested (DedupSpec).
    */
  def minHashLshLosers(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    val sigs = signatures(df, textCol, idCol, shingleSize, numHashes)
    withSignatures(candidatePairs(sigs, numHashes, bands), sigs)
      .filter((eqCount(col("sig_a"), col("sig_b"))
        .cast("double") / numHashes) >= threshold)
      .select(greatest(col("id_a"), col("id_b")).as(idCol))
      .distinct()
  }

  /** Incremental near-dup: pairs *involving a new document* — new×index
    * and new×new — against the pre-built two-table index
    * ([[signatures]] + [[signatureBands]]). The daily 1% increment
    * costs a join of its own NARROW bands against the band-partitioned
    * index bands (signature payload moves only per candidate pair, via
    * the sigs table), not a recompute of the corpus self-join; old×old
    * pairs were already emitted when their documents arrived.
    * `batch == oldPairs ∪ incremental` exactly (DedupSpec property).
    * Callers then append `newSigs`/`newBands` to the index tables.
    */
  def minHashLshIncremental(
      indexBands: DataFrame,
      indexSigs: DataFrame,
      newBands: DataFrame,
      newSigs: DataFrame,
      numHashes: Int = 64,
      threshold: Double = 0.5): DataFrame = {
    val allBands = indexBands.unionByName(newBands)
    val allSigs = indexSigs.unionByName(newSigs)
    // ONE join with the new side driving (a new id can be either end of
    // a pair, so the condition is ≠ and least/greatest normalizes the
    // orientation — running two <-joins instead would re-execute both
    // pipelines per orientation). new×new collisions appear once per
    // orientation; dropDuplicates collapses them.
    val cand = newBands.as("a").join(allBands.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.id") =!= col("b.id"))
      .select(
        least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
    withSignatures(cand, allSigs)
      .select(col("id_a"), col("id_b"),
        (eqCount(col("sig_a"), col("sig_b"))
          .cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** SimHash signature width: 60 bits — the width of
    * [[graft.functions.AuditableHash.h60]], so every bit of the token
    * hash is oracle-reproducible. (4 more bits would need a second md5
    * parse and buy ~nothing: near-dup discrimination saturates well
    * below 60 bits.)
    */
  val SimHashBits = 60

  /** SimHash over whitespace tokens: each token hashes to
    * [[SimHashBits]] bits; bit b of the signature is 1 iff
    * Σ_tokens (±1 for bit b) > 0. Pure per-row expression tree (fold
    * over the token array).
    */
  def simHash(text: Column): Column = {
    val toks = T.tokens(lower(text))
    val counts = aggregate(
      toks,
      array_repeat(lit(0L), SimHashBits),
      (acc, t) => {
        val h = H.h60(concat(lit("simhash:"), t))
        // static per-bit shifts (no Column-Column shift exists); unrolled
        // once at plan build, still one codegen'd expression per row
        array((0 until SimHashBits).map { bit =>
          element_at(acc, bit + 1) +
            when(shiftright(h, bit).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)
        }: _*)
      })
    (0 until SimHashBits).map { bit =>
      when(element_at(counts, bit + 1) > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** [[simHash]] as a DataFrame op: explode tokens → conditional-sum
    * aggregates per bit → pack sign bits. Same signature values as the
    * column form, but the plan is a plain hash aggregate — the column
    * form's per-token array rebuild generates a huge codegen unit
    * whose JIT compile time (~10s) dwarfs the actual work at test
    * scale, and whose per-token allocation hurts at every scale.
    * One shuffle on `idCol`.
    */
  def simHashDf(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = Spread.auto(df, col(idCol)).select(col(idCol).as("id"),
        explode(T.tokens(lower(col(textCol)))).as("tok"))
      .withColumn("h", H.h60(concat(lit("simhash:"), col("tok"))))
    val bitSums = (0 until SimHashBits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        .as(s"c$b")
    }
    val counts = toks.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val packed = (0 until SimHashBits).map { b =>
      when(col(s"c$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    // empty/whitespace-only docs have no tokens → rejoin with simhash 0
    df.select(col(idCol).as("id"))
      .join(counts.select(col("id"), packed.as("simhash")), Seq("id"), "left_outer")
      .withColumn("simhash", coalesce(col("simhash"), lit(0L)))
  }

  /** The persistable SimHash index: `(id, sim, chunk, chunk_val)` rows
    * of a [[simHashDf]] signature set — the analogue of
    * [[signatureBands]] for the 4×15-bit pigeonhole blocks. Unlike the
    * MinHash index, this is ONE table, not two: the whole signature is
    * 8 bytes, so riding it on every chunk row costs 32 bytes/doc of
    * index storage and buys the pair path a direct XOR-popcount on the
    * collision row — the two per-pair signature joins the MinHash shape
    * needs (to keep its ~0.5 KB arrays off the band exchange) would
    * cost more than they save here. Same payload-size reasoning, both
    * directions. Persist partitioned by `chunk` at scale; incremental
    * batches join against it ([[simHashIncremental]]) instead of
    * recomputing the corpus.
    */
  def simHashChunks(sigs: DataFrame): DataFrame =
    sigs.select(col("id"), col("simhash").as("sim"),
        posexplode(array((0 until 4).map(i =>
          shiftright(col("simhash"), i * 15).bitwiseAND(0x7FFFL)): _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "chunk_val")

  /** Incremental SimHash near-dup: pairs *involving a new document* —
    * new×index and new×new — against the pre-built [[simHashChunks]]
    * index. Daily cost = the increment's chunk rows joined to the
    * chunk-partitioned index and an XOR-popcount per collision row; the
    * corpus self-join never reruns and old×old pairs were already
    * emitted when their documents arrived.
    * `batch == oldPairs ∪ incremental` exactly (DedupSpec property).
    * Callers then append `newChunks` to the index table.
    */
  def simHashIncremental(
      indexChunks: DataFrame,
      newChunks: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"maxHamming=$maxHamming exceeds the 4-chunk candidate guarantee (<= 3)")
    val allChunks = indexChunks.unionByName(newChunks)
    // ONE join with the new side driving (a new id can be either end of
    // a pair → ≠ condition + least/greatest orientation normalization,
    // exactly as minHashLshIncremental); new×new collisions appear once
    // per orientation and dropDuplicates collapses them. hamming is
    // computed on the collision row BEFORE the dedup and is
    // functionally determined by the pair, so it joins the dedup KEYS —
    // a pure hash-distinct over three scalars instead of a First
    // aggregate dragging a payload column; same rows either way.
    newChunks.as("a").join(allChunks.as("b"),
        col("a.chunk") === col("b.chunk") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.id") =!= col("b.id"))
      .select(
        least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).cast("long").as("hamming"))
      .dropDuplicates("id_a", "id_b", "hamming")
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash near-duplicate pairs: candidates share one of four 15-bit
    * signature chunks (any pair within hamming distance <= maxHamming <=
    * ~3 shares a chunk by pigeonhole when distance < 4); verified by
    * exact popcount of the XOR. Shuffle key = (chunkIdx, chunkValue).
    */
  def simHashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3): DataFrame = {
    // 4 chunks of 15 bits guarantee a shared chunk only for distance
    // < 4 (pigeonhole); a larger threshold would silently miss pairs
    require(maxHamming <= 3,
      s"maxHamming=$maxHamming exceeds the 4-chunk candidate guarantee (<= 3)")
    val sigs = simHashDf(df, textCol, idCol).withColumnRenamed("simhash", "sim")
    val chunked = sigs.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sim"), i * 15).bitwiseAND(0x7FFFL)): _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "chunk_val")
    // shuffle_hash: one computation of the simhash pipeline, read by
    // both join sides via stage reuse (see chunkOverlapPairs note)
    val a = chunked.hint("shuffle_hash").as("a")
    val b = chunked.hint("shuffle_hash").as("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).cast("long").as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity between all pairs within a blocking
    * group (e.g. same source/topic). Shingle sets are exploded and
    * joined on the shingle — the intersection is computed distributed,
    * never via a cross product; `blockCol` bounds the candidate space.
    */
  def ngramJaccard(
      df: DataFrame,
      textCol: String,
      idCol: String,
      blockCol: String,
      n: Int = 3,
      minJaccard: Double = 0.0): DataFrame = {
    // shingles join as 8-byte xxhash64 keys, not ~20-char strings:
    // less shuffle volume, cheaper equality in the hot join (a 64-bit
    // collision across ~10⁶ distinct shingles is ~1e-7 — below the
    // float-rounding noise floor the oracle already tolerates).
    // set_size is the native shingle array's length, stamped on every
    // exploded row — no window, no groupBy branch, no exchange before
    // the join; the self-join's two sides are byte-identical narrow
    // plans (ReuseExchange computes the join exchange once) and the
    // pair aggregate carries the sizes through with first().
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val shArr = ColumnBridge.column(graft.plans.WordShingles(
      ColumnBridge.expression(lower(coalesce(col(textCol), lit("")))), n))
    val sh = Spread.auto(df, col(idCol))
      .withColumn("__sh", shArr)
      .select(col(idCol).as("id"), col(blockCol).as("blk"),
        size(col("__sh")).cast("long").as("set_size"),
        explode(col("__sh")).as("shingle"))
      .withColumn("shingle", xxhash64(col("shingle")))

    // shuffle_hash: one computation of the shingle pipeline, read by
    // both join sides via stage reuse (see chunkOverlapPairs note)
    sh.hint("shuffle_hash").as("a").join(sh.hint("shuffle_hash").as("b"),
        col("a.blk") === col("b.blk") &&
        col("a.shingle") === col("b.shingle") &&
        col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"),
        first(col("a.set_size")).as("size_a"),
        first(col("b.set_size")).as("size_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("size_a") + col("size_b") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Dedup-pipeline quality telemetry — precision/recall of the banded
    * MinHash-LSH pipeline ([[minHashLsh]]: banding candidates, then
    * `est_jaccard ≥ threshold`) against EXACT shingle-Jaccard ground
    * truth ([[ngramJaccard]] corpus-wide, same shingle size, same
    * inclusive threshold) — the dial that tunes `numHashes`/`bands`
    * the way [[graft.operators.IvfIndex.recallAtK]] tunes `nProbe`:
    * recall falls when banding misses true pairs, precision falls when
    * the 64-hash estimate admits pairs below the true threshold. One
    * row: `(n_exact, n_lsh, n_hit, precision, recall)` — NULL metric
    * when its denominator is empty, never a fake 1.0.
    *
    * Cost discipline: the exact side is Σ df² over shared shingles —
    * the eval protocol runs it over a corpus SAMPLE (like every
    * ground-truth eval here); the three 1-row aggregates assemble via
    * broadcast crossJoins (the censused 1-row-scalar pattern).
    */
  def lshQuality(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    val lsh = minHashLsh(df, textCol, idCol, shingleSize, numHashes,
        bands, threshold)
      .select(col("id_a"), col("id_b")).distinct()
    val exact = ngramJaccard(df.withColumn("__blk", lit(1)), textCol,
        idCol, "__blk", shingleSize, minJaccard = threshold)
      .select(col("id_a"), col("id_b"))
    // one full-outer pair join + one aggregate: each pipeline computes
    // ONCE (the crossJoin-of-three-counts form re-ran the shingle
    // pipelines per branch — measured 2.6× this plan's wall)
    exact.withColumn("__e", lit(1L))
      .join(lsh.withColumn("__l", lit(1L)), Seq("id_a", "id_b"), "full_outer")
      .agg(
        // outer coalesce: an agg over ZERO pair rows sums to NULL, and
        // the no-similar-pairs corpus must report honest zero counts
        coalesce(sum(coalesce(col("__e"), lit(0L))), lit(0L)).as("n_exact"),
        coalesce(sum(coalesce(col("__l"), lit(0L))), lit(0L)).as("n_lsh"),
        coalesce(sum(when(col("__e").isNotNull && col("__l").isNotNull, 1L)
          .otherwise(0L)), lit(0L)).as("n_hit"))
      .withColumn("precision",
        when(col("n_lsh") > 0,
          round(col("n_hit").cast("double") / col("n_lsh").cast("double"), 6)))
      .withColumn("recall",
        when(col("n_exact") > 0,
          round(col("n_hit").cast("double") / col("n_exact").cast("double"), 6)))
  }

  /** Embedding near-duplicate pairs: exact cosine within a blocking
    * group. At 100 TB the block comes from LSH buckets
    * ([[graft.operators.Similarity.lshBucketsDf]]); here any coarse
    * label works.
    */
  def embeddingNearDup(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      blockCol: String,
      minCosine: Double,
      score: (Column, Column) => Column = V.cosine): DataFrame = {
    val slim = df.select(col(idCol).as("id"), col(blockCol).as("blk"), col(vecCol).as("v"))
    // shuffle_hash: a corpus-sized vector table must never plan as the
    // broadcast side (see chunkOverlapPairs note)
    slim.hint("shuffle_hash").as("a").join(slim.hint("shuffle_hash").as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("cosine", round(score(col("a.v"), col("b.v")), 6))
      .filter(col("cosine") >= minCosine)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }

  /** Embedding near-dup at 100 TB: blocking comes from hyperplane-LSH
    * buckets ([[Similarity.lshBucketsDf]]) instead of a pre-existing
    * label — the corpus needs no blocking column at all. A pair is
    * considered iff it collides in at least one of `tables` hash
    * tables, then verified with the exact fixed-point cosine; false
    * positives cost one integer dot, false negatives are the recall
    * trade `bits`/`tables` tunes (recall asserted vs the exact path in
    * DedupSpec).
    *
    * Shuffle shape: bucket rows carry the quantized vector, so the
    * self-join's two sides are the *identical* plan — one exchange,
    * computed once (ReuseExchange) — and no post-hoc vector-fetch
    * joins. Bucket skew (dense regions of embedding space) is the
    * pathological case: `spark.sql.adaptive.skewJoin` splits hot
    * buckets at runtime.
    */
  def embeddingNearDupLsh(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      minCosine: Double,
      dim: Int,
      bits: Int = 8,
      tables: Int = 8,
      seed: Long = 42L): DataFrame = {
    val bk = Similarity.lshBucketsDf(df.sparkSession,
        df.select(col(idCol), col(vecCol)), idCol, vecCol, dim, bits, tables, seed)
      .select(col("id"), col("table"), col("bucket"), V.quantize(col("v")).as("qv"))
      .withColumn("n2", V.dotQ(col("qv"), col("qv")))
    // shuffle_hash pins the documented one-exchange shape at EVERY
    // scale (a small-scale broadcast would plan the two sides as
    // different subtrees and run the bucket pipeline twice). Cosine on
    // the COLLISION ROW, scalar max per pair: the score is
    // table-independent, and deduping the quantized arrays through
    // dropDuplicates would sort candidates × vector payload
    // (first(array) can't hash-aggregate) — same move as lshTopK.
    bk.hint("shuffle_hash").as("a").join(bk.hint("shuffle_hash").as("b"),
        col("a.table") === col("b.table") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(V.cosineFromQuantized(
          col("a.qv"), col("b.qv"), col("a.n2"), col("b.n2")), 6).as("cosine"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("cosine")).as("cosine"))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }

  /** [[embeddingNearDup]] with the fixed-point cosine, restructured for
    * the O(pairs) join: vectors quantize and norm ONCE per row before
    * the join; each pair costs a single integer dot product. Same
    * values as `score = cosineQuantized`, ~4× less pair work.
    */
  def embeddingNearDupQuantized(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      blockCol: String,
      minCosine: Double): DataFrame = {
    val pre = df.select(col(idCol).as("id"), col(blockCol).as("blk"),
        V.quantize(col(vecCol)).as("qv"))
      .withColumn("n2", V.dotQ(col("qv"), col("qv")))
    // shuffle_hash: the per-row quantize+norm precompute must run once,
    // not once per join side (see chunkOverlapPairs note)
    pre.hint("shuffle_hash").as("a").join(pre.hint("shuffle_hash").as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("cosine", round(
        V.cosineFromQuantized(col("a.qv"), col("b.qv"), col("a.n2"), col("b.n2")), 6))
      .filter(col("cosine") >= minCosine)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }

  /** The two-table embedding LSH index: NARROW bucket rows
    * `(id, table, bucket)` + quantized vectors `(id, qv, n2)` — the
    * MinHash split applied to embeddings. A 64-dim quantized vector is
    * ~0.5 KB, so embedding it in each of the `tables` bucket rows (as
    * the one-shot [[embeddingNearDupLsh]] legitimately does inside a
    * single plan) would multiply PERSISTED index storage and every
    * future bucket join's payload ×tables; the one-table SimHash trade
    * goes the other way only because its whole signature is 8 bytes.
    * Persist buckets partitioned by `table` at scale, vectors by id
    * bucket; incremental batches join against them
    * ([[embeddingNearDupIncremental]]) instead of recomputing the
    * corpus. Bucket identity is [[Similarity.planeMatrix]] — the same
    * frozen hyperplanes must be passed for every increment (`seed` is
    * the codebook here; drift = explicit rebuild, as with
    * [[IvfIndex.rebuild]]).
    */
  def embeddingIndex(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      bits: Int = 8,
      tables: Int = 8,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    val buckets = Similarity.lshBucketsDf(df.sparkSession,
        df.select(col(idCol), col(vecCol)), idCol, vecCol, dim, bits, tables, seed)
      .select(col("id"), col("table"), col("bucket"))
    val vecs = df.select(col(idCol).as("id"), V.quantize(col(vecCol)).as("qv"))
      .withColumn("n2", V.dotQ(col("qv"), col("qv")))
    (buckets, vecs)
  }

  /** Incremental embedding near-dup: pairs *involving a new vector* —
    * new×index and new×new — against the pre-built two-table index
    * ([[embeddingIndex]]). Daily cost = the increment's narrow bucket
    * rows joined to the bucket-partitioned index plus one integer dot
    * per candidate PAIR (vectors fetched from the vecs table per
    * deduped pair, never per collision row); the corpus self-join never
    * reruns. `batch == oldPairs ∪ incremental` exactly (DedupSpec
    * property — scores are table-independent, so the pair-fetch form
    * and the batch collision-row form agree to the digit). Callers then
    * append `newBuckets`/`newVecs` to the index tables.
    */
  def embeddingNearDupIncremental(
      indexBuckets: DataFrame,
      indexVecs: DataFrame,
      newBuckets: DataFrame,
      newVecs: DataFrame,
      minCosine: Double): DataFrame = {
    val allBuckets = indexBuckets.unionByName(newBuckets)
    val allVecs = indexVecs.unionByName(newVecs)
    val cand = newBuckets.as("a").join(allBuckets.as("b"),
        col("a.table") === col("b.table") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") =!= col("b.id"))
      .select(
        least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .join(allVecs.select(col("id").as("id_a"),
        col("qv").as("qv_a"), col("n2").as("n2_a")), Seq("id_a"))
      .join(allVecs.select(col("id").as("id_b"),
        col("qv").as("qv_b"), col("n2").as("n2_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), round(V.cosineFromQuantized(
        col("qv_a"), col("qv_b"), col("n2_a"), col("n2_b")), 6).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC dedup by
    * clustering the embedding space and removing near-identical
    * neighbors within each cluster — catches paraphrases and templated
    * rewrites that lexical MinHash misses.
    *
    * Algorithm as published: k-means the embeddings (here the
    * deterministic auditable-hash codebook pick of
    * [[IvfIndex.buildIndex]] — the assignment is the
    * [[graft.plans.IvfAssign]] narrow map, so clustering costs one
    * scan), then within each cluster compare all pairs and drop every
    * document that has a higher-priority neighbor above `minCosine`.
    * Our keep rule is the deterministic "first wins": a doc is a
    * semantic duplicate iff some LOWER id in its cluster has rounded
    * quantized cosine ≥ `minCosine` (the paper keeps a random/low-
    * centroid-distance representative; any fixed priority gives the
    * same dedup mass).
    *
    * Shape for 100 TB: the within-cluster self-join exchanges only
    * `(centroid_id, id, quantized vec)` rows hashed by cluster — both
    * sides are the SAME cells table, so the exchange is computed once
    * and reused — and all-pairs cost is bounded by the cluster size the
    * caller controls via `nClusters` (pick k ≈ N / targetClusterSize;
    * the paper uses ~100k clusters at web scale). A hot cluster
    * skew-splits under AQE like any shuffle join.
    *
    * Output: one row per input vector — `(idCol, centroid_id, sem_dup,
    * nn_cosine)` where `nn_cosine` is the max rounded cosine to any
    * lower-id cluster-mate above threshold (NULL ⇔ kept).
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
      nClusters: Int, minCosine: Double): DataFrame = {
    val (_, cells) = IvfIndex.buildIndex(df, idCol, vecCol, nClusters)
    val a = cells.select(col("centroid_id"), col("id").as("id_a"),
      col("cqv").as("qv_a"), col("cn2").as("n2_a"))
    val b = cells.select(col("centroid_id"), col("id").as("id_b"),
      col("cqv").as("qv_b"), col("cn2").as("n2_b"))
    val losers = a.join(b, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_b"), round(V.cosineFromQuantized(
        col("qv_a"), col("qv_b"), col("n2_a"), col("n2_b")), 6).as("cosine"))
      .filter(col("cosine") >= minCosine)
      .groupBy(col("id_b")).agg(max(col("cosine")).as("nn_cosine"))
    cells.select(col("id"), col("centroid_id"))
      .join(losers.withColumnRenamed("id_b", "id"), Seq("id"), "left")
      .select(col("id").as(idCol), col("centroid_id"),
        col("nn_cosine").isNotNull.as("sem_dup"), col("nn_cosine"))
  }

  /** Incremental [[semDedup]] over the persisted IVF index
    * ([[IvfIndex.buildIndex]]'s `(cents, cells)` pair — the same state
    * the ANN probes maintain): a daily batch of new vectors assigns to
    * the FROZEN codebook ([[IvfIndex.assignIncrement]], a narrow map
    * over the increment only) and gets verdicts against index ∪ batch
    * cell-mates. Under the monotonic-id contract indexed docs only
    * ever gain HIGHER-id mates, so index verdicts never change and the
    * batch's verdicts equal the one-shot [[semDedup]] with the same
    * codebook — the family discipline: deletion is a tombstone
    * anti-join on `cells` before the call (the q97 shape), codebook
    * drift is [[IvfIndex.rebuild]]'s job on the maintenance cadence.
    * Callers append the batch's cell rows (recomputable via
    * [[IvfIndex.assignIncrement]]) to the persisted cells.
    */
  def semDedupIncremental(cents: DataFrame, cells: DataFrame,
      newVecs: DataFrame, idCol: String, vecCol: String,
      minCosine: Double): DataFrame =
    semDedupOnCells(cells,
      IvfIndex.assignIncrement(newVecs, idCol, vecCol, cents),
      idCol, minCosine)

  /** [[semDedupIncremental]] given the batch's ALREADY-ASSIGNED cell
    * rows — the streaming twin computes the assignment once and feeds
    * both the verdicts and the cells append from it.
    */
  def semDedupOnCells(cells: DataFrame, newCells: DataFrame,
      idCol: String, minCosine: Double): DataFrame = {
    val earlier = cells.unionByName(newCells)
      .select(col("centroid_id"), col("id").as("id_a"),
        col("cqv").as("qv_a"), col("cn2").as("n2_a"))
    val probes = newCells.select(col("centroid_id"), col("id").as("id_b"),
      col("cqv").as("qv_b"), col("cn2").as("n2_b"))
    val losers = earlier.join(probes, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_b"), round(V.cosineFromQuantized(
        col("qv_a"), col("qv_b"), col("n2_a"), col("n2_b")), 6).as("cosine"))
      .filter(col("cosine") >= minCosine)
      .groupBy(col("id_b")).agg(max(col("cosine")).as("nn_cosine"))
    newCells.select(col("id"), col("centroid_id"))
      .join(losers.withColumnRenamed("id_b", "id"), Seq("id"), "left")
      .select(col("id").as(idCol), col("centroid_id"),
        col("nn_cosine").isNotNull.as("sem_dup"), col("nn_cosine"))
  }
}
