package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation (SURVEY.md §7.4-7). AQE's skew-join handles
  * most cases at runtime; these are the explicit fallbacks for when it
  * can't — a first-stage aggregation on a pathological key (one
  * employer = 30% of rows at 100 TB), or a shuffled join whose hot keys
  * overflow a single task even after AQE splitting.
  */
object Salting {

  /** Salt from full row content, not `monotonically_increasing_id()`:
    * the id depends on partition layout and within-partition order, so
    * a retried task after a fetch failure could re-salt rows differently
    * and double-count/drop partials (the SPARK-23207 failure class).
    * Content hashing is retry-stable.
    *
    * Limitation (ADVICE r01): byte-identical rows all hash to the same
    * salt, so a hot key dominated by *duplicate* rows would still land
    * in one task. [[saltedSumCount]] closes this by collapsing exact
    * duplicates (with a weight) in a pre-phase whose shuffle key is the
    * full row content — uniformly distributed by construction — before
    * salting; [[saltedJoin]] documents it (join outputs can't be
    * weight-collapsed without changing cardinality).
    */
  private def contentSalt(df: DataFrame, salts: Int) =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts.toLong))

  /** Two-phase (salted) aggregation: rows scatter over `salts`
    * sub-keys, partially aggregate, then combine per real key. Results
    * identical to a direct groupBy for algebraic aggregates (count /
    * sum / min / max — everything decomposable); the hot key's work
    * spreads over `salts` tasks instead of one.
    *
    * Phase 0 collapses byte-identical rows to (row, weight): its
    * group-by key is the entire row content, so even a single
    * million-duplicate row spreads evenly across the cluster (hash of
    * content ≈ uniform), and the later salted phases see at most one
    * row per distinct content. count/sum then aggregate weighted.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
      salts: Int = 16): DataFrame = {
    val distinctRows = df.groupBy(df.columns.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("__w"))
    val salted = distinctRows.withColumn("__salt", contentSalt(df, salts))
    val partialAggs = sum(col("__w")).as("__cnt") +:
      sumCols.map(c => sum(col(c) * col("__w")).as(s"__sum_$c"))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = sum(col("__cnt")).as("n") +:
      sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c"))
    partial.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted inner equi-join for a skewed left side: left rows get a
    * random-but-deterministic salt in [0, salts); the (small but not
    * broadcastable) right side replicates `salts` times. The join key
    * space becomes (keys, salt) — hot keys split across `salts` tasks.
    *
    * Known limitation: the salt is a content hash (retry-stable — see
    * [[contentSalt]]), so byte-identical left rows share a salt and a
    * duplicate-dominated hot key stays in one task. If your skew is
    * duplicate rows rather than distinct rows sharing a key, collapse
    * them first (`groupBy(all columns).count()` → join → re-expand by
    * the weight), or rely on AQE skew-join splitting, which splits by
    * partition size and has no such blind spot.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      salts: Int = 16): DataFrame = {
    val left = skewed.withColumn("__salt", contentSalt(skewed, salts))
    val right = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    left.join(right, keys :+ "__salt").drop("__salt")
  }

  /** Measure before mitigating: per-key-space skew facts that decide
    * between doing nothing, AQE skew splitting, [[saltedSumCount]], or
    * pre-aggregation. One aggregate + a bounded top-k — safe to run on
    * the full fact. Returns a single row:
    * `n_rows, n_keys, max_key_rows, top<k>_rows, skew_ratio`
    * (max key count ÷ mean key count; ≳ 10–100 ⇒ one task owns the
    * hot key's whole shuffle partition without intervention).
    */
  def skewReport(df: DataFrame, keys: Seq[String], topK: Int = 5): DataFrame = {
    val perKey = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
    val top = perKey.orderBy(col("__n").desc).limit(topK)
      .agg(sum(col("__n")).as("__top"))
    perKey.agg(
        sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("__n")).as("max_key_rows"))
      .crossJoin(top)
      .select(col("n_rows"), col("n_keys"), col("max_key_rows"),
        col("__top").as(s"top${topK}_rows"),
        round(col("max_key_rows") * col("n_keys").cast("double") / col("n_rows"), 2)
          .as("skew_ratio"))
  }

  // ---- sketch-backed skew advisory (index read, not a corpus scan) -------

  /** The composite key as one NULL-safe string (per-key `"__null__"`
    * sentinel, 0x01 separator — the [[Drift]] category convention), so
    * the three state sketches share one value column.
    */
  private def keyString(keys: Seq[String]): Column =
    concat_ws("",
      keys.map(k => coalesce(col(k).cast("string"), lit("__null__"))): _*)

  private val CmDepth = 4
  private val CmWidth = 4096

  /** Persist the skew-advisory state for `df`'s key space under `dir`
    * — three ADDITIVE tables, so daily increments [[appendSkewState]]
    * in and the advisory never re-scans history (the incremental-index
    * discipline every sketch family here follows):
    *
    *  - `theta/` — [[ThetaSketch]] rows of the key (distinct-count
    *    estimate, merge = union-set state exactly),
    *  - `cm/` — [[CountMin]] cells of the key (point-count upper
    *    bounds, cell-wise additive; row 0's cell sum is the EXACT row
    *    count),
    *  - `cands/` — the Misra–Gries per-partition candidate SUPERSET of
    *    keys holding > 1/`hhK` of any partition (pigeonhole: every key
    *    with a > 1/`hhK` share of the TOTAL is in here; union across
    *    batches preserves the guarantee).
    *
    * Build cost: one aggregate pass per table over the increment —
    * increment-sized, never history-sized.
    */
  def writeSkewState(df: DataFrame, keys: Seq[String], dir: String,
      thetaK: Int = 256, hhK: Int = 64, overwrite: Boolean = true): Unit = {
    val spark = df.sparkSession
    val mode = if (overwrite) "overwrite" else "append"
    // sketch parameters PIN the state dir (ADVICE r12): a read (or an
    // append) at a different thetaK would silently skew n_keys and
    // every ratio, so the params persist in a 1-row meta table —
    // written on build, validated on every append and read
    readStateMeta(spark, dir) match {
      case Some((t, h)) if !overwrite =>
        require(t == thetaK && h == hhK,
          s"skew state at $dir was written with thetaK=$t/hhK=$h; " +
            s"appending with thetaK=$thetaK/hhK=$hhK would corrupt it")
      case _ =>
        import spark.implicits._
        Seq((thetaK, hhK, CmDepth, CmWidth))
          .toDF("theta_k", "hh_k", "cm_depth", "cm_width")
          .write.mode("overwrite").parquet(s"$dir/meta")
    }
    val (theta, cm, cands) = skewStateFrames(df, keys, thetaK, hhK)
    theta.write.mode(mode).parquet(s"$dir/theta")
    cm.write.mode(mode).parquet(s"$dir/cm")
    cands.write.mode(mode).parquet(s"$dir/cands")
  }

  /** `(thetaK, hhK)` recorded in the state dir, validating the CM
    * geometry against this build's constants (a mismatched geometry
    * cannot be reinterpreted — fail loudly). None for a dir without
    * meta (pre-r13 state, or a fresh build).
    */
  private def readStateMeta(spark: org.apache.spark.sql.SparkSession,
      dir: String): Option[(Int, Int)] =
    graft.sources.Zone.readIfExists(spark, s"$dir/meta").map { m =>
      val r = m.head()
      require(r.getAs[Int]("cm_depth") == CmDepth &&
        r.getAs[Int]("cm_width") == CmWidth,
        s"skew state at $dir has CountMin geometry " +
          s"${r.getAs[Int]("cm_depth")}x${r.getAs[Int]("cm_width")}; " +
          s"this build reads ${CmDepth}x$CmWidth")
      (r.getAs[Int]("theta_k"), r.getAs[Int]("hh_k"))
    }

  /** Fold a daily increment into an existing state: plain appends —
    * readers re-trim the theta rows, cell-sum the CountMin rows, and
    * union-distinct the candidates, so append-then-report equals
    * rebuild-from-everything within the documented envelopes
    * (SaltingSpec pins it).
    */
  def appendSkewState(df: DataFrame, keys: Seq[String], dir: String,
      thetaK: Int = 256, hhK: Int = 64): Unit =
    writeSkewState(df, keys, dir, thetaK, hhK, overwrite = false)

  /** [[skewReport]] from a persisted [[writeSkewState]] dir — the daily
    * advisory at index-read cost (state is sketch-sized; the fact is
    * never touched):
    *
    *  - `n_rows` — EXACT (CountMin row-0 cell sum counts every row
    *    once),
    *  - `n_keys` — theta estimate, ±≈1/√(thetaK−2) (exact below
    *    thetaK distinct),
    *  - `max_key_rows_ub` / `max_key_rows_lb` — the hottest candidate's
    *    CountMin estimate, bracketed: CM point estimates are UPPER
    *    bounds within +`cm_resolution` = ⌈e·N/width⌉ collision mass, so
    *    `lb = max(0, ub − resolution)` is the count the key PROVABLY
    *    has. Reporting only the ub would cry wolf on a uniform key
    *    space the moment n_keys ≫ width (measured: a 30× uniform fact
    *    read ratio 11.6 from collisions alone); the lb is what the
    *    mitigation decision may act on,
    *  - `top<k>_rows_ub` — Σ of the top-k candidate upper bounds,
    *  - `skew_ratio_ub` / `skew_ratio_lb` — the [[skewReport]] ratio
    *    over each bracket end. `lb ≫ 10` ⇒ provably hot, mitigate;
    *    `ub` small ⇒ provably uniform; lb small with ub large ⇒
    *    resolution-limited, and by construction harmless: a key
    *    invisible at resolution e·N/width holds < e/width of the
    *    table — with width ≳ 100× the shuffle partition count such a
    *    key cannot dominate any partition, which is the only skew that
    *    matters.
    *
    * The true hottest key is IN the candidate superset whenever it
    * holds > 1/hhK of the rows; below that share no key can dominate
    * a ≥ hhK-partition shuffle and the advisory's "no provable skew"
    * IS the answer. An empty candidate set reports NULL max/top —
    * same meaning.
    */
  def skewReportFromState(spark: org.apache.spark.sql.SparkSession,
      dir: String, topK: Int = 5, thetaK: Int = 256): DataFrame = {
    // the STORED thetaK wins (ADVICE r12 — a read at a mismatched k
    // silently skews n_keys); the parameter is the fallback for state
    // dirs written before the meta table existed
    val effThetaK = readStateMeta(spark, dir).map(_._1).getOrElse(thetaK)
    skewReportFromFrames(spark.read.parquet(s"$dir/theta"),
      spark.read.parquet(s"$dir/cm"), spark.read.parquet(s"$dir/cands"),
      topK, effThetaK)
  }

  /** [[skewReportFromState]] over CALLER-HELD state frames — the
    * report for deployments whose skew state lives inside another
    * family's layout (the streamed advisory legs,
    * [[graft.streaming.CorpusStream.readMergedAdvisories]], or a
    * composed job's folded root) rather than a [[writeSkewState]]
    * dir. The canonical merges re-apply on read and are idempotent
    * on already-merged frames, so raw appended rows and a folded
    * state report identically. Pass the thetaK the state was BUILT
    * with (the advmeta/skew-meta pin — a mismatched k silently skews
    * `n_keys`).
    */
  def skewReportFromFrames(thetaRows: DataFrame, cmRows: DataFrame,
      candRows: DataFrame, topK: Int = 5, thetaK: Int = 256): DataFrame = {
    val theta = ThetaSketch.merge(thetaRows)(Seq.empty, thetaK)
    val nKeys = ThetaSketch.estimate(theta, Seq.empty, thetaK)
      .select(col("est_distinct").as("n_keys"))
    val cm = CountMin.merge(cmRows)(Seq.empty)
      .localCheckpoint(eager = true) // depth·width cells, read twice
    val nRows = cm.filter(col("row") === 0)
      .agg(coalesce(sum(col("cell_count")), lit(0L)).as("n_rows"))
    val cands = candRows.distinct()
    val ests = CountMin.estimate(cm, cands, Seq.empty, "value",
      CmDepth, CmWidth)
    val top = ests.orderBy(col("est_count").desc).limit(topK)
      .agg(max(col("est_count")).as("max_key_rows_ub"),
        sum(col("est_count")).as(s"top${topK}_rows_ub"))
    def ratio(c: Column): Column =
      round(c * col("n_keys").cast("double") / col("n_rows"), 2)
    nRows.crossJoin(broadcast(nKeys)).crossJoin(broadcast(top))
      .withColumn("cm_resolution",
        ceil(lit(math.E) * col("n_rows") / lit(CmWidth)).cast("long"))
      // explicit NULL guard: greatest() SKIPS nulls, so an empty
      // candidate set (ub NULL) would otherwise report lb = 0 — an
      // inconsistent bracket; NULL/NULL means "no candidates", as doc'd
      .withColumn("max_key_rows_lb",
        when(col("max_key_rows_ub").isNotNull,
          greatest(lit(0L), col("max_key_rows_ub") - col("cm_resolution"))))
      .select(col("n_rows"), col("n_keys"),
        col("max_key_rows_ub"), col("max_key_rows_lb"),
        col(s"top${topK}_rows_ub"), col("cm_resolution"),
        ratio(col("max_key_rows_ub")).as("skew_ratio_ub"),
        ratio(col("max_key_rows_lb")).as("skew_ratio_lb"))
  }

  /** The batch's three skew-state tables as FRAMES `(theta, cm,
    * cands)` — the unit [[writeSkewState]] persists, exposed so
    * composed jobs can fold skew state inside their own atomic swap
    * ([[graft.jobs.CorpusJob.runIncremental]]'s folded root) instead
    * of the append-only dir layout.
    */
  def skewStateFrames(df: DataFrame, keys: Seq[String],
      thetaK: Int = 256, hhK: Int = 64): (DataFrame, DataFrame, DataFrame) = {
    val keyed = df.select(keyString(keys).as("__key"))
    (ThetaSketch.sketch(keyed, Seq.empty, "__key", thetaK),
      CountMin.sketch(keyed, Seq.empty, "__key", CmDepth, CmWidth),
      HeavyHitters.mgSummaries(keyed, "__key", hhK)
        .filter(col("value").isNotNull).select(col("value")).distinct())
  }

  /** Canonically fold prior state frames with a batch's: theta rows
    * re-trim (KMV union-set state — exactly the union's sketch), CM
    * cells sum, candidates union-distinct. Fold-per-batch == rebuild
    * within the documented envelopes (the same merges
    * [[skewReportFromState]] applies on read).
    */
  def mergeSkewState(prior: (DataFrame, DataFrame, DataFrame),
      batch: (DataFrame, DataFrame, DataFrame),
      thetaK: Int = 256): (DataFrame, DataFrame, DataFrame) =
    (ThetaSketch.merge(prior._1.unionByName(batch._1))(Seq.empty, thetaK),
      CountMin.merge(prior._2.unionByName(batch._2))(Seq.empty),
      prior._3.unionByName(batch._3).distinct())

  /** The 1-row parameter meta for a frame-folded state dir (same
    * contract as [[writeSkewState]]'s).
    */
  def skewMetaFrame(spark: org.apache.spark.sql.SparkSession,
      thetaK: Int = 256, hhK: Int = 64): DataFrame = {
    import spark.implicits._
    Seq((thetaK, hhK, CmDepth, CmWidth))
      .toDF("theta_k", "hh_k", "cm_depth", "cm_width")
  }

  // ---- closed-loop mitigation (r12 verdict task 7) -----------------------

  /** The salt decision derived from the persisted state's PROVABLE
    * bound: returns 1 (don't salt) unless `skew_ratio_lb >= threshold`
    * — the lb is collision-mass-free, so a uniform key space can never
    * trip the mitigation however large its COLLISION-inflated ub reads
    * (the r12 measurement: 30× uniform keys showed ub 11.6 with lb
    * 0.0). When lb-proven, the salt count is the ratio itself (the hot
    * key provably holds ratio_lb × the mean key's rows, so ~⌈ratio⌉
    * sub-keys bring its partition back to the mean), clamped to
    * `maxSalts`. One sketch-sized state read; the fact is never
    * touched.
    */
  def saltsFromState(spark: org.apache.spark.sql.SparkSession, dir: String,
      threshold: Double = 10.0, maxSalts: Int = 64): Int = {
    require(threshold > 0 && maxSalts >= 2, s"bad threshold/maxSalts")
    saltsFromReportRow(skewReportFromState(spark, dir).head(),
      threshold, maxSalts)
  }

  /** The same salt decision off an already-computed
    * [[skewReportFromState]]/[[skewReportFromFrames]] row — so a
    * caller that reports AND decides (the ops dashboard) pays one
    * sketch read, not two.
    */
  def saltsFromReportRow(r: org.apache.spark.sql.Row,
      threshold: Double = 10.0, maxSalts: Int = 64): Int = {
    require(threshold > 0 && maxSalts >= 2, s"bad threshold/maxSalts")
    Option(r.getAs[java.lang.Double]("skew_ratio_lb")).map(_.toDouble) match {
      case Some(ratio) if ratio >= threshold =>
        math.min(maxSalts.toLong, math.ceil(ratio).toLong).toInt
      case _ => 1 // no PROVABLE skew → the plain plan (or AQE) is right
    }
  }

  /** [[saltedSumCount]] behind the state-derived decision: the daily
    * pipeline self-tunes — salting engages only when the persisted
    * advisory PROVES a hot key (lb-based, so never on a uniform key
    * space), with the salt count sized by the proven ratio. Results
    * are identical either way (SaltingSpec pins auto == plain on
    * planted 30× hot-key data AND on uniform data).
    */
  def autoSaltedSumCount(df: DataFrame, keys: Seq[String],
      sumCols: Seq[String], stateDir: String,
      threshold: Double = 10.0, maxSalts: Int = 64): DataFrame = {
    val salts = saltsFromState(df.sparkSession, stateDir, threshold, maxSalts)
    if (salts > 1) saltedSumCount(df, keys, sumCols, salts)
    else {
      // plain one-shuffle aggregate, same output contract
      val aggs = count(lit(1)).as("n") +:
        sumCols.map(c => sum(col(c)).as(s"sum_$c"))
      df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
  }

  /** [[saltedJoin]] behind the same state-derived decision (the skewed
    * LEFT side's key state decides; an unproven skew keeps the plain
    * join and lets AQE's size-based splitting handle the rest).
    */
  def autoSaltedJoin(skewed: DataFrame, other: DataFrame,
      keys: Seq[String], stateDir: String,
      threshold: Double = 10.0, maxSalts: Int = 64): DataFrame = {
    val salts = saltsFromState(skewed.sparkSession, stateDir, threshold,
      maxSalts)
    if (salts > 1) saltedJoin(skewed, other, keys, salts)
    else skewed.join(other, keys)
  }
}
