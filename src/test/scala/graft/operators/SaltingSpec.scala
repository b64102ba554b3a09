package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation == direct aggregation (skewed key)") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_l_quantity"))
    val salted = Salting.saltedSumCount(li, Seq("l_returnflag"), Seq("l_quantity"), 8)
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("salted aggregation correct with duplicate-dominated hot key") {
    // a hot key made of byte-identical rows (the ADVICE r01 blind spot):
    // phase 0 collapses them to (row, weight), so counts/sums stay exact
    val dup = Seq.fill(5000)(("HOT", 2.0)) ++ Seq(("a", 1.0), ("b", 3.0), ("b", 4.0))
    val df = dup.toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum($"v").as("sum_v"))
    val salted = Salting.saltedSumCount(df, Seq("k"), Seq("v"), 8)
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("AQE splits a skewed join partition at runtime (the zero-code skew path)") {
    // Salting is the explicit mitigation; AQE skew-join is the ambient
    // one — this locks in that it actually engages. One hot key
    // dominates the left side; with the skew thresholds forced low, the
    // final adaptive plan must mark the sort-merge join skew=true (hot
    // partition split into parallel tasks).
    val conf = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val left = (Seq.tabulate(20000)(i => (1L, s"payload_left_$i")) ++
        Seq.tabulate(200)(i => (i.toLong + 2, s"cold_$i"))).toDF("k", "l")
      val right = Seq.tabulate(300)(i => (i.toLong, s"r_$i")).toDF("k", "r")
      val joined = left.join(right, "k")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p.take(3000))
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("salted join == plain join (row multiset)") {
    val dir = "/root/testdata/sf0.001"
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(spark, dir).select($"c_custkey".as("o_custkey"), $"c_mktsegment")
    val plain = o.join(c, Seq("o_custkey"))
    val salted = Salting.saltedJoin(o, c, Seq("o_custkey"), 8)
      .select(plain.columns.map(col).toIndexedSeq: _*)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("skewReport quantifies a planted hot key") {
    import spark.implicits._
    // 1000 rows on key 'hot', 10 each on 100 cold keys
    val df = (Seq.fill(1000)("hot") ++ (1 to 100).flatMap(k => Seq.fill(10)(s"k$k")))
      .toDF("k")
    val r = Salting.skewReport(df, Seq("k")).head
    assert(r.getAs[Long]("n_rows") == 2000L)
    assert(r.getAs[Long]("n_keys") == 101L)
    assert(r.getAs[Long]("max_key_rows") == 1000L)
    // max=1000 vs mean≈19.8 → ratio ≈ 50.5
    assert(r.getAs[Double]("skew_ratio") > 40.0)
    // uniform data reports ratio ≈ 1
    val uni = (1 to 100).flatMap(k => Seq.fill(10)(s"k$k")).toDF("k")
    assert(Salting.skewReport(uni, Seq("k")).head.getAs[Double]("skew_ratio") == 1.0)
  }

  test("sketch-backed advisory ≈ exact skewReport within the documented " +
      "envelopes, at index-read cost; daily appends fold in additively") {
    import spark.implicits._
    // planted hot key over a key space big enough that the theta
    // estimate actually estimates (n_keys > thetaK)
    val hot = Seq.fill(5000)("hot")
    val cold = (1 to 2000).flatMap(k => Seq.fill(5)(s"k$k"))
    val df = (hot ++ cold).toDF("k")
    val exact = Salting.skewReport(df, Seq("k")).head
    val dir = tmpDir("skewstate")
    Salting.writeSkewState(df, Seq("k"), dir)
    val est = Salting.skewReportFromState(spark, dir).head

    // n_rows: EXACT (CountMin row-0 cell sum)
    assert(est.getAs[Long]("n_rows") == exact.getAs[Long]("n_rows"))
    // n_keys: theta envelope ±3/sqrt(k-2) (~19% at k=256, generous 3σ)
    val nk = est.getAs[Long]("n_keys").toDouble
    val nkTrue = exact.getAs[Long]("n_keys").toDouble
    assert(math.abs(nk - nkTrue) / nkTrue < 3.0 / math.sqrt(254.0),
      s"n_keys est $nk vs true $nkTrue")
    // hot-key bracket: ub is a CountMin upper bound within +resolution,
    // lb = ub - resolution provably held by the key
    val ub = est.getAs[Long]("max_key_rows_ub")
    val lb = est.getAs[Long]("max_key_rows_lb")
    val mxTrue = exact.getAs[Long]("max_key_rows")
    val res = est.getAs[Long]("cm_resolution")
    assert(ub >= mxTrue && ub <= mxTrue + res, s"max ub $ub vs true $mxTrue")
    assert(lb <= mxTrue, s"lb $lb must never exceed the true max $mxTrue")
    // the decision matches the exact report: provably severe skew
    assert(est.getAs[Double]("skew_ratio_lb") > 40.0)

    // incremental: two appended halves ≈ the one-shot state (theta/CM
    // additive exactly; the MG candidate union stays a superset)
    val dir2 = tmpDir("skewstate2")
    Salting.writeSkewState(df.filter(xxhash64($"k") % 2 === 0), Seq("k"), dir2)
    Salting.appendSkewState(df.filter(xxhash64($"k") % 2 =!= 0), Seq("k"), dir2)
    val inc = Salting.skewReportFromState(spark, dir2).head
    assert(inc.getAs[Long]("n_rows") == exact.getAs[Long]("n_rows"))
    assert(inc.getAs[Long]("max_key_rows_ub") >= mxTrue &&
      inc.getAs[Long]("max_key_rows_ub") <= mxTrue + res)
    // theta state is canonical: merged appends give the SAME estimate
    assert(inc.getAs[Long]("n_keys") == est.getAs[Long]("n_keys"))

    // no hot key → no provable skew: lb ratio ≈ 0 (the false-alarm
    // guard — the ub alone WOULD alias collision mass into "skew")
    val uniDir = tmpDir("skewstate3")
    val uni = (1 to 3000).map(k => s"u$k").toDF("k")
    Salting.writeSkewState(uni, Seq("k"), uniDir)
    val ur = Salting.skewReportFromState(spark, uniDir).head
    assert(ur.getAs[Long]("n_rows") == 3000L)
    if (!ur.isNullAt(ur.fieldIndex("max_key_rows_lb")))
      assert(ur.getAs[Double]("skew_ratio_lb") < 10.0,
        s"uniform key space must not report provable skew: $ur")
  }

  test("closed-loop mitigation: auto-salt engages only on an lb-PROVEN " +
      "hot key, sizes salts by the proven ratio, results == plain") {
    import spark.implicits._
    // planted 30x-ish hot key (the r11 advisory fixture shape)
    val hot = (Seq.fill(5000)("hot") ++
      (1 to 2000).flatMap(k => Seq.fill(5)(s"k$k")))
      .zipWithIndex.map { case (k, i) => (k, (i % 7).toLong) }
      .toDF("k", "v")
    val hotDir = tmpDir("autosalt_hot")
    Salting.writeSkewState(hot, Seq("k"), hotDir)
    val salts = Salting.saltsFromState(spark, hotDir)
    assert(salts > 1, s"proven hot key must engage salting, got $salts")
    assert(salts <= 64, s"salt count must clamp, got $salts")
    val auto = Salting.autoSaltedSumCount(hot, Seq("k"), Seq("v"), hotDir)
      .orderBy($"k").collect().map(_.toString).toSeq
    val plain = hot.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("sum_v"))
      .orderBy($"k").collect().map(_.toString).toSeq
    assert(auto == plain, "auto-salted results diverged from plain")

    // uniform key space: the collision-inflated ub is large but the lb
    // is ~0 — the mitigation must NOT engage (the false-alarm guard)
    val uni = (1 to 3000).map(k => (s"u$k", 1L)).toDF("k", "v")
    val uniDir = tmpDir("autosalt_uni")
    Salting.writeSkewState(uni, Seq("k"), uniDir)
    assert(Salting.saltsFromState(spark, uniDir) == 1,
      "uniform keys must never trip the mitigation")
    val autoUni = Salting.autoSaltedSumCount(uni, Seq("k"), Seq("v"), uniDir)
    assert(autoUni.count() == 3000L &&
      autoUni.columns.toSeq == Seq("k", "n", "sum_v"))
    // auto join twin: engaged == plain row multiset
    val dim = Seq(("hot", "d1"), ("k1", "d2")).toDF("k", "attr")
    val aj = Salting.autoSaltedJoin(hot, dim, Seq("k"), hotDir)
    val pj = hot.join(dim, Seq("k"))
    assert(aj.exceptAll(pj).isEmpty && pj.exceptAll(aj).isEmpty)
  }

  test("skew-state meta pins the sketch parameters: mismatched appends " +
      "fail loudly; reads use the STORED thetaK") {
    import spark.implicits._
    val df = (1 to 500).map(k => s"k$k").toDF("k")
    val dir = tmpDir("skewmeta")
    Salting.writeSkewState(df, Seq("k"), dir, thetaK = 512)
    // an append at the default thetaK=256 must refuse, not corrupt
    val e = intercept[IllegalArgumentException] {
      Salting.appendSkewState(df, Seq("k"), dir) // thetaK defaults to 256
    }
    assert(e.getMessage.contains("thetaK"))
    // a read at the (wrong) default is CORRECTED by the stored meta:
    // same report as an explicit thetaK=512 read
    val viaDefault = Salting.skewReportFromState(spark, dir).head.toString
    val viaExplicit = Salting.skewReportFromState(spark, dir,
      thetaK = 512).head.toString
    assert(viaDefault == viaExplicit)
    // the frames seam (r15): the report over caller-held state frames
    // == the dir read (skewReportFromState delegates), and the salt
    // decision off an already-computed row == the dir-read decision
    val viaFrames = Salting.skewReportFromFrames(
      spark.read.parquet(s"$dir/theta"), spark.read.parquet(s"$dir/cm"),
      spark.read.parquet(s"$dir/cands"), thetaK = 512).head
    assert(viaFrames.toString == viaExplicit)
    assert(Salting.saltsFromReportRow(viaFrames) ==
      Salting.saltsFromState(spark, dir))
  }
}
