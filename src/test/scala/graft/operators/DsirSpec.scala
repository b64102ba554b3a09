package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {

  import spark.implicits._

  test("log2Fp: exact fixed-point binary log, monotone, matches the SQL recursive form") {
    // anchor values cross-checked against the DuckDB recursive CTE the
    // q113 oracle runs (same repeated-squaring algorithm)
    assert(Dsir.log2Fp(1L) == 0L)
    assert(Dsir.log2Fp(2L) == 1024L)
    assert(Dsir.log2Fp(3L) == 1623L)
    assert(Dsir.log2Fp(7L) == 2874L)
    assert(Dsir.log2Fp(9170L) == 13478L)
    assert(Dsir.log2Fp(1048576L) == 20480L)
    assert(Dsir.log2Fp(999999937L) == 30614L)
    // within one fixed-point unit of the float log2, and monotone
    var prev = -1L
    for (n <- Seq(1L, 2L, 5L, 100L, 12345L, 1L << 40, (1L << 62) - 1)) {
      val fp = Dsir.log2Fp(n)
      val float = math.log(n.toDouble) / math.log(2.0) * 1024.0
      assert(math.abs(fp - float) <= 2.0, s"log2Fp($n)=$fp vs $float")
      assert(fp >= prev); prev = fp
    }
  }

  test("fitWeights: target-only features weigh positive, raw-only negative; smoothing keeps unseen finite") {
    val target = Seq((0L, "alpha alpha alpha"), (10L, "alpha beta")).toDF("doc_id", "text")
    val raw = Seq((1L, "gamma gamma"), (2L, "gamma delta")).toDF("doc_id", "text")
    val dim = 4096
    val w = Dsir.fitWeights(target, raw, "text", dim)
    assert(w.length == dim)
    def bucket(tok: String): Int =
      (graft.functions.AuditableHash.h60(tok) % dim).toInt
    // fixture precondition: the 8 features must not collide mod dim,
    // or the per-bucket assertions below test the wrong thing
    val feats = Seq("alpha", "beta", "gamma", "delta", "alpha beta",
      "alpha alpha", "gamma gamma", "gamma delta")
    assert(feats.map(bucket).distinct.size == feats.size,
      "fixture features collide mod dim — pick different words")
    assert(w(bucket("alpha")) > 0, "target-frequent token must weigh positive")
    assert(w(bucket("gamma")) < 0, "raw-frequent token must weigh negative")
    // a bucket neither side saw gets the smoothed prior log(1/(Nt+dim)) -
    // log(1/(Nr+dim)) — finite, small
    val unseen = (0 until dim).toSet -- feats.map(bucket)
    unseen.foreach(b => assert(math.abs(w(b)) < 1024,
      s"unseen bucket $b weight ${w(b)} should be within one log2 unit"))
  }

  test("score: log-likelihood-ratio ranks target-like docs above raw-like ones; NULL/empty contracts") {
    val target = Seq((0L, "the quick brown fox"), (10L, "the lazy dog")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "the quick brown fox jumps"), // target-like
      (2L, "zzz qqq xxx www vvv"),       // nothing in common
      (3L, null.asInstanceOf[String]),
      (4L, "   ")).toDF("doc_id", "text")
    val w = Dsir.fitWeights(target, raw, "text", 256)
    val got = Dsir.score(raw, "text", w)
      .collect().map(r => r.getLong(0) -> Option(r.get(2)).map(_.toString.toLong)).toMap
    assert(got(1L).get > got(2L).get, "target-like doc must outscore alien doc")
    assert(got(3L).isEmpty, "NULL text scores NULL")
    assert(got(4L).contains(0L), "token-less text scores 0")
  }

  test("selectTop: distributed rank == single-window reference; floor(N*num/den) rows; NULLs never selected") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val target = docs.filter($"doc_id" % 10 === 0)
    val raw = docs.filter($"doc_id" % 10 =!= 0)
    val w = Dsir.fitWeights(target, raw, "text", 1024)
    val scored = Dsir.score(raw, "text", w).cache()
    try {
      val got = Dsir.selectTop(scored, "dsir_score", "doc_id", 20, 100)
        .select($"doc_id", $"selected")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      // reference: driver-side sort of the scored rows
      val rows = scored.select($"doc_id", $"dsir_score")
        .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.toString.toLong)))
      val ranked = rows.collect { case (id, Some(s)) => (id, s) }
        .sortBy { case (id, s) => (-s, id) }
      val k = (ranked.length.toLong * 20L / 100L).toInt
      val expect = ranked.take(k).map(_._1).toSet
      assert(got.count(_._2) == k, s"exactly floor(N*0.2) = $k selected")
      assert(got.filter(_._2).keySet == expect,
        "distributed rank must equal the single-window reference")
      rows.collect { case (id, None) => id }
        .foreach(id => assert(!got(id), s"NULL-scored $id must not be selected"))
      assert(got.size == rows.length, "every input row classified")
    } finally scored.unpersist()
  }

  test("incremental count state: daily merge == one-shot; subtract retracts exactly; corruption fails loudly") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val dim = 1024
    def dense(c: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      c.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // additive merge over disjoint daily slices == the one-shot count
    val merged = (0 to 2)
      .map(d => Dsir.bucketCountsDf(docs.filter($"doc_id" % 3 === d), "text", dim))
      .reduce(Dsir.mergeCounts)
    assert(dense(merged) == dense(Dsir.bucketCountsDf(docs, "text", dim)))
    // subtracting a slice's counts == counting the remainder
    val takedown = docs.filter($"doc_id" % 13 === 5)
    val after = Dsir.subtractCounts(merged,
      Dsir.bucketCountsDf(takedown, "text", dim))
    assert(dense(after) ==
      dense(Dsir.bucketCountsDf(docs.filter($"doc_id" % 13 =!= 5), "text", dim)))
    // weights from the maintained state == weights fit from scratch
    val target = docs.filter($"doc_id" % 10 === 0)
    val pool = docs.filter($"doc_id" % 10 =!= 0)
    val viaState = Dsir.weightsFrom(
      Dsir.bucketCountsDf(target, "text", dim),
      Dsir.bucketCountsDf(pool, "text", dim), dim)
    assert(viaState.sameElements(Dsir.fitWeights(target, pool, "text", dim)))
    // over-subtraction (docs never counted in) must fail loudly, not
    // skew: subtracting the full corpus from a takedown-only state is
    // guaranteed to drive shared buckets negative
    val corrupted = Dsir.subtractCounts(
      Dsir.bucketCountsDf(takedown, "text", dim),
      Dsir.bucketCountsDf(docs, "text", dim))
    intercept[IllegalArgumentException] {
      Dsir.weightsFrom(Dsir.bucketCountsDf(target, "text", dim), corrupted, dim)
    }
  }

  test("selectLikeTarget: selection actually shifts the pool toward the target distribution") {
    // synthetic two-dialect corpus: target speaks A; the raw pool is a
    // mix. The selected 30% must be overwhelmingly dialect-A docs.
    val aWords = Seq("alpha", "beta", "gamma", "delta")
    val bWords = Seq("omega", "sigma", "kappa", "theta")
    def doc(words: Seq[String], seed: Long): String =
      (0 until 12).map(i => words(((seed * 31 + i * 7) % 4).toInt)).mkString(" ")
    val target = (0L until 40L).map(i => (i * 10, doc(aWords, i))).toDF("doc_id", "text")
    val raw = ((0L until 50L).map(i => (i * 10 + 1, doc(aWords, i + 100))) ++
      (0L until 150L).map(i => (i * 10 + 2, doc(bWords, i)))).toDF("doc_id", "text")
    val sel = Dsir.selectLikeTarget(target, raw, "text", "doc_id",
        dim = 512, num = 30, den = 100)
      .filter($"selected").select($"doc_id")
      .collect().map(_.getLong(0))
    assert(sel.length == 60) // floor(200 * 0.3)
    val aSelected = sel.count(_ % 10 == 1)
    assert(aSelected == 50,
      s"all 50 dialect-A raw docs must be selected, got $aSelected")
  }
}
