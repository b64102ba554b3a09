package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.{AuditableHash => H, TextFunctions => T}
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 256
  private val weights = QualityModel.stubWeights(dim)

  test("native score == composed explode/lookup reference on real documents") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").filter($"text".isNotNull)
    // independent composed form: explode tokens, hash each LOWERCASED
    // token, 1-based element_at against the weight array literal
    val wLit = typedlit(weights.toArray)
    val reference = docs
      .select($"doc_id", explode_outer(T.tokens($"text")).as("tok"))
      .withColumn("wv",
        when($"tok".isNull, lit(0L))
          .otherwise(element_at(wLit,
            (H.h60(lower($"tok")) % dim + 1).cast("int"))))
      .groupBy("doc_id").agg(sum($"wv").as("ref_score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = QualityModel.score(docs, "text", weights)
      .select("doc_id", "bow_score")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == reference)
    assert(native.nonEmpty)
  }

  test("NULL text scores NULL and fails the gate; empty scores 0 and passes at 0") {
    val edge = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "   "),
      (4L, "one token here")).toDF("doc_id", "text")
    val out = QualityModel.score(edge, "text", weights)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3))).toMap
    assert(out(1L) == ((None, false)), "NULL text: NULL score, gate fails")
    assert(out(2L) == ((Some(0L), true)), "empty text: score 0 passes at threshold 0")
    assert(out(3L) == ((Some(0L), true)), "whitespace-only text: score 0")
    assert(out(4L)._1.isDefined)
  }

  test("loadModel: checked-in export parses; bigram scoring == composed reference") {
    val path = getClass.getResource("/quality_model_tiny.txt").getPath
    val model = QualityModel.loadModel(path)
    assert(model.dim == 16 && model.scale == 1000L && model.bigrams)
    // sparse buckets default to 0; listed ones land where declared
    assert(model.weights(0) == 125L && model.weights(1) == -770L)
    assert(model.weights(2) == 0L && model.weights(8) == 990L)

    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").filter($"text".isNotNull).limit(200)
    // composed reference: unigram pass + bigram pass, each hashing the
    // LOWERCASED space-joined window (the ShingleHashes contract)
    val wLit = typedlit(model.weights.toArray)
    def pass(tokCol: org.apache.spark.sql.Column) =
      sum(when(tokCol.isNull, lit(0L)).otherwise(
        element_at(wLit, (H.h60(lower(tokCol)) % model.dim + 1).cast("int"))))
    val toks = docs.select($"doc_id",
      posexplode_outer(T.tokens($"text")).as(Seq("pos", "tok")))
    val uni = toks.groupBy("doc_id").agg(pass($"tok").as("u"))
    val bi = toks.alias("a")
      .join(toks.alias("b"),
        $"a.doc_id" === $"b.doc_id" && $"a.pos" + 1 === $"b.pos")
      .select($"a.doc_id".as("doc_id"),
        concat($"a.tok", lit(" "), $"b.tok").as("bg"))
      .groupBy("doc_id").agg(pass($"bg").as("b"))
    val reference = uni.join(bi, Seq("doc_id"), "left")
      .select($"doc_id", ($"u" + coalesce($"b", lit(0L))).as("ref"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = QualityModel.scoreWith(docs, "text", model)
      .select("doc_id", "bow_score")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == reference)
    assert(native.nonEmpty)
  }

  test("loadModel rejects malformed exports loudly") {
    def tmpModel(lines: String*): String = {
      val f = java.io.File.createTempFile("qmodel", ".txt")
      f.deleteOnExit()
      val w = new java.io.PrintWriter(f)
      try lines.foreach(w.println) finally w.close()
      f.getPath
    }
    def rejects(lines: String*): Unit =
      intercept[IllegalArgumentException](
        QualityModel.loadModel(tmpModel(lines: _*)))
    rejects("scale 1000")                    // missing dim
    rejects("w 0 5", "dim 4")                // w before dim
    rejects("dim 4", "w 4 5")                // bucket out of range
    rejects("dim 4", "w 1 5", "w 1 6")       // duplicate bucket
    rejects("dim 4", "w 1 notanumber")       // bad weight
    rejects("dim 4", "frobnicate 9")         // unknown directive
    // and the happy path parses with defaults
    val m = QualityModel.loadModel(tmpModel("dim 4", "w 2 7"))
    assert(m.dim == 4 && m.scale == 1000L && !m.bigrams)
    assert(m.weights == IndexedSeq(0L, 0L, 7L, 0L))
  }

  test("filterByScore keeps exactly the passing rows; stub weights deterministic") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val scored = QualityModel.score(docs, "text", weights).cache()
    try {
      val passing = scored.filter($"quality_pass").select("doc_id")
        .as[Long].collect().toSet
      val kept = QualityModel.filterByScore(docs, "text", weights)
        .select("doc_id").as[Long].collect().toSet
      assert(kept == passing)
      assert(passing.nonEmpty && passing.size < docs.count(),
        "threshold 0 should split the corpus both ways")
    } finally scored.unpersist()
    assert(QualityModel.stubWeights(dim) == weights)
    assert(weights.forall(w => w >= -1000L && w <= 1000L))
  }

  test("train: separable corpus converges; weights deterministic under repartition; kernel round-trip") {
    // two disjoint-vocabulary classes, slight per-doc variation so the
    // problem isn't a single repeated row
    val docs = ((0 until 30).map(i =>
      (i.toLong, s"alpha beta gamma delta tok$i alpha beta", 1L)) ++
      (30 until 60).map(i =>
        (i.toLong, s"omega psi chi phi tok$i omega psi", 0L)))
      .toDF("id", "text", "y")
    val m = QualityModel.train(docs, "text", "y", "id", dim = 64, iters = 8)
    assert(m.scale == QualityModel.TrainScale && !m.bigrams && m.dim == 64)
    // the fitted weights separate the classes through the INFERENCE
    // kernel (scoreWith) — the round-trip that makes training real
    val scored = QualityModel.scoreWith(docs, "text", m)
      .select($"y", $"bow_score").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val good = scored.filter(_._1 == 1L).map(_._2)
    val bad = scored.filter(_._1 == 0L).map(_._2)
    assert(good.min > bad.max,
      s"classes must separate: good min ${good.min} vs bad max ${bad.max}")
    assert(good.min > 0L && bad.max < 0L, "zero threshold splits them")
    // exact-integer gradient discipline: identical weights regardless
    // of input partitioning
    val m2 = QualityModel.train(docs.repartition(7), "text", "y", "id",
      dim = 64, iters = 8)
    assert(m2.weights == m.weights)

    // held-out evaluation: a disjoint-vocab model is perfect on a
    // held-out slice of the same distribution
    val holdout = ((60 until 70).map(i =>
      (i.toLong, s"alpha beta gamma held$i", 1L)) ++
      (70 until 80).map(i => (i.toLong, s"omega psi chi held$i", 0L)))
      .toDF("id", "text", "y")
    val ev = QualityModel.evaluate(holdout, "text", "y", m).head()
    assert(ev.getAs[Long]("tp") == 10L && ev.getAs[Long]("tn") == 10L &&
      ev.getAs[Long]("fp") == 0L && ev.getAs[Long]("fn") == 0L)
    assert(ev.getAs[Double]("accuracy") == 1.0 &&
      ev.getAs[Double]("precision") == 1.0 && ev.getAs[Double]("recall") == 1.0)
    // empty test set: zero counts, NULL metrics — never a fake score
    val empty = QualityModel.evaluate(holdout.limit(0), "text", "y", m).head()
    assert(empty.getAs[Long]("tp") == 0L && empty.getAs[Long]("tn") == 0L)
    assert(empty.isNullAt(empty.fieldIndex("accuracy")) &&
      empty.isNullAt(empty.fieldIndex("precision")) &&
      empty.isNullAt(empty.fieldIndex("recall")))
  }
}
