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
}
