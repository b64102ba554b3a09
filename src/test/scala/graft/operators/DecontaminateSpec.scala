package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("overlap fractions: exact copy 1.0, disjoint 0.0, partial in between") {
    val bench = Seq((100L, "the quick brown fox jumps over lazy dogs"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over lazy dogs"), // verbatim copy
      (2L, "completely different words entirely here now"), // disjoint
      (3L, "the quick brown fox went somewhere else today") // shares a prefix
    ).toDF("doc_id", "text")
    val out = Decontaminate.overlap(corpus, bench, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L)._3 == 1.0)
    assert(out(2L)._3 == 0.0)
    assert(out(3L)._3 > 0.0 && out(3L)._3 < 1.0)
    // 8 tokens → 6 distinct 3-shingles
    assert(out(1L)._1 == 6L && out(1L)._2 == 6L)
  }

  test("every corpus doc appears, even empty/short ones") {
    val bench = Seq((9L, "a b c")).toDF("doc_id", "text")
    val corpus = Seq((1L, ""), (2L, "solo"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Decontaminate.overlap(corpus, bench, "text", "doc_id")
    assert(out.count() == 3)
    // short docs collapse to one whole-text shingle (shingleRows contract)
    assert(out.filter(col("n_shingles") === 1).count() == 3)
  }

  test("semanticOverlap: a verbatim leak flags at 1.0, a paraphrase-close " +
      "vector flags above the dial, orthogonal vectors stay clean; " +
      "unscorable embeddings drop") {
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val corpus = Seq(
      (1L, v(1, 0, 0, 0)), // verbatim leak → cosine 1.0
      (2L, v(0.9, 0.1, 0, 0)), // near the leak direction → high cosine
      (3L, v(0, 0, 0, 1)), // orthogonal to every benchmark vector
      (4L, null.asInstanceOf[Array[Float]]) // unscorable → drops
    ).toDF("vec_id", "embedding")
    val bench = Seq(
      (100L, v(1, 0, 0, 0)),
      (101L, v(0, 1, 0, 0))
    ).toDF("vec_id", "embedding")
    val out = Decontaminate.semanticOverlap(corpus, bench, "embedding",
        "vec_id", minCosine = 0.9)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L), s"null embedding must drop: $out")
    assert(out(1L)._1 == 100L && out(1L)._2 == 1.0 && out(1L)._3)
    assert(out(2L)._1 == 100L && out(2L)._2 > 0.9 && out(2L)._3)
    assert(out(3L)._2 == 0.0 && !out(3L)._3)
    // ties break to the lower benchmark id: a corpus vector equidistant
    // from two benchmark vectors reports the lower id
    val tied = Decontaminate.semanticOverlap(
        Seq((5L, v(1, 1, 0, 0))).toDF("vec_id", "embedding"),
        bench, "embedding", "vec_id", minCosine = 0.9)
      .head()
    assert(tied.getLong(1) == 100L && !tied.getBoolean(3))
  }
}
