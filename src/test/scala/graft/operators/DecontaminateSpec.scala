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
}
