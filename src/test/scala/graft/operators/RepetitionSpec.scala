package graft.operators

import graft.SparkSpec

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("repeated text scores high, varied text zero, short text NULL") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"), // one distinct 3-gram, 4 total
      (2L, "all words here are fully unique"), // 4 grams, all distinct
      (3L, "too short"), // < 3 tokens → no grams
      (4L, "a b c") // exactly one gram
    ).toDF("doc_id", "text")
    val out = TermStats.nGramRepetition(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out(1L) == ((4L, 1L, Some(0.75))))
    assert(out(2L) == ((4L, 4L, Some(0.0))))
    assert(out(3L) == ((0L, 0L, None)))
    assert(out(4L) == ((1L, 1L, Some(0.0))))
  }

  test("counts raw occurrences, not the distinct-shingle set") {
    // "x y x y x y": grams = [x y x, y x y, x y x, y x y] → 4 total, 2 distinct
    val docs = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
    val r = TermStats.nGramRepetition(docs, "text", "doc_id").head
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L && r.getDouble(3) == 0.5)
  }
}
