package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(Option(text)).toDF("t").select(c.as("r")).head().getAs[T]("r")

  test("tokens: empty/null/whitespace-only → 0; multi-space collapses") {
    assert(one[Int](TextFunctions.tokenCount(col("t")), "a  b\t c") == 3)
    assert(one[Int](TextFunctions.tokenCount(col("t")), "") == 0)
    assert(one[Int](TextFunctions.tokenCount(col("t")), "   ") == 0)
    assert(one[Int](TextFunctions.tokenCount(col("t")), null) == 0)
  }

  test("subword count: words + punctuation marks") {
    assert(one[Int](TextFunctions.subwordCount(col("t")), "don't stop, now!") == 7)
    // don + ' + t + stop + , + now + !
  }

  test("ratios and quality are bounded and sane") {
    val q = one[Double](TextFunctions.qualityScore(col("t")),
      ("the quick brown fox and a dog " * 20).trim)
    assert(q > 0.5 && q <= 1.0)
    assert(one[Double](TextFunctions.punctRatio(col("t")), "a,b,c") == 0.4)
    assert(one[Double](TextFunctions.stopwordRatio(col("t"),
      TextFunctions.EnglishStopwords), "THE cat") == 0.5)
  }

  test("langId picks the dominant marker profile; und for no markers") {
    assert(one[String](TextFunctions.langId(col("t")),
      "the cat is one of the best") == "en")
    assert(one[String](TextFunctions.langId(col("t")),
      "der hund und die katze ist da") == "de")
    assert(one[String](TextFunctions.langId(col("t")),
      "đây là của và người") == "vi")
    assert(one[String](TextFunctions.langId(col("t")), "xyz qqq") == "und")
  }

  test("content fingerprint invariant to case/punct/spacing, sensitive to words") {
    val f = (s: String) => one[String](TextFunctions.contentFingerprint(col("t")), s)
    assert(f("Hello,   World!") == f("hello world"))
    assert(f("hello world") != f("hello worlds"))
  }

  test("word shingles: n-grams in order; short doc collapses to whole text") {
    val sh = Seq("a b c d").toDF("t")
      .select(TextFunctions.wordShingles(col("t"), 2).as("s"))
      .head().getSeq[String](0)
    assert(sh == Seq("a b", "b c", "c d"))
    val short = Seq("a b").toDF("t")
      .select(TextFunctions.wordShingles(col("t"), 5).as("s"))
      .head().getSeq[String](0)
    assert(short == Seq("a b"))
  }
}
