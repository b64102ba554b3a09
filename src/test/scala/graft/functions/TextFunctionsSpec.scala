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

  test("native TextStats == original HOF forms on real documents + edge strings") {
    import org.apache.spark.sql.functions._
    val T = TextFunctions
    // the original composed forms, inlined here as the reference
    def toksOf(c: org.apache.spark.sql.Column) = T.tokens(c)
    def refTokenCount(c: org.apache.spark.sql.Column) = size(toksOf(c))
    def refSubword(c: org.apache.spark.sql.Column) =
      when(c.isNull, lit(0))
        .otherwise(size(regexp_extract_all(c, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0))))
    def refStopRatio(c: org.apache.spark.sql.Column) = {
      val toks = toksOf(lower(c))
      val sw = array(T.EnglishStopwords.map(lit): _*)
      when(size(toks) === 0, lit(0.0))
        .otherwise(size(filter(toks, t => array_contains(sw, t))).cast("double") /
          size(toks).cast("double"))
    }
    def refPunct(c: org.apache.spark.sql.Column) =
      when(c.isNull || length(c) === 0, lit(0.0))
        .otherwise(length(regexp_replace(c, "[^.,;:!?]", "")).cast("double") /
          length(c).cast("double"))
    def refMeanLen(c: org.apache.spark.sql.Column) = {
      val toks = toksOf(c)
      when(size(toks) === 0, lit(0.0))
        .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          size(toks).cast("double"))
    }
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text")).limit(300)
      .unionByName(Seq("", "   ", "thỏa thuận CỦA người!", "a\tb\nc", "...,;;").toDF("text"))
    val cmp = docs.select(
      (T.tokenCount(col("text")) <=> refTokenCount(col("text"))).as("a"),
      (T.subwordCount(col("text")) <=> refSubword(col("text"))).as("b"),
      (T.stopwordRatio(col("text"), T.EnglishStopwords) <=> refStopRatio(col("text"))).as("c"),
      (T.punctRatio(col("text")) <=> refPunct(col("text"))).as("d"),
      (T.meanTokenLen(col("text")) <=> refMeanLen(col("text"))).as("e"))
    assert(cmp.filter(!col("a") || !col("b") || !col("c") || !col("d") || !col("e")).isEmpty)
  }

  test("dupLineStats: counts + duplicate char mass; empties collapse; NULL propagates") {
    def st(text: String): org.apache.spark.sql.Row =
      one[org.apache.spark.sql.Row](TextFunctions.dupLineStats(col("t")), text)
    // "a b a c": one duplicate line carrying 1 repeated char
    assert(st("a\nb\na\nc").toSeq == Seq(4L, 3L, 1L, 4L, 1L))
    // trailing separators: empties are lines too and dedup like any value
    assert(st("x\n\nx\n\n").toSeq == Seq(5L, 2L, 3L, 2L, 1L))
    // empty text is one empty line, nothing duplicated
    assert(st("").toSeq == Seq(1L, 1L, 0L, 0L, 0L))
    assert(st(null).toSeq.forall(_ == null))
    // multi-char separator
    val para = one[org.apache.spark.sql.Row](
      TextFunctions.dupLineStats(col("t"), "\n\n"), "p\n\np\n\nq")
    assert(para.toSeq == Seq(3L, 2L, 1L, 3L, 1L))
  }

  test("dedupLines keeps first occurrences in order; NULL passes through") {
    assert(one[String](TextFunctions.dedupLines(col("t")), "a\nb\na\nc\nb") == "a\nb\nc")
    // second blank line drops (intra-doc: repeated blanks ARE redundancy)
    assert(one[String](TextFunctions.dedupLines(col("t")), "x\n\ny\n\nx") == "x\n\ny")
    assert(one[String](TextFunctions.dedupLines(col("t")), "") == "")
    assert(one[String](TextFunctions.dedupLines(col("t")), null) == null)
    assert(one[String](TextFunctions.dedupLines(col("t"), "\n\n"), "p\n\np\n\nq")
      == "p\n\nq")
  }

  test("content fingerprint invariant to case/punct/spacing, sensitive to words") {
    val f = (s: String) => one[String](TextFunctions.contentFingerprint(col("t")), s)
    assert(f("Hello,   World!") == f("hello world"))
    assert(f("hello world") != f("hello worlds"))
  }

  test("stripHtml: elements with content drop, tags drop, entities decode in safe order") {
    val cases = Seq(
      "<p>Hello <b>world</b></p>" -> "Hello world",
      // script/style content must vanish entirely, '<' inside included
      "<script>if (a < b && c > d) alert('x');</script>keep" -> "keep",
      "<style>.a { color: red; }</style>keep" -> "keep",
      "before<!-- secret -->after" -> "before after",
      // entity gauntlet: &amp; decodes LAST, so &amp;lt; -> literal &lt;
      "Tom &amp; Jerry &lt;3 &quot;q&quot; &#39;s&nbsp;end" ->
        "Tom & Jerry <3 \"q\" 's end",
      "&amp;lt;" -> "&lt;",
      // malformed nesting degrades to keeping text, never dropping it
      "<p>un<closed text" -> "un<closed text",
      "   spaced\n\nout   " -> "spaced out",
    )
    val df = cases.zipWithIndex
      .map { case ((in, out), i) => (i.toLong, in, out) }
      .toDF("id", "raw", "expect")
    val bad = df
      .withColumn("got", graft.functions.TextFunctions.stripHtml($"raw"))
      .filter($"got" =!= $"expect")
    assert(bad.count() == 0,
      bad.select("raw", "got", "expect").collect().mkString("; "))
  }

  test("normalizeUrl: authority lowers, path case survives, utm/fragment/ports strip") {
    val cases = Seq(
      "HTTPS://Example.COM/Path/X" -> "https://example.com/Path/X",
      "https://example.com:443/x" -> "https://example.com/x",
      "http://example.com:80" -> "http://example.com",
      // a :80 outside the authority is data, not a port
      "http://example.com/t?at=12:80/x" -> "http://example.com/t?at=12:80/x",
      "http://e.com/p#frag" -> "http://e.com/p",
      "http://e.com/p?utm_source=a&id=1" -> "http://e.com/p?id=1",
      "http://e.com/p?id=1&utm_campaign=x" -> "http://e.com/p?id=1",
      "http://e.com/p?utm_only=1" -> "http://e.com/p",
      "http://e.com/p?utm_a=1&utm_b=2" -> "http://e.com/p",
      // scheme-less input passes through the non-authority rules only
      "not a url #frag" -> "not a url",
      "  http://e.com/x  " -> "http://e.com/x",
    )
    val df = cases.zipWithIndex
      .map { case ((in, out), i) => (i.toLong, in, out) }
      .toDF("id", "raw", "expect")
    val bad = df
      .withColumn("got", graft.functions.TextFunctions.normalizeUrl($"raw"))
      .filter($"got" =!= $"expect")
    assert(bad.count() == 0,
      bad.select("raw", "got", "expect").collect().mkString("; "))
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
