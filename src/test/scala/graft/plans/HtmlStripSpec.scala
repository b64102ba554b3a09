package graft.plans

import graft.{SparkSpec, Tables}
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._

class HtmlStripSpec extends SparkSpec {
  import spark.implicits._

  private def adversarial = Seq(
    // pass ORDER is observable: the script match spans the comments,
    // so script-first (the chain's order) loses the x
    "<!-- <script> -->x<!-- </script> -->",
    // element open swallowing a nested '<'
    "<script <script>x</script>tail",
    // almost-open prefix before a real element
    "<scr<script>x</script>keep",
    // '<scriptfoo>' opens an element per the [^>]* contract
    "<scriptfoo>gone</script>still here",
    // unclosed element: open tag left for the tag pass
    "<script>never closed",
    "<style>also never closed",
    // unclosed comment and empty/degenerate tags
    "<!-- no close", "a <> b", "a < b > c",
    // entity ordering gauntlet
    "&amp;lt; &amp;amp; &lt;b&gt; &quot;&#39;&nbsp;",
    // case-insensitive element names
    "<SCRIPT>X</ScRiPt>kept <STYLE a=b>y</style>too",
    // whitespace soup incl. vertical tab and CR
    "a\t\n\f\r  b", "   ", "", "plain text",
    // entities that almost match
    "&lt &amp;; &nbsp",
  ).zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "text")

  test("kernel == composed regexp_replace chain on adversarial fixtures") {
    val bad = adversarial
      .withColumn("k", T.stripHtml($"text"))
      .withColumn("c", T.stripHtmlComposed($"text"))
      .filter($"k" =!= $"c")
    assert(bad.count() == 0,
      bad.select("text", "k", "c").collect().mkString("\n"))
  }

  test("kernel == composed chain on real documents wrapped in the q110 HTML") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val html = concat(
      lit("<html><head><title>Doc "), $"doc_id", lit("</title>"),
      lit("<style type=\"text/css\">body { color: red; }</style>"),
      lit("<script>var x = 1 < 2 && 3 > 2;</script></head><body>"),
      when($"doc_id" % 3 === 0, lit("<!-- hidden comment -->")).otherwise(lit("")),
      lit("<p class=\"main\">"), coalesce($"text", lit("")),
      lit("</p><div>Tom &amp; Jerry &lt;3 &quot;quoted&quot; " +
        "&#39;s&nbsp;end</div></body></html>"))
    val bad = docs.withColumn("h", html)
      .withColumn("k", T.stripHtml($"h"))
      .withColumn("c", T.stripHtmlComposed($"h"))
      .filter($"k" =!= $"c")
    assert(bad.count() == 0,
      bad.select("doc_id", "k", "c").limit(3).collect().mkString("\n"))
  }

  test("null propagates; SQL registration") {
    val df = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
    assert(df.select(T.stripHtml($"text")).head().isNullAt(0))
    GraftExtensions.register(spark)
    df.createOrReplaceTempView("hs_t")
    assert(spark.sql("SELECT graft_strip_html('a<b>c</b>') AS s").head().getString(0)
      == "a c")
  }
}
