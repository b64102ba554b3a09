package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused HTML boilerplate strip — the native kernel behind
  * [[graft.functions.TextFunctions.stripHtml]]: six explicit scans
  * (script, style, comment, tag, entities, whitespace) over char
  * buffers, replacing the composed form's ELEVEN `regexp_replace`
  * passes whose intermediate strings each allocate per row on the
  * `normalizeText` ingest path.
  *
  * Semantics are the composed chain's EXACTLY — including its
  * observable pass ORDER: script elements strip before comments, so
  * `<!-- <script> -->x<!-- </script> -->` loses the x (the script
  * match spans the two comments), which a comment-first parser would
  * keep. HtmlStripSpec proves kernel == chain differentially on real
  * documents and on the adversarial-overlap fixtures; the q110 oracle
  * is unchanged because the chain it mirrors is unchanged.
  *
  * Pass contract mirrored from the regexes:
  *  - element passes: `(?is)<script[^>]*>.*?</script>` — "<script"
  *    case-insensitive, ANY non-'>' run (so `<scriptfoo>` opens one),
  *    lazy close; an unclosed element does NOT match (the open tag is
  *    left for the tag pass);
  *  - comment pass: `(?s)<!--.*?-->`, unclosed stays;
  *  - tag pass: `(?s)<[^>]+>` (non-empty body);
  *  - entities: one scan each for `&lt; &gt; &quot; &#39; &nbsp;` then
  *    `&amp;` LAST, never re-scanning a replacement (Java replaceAll
  *    resumes after the match, so `&amp;lt;` yields literal `&lt;`);
  *  - whitespace: runs of Java `\s` = ASCII `[ \t\n\x0B\f\r]` collapse
  *    to one space, then 0x20-trim (Spark's `trim`).
  */
case class HtmlStrip(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_strip_html requires string, got $t")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_html"

  override protected def nullSafeEval(input: Any): Any =
    HtmlStrip.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.HtmlStrip.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): HtmlStrip =
    copy(child = newChild)
}

object HtmlStrip {

  def compute(text: UTF8String): UTF8String = {
    var s = text.toString
    s = stripElement(s, "script")
    s = stripElement(s, "style")
    s = stripComments(s)
    s = stripTags(s)
    s = replaceAllLiteral(s, "&lt;", "<")
    s = replaceAllLiteral(s, "&gt;", ">")
    s = replaceAllLiteral(s, "&quot;", "\"")
    s = replaceAllLiteral(s, "&#39;", "'")
    s = replaceAllLiteral(s, "&nbsp;", " ")
    s = replaceAllLiteral(s, "&amp;", "&")
    UTF8String.fromString(collapseAndTrim(s))
  }

  private def regionMatchesCi(s: String, at: Int, lit: String): Boolean =
    s.regionMatches(true, at, lit, 0, lit.length)

  /** `(?is)<name[^>]*>.*?</name>` → " ", repeatedly, resuming after
    * each replacement like `replaceAll`.
    */
  private def stripElement(s: String, name: String): String = {
    val open = "<" + name
    val close = "</" + name + ">"
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '<' && regionMatchesCi(s, i, open)) {
        // [^>]* then '>' — no '>' means the open tag never matches
        var j = i + open.length
        while (j < s.length && s.charAt(j) != '>') j += 1
        if (j < s.length) {
          // lazy scan for the case-insensitive closer
          var k = j + 1
          var found = -1
          while (found < 0 && k + close.length <= s.length) {
            if (s.charAt(k) == '<' && regionMatchesCi(s, k, close)) found = k
            else k += 1
          }
          if (found >= 0) {
            out.append(' ')
            i = found + close.length
          } else { out.append(s.charAt(i)); i += 1 } // unclosed: no match
        } else { out.append(s.charAt(i)); i += 1 }
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** `(?s)<!--.*?-->` → " ". */
  private def stripComments(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '<' && s.startsWith("<!--", i)) {
        val end = s.indexOf("-->", i + 4)
        if (end >= 0) { out.append(' '); i = end + 3 }
        else { out.append(s.charAt(i)); i += 1 }
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** `(?s)<[^>]+>` → " " (body must be non-empty). */
  private def stripTags(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '<') {
        var j = i + 1
        while (j < s.length && s.charAt(j) != '>') j += 1
        if (j < s.length && j > i + 1) { out.append(' '); i = j + 1 }
        else { out.append(s.charAt(i)); i += 1 }
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** One literal-replace scan; resumes after each match (replacements
    * are never re-scanned within a pass).
    */
  private def replaceAllLiteral(s: String, find: String, repl: String): String = {
    var idx = s.indexOf(find)
    if (idx < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var from = 0
    while (idx >= 0) {
      out.append(s, from, idx).append(repl)
      from = idx + find.length
      idx = s.indexOf(find, from)
    }
    out.append(s, from, s.length)
    out.toString
  }

  private def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** `\s+` → " " then 0x20-trim. */
  private def collapseAndTrim(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isJavaWs(c)) {
        out.append(' ')
        while (i < s.length && isJavaWs(s.charAt(i))) i += 1
      } else { out.append(c); i += 1 }
    }
    var a = 0
    var b = out.length
    while (a < b && out.charAt(a) == ' ') a += 1
    while (b > a && out.charAt(b - 1) == ' ') b -= 1
    out.substring(a, b)
  }
}
