package graft.control

import graft.operators.AggSpec
import javax.xml.parsers.DocumentBuilderFactory
import scala.jdk.CollectionConverters._

/** Reference-shaped XML configuration (`config.xml:86-123`, consumed at
  * `datamart/load_to_dm.py:104-113`): declarative mart specs
  *
  * {{{
  * <aggregates><table>
  *   <name>agg_job_by_company</name>
  *   <source>job</source>
  *   <groupBy>company_name</groupBy>
  *   <metrics><metric>COUNT(*) AS total_jobs</metric></metrics>
  * </table>…</aggregates>
  * }}}
  *
  * Parsed with the JDK DOM (no extra dependency). Metric strings go
  * through `expr(...)` (AggSpec) — the same "config is SQL fragments"
  * contract as the reference, but Catalyst-validated at plan time.
  */
object AppConfig {

  final case class MartTable(name: String, source: String, spec: AggSpec)

  def loadMartSpecs(xmlPath: String): Seq[MartTable] = {
    val doc = DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.File(xmlPath))
    val tables = doc.getElementsByTagName("table")
    (0 until tables.getLength).map { i =>
      val el = tables.item(i).asInstanceOf[org.w3c.dom.Element]
      def texts(tag: String): Seq[String] = {
        val nodes = el.getElementsByTagName(tag)
        (0 until nodes.getLength).map(j => nodes.item(j).getTextContent.trim)
      }
      def required(tag: String): String = {
        val vs = texts(tag)
        require(vs.nonEmpty && vs.head.nonEmpty,
          s"mart config: <table> #${i + 1} is missing <$tag> ($xmlPath)")
        vs.head
      }
      val metrics = texts("metric")
      require(metrics.nonEmpty,
        s"mart config: <table> #${i + 1} has no <metric> entries ($xmlPath)")
      val name = required("name")
      // multiple <groupBy> elements → composite grouping (AggSpec
      // supports it; silently using only the first would collapse rows)
      val groupBys = texts("groupBy").filter(_.nonEmpty)
      require(groupBys.nonEmpty,
        s"mart config: <table> #${i + 1} is missing <groupBy> ($xmlPath)")
      MartTable(name, required("source"), AggSpec(name, groupBys, metrics))
    }
  }
}
