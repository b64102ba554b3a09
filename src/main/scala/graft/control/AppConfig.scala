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
      def text(tag: String): String =
        el.getElementsByTagName(tag).item(0).getTextContent.trim
      val metricNodes = el.getElementsByTagName("metric")
      val metrics = (0 until metricNodes.getLength)
        .map(j => metricNodes.item(j).getTextContent.trim)
      val name = text("name")
      MartTable(name, text("source"),
        AggSpec(name, Seq(text("groupBy")), metrics))
    }
  }
}
