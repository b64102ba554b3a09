package graft

/** The bench tail line: the complete per-query wall map, sized to ALWAYS
  * parse whole out of the driver's 2000-char tail capture (sbt appends
  * its own "[success] …" line after us, so the budget is 1840 chars).
  *
  * Extracted from [[Bench]] so the degradation ladder is spec-testable
  * without running a bench (BenchFormatSpec pins: ≤ budget at 260
  * synthetic queries, per-query resolution never coarser than 0.1 s,
  * and `n`/`n_err` present in EVERY tier — r12's two coarsest tiers
  * dropped the error count exactly on the runs most likely to need it,
  * and degraded values to INTEGER seconds, blinding the cross-round
  * "zero sub-second regressions" gate; both fixed here).
  *
  * Degradation ladder (first line that fits wins):
  *  1. full keys, 4 dp seconds
  *  2. full keys, 2 dp
  *  3. stripped keys (`"140"` for `q140_bm25_batch`, restored by the
  *     self-describing `key_prefix` field), 2 dp
  *  4. stripped keys, adaptive 2 dp/1 dp
  *  5. stripped keys, 1 dp seconds
  *  6. stripped keys, INTEGER DECISECONDS (`"q_unit":"ds"` — a parser
  *     that applies the unit can never misread by 10×; 0.1 s is the
  *     resolution FLOOR of the whole ladder)
  *  7. packed deciseconds: the sorted numeric ids compress to range
  *     runs (`"q_ids":"1-188"`) and the values ride one comma-separated
  *     string in id order (`"q_ds":"3,27,…"`) — ~6× denser than the
  *     object form, still one self-describing JSON line, still 0.1 s.
  *     Fits ~600 queries; [[decodeTail]] round-trips it exactly.
  *
  * The 4 dp full-precision line + the durable SPARK_GRAFT_BENCH_OUT
  * copy remain the precision-of-record; this line is the
  * parse-of-record.
  */
object BenchFormat {

  val Budget = 1840

  def jstr(s: String): String =
    "\"" + s.replaceAll("[\"\\\\\\n\\r\\t]", " ") + "\""
  def jnum(v: Double): String =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
  def jnum2(v: Double): String =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
  private def fmt1(v: Double): String =
    BigDecimal(v).setScale(1, BigDecimal.RoundingMode.HALF_UP).toString
  private def fmtAd(v: Double): String = // 3 significant-ish digits
    if (v < 10) jnum2(v) else fmt1(v)
  /** Integer deciseconds — the ladder's resolution floor. */
  def ds(v: Double): Long =
    BigDecimal(v * 10).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** `"1-5,7,9-12"` for sorted distinct ids — the packed-tier key side. */
  private[graft] def packRanges(ids: Seq[Long]): String = {
    val runs = scala.collection.mutable.ListBuffer[(Long, Long)]()
    for (id <- ids) runs.lastOption match {
      case Some((a, b)) if id == b + 1 => runs(runs.size - 1) = (a, id)
      case _ => runs += ((id, id))
    }
    runs.map { case (a, b) => if (a == b) s"$a" else s"$a-$b" }.mkString(",")
  }

  private[graft] def unpackRanges(s: String): Seq[Long] =
    if (s.isEmpty) Seq.empty
    else s.split(",").toIndexedSeq.flatMap { run =>
      run.split("-") match {
        case Array(a, b) => a.toLong to b.toLong
        case Array(a) => Seq(a.toLong)
      }
    }

  /** Build the tail line for `ok` (queries with ≥1 successful round),
    * walls in seconds. `nAll` is the total query count (so
    * `n_err = nAll - ok.size` — present in every tier).
    *
    * r14 verdict task 1 — the tail must SELF-ADJUDICATE contention:
    * `cpu` (per-query process-CPU seconds of the winning round) and
    * `load` (the run-wide load block JSON) ride every tier that fits,
    * cpu in the same encoding as the walls (`"cpu":{…}` object form,
    * `"c_ds"` packed deciseconds). The box swings 1.4–1.7× wall on
    * constant CPU, so a wall map without a cpu map cannot distinguish
    * a regression from a co-tenant burst — two rounds of judge
    * re-runs existed only because this line didn't carry it. When
    * even the packed cpu map cannot fit (≫250 queries), cpu drops
    * LAST, before any wall resolution is lost — the wall ladder below
    * is unchanged from r12.
    */
  def tailLine(ok: Seq[String], wall: Map[String, Double], total: Double,
      nAll: Int, sfName: String,
      cpu: Map[String, Double] = Map.empty,
      load: String = ""): String = {
    val sorted = ok.sorted
    val haveCpu = sorted.forall(cpu.contains)
    val loadField = if (load.isEmpty) "" else s""""load":$load,"""
    // short key = the qNNN prefix, unless that collides
    val shortKey0 = ok.map(k => k -> k.takeWhile(_ != '_')).toMap
    val shortKey: Map[String, String] =
      if (shortKey0.values.toSet.size == ok.size) shortKey0
      else ok.map(k => k -> k).toMap
    def line(strip: Boolean, f: Double => String, extra: String = "",
        cpuF: Option[Double => String] = None): String = {
      val key: String => String =
        if (strip) k => shortKey(k).stripPrefix("q") else shortKey
      val qs = sorted.map(k => jstr(key(k)) + ":" + f(wall(k)))
        .mkString("{", ",", "}")
      val cs = cpuF.filter(_ => haveCpu).map { cf =>
        sorted.map(k => jstr(key(k)) + ":" + cf(cpu(k)))
          .mkString(""""cpu":{""", ",", "},")
      }.getOrElse("")
      val pfx = if (strip) """"key_prefix":"q",""" else ""
      s"""{"metric":"total","value":${jnum2(total)},"unit":"sec",""" +
        s""""n":${ok.size},"n_err":${nAll - ok.size},$pfx$extra""" +
        s"""$cs$loadField"queries":$qs,"sf":"$sfName"}"""
    }
    // packed tier: only when every stripped key is a distinct integer
    // (all current names are qNNN_…; a non-numeric residue falls back
    // to the object ds tier, which is still decisecond-floored)
    val numericIds = sorted.flatMap { k =>
      val s = shortKey(k).stripPrefix("q")
      if (s.nonEmpty && s.forall(_.isDigit)) Some(k -> s.toLong) else None
    }
    def packed(withCpu: Boolean): Option[String] =
      if (numericIds.size == sorted.size &&
          numericIds.map(_._2).distinct.size == sorted.size) {
        val byId = numericIds.sortBy(_._2)
        val vals = byId.map { case (k, _) => ds(wall(k)).toString }.mkString(",")
        val cs = if (withCpu && haveCpu)
          byId.map { case (k, _) => ds(cpu(k)).toString }
            .mkString(""""c_ds":"""", ",", "\",")
        else ""
        Some(s"""{"metric":"total","value":${jnum2(total)},"unit":"sec",""" +
          s""""n":${ok.size},"n_err":${nAll - ok.size},"key_prefix":"q",""" +
          s""""q_unit":"ds","q_ids":"${packRanges(byId.map(_._2))}",""" +
          s"""$cs$loadField"q_ds":"$vals","sf":"$sfName"}""")
      } else None
    // cpu resolution degrades ahead of wall resolution at every step
    // (cpu flags contention, cpu ≪ wall or cpu ≈ const across rounds —
    // it never ranks queries); cpu drops entirely only after the
    // densest packed-with-cpu tier fails to fit
    val withCpu = Seq(
      line(strip = false, jnum, cpuF = Some(jnum2)),
      line(strip = false, jnum2, cpuF = Some(jnum2)),
      line(strip = true, jnum2, cpuF = Some(fmt1)),
      line(strip = true, fmtAd, cpuF = Some(fmt1)),
      line(strip = true, fmt1, cpuF = Some(v => ds(v).toString),
        extra = """"c_unit":"ds","""),
      line(strip = true, v => ds(v).toString,
        extra = """"q_unit":"ds","c_unit":"ds",""",
        cpuF = Some(v => ds(v).toString))) ++ packed(withCpu = true)
    val wallOnly = Seq(
      line(strip = false, jnum), line(strip = false, jnum2),
      line(strip = true, jnum2), line(strip = true, fmtAd),
      line(strip = true, fmt1),
      line(strip = true, v => ds(v).toString, extra = """"q_unit":"ds",""")) ++
      packed(withCpu = false)
    val candidates = (if (haveCpu) withCpu else Seq.empty) ++ wallOnly
    candidates.find(_.length <= Budget).getOrElse(candidates.last)
  }

  /** The cpu half of a [[tailLine]]: `name → process-CPU seconds`, from
    * either the `"cpu":{…}` object form or the packed `"c_ds"` string
    * (ids from `q_ids`, same order). Empty map when the line carries no
    * cpu (a pre-r15 artifact, or the ≫250-query drop tier).
    */
  def decodeTailCpu(line: String): Map[String, Double] = {
    def field(name: String): Option[String] = {
      val m = java.util.regex.Pattern
        .compile("\"" + name + "\":(\"([^\"]*)\"|([0-9.\\-]+))")
        .matcher(line)
      if (m.find()) Option(m.group(2)).orElse(Option(m.group(3))) else None
    }
    val prefix = field("key_prefix").getOrElse("")
    (field("q_ids"), field("c_ds")) match {
      case (Some(ids), Some(vals)) =>
        val idSeq = unpackRanges(ids)
        val vs = if (vals.isEmpty) Seq.empty[String]
          else vals.split(",").toIndexedSeq
        require(idSeq.size == vs.size,
          s"packed id/cpu count mismatch: ${idSeq.size} vs ${vs.size}")
        idSeq.zip(vs).map { case (id, v) =>
          s"$prefix$id" -> v.toDouble / 10.0 }.toMap
      case _ =>
        val unit = field("c_unit").getOrElse("sec")
        def toSec(v: Double) = if (unit == "ds") v / 10.0 else v
        val m = java.util.regex.Pattern
          .compile("\"cpu\":\\{([^}]*)\\}").matcher(line)
        if (!m.find()) Map.empty
        else m.group(1).split(",").filter(_.nonEmpty).map { kv =>
          val Array(k, v) = kv.split(":", 2)
          prefix + k.stripPrefix("\"").stripSuffix("\"") -> toSec(v.toDouble)
        }.toMap
    }
  }

  /** Round-trip a [[tailLine]] back to `(n, n_err, name → seconds)` —
    * the spec's proof that every tier (including packed) preserves
    * per-query values at ≤0.1 s resolution, and a parser reference for
    * anyone reading the artifact. Hand-rolled for this line's known
    * shape (flat JSON, one object field) — not a general JSON parser.
    */
  def decodeTail(line: String): (Int, Int, Map[String, Double]) = {
    def field(name: String): Option[String] = {
      val m = java.util.regex.Pattern
        .compile("\"" + name + "\":(\"([^\"]*)\"|([0-9.\\-]+))")
        .matcher(line)
      if (m.find()) Option(m.group(2)).orElse(Option(m.group(3))) else None
    }
    val n = field("n").map(_.toInt).getOrElse(0)
    val nErr = field("n_err").map(_.toInt).getOrElse(0)
    val prefix = field("key_prefix").getOrElse("")
    val unit = field("q_unit").getOrElse("sec")
    def toSec(v: Double) = if (unit == "ds") v / 10.0 else v
    val queries: Map[String, Double] = (field("q_ids"), field("q_ds")) match {
      case (Some(ids), Some(vals)) =>
        val idSeq = unpackRanges(ids)
        val vs = if (vals.isEmpty) Seq.empty[String]
          else vals.split(",").toIndexedSeq
        require(idSeq.size == vs.size,
          s"packed id/value count mismatch: ${idSeq.size} vs ${vs.size}")
        idSeq.zip(vs).map { case (id, v) =>
          s"$prefix$id" -> toSec(v.toDouble) }.toMap
      case _ =>
        val m = java.util.regex.Pattern
          .compile("\"queries\":\\{([^}]*)\\}").matcher(line)
        if (!m.find()) Map.empty
        else m.group(1).split(",").filter(_.nonEmpty).map { kv =>
          val Array(k, v) = kv.split(":", 2)
          prefix + k.stripPrefix("\"").stripSuffix("\"") -> toSec(v.toDouble)
        }.toMap
    }
    (n, nErr, queries)
  }
}
