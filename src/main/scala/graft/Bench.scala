package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark) // graft_dotq SQL surface
    // Warmup: pay one-time costs (executor spin-up, memory manager,
    // parquet footer caches, codegen JIT of the common operators) on a
    // tiny SF so per-query timings measure the queries, not the JVM.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // best-of-2: the first run of each query pays its whole-stage
    // codegen JIT; the second measures steady-state execution. Report
    // the min (standard bench practice; ±20% single-run variance).
    // A query that throws is reported in "errors" (not timed as
    // near-zero — a swallowed failure would silently improve the total).
    // host-contention telemetry: the sandbox is shared, and cross-round
    // comparisons need to know whether a delta is the engine or the host
    // (BENCH_r03 vs r04 differed ~2× on zero engine change). loadavg
    // brackets the run; wall-vs-process-CPU says how much of the run WE
    // were (a loaded host inflates wall, not our CPU).
    def loadAvg(): Double = scala.util.Try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.split(" ")(0).toDouble finally src.close()
    }.getOrElse(-1.0)
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def procCpuSec(): Double = osBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime / 1e9
      case _ => -1.0
    }
    val (loadStart, cpuStart, wallStart) = (loadAvg(), procCpuSec(), System.nanoTime())
    // best-of-n, n=2 by default (run 1 pays codegen JIT; run 2 is steady
    // state); SPARK_GRAFT_BENCH_RUNS=3+ tightens the min on noisy hosts
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val results = SparkEntry.queries.map { case (name, fn) =>
      var err: Option[String] = None
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case t: Throwable =>
          err = Some(Option(t.getMessage).getOrElse(t.getClass.getName).take(200))
        }
        (System.nanoTime() - t0) / 1e9
      }
      (name, times.min, err)
    }
    val (loadEnd, cpuEnd, wallSec) =
      (loadAvg(), procCpuSec(), (System.nanoTime() - wallStart) / 1e9)
    def jstr(s: String) = "\"" + s.replaceAll("[\"\\\\\\n\\r\\t]", " ") + "\""
    // 0.1 ms resolution: full-precision doubles made the summary line
    // ~4 KB and a log-tail capture truncated it (BENCH_r03 lost 16
    // queries); rounded, 78 queries fit in ~1.5 KB
    def jnum(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val ok = results.collect { case (k, v, None) => (k, v) }
    val qs = ok.map { case (k, v) => jstr(k) + ":" + jnum(v) }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val load = s"""{"avg_start":${jnum(loadStart)},"avg_end":${jnum(loadEnd)},""" +
      s""""wall_sec":${jnum(wallSec)},"proc_cpu_sec":${jnum(cpuEnd - cpuStart)},""" +
      s""""cpus":$cpus}"""
    val line = s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":$qs,"errors":$errs,"load":$load,"sf":"$sfDir"}"""
    // stdout FIRST: if the durable-copy write throws (read-only dir, bad
    // SPARK_GRAFT_BENCH_OUT), the results must not die with it
    println(line)
    scala.util.Try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_full.json"))
      Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(out, line.getBytes("UTF-8"))
    }.failed.foreach(t => System.err.println(s"bench: durable copy failed: $t"))
    spark.stop()
  }
}
