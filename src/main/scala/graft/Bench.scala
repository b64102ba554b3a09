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
    val results = SparkEntry.queries.map { case (name, fn) =>
      var err: Option[String] = None
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case t: Throwable =>
          err = Some(Option(t.getMessage).getOrElse(t.getClass.getName).take(200))
        }
        (System.nanoTime() - t0) / 1e9
      }
      (name, times.min, err)
    }
    def jstr(s: String) = "\"" + s.replaceAll("[\"\\\\\\n\\r\\t]", " ") + "\""
    val ok = results.collect { case (k, v, None) => (k, v) }
    val qs = ok.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
