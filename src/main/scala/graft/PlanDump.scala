package graft

import org.apache.spark.sql.SparkSession

/** Regenerates the plan dumps in PLANS.md: prints the executed plan of
  * each named query (all of `SparkEntry.queries` if no names given) on
  * sf0.001. Usage:
  * `sbt "runMain graft.PlanDump [sfDir] [q01_... q22_...]"`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.maxMetadataStringLength", 200)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.register(spark)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"\n## $name\n")
      println("```")
      println(df.queryExecution.executedPlan.toString.trim)
      println("```")
    }
    spark.stop()
  }
}
