package graft

import graft.control.SessionDefaults
import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession

/** The library's front door: a SparkSession builder with the graft SQL
  * functions registered (the [[graft.plans.GraftExtensions]] catalog:
  * `graft_dotq`/`graft_dotd`/`graft_eq_count`/`graft_h60`/
  * `graft_quantize`/`graft_cdc_chunks`/`graft_shingle_h60`/
  * `graft_image_header`/`graft_av_header`/`graft_nfc`) and the
  * cluster-scale sizing defaults applied — what a user switching from
  * the reference stack starts from.
  *
  * {{{
  * val spark = GraftSession.builder(totalCores = 4000, largestTableGB = 102400)
  *   .master(...)            // or spark-submit supplies it
  *   .getOrCreate()
  * }}}
  *
  * The test/bench mains build their own pinned local sessions and call
  * [[graft.plans.GraftExtensions.register]] directly — this builder is
  * the production path.
  */
object GraftSession {
  def builder(totalCores: Int, largestTableGB: Long): SparkSession.Builder =
    SessionDefaults.configure(
      SparkSession.builder().withExtensions(new GraftExtensions),
      totalCores, largestTableGB)
}
