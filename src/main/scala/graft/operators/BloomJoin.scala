package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: drop probe-side rows that cannot join
  * *before* they reach the shuffle. On a 100 TB fact ⋈ selective
  * dimension join, the shuffle write of doomed fact rows dominates the
  * job; a bloom built from the build side's keys filters them at the
  * scan (false positives are removed by the join itself, so the result
  * is exact — the bloom only trims work, never changes semantics).
  *
  * Spark's own runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, injected by
  * `InjectRuntimeFilter`) does this automatically *within* one query.
  * The operator form exists for what the optimizer can't see: building
  * the filter ONCE and reusing it across jobs/stages of a pipeline
  * (e.g. one daily dimension delta pruning many fact scans), or
  * pruning before an expensive non-join operator (dedup, ANN) that
  * consumes the filtered scan.
  *
  * The probe is the codegen'd [[graft.plans.BloomMightContain]]
  * kernel over the SERIALIZED filter (Spark's own
  * `BloomFilterMightContain` is `private[sql]` and bound to the
  * runtime-filter subquery machinery, so it can't carry a pre-built
  * reusable blob): the blob ships as a plan reference object, decodes
  * once per executor, and the membership test runs inside the scan's
  * whole-stage codegen — no boxing, no codegen break, which matters
  * precisely because this predicate sits on the 100 TB probe scan.
  */
object BloomJoin {

  /** Build a bloom of `small`'s join keys (one pass over the build
    * side, tree-aggregated — `DataFrameStatFunctions.bloomFilter`),
    * pre-filter `big` with it, then run the exact equi-join. Long and
    * string keys supported (the sketch hashes both natively).
    */
  def prefilteredJoin(big: DataFrame, small: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame =
    big.filter(mightContain(small, key, expectedItems, fpp)(col(key)))
      .join(small, key)

  /** The reusable half: a `Column => Column` probe you can apply to any
    * number of scans (persist the underlying bloom across a pipeline by
    * holding this function). NULL keys never match (they cannot join).
    */
  def mightContain(small: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.01): Column => Column = {
    import org.apache.spark.sql.types._
    // the sketch inserts EVERY integral type as a long (ByteType through
    // LongType) — classifying any of them as strings would probe
    // mightContainString against long-hashed insertions and silently
    // reject almost every row (an exact join degenerating to empty)
    val dt = small.schema(key).dataType
    val isIntegral = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case StringType => false
      case other => throw new IllegalArgumentException(
        s"bloom join key '$key' has unsupported type $other — integral or string only")
    }
    val bf = small.stat.bloomFilter(key, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bytes = bos.toByteArray
    import org.apache.spark.sql.graftbridge.ColumnBridge
    if (isIntegral) {
      c => ColumnBridge.column(graft.plans.BloomMightContain(
        ColumnBridge.expression(c.cast("long")), bytes, longKey = true))
    } else {
      c => ColumnBridge.column(graft.plans.BloomMightContain(
        ColumnBridge.expression(c.cast("string")), bytes, longKey = false))
    }
  }
}
