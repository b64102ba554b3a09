package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type-2 merge — the reference's crown jewel
  * (`loadtowh/load_to_wh.sh:62-87`, SURVEY.md §2.10), re-expressed as a
  * pure DataFrame transformation:
  *
  *  1. *Expire*: active rows (`expiredCol` = [[Sentinel]]) whose incoming
  *     counterpart differs in any tracked attribute get
  *     `expiredCol = effectiveDate`.
  *  2. *Insert*: incoming rows with no *surviving* active counterpart
  *     (new keys + just-expired keys) are appended active.
  *
  * NULL semantics (SURVEY.md §7.4-1): MySQL `<>` is NULL-propagating, so
  * a row whose tracked attribute changes to/from NULL never expires in
  * the reference. Default here is the *corrected* `!(a <=> b)`;
  * `legacyNullChange = true` reproduces the reference bug-for-bug.
  *
  * Scale shape: two shuffles on the natural key (change-detect join +
  * anti join); history rows never shuffle (they pass through on a
  * metadata filter). The natural key `(job_title, company_name)` is
  * skew-prone at 100 TB (SURVEY.md §7.4-7) — AQE skew-join handles the
  * hot keys; the joins broadcast automatically when a day's increment is
  * small.
  */
object Scd2Merge {
  val Sentinel = "9999-12-31"

  /** @param current    full SCD2 table (history + active versions)
    * @param incoming   today's snapshot, same schema minus `expiredCol`.
    *                   Must be unique per natural key — duplicate keys
    *                   insert duplicate active versions (exactly what
    *                   the reference's INSERT does; callers that want
    *                   the invariant collapse first, see
    *                   WarehouseLoadJob)
    * @param keys       natural key columns
    * @param tracked    attributes whose change triggers a new version
    * @param expiredCol name of the version-end date column
    * @param effectiveDate logical date of this load (injectable clock,
    *                   SURVEY.md §7.4-5 — never wall-clock)
    */
  def apply(
      current: DataFrame,
      incoming: DataFrame,
      keys: Seq[String],
      tracked: Seq[String],
      expiredCol: String,
      effectiveDate: Column,
      legacyNullChange: Boolean = false): DataFrame = {

    val sentinel = to_date(lit(Sentinel))
    val active  = current.filter(col(expiredCol) === sentinel)
    val history = current.filter(col(expiredCol) =!= sentinel || col(expiredCol).isNull)

    def differs(a: String, i: String): Column = {
      val cols = tracked.map(t => (col(s"$a.$t"), col(s"$i.$t")))
      val per =
        if (legacyNullChange) cols.map { case (x, y) => x =!= y } // NULL → not changed
        else cols.map { case (x, y) => !(x <=> y) }
      per.reduce(_ || _)
    }

    // every key comparison is null-safe (<=>): the natural key
    // (job_title, company_name) can carry NULLs, and a plain-equality
    // usingColumns join would neither expire nor match NULL-key rows —
    // re-inserting them active on every load
    def keyEq(l: String, r: String) =
      keys.map(k => col(s"$l.$k") <=> col(s"$r.$k")).reduce(_ && _)
    val changedKeys = active.as("a")
      .join(incoming.as("i"), keyEq("a", "i"), "inner")
      .filter(differs("a", "i"))
      .select(keys.map(k => col(s"a.$k")): _*)
      .distinct()

    val expired = active.as("a")
      .join(changedKeys.as("c"), keyEq("a", "c"), "left_semi")
      .withColumn(expiredCol, to_date(effectiveDate))
    val survivingActive = active.as("a")
      .join(changedKeys.as("c"), keyEq("a", "c"), "left_anti")

    val inserts = incoming.as("i")
      .join(survivingActive.as("s"), keyEq("i", "s"), "left_anti")
      .withColumn(expiredCol, sentinel)
      .select(current.columns.map(col).toIndexedSeq: _*) // align column order

    history
      .unionByName(survivingActive)
      .unionByName(expired)
      .unionByName(inserts)
  }

  /** SCD2 merge in ONE shuffle join — the at-scale form of [[apply]]
    * for inputs that are unique per natural key (the invariant
    * WarehouseLoadJob maintains by collapsing incoming first; the
    * generic [[apply]] stays for the faithful duplicate-tolerant
    * semantics). active FULL OUTER incoming, then each joined row
    * locally emits its verdict:
    *
    *  - matched & changed   → expired version + new active version
    *  - matched & unchanged → the active row, untouched
    *  - active only         → the active row, untouched
    *  - incoming only       → new active version
    *
    * Three key-joins collapse to one (history still rides a metadata
    * filter): one exchange per side, each read once — at 100 TB the
    * composed form re-reads its reused exchanges seven times across
    * four join operators, this reads two exchanges once.
    * Results are identical to [[apply]] under the uniqueness
    * precondition (asserted in Scd2MergeSpec).
    */
  def singlePass(
      current: DataFrame,
      incoming: DataFrame,
      keys: Seq[String],
      tracked: Seq[String],
      expiredCol: String,
      effectiveDate: Column,
      legacyNullChange: Boolean = false): DataFrame = {

    val sentinel = to_date(lit(Sentinel))
    val active  = current.filter(col(expiredCol) === sentinel)
    val history = current.filter(col(expiredCol) =!= sentinel || col(expiredCol).isNull)
    val outCols = current.columns.toIndexedSeq

    val keyEq = keys.map(k => col(s"a.$k") <=> col(s"i.$k")).reduce(_ && _)
    val diffPer = tracked.map { t =>
      if (legacyNullChange) col(s"a.$t") =!= col(s"i.$t")
      else !(col(s"a.$t") <=> col(s"i.$t"))
    }
    val diff = diffPer.reduce(_ || _)

    val joined = active.withColumn("__ap", lit(true)).as("a")
      .join(incoming.withColumn("__ip", lit(true)).as("i"), keyEq, "full_outer")
    val aPresent = coalesce(col("a.__ap"), lit(false))
    val iPresent = coalesce(col("i.__ip"), lit(false))

    val kept = struct(outCols.map(c => col(s"a.$c").as(c)): _*)
    val expiredRow = struct(outCols.map(c =>
      (if (c == expiredCol) to_date(effectiveDate) else col(s"a.$c")).as(c)): _*)
    val insertRow = struct(outCols.map(c =>
      (if (c == expiredCol) sentinel else col(s"i.$c")).as(c)): _*)

    val out = joined
      .select(explode(
        when(aPresent && iPresent,
          when(diff, array(expiredRow, insertRow)).otherwise(array(kept)))
        .when(aPresent, array(kept))
        .otherwise(array(insertRow))).as("__r"))
      .select(outCols.map(c => col(s"__r.$c").as(c)): _*)

    history.unionByName(out)
  }

  /** Continue a dense surrogate key: rows with a NULL `skCol` get
    * `max(existing sk) + rank` ordered by the natural key —
    * deterministic and insertion-order-free (SURVEY.md §7.4-6).
    * (Density is a reference contract — AUTO_INCREMENT — otherwise
    * `monotonically_increasing_id()` would do with no ordering work.)
    *
    * Distributed dense numbering (no global window — a
    * `Window.orderBy` with no partitionBy moves every new row to ONE
    * task): range-partition the new rows by the order keys (equal keys
    * land together, partition i's keys all sort before partition
    * i+1's), count rows per partition (one tiny job — this is exactly
    * RDD.zipWithIndex's scheme, kept in DataFrame-land so the rows
    * never leave Tungsten), then `global rank = partition offset +
    * local row_number` with a *partitioned* window. Each partition
    * sorts only its own slice; a billion-row increment spreads over
    * the cluster.
    *
    * The range-partitioned frame is MATERIALIZED once (localCheckpoint)
    * before the two consumers: RangePartitioner's reservoir sample is
    * seeded from the rdd id, which differs per action — re-executing
    * the exchange for the count pass and the assignment pass could
    * draw different range bounds, shifting boundary rows between
    * partitions and colliding surrogate keys. Materializing pins both
    * passes (and the stored `__pid` values) to ONE partitioning; on a
    * real cluster swap in reliable `checkpoint()` if executor loss
    * between the passes must be recoverable.
    */
  def assignSurrogateKeys(df: DataFrame, skCol: String, orderKeys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = df.filter(col(skCol).isNotNull)
    val fresh = df.filter(col(skCol).isNull)
    val maxSk: Long = Option(keyed.agg(max(col(skCol))).first().get(0))
      .map(_.toString.toLong).getOrElse(0L)
    // explicit partition count: a by-num repartition is exempt from AQE
    // partition coalescing, so __pid can't shift between the count pass
    // and the assignment pass
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = fresh
      .repartitionByRange(nParts, orderKeys.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = ranged.groupBy("__pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Long] = // exclusive prefix sums, one entry per non-empty partition
      counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
        .zip(counts).map { case ((_, off), (pid, _)) => pid -> off }.toMap
    val localRank = row_number().over(
      Window.partitionBy(col("__pid")).orderBy(orderKeys.map(col): _*))
    keyed.unionByName(
      ranged
        .withColumn(skCol,
          lit(maxSk) + element_at(typedlit(offsets), col("__pid")) + localRank)
        .drop("__pid"))
  }
}
