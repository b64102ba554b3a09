package graft.operators

import graft.functions.AuditableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Count-Min sketch: approximate per-key frequencies (heavy
  * hitters, top talkers) in O(depth × width) integers per group — the
  * frequency-domain sibling of [[HllSketch]]'s cardinality sketch, and
  * like it row-shaped and engine-neutral rather than an opaque blob
  * (Cormode & Muthukrishnan, "An Improved Data Stream Summary: the
  * Count-Min Sketch and its Applications", J. Algorithms 2005).
  *
  * Why a warehouse at 100 TB wants this over `GROUP BY key`:
  * the sketch is a **fixed-size mergeable summary** — daily/per-source
  * sketches add cell-wise into monthly ones without re-scanning facts,
  * and the post-shuffle row count is depth·width per group regardless
  * of key cardinality (a billion-key fact summarizes into 4×1024
  * rows). Estimates are upper bounds: est ≥ true, and
  * est ≤ true + ε·N with probability 1−δ (ε = e/width, δ = e^−depth).
  *
  * Every hash is the [[AuditableHash]] universal family (constants
  * derived from literal strings `cm:a:i` / `cm:b:i`), so the DuckDB
  * oracle rebuilds the identical sketch and the counts hash-match
  * exactly (q63).
  */
object CountMin {

  /** Row `i`'s bucket for a value column: `((a_i·h30(v) + b_i) mod p)
    * mod width`. Same shape as the MinHash permutations, different
    * derivation strings — families must not alias.
    */
  def bucket(i: Int, width: Int, v: Column): Column =
    ((lit(cmA(i)) * AuditableHash.base30(v) + lit(cmB(i))) % lit(AuditableHash.P)) % lit(width.toLong)

  def cmA(i: Int): Long = AuditableHash.h60(s"cm:a:$i") % (AuditableHash.M30 - 1) + 1
  def cmB(i: Int): Long = AuditableHash.h60(s"cm:b:$i") % AuditableHash.P

  /** Build the sketch table: one row per (groupCols, row, bucket) with
    * the cell count. One shuffle; map-side partial aggregation bounds
    * the exchange at depth·width rows per group per task. `weightCol`
    * (optional) adds that column instead of 1 per row.
    */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      depth: Int = 4, width: Int = 1024,
      weightCol: Option[String] = None): DataFrame = {
    val w = weightCol.map(col).getOrElse(lit(1L))
    val rows = (0 until depth).map { i =>
      struct(lit(i).as("row"), bucket(i, width, col(valueCol)).cast("int").as("bucket"))
    }
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ explode(array(rows: _*)).as("rb") :+ w.as("__w"): _*)
      .groupBy((groupCols.map(col) :+ col("rb.row").as("row") :+ col("rb.bucket").as("bucket")): _*)
      .agg(sum(col("__w")).as("cell_count"))
  }

  /** Merge sketches built with the same (depth, width): cell-wise sum.
    * Associative and commutative — daily partitions roll up exactly.
    */
  def merge(sketches: DataFrame*)(groupCols: Seq[String]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy((groupCols ++ Seq("row", "bucket")).map(col): _*)
      .agg(sum(col("cell_count")).as("cell_count"))

  /** Point-query a key table against a sketch: est(key) = min over
    * rows of the key's cell. `keys` needs `valueCol` (+ groupCols if
    * the sketch is grouped); output appends `est_count`. The keys side
    * is usually small (candidate heavy hitters) → broadcast join per
    * row of depth.
    */
  def estimate(sketchDf: DataFrame, keys: DataFrame, groupCols: Seq[String],
      valueCol: String, depth: Int = 4, width: Int = 1024): DataFrame = {
    val probes = keys.select(keys.columns.map(col) :+
      explode(array((0 until depth).map(i =>
        struct(lit(i).as("row"), bucket(i, width, col(valueCol)).cast("int").as("bucket"))).toIndexedSeq: _*)).as("rb"): _*)
      .select(keys.columns.map(col) :+ col("rb.row").as("row") :+ col("rb.bucket").as("bucket"): _*)
    probes.join(sketchDf, groupCols ++ Seq("row", "bucket"), "left")
      .na.fill(0L, Seq("cell_count"))
      .groupBy(keys.columns.map(col): _*)
      .agg(min(col("cell_count")).as("est_count"))
  }
}
