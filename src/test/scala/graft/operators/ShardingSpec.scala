package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")
    .withColumn("n_tokens",
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
    .select($"doc_id", $"n_tokens")

  test("distributed assignment == the single-global-window reference") {
    import org.apache.spark.sql.expressions.Window
    val budget = 2000L
    val u = graft.functions.AuditableHash.h60(
      concat(lit("shard:"), $"doc_id".cast("string")))
    val w = Window.orderBy(u, $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val reference = docs
      .withColumn("cum", sum($"n_tokens").over(w))
      .withColumn("shard_id", floor(($"cum" - $"n_tokens") / budget).cast("long"))
      .select("doc_id", "shard_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val distributed = Sharding.assignShards(docs, "doc_id", "n_tokens", budget)
      .select("doc_id", "shard_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed == reference)
  }

  test("shards are contiguous, budget-bounded, and deterministic") {
    val budget = 2000L
    val out = Sharding.assignShards(docs, "doc_id", "n_tokens", budget).cache()
    try {
      val perShard = out.groupBy("shard_id")
        .agg(sum("n_tokens").as("t"), max("n_tokens").as("m"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val ids = perShard.map(_._1).sorted
      assert(ids.sameElements(ids.indices.map(_.toLong)), "shard ids contiguous from 0")
      assert(ids.length > 3, "budget should yield several shards at this SF")
      // closing rule: a shard overshoots by less than its largest doc
      perShard.foreach { case (id, t, m) =>
        assert(t < budget + m, s"shard $id holds $t tokens (max doc $m)")
      }
      // a non-final shard undershoots by at most the previous shard's
      // overshoot, itself bounded by the corpus's largest doc
      val maxDoc = perShard.map(_._3).max
      perShard.filter(_._1 < ids.last).foreach { case (id, t, _) =>
        assert(t > budget - maxDoc, s"non-final shard $id too small: $t")
      }
      val again = Sharding.assignShards(docs.repartition(13), "doc_id",
        "n_tokens", budget)
        .select("doc_id", "shard_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(again == out.select("doc_id", "shard_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    } finally out.unpersist()
  }

  test("writeShards: per-shard directories + complete manifest") {
    val dir = tmpDir("shards")
    val manifest = Sharding.writeShards(spark, docs, dir, "doc_id",
      "n_tokens", shardTokens = 2000L)
    val m = manifest.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(m.map(_._2).sum == docs.count())
    assert(m.map(_._3).sum == docs.agg(sum("n_tokens")).head().getLong(0))
    // a trainer reads shard k as one directory glob
    val shard0 = spark.read.parquet(s"$dir/shards/shard_id=0")
    assert(shard0.count() == m.map { case (k, v, _) => k -> v }.toMap.apply(0L))
  }
}
