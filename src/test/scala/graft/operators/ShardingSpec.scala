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

  test("packSequences: distributed packing == the single-global-window reference") {
    import org.apache.spark.sql.expressions.Window
    val b = 512L
    val u = graft.functions.AuditableHash.h60(
      concat(lit("pack:"), $"doc_id".cast("string")))
    val w = Window.orderBy(u, $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val reference = docs
      .withColumn("cum", sum($"n_tokens").over(w))
      .withColumn("tok_start", $"cum" - $"n_tokens")
      .select($"doc_id", $"tok_start",
        floor($"tok_start" / b).cast("long").as("bf"),
        when($"n_tokens" > 0, floor(($"cum" - 1) / b))
          .otherwise(floor($"tok_start" / b)).cast("long").as("bl"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val packed = Sharding.packSequences(docs, "doc_id", "n_tokens", b)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("tok_start"), r.getAs[Long]("block_first"),
          r.getAs[Long]("block_last"))).toMap
    assert(packed == reference)
  }

  test("packSequences: offsets tile the token stream; blocks full; straddle and zero-token rows coherent") {
    val b = 512L
    val rows = Sharding.packSequences(
      docs.union(Seq((999999L, 0L)).toDF("doc_id", "n_tokens")),
      "doc_id", "n_tokens", b)
      .select("doc_id", "n_tokens", "tok_start", "block_first", "block_last", "n_blocks")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // the offsets are a permutation-free tiling: sorted by tok_start,
    // each document starts exactly where the previous one ended
    val byStart = rows.sortBy(_._3)
    byStart.sliding(2).foreach {
      case Array((_, t1, s1, _, _, _), (_, _, s2, _, _, _)) =>
        assert(s2 == s1 + t1, "gap or overlap in the packed token stream")
      case _ => ()
    }
    val total = rows.map(_._2).sum
    rows.foreach { case (id, tok, start, bf, bl, nb) =>
      assert(bf == start / b, s"doc $id block_first")
      if (tok > 0) {
        assert(bl == (start + tok - 1) / b, s"doc $id block_last")
        assert(nb == bl - bf + 1, s"doc $id n_blocks")
      } else {
        assert(bl == bf && nb == 0L, s"doc $id zero-token row")
      }
      assert(start + tok <= total)
    }
    // some document must straddle a block boundary at this width —
    // the property that distinguishes packing from sharding
    assert(rows.exists(r => r._6 > 1), "expected at least one straddling doc")
    // startTokens chains batches into one unbroken stream: shifting by
    // a full block shifts every block id by exactly one
    val shifted = Sharding.packSequences(docs, "doc_id", "n_tokens", b,
      startTokens = b)
      .select("doc_id", "block_first").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = Sharding.packSequences(docs, "doc_id", "n_tokens", b)
      .select("doc_id", "block_first").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    base.foreach { case (id, bf) => assert(shifted(id) == bf + 1) }
  }

  test("continueShards: daily batches == one-shot day-major assignment; seam shard keeps filling; replay no-op") {
    import org.apache.spark.sql.expressions.Window
    val budget = 2000L
    val state = tmpDir("shardstate")
    val n = docs.agg(max($"doc_id")).head().getLong(0)
    val cuts = Seq(n / 3, 2 * n / 3, n)
    val days = cuts.zip(-1L +: cuts.dropRight(1)).map { case (hi, lo) =>
      docs.filter($"doc_id" > lo && $"doc_id" <= hi)
    }
    days.zipWithIndex.foreach { case (d, i) =>
      Sharding.continueShards(spark, d, state, "doc_id", "n_tokens",
        budget, batchId = i.toLong)
    }
    val got = spark.read.parquet(s"$state/shards")
      .select($"doc_id", $"shard_id".cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // reference: one global cumsum under day-major order (day, u, doc_id)
    val u = graft.functions.AuditableHash.h60(
      concat(lit("shard:"), $"doc_id".cast("string")))
    val day = when($"doc_id" <= cuts(0), 0).when($"doc_id" <= cuts(1), 1).otherwise(2)
    val w = Window.orderBy(day, u, $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val reference = docs
      .withColumn("cum", sum($"n_tokens").over(w))
      .withColumn("shard_id", floor(($"cum" - $"n_tokens") / budget).cast("long"))
      .select("doc_id", "shard_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == reference)

    // the day-1 seam shard is SHARED: day 2's first docs land in the
    // shard day 1 left open (unless day 1 closed exactly on budget)
    val lastDay1Shard = spark.read.parquet(s"$state/shards")
      .filter($"__batch_id" === 0).agg(max($"shard_id".cast("long"))).head().getLong(0)
    val firstDay2Shard = spark.read.parquet(s"$state/shards")
      .filter($"__batch_id" === 1).agg(min($"shard_id".cast("long"))).head().getLong(0)
    assert(firstDay2Shard <= lastDay1Shard,
      "day 2 must continue the open shard, not truncate at the boundary")

    // budget bound holds ACROSS the seam: every shard < budget + its max doc
    spark.read.parquet(s"$state/shards")
      .groupBy($"shard_id".cast("long").as("s"))
      .agg(sum("n_tokens").as("t"), max("n_tokens").as("m"))
      .collect().foreach { r =>
        assert(r.getLong(1) < budget + r.getLong(2),
          s"shard ${r.getLong(0)} exceeds budget: ${r.getLong(1)}")
      }

    // replay of a committed batch: cursor marker short-circuits, state unchanged
    val cursorBefore = spark.read.parquet(s"$state/_cursor").head()
    assert(Sharding.continueShards(spark, days(1), state, "doc_id", "n_tokens",
      budget, batchId = 1L) == 0L)
    assert(spark.read.parquet(s"$state/_cursor").head() == cursorBefore)
    assert(spark.read.parquet(s"$state/shards").count() == docs.count(),
      "replay must not duplicate rows")
    assert(spark.read.parquet(s"$state/_cursor").head().getLong(0) ==
      docs.agg(sum("n_tokens")).head().getLong(0))
  }

  test("continuePack: daily batches == one-shot day-major packing; seam block keeps filling; replay no-op") {
    import org.apache.spark.sql.expressions.Window
    val b = 512L
    val state = tmpDir("packstate")
    val n = docs.agg(max($"doc_id")).head().getLong(0)
    val cuts = Seq(n / 3, 2 * n / 3, n)
    val days = cuts.zip(-1L +: cuts.dropRight(1)).map { case (hi, lo) =>
      docs.filter($"doc_id" > lo && $"doc_id" <= hi)
    }
    days.zipWithIndex.foreach { case (d, i) =>
      Sharding.continuePack(spark, d, state, "doc_id", "n_tokens",
        b, batchId = i.toLong)
    }
    val got = spark.read.parquet(s"$state/packed")
      .select($"doc_id", $"tok_start", $"block_first", $"block_last")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

    // reference: one global cumsum under day-major order (day, u, doc_id)
    val u = graft.functions.AuditableHash.h60(
      concat(lit("pack:"), $"doc_id".cast("string")))
    val day = when($"doc_id" <= cuts(0), 0).when($"doc_id" <= cuts(1), 1).otherwise(2)
    val w = Window.orderBy(day, u, $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val reference = docs
      .withColumn("cum", sum($"n_tokens").over(w))
      .withColumn("tok_start", $"cum" - $"n_tokens")
      .select($"doc_id", $"tok_start",
        floor($"tok_start" / b).cast("long").as("bf"),
        when($"n_tokens" > 0, floor(($"cum" - 1) / b))
          .otherwise(floor($"tok_start" / b)).cast("long").as("bl"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == reference)

    // the day seam does not break the stream: day 2's first offset is
    // exactly day 1's total, so the boundary block keeps filling
    // (token stream gap-free across the seam by the tiling property)
    val day1Total = days(0).agg(sum("n_tokens")).head().getLong(0)
    val day2Starts = spark.read.parquet(s"$state/packed")
      .filter($"__batch_id" === 1).agg(min($"tok_start")).head().getLong(0)
    assert(day2Starts == day1Total,
      s"day 2 must start at day 1's total ($day1Total), got $day2Starts")

    // replay: cursor marker short-circuits, rows not duplicated
    assert(Sharding.continuePack(spark, days(1), state, "doc_id", "n_tokens",
      b, batchId = 1L) == 0L)
    assert(spark.read.parquet(s"$state/packed").count() == docs.count())
    assert(spark.read.parquet(s"$state/_cursor").head().getLong(0) ==
      docs.agg(sum("n_tokens")).head().getLong(0))
  }

  test("redactShards: deleted docs leave; untouched partitions byte-stable; emptied shard dirs removed") {
    val budget = 2000L
    val state = tmpDir("shardredact")
    val n = docs.agg(max($"doc_id")).head().getLong(0)
    Sharding.continueShards(spark, docs.filter($"doc_id" <= n / 2), state,
      "doc_id", "n_tokens", budget, batchId = 0L)
    Sharding.continueShards(spark, docs.filter($"doc_id" > n / 2), state,
      "doc_id", "n_tokens", budget, batchId = 1L)
    val before = spark.read.parquet(s"$state/shards")
      .select($"doc_id", $"shard_id".cast("long"), $"__batch_id".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // delete one whole (batch, shard) partition plus a few scattered docs
    val (emptyB, emptyS) = (before.head._3, before.head._2)
    val wholeShard = before
      .filter(r => r._3 == emptyB && r._2 == emptyS).map(_._1).toSet
    val scattered = before.map(_._1).filter(id => id % 13 == 5).toSet
    val delIds = wholeShard ++ scattered
    val removed = Sharding.redactShards(spark, state,
      delIds.toSeq.toDF("doc_id"), "doc_id")
    assert(removed == before.count(r => delIds.contains(r._1)))

    val after = spark.read.parquet(s"$state/shards")
      .select($"doc_id", $"shard_id".cast("long"), $"__batch_id".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exactly the survivors remain, with FROZEN shard assignments
    assert(after.toSet == before.filterNot(r => delIds.contains(r._1)).toSet)
    // the fully-deleted partition directory is gone
    assert(!new java.io.File(
      s"$state/shards/__batch_id=$emptyB/shard_id=$emptyS").exists())
    // a second identical redaction is a no-op
    assert(Sharding.redactShards(spark, state,
      delIds.toSeq.toDF("doc_id"), "doc_id") == 0L)
    // cursor untouched — shard boundaries stay frozen
    assert(spark.read.parquet(s"$state/_cursor").head().getLong(0) ==
      docs.agg(sum($"n_tokens")).head().getLong(0))
  }

  test("continue → redact → continue: cursor drift-free across the day seam") {
    // takedown-vs-continuation composition: a redaction BETWEEN daily
    // batches must not move the cursor, so the next batch lands exactly
    // where it would have without the takedown — shard boundaries are
    // frozen by token position, not by surviving content
    val budget = 2000L
    val n = docs.agg(max($"doc_id")).head().getLong(0)
    val cuts = Seq(n / 3, 2 * n / 3, n)
    val days = cuts.zip(-1L +: cuts.dropRight(1)).map { case (hi, lo) =>
      docs.filter($"doc_id" > lo && $"doc_id" <= hi)
    }

    // reference: three batches, no redaction
    val ref = tmpDir("shardref")
    days.zipWithIndex.foreach { case (d, i) =>
      Sharding.continueShards(spark, d, ref, "doc_id", "n_tokens",
        budget, batchId = i.toLong)
    }
    val refAssign = spark.read.parquet(s"$ref/shards")
      .select($"doc_id", $"shard_id".cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // interleaved: batch 0 → redact (docs in batch 0's OPEN seam shard
    // — the case where drift would corrupt batch 1) → batch 1 →
    // redact again → batch 2
    val state = tmpDir("shardinter")
    Sharding.continueShards(spark, days(0), state, "doc_id", "n_tokens",
      budget, batchId = 0L)
    val openShard = spark.read.parquet(s"$state/shards")
      .agg(max($"shard_id".cast("long"))).head().getLong(0)
    val del1 = spark.read.parquet(s"$state/shards")
      .filter($"shard_id".cast("long") === openShard)
      .select($"doc_id").limit(2)
      .collect().map(_.getLong(0)).toSet
    assert(del1.nonEmpty, "need docs in the open seam shard to delete")
    assert(Sharding.redactShards(spark, state,
      del1.toSeq.toDF("doc_id"), "doc_id") == del1.size)
    Sharding.continueShards(spark, days(1), state, "doc_id", "n_tokens",
      budget, batchId = 1L)
    val del2 = days(1).select($"doc_id").filter($"doc_id" % 17 === 3)
      .collect().map(_.getLong(0)).toSet
    Sharding.redactShards(spark, state, del2.toSeq.toDF("doc_id"), "doc_id")
    Sharding.continueShards(spark, days(2), state, "doc_id", "n_tokens",
      budget, batchId = 2L)

    val got = spark.read.parquet(s"$state/shards")
      .select($"doc_id", $"shard_id".cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val deleted = del1 ++ del2
    // survivors sit in EXACTLY the shard the redaction-free run puts
    // them in — batches 1 and 2 continued from an undrifted cursor
    assert(got == refAssign.filterNot { case (id, _) => deleted.contains(id) })
    // cursor carries the FULL token history, including redacted docs
    assert(spark.read.parquet(s"$state/_cursor").head().getLong(0) ==
      docs.agg(sum($"n_tokens")).head().getLong(0))
    // manifest-style invariant: per-shard totals never exceed the
    // redaction-free shard's (redaction only shrinks, never re-packs)
    val refTotals = spark.read.parquet(s"$ref/shards")
      .groupBy($"shard_id".cast("long").as("s")).agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.read.parquet(s"$state/shards")
      .groupBy($"shard_id".cast("long").as("s")).agg(sum("n_tokens").as("t"))
      .collect().foreach { r =>
        assert(r.getLong(1) <= refTotals(r.getLong(0)),
          s"shard ${r.getLong(0)} grew past its frozen boundary")
      }
  }

  test("durable checkpointDir (one-shot export): assignment identical to localCheckpoint") {
    // the full-corpus one-shot path: range-partitioned input
    // materializes to a durable staging dir instead of executor block
    // storage; the assignment must be byte-identical either way
    val budget = 2000L
    val viaLocal = Sharding.assignShards(docs, "doc_id", "n_tokens", budget)
      .select("doc_id", "shard_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ckpt = tmpDir("shardckpt")
    val viaDurable = Sharding.assignShards(docs, "doc_id", "n_tokens", budget,
        checkpointDir = Some(s"$ckpt/staging"))
      .select("doc_id", "shard_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDurable == viaLocal)
    // the staging dir is real parquet the caller can clean up
    assert(graft.sources.Zone.exists(spark, s"$ckpt/staging"))
    // and the writeShards layout accepts the same option
    val outDir = tmpDir("shardsdurable")
    val manifest = Sharding.writeShards(spark, docs, outDir, "doc_id",
      "n_tokens", budget, checkpointDir = Some(s"$ckpt/staging2"))
    assert(manifest.agg(sum($"n_docs")).head().getLong(0) == docs.count())
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
    // the per-file sha256 audit trail ships with the export
    val fh = spark.read.parquet(s"$dir/_filehashes")
    assert(fh.select("shard_id").distinct().count() == m.length.toLong)
    assert(fh.filter(length(col("sha256")) =!= 64).count() == 0)
  }

  test("writeShards json: JSON Lines layout, manifest identical to parquet export") {
    val pDir = tmpDir("shardsp"); val jDir = tmpDir("shardsj")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val mp = key(Sharding.writeShards(spark, docs, pDir, "doc_id",
      "n_tokens", shardTokens = 2000L))
    val mj = key(Sharding.writeShards(spark, docs, jDir, "doc_id",
      "n_tokens", shardTokens = 2000L, format = "json"))
    // same deterministic assignment ⇒ identical manifests
    assert(mj == mp)
    // the shard files are real JSON Lines: one parseable object per row
    val files = new java.io.File(s"$jDir/shards/shard_id=0")
      .listFiles().filter(_.getName.endsWith(".json"))
    assert(files.nonEmpty, "expected .json part files")
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    assert(lines.nonEmpty && lines.forall(l =>
      l.startsWith("{") && l.endsWith("}") && l.contains("\"doc_id\"")))
  }

  test("fileHashes audit trail: redaction changes exactly the rewritten partitions' hashes") {
    val budget = 2000L
    val state = tmpDir("shardaudit")
    val n = docs.agg(max($"doc_id")).head().getLong(0)
    Sharding.continueShards(spark, docs.filter($"doc_id" <= n / 2), state,
      "doc_id", "n_tokens", budget, batchId = 0L)
    Sharding.continueShards(spark, docs.filter($"doc_id" > n / 2), state,
      "doc_id", "n_tokens", budget, batchId = 1L)
    def snapshot() = Sharding.fileHashes(spark, s"$state/shards")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)) ->
        (r.getString(0), r.getLong(3), r.getString(4)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val before = snapshot()
    assert(before.nonEmpty && before.values.forall(_.forall(_._3.length == 64)))
    // redact a few scattered docs; record which partitions hold them
    val rows = spark.read.parquet(s"$state/shards")
      .select($"doc_id", $"__batch_id".cast("long"), $"shard_id".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val delIds = rows.map(_._1).filter(_ % 17 == 3).toSet
    val touched = rows.filter(r => delIds.contains(r._1))
      .map(r => (r._2, r._3)).toSet
    assert(delIds.nonEmpty && touched.size < before.size,
      "fixture sanity: some partitions must stay untouched")
    Sharding.redactShards(spark, state, delIds.toSeq.toDF("doc_id"), "doc_id")
    val after = snapshot()
    // rewritten partitions: hash set differs; untouched: byte-identical
    for ((part, files) <- before) {
      if (touched.contains(part))
        assert(after.get(part).forall(_ != files),
          s"rewritten partition $part kept identical file hashes")
      else
        assert(after(part) == files,
          s"untouched partition $part was rewritten: $files -> ${after(part)}")
    }
  }

  test("writeShards json: all-NULL token column survives read-back (schema pinned, not inferred)") {
    import spark.implicits._
    // JSON Lines omits NULL fields: with inference the column would
    // vanish from the read-back and the manifest agg would fail
    // unresolved. The writer's schema is pinned on read instead.
    val nullToks = Seq(
      (1L, null.asInstanceOf[java.lang.Long]),
      (2L, null.asInstanceOf[java.lang.Long]),
      (3L, null.asInstanceOf[java.lang.Long]),
    ).toDF("doc_id", "n_tokens")
    val dir = tmpDir("shardsnull")
    val m = Sharding.writeShards(spark, nullToks, dir, "doc_id",
        "n_tokens", shardTokens = 100L, format = "json")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // NULL tokens weigh 0: everything packs into shard 0
    assert(m.toSeq == Seq((0L, 3L, 0L)))
  }
}
