package graft.operators

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: Seq[(Long, String)], maxDist: Int,
      blockLen: Int = 4, maxBlock: Long = 1000L) =
    FuzzyJoin.fuzzyPairs(rows.toDF("id", "name"), "name", "id",
        maxDist, blockLen, maxBlock)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet

  test("single-edit pairs are ALWAYS found at maxDist=1 (pigeonhole " +
      "completeness, edit at every position)") {
    val base = "abcdefgh" // len 8 = 2·blockLen
    val rows = (0L, base) +: base.indices.map(i =>
      (i + 1L, base.updated(i, 'z')))
    val got = pairs(rows, maxDist = 1)
    // every mutant pairs with the base at dist 1
    base.indices.foreach { i =>
      assert(got.contains((0L, i + 1L, 1)), s"missed edit at position $i")
    }
    // mutants at different positions are dist 2 — none matched
    assert(got.size == base.length)
  }

  test("indels survive the length band; identical keys match at dist 0") {
    val rows = Seq((1L, "abcdefgh"), (2L, "abcdefgh"), (3L, "abcdefghX"),
      (4L, "bcdefgh"))
    val got = pairs(rows, maxDist = 1)
    assert(got.contains((1L, 2L, 0))) // exact dup
    assert(got.contains((1L, 3L, 1))) // append (shares prefix block)
    assert(got.contains((1L, 4L, 1))) // head deletion (shares suffix block)
    assert(got.contains((2L, 3L, 1)) && got.contains((2L, 4L, 1)))
  }

  test("a pair sharing BOTH blocks verifies once (distinct before the DP)") {
    val df = Seq((1L, "abcdXefgh"), (2L, "abcdYefgh")).toDF("id", "name")
    val out = FuzzyJoin.fuzzyPairs(df, "name", "id", maxDist = 1).collect()
    assert(out.length == 1 && out.head.getInt(4) == 1)
  }

  test("hot blocks are dropped from candidate generation and reported " +
      "by blockStats") {
    // 30 keys share prefix "AAAA"; suffixes all distinct → with
    // maxBlock = 10 the prefix block is dropped and prefix-only
    // near-pairs are (documentedly) missed
    val rows = (1L to 30L).map(i => (i, f"AAAA-key-$i%04d"))
    val got = pairs(rows, maxDist = 1, maxBlock = 10L)
    assert(got.isEmpty) // 0001 vs 0002 differ in suffix block; prefix dropped
    val kept = pairs(rows, maxDist = 1, maxBlock = 1000L)
    assert(kept.nonEmpty) // with the block kept, near-pairs appear
    val stats = FuzzyJoin.blockStats(rows.toDF("id", "name"), "name", "id",
        blockLen = 4, maxBlock = 10L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3)))
    val hot = stats.filter(s => s._1 == "p" && s._2 == "AAAA")
    assert(hot.length == 1 && hot.head._3 == 30L && !hot.head._4)
    assert(stats.filter(_._1 == "s").forall(_._4)) // suffix blocks all kept
  }

  test("incremental: batch == old-pairs ∪ new-involving pairs (no cap " +
      "crossing); the two legs are disjoint") {
    val base = "abcdefgh"
    val rows = (0L to 20L).map(i =>
      (i, if (i % 3 == 0) base.updated(2, ('a' + (i % 7).toInt).toChar)
          else f"k$i%02d-${base.substring(0, 4)}"))
    val old = rows.filter(_._1 % 4 != 1)
    val nw = rows.filter(_._1 % 4 == 1)
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    val oldPairs = toSet(FuzzyJoin.fuzzyPairs(old.toDF("id", "name"),
      "name", "id", maxDist = 2))
    val incr = toSet(FuzzyJoin.fuzzyPairsIncremental(
      FuzzyJoin.blockRows(old.toDF("id", "name"), "name", "id", 4),
      nw.toDF("id", "name"), "name", "id", maxDist = 2))
    val batch = toSet(FuzzyJoin.fuzzyPairs(rows.toDF("id", "name"),
      "name", "id", maxDist = 2))
    assert((oldPairs & incr).isEmpty)
    assert((oldPairs | incr) == batch)
    // every incremental pair involves a new id
    val newIds = nw.map(_._1).toSet
    assert(incr.forall(p => newIds.contains(p._1) || newIds.contains(p._2)))
  }

  test("incremental under a cap crossing: union ⊇ batch; the surplus " +
      "is exactly stale old-old pairs of the crossed block") {
    // 8 old + 4 new keys share prefix "AAAA" (suffixes distinct):
    // old size 8 ≤ maxBlock 10, old ∪ new = 12 > 10 — the block
    // crosses between builds
    val old = (1L to 8L).map(i => (i, f"AAAA-$i%04d"))
    val nw = (9L to 12L).map(i => (i, f"AAAA-$i%04d"))
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oldPairs = toSet(FuzzyJoin.fuzzyPairs(old.toDF("id", "name"),
      "name", "id", maxDist = 2, blockLen = 4, maxBlock = 10L))
    val incr = toSet(FuzzyJoin.fuzzyPairsIncremental(
      FuzzyJoin.blockRows(old.toDF("id", "name"), "name", "id", 4),
      nw.toDF("id", "name"), "name", "id", maxDist = 2,
      blockLen = 4, maxBlock = 10L))
    val batch = toSet(FuzzyJoin.fuzzyPairs((old ++ nw).toDF("id", "name"),
      "name", "id", maxDist = 2, blockLen = 4, maxBlock = 10L))
    assert(incr.isEmpty) // crossed block generates no NEW candidates
    val union = oldPairs | incr
    assert(batch.subsetOf(union))
    assert((union -- batch).forall(p => p._1 <= 8L && p._2 <= 8L))
    assert((union -- batch).nonEmpty) // the stale old-old pairs
  }

  test("edits beyond maxDist are rejected by the verifier, not just " +
      "by blocking") {
    // shares the prefix block, so a candidate IS generated; dist 3
    val rows = Seq((1L, "abcdefgh"), (2L, "abcdzzzh"))
    assert(pairs(rows, maxDist = 2).isEmpty)
    assert(pairs(rows, maxDist = 3) == Set((1L, 2L, 3)))
  }

  test("autoBlockLen: log16 steps with the floor; fuzzyPairsAuto == " +
      "fuzzyPairs at the derived dial") {
    assert(FuzzyJoin.autoBlockLen(0) == 2 && FuzzyJoin.autoBlockLen(1) == 2)
    assert(FuzzyJoin.autoBlockLen(255) == 2)   // bitlen 8 → 2
    assert(FuzzyJoin.autoBlockLen(256) == 3)   // bitlen 9 → 3 (a step)
    assert(FuzzyJoin.autoBlockLen(65535) == 4)
    assert(FuzzyJoin.autoBlockLen(65536) == 5)
    assert(FuzzyJoin.autoBlockLen(5, minLen = 4) == 4)
    val rows = (0L to 40L).map(i => (i, f"key-$i%03d-abcdefgh"))
    val auto = FuzzyJoin.fuzzyPairsAuto(rows.toDF("id", "name"),
      "name", "id", maxDist = 2).collect().map(_.toString).toSet
    val manual = FuzzyJoin.fuzzyPairs(rows.toDF("id", "name"),
        "name", "id", maxDist = 2,
        blockLen = FuzzyJoin.autoBlockLen(41)) // bitlen 6 → 2
      .collect().map(_.toString).toSet
    assert(auto == manual)
  }

  test("auto dial across a blockLen step: the increment keeps the STORED " +
      "dial, batch == old ∪ increment still holds, and the meta flags " +
      "the crossing for a deliberate re-block") {
    // old N = 200 (blockLen 2), batch pushes N to 300 (recommended 3):
    // the dial STEPS between builds — exactly the drift hazard
    val old = (1L to 200L).map(i => (i, f"nm$i%04d-abcdefgh"))
    val nw = (201L to 300L).map(i => (i, f"nm$i%04d-abcdefgh"))
    val meta = FuzzyJoin.blockMeta(old.toDF("id", "name"), "name")
    assert(meta.head().getLong(0) == 200L && meta.head().getInt(1) == 2)
    val idx = FuzzyJoin.blockRows(old.toDF("id", "name"), "name", "id",
      meta.head().getInt(1))
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    val oldPairs = toSet(FuzzyJoin.fuzzyPairs(old.toDF("id", "name"),
      "name", "id", maxDist = 2, blockLen = 2))
    val incr = toSet(FuzzyJoin.fuzzyPairsIncrementalMeta(idx, meta,
      nw.toDF("id", "name"), "name", "id", maxDist = 2))
    // the contract is against the STORED-dial rebuild — it holds even
    // though N crossed a step mid-stream
    val batchStored = toSet(FuzzyJoin.fuzzyPairs(
      (old ++ nw).toDF("id", "name"), "name", "id", maxDist = 2,
      blockLen = 2))
    assert((oldPairs | incr) == batchStored)
    assert((oldPairs & incr).isEmpty)
    // the crossing is loud, not silent
    val after = FuzzyJoin.blockMetaAfterIncrement(meta,
      nw.toDF("id", "name"), "name").head()
    assert(after.getLong(0) == 300L)
    assert(after.getInt(1) == 2)      // stored layout unchanged
    assert(after.getInt(2) == 3)      // recommendation stepped
    assert(after.getBoolean(3))       // reblock_due
    // after the deliberate re-block, the new index carries its own dial
    // and the increment contract re-establishes at that dial
    val meta2 = FuzzyJoin.blockMeta((old ++ nw).toDF("id", "name"), "name")
    assert(meta2.head().getInt(1) == 3)
  }
}
