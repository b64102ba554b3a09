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
}
