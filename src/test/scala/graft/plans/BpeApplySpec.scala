package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Differential proof that [[BpeApplyMerges]] == the sequential
  * `replace(s, ' p1 p2 ', ' p1p2 ')` chain it replaced — the contract
  * the q100/q101 oracles state in SQL. Cases are adversarial for the
  * rank-heap shortcut: immediately repeated pairs (the overlap quirk),
  * the same pair at several ranks (legal — a quirk leftover can win
  * the argmax again), merges whose output feeds later merges, pairs
  * that never occur, and a fuzz sweep over random canonical
  * segmentations.
  */
class BpeApplySpec extends SparkSpec {
  import spark.implicits._

  private def viaKernel(segs: Seq[String],
      merges: Seq[(String, String)]): Seq[String] = {
    val df = segs.toDF("s")
    df.select(ColumnBridge.column(BpeApplyMerges(
        ColumnBridge.expression(col("s")), merges)).as("r"))
      .collect().map(r => r.getString(0)).toSeq
  }

  private def viaReplaceChain(segs: Seq[String],
      merges: Seq[(String, String)]): Seq[String] = {
    val df = segs.toDF("s")
    merges.foldLeft(df) { case (acc, (pair, merged)) =>
        acc.withColumn("s", expr(s"replace(s, ' $pair ', ' $merged ')"))
      }
      .collect().map(r => r.getString(0)).toSeq
  }

  private def check(segs: Seq[String], merges: Seq[(String, String)]): Unit = {
    val k = viaKernel(segs, merges)
    val c = viaReplaceChain(segs, merges)
    segs.indices.foreach { i =>
      assert(k(i) == c(i),
        s"diverged on '${segs(i)}' with $merges: kernel='${k(i)}' chain='${c(i)}'")
    }
  }

  test("overlap quirk: immediately repeated pairs merge once per pass") {
    check(
      Seq(" a b a b </w> ", " a b a b a b </w> ", " a b c a b </w> ",
        " a a a a </w> ", " b a b a b </w> "),
      Seq("a b" -> "ab", "a a" -> "aa"))
  }

  test("duplicate pair at several ranks: each rank runs its own pass") {
    // rank 1 leaves the quirk leftover; rank 3 (same pair) merges it
    check(
      Seq(" a b a b </w> ", " a b a b a b a b </w> "),
      Seq("a b" -> "ab", "c d" -> "cd", "a b" -> "ab"))
  }

  test("merge outputs feed later merges; unseen pairs are free") {
    check(
      Seq(" l o w e r </w> ", " l o w e s t </w> ", " n e w e r </w> ",
        " w i d e r </w> ", " x </w> ", " </w> "),
      Seq("e r" -> "er", "er </w>" -> "er</w>", "l o" -> "lo",
        "lo w" -> "low", "z z" -> "zz", "e s" -> "es", "es t" -> "est"))
  }

  test("degenerate inputs: empty list, single symbol, null") {
    assert(viaKernel(Seq(" a b </w> "), Nil) == Seq(" a b </w> "))
    check(Seq(" x </w> ", " lone "), Seq("a b" -> "ab"))
    val r = Seq[Option[String]](None).toDF("s")
      .select(ColumnBridge.column(BpeApplyMerges(
        ColumnBridge.expression(col("s")), Seq("a b" -> "ab"))).as("r"))
      .collect()
    assert(r(0).isNullAt(0))
  }

  test("fuzz: random canonical segmentations x random merge lists") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab" // tiny alphabet → dense pair collisions
    def word(n: Int) = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length)))
    for (round <- 1 to 8) {
      val segs = Seq.fill(60)(
        " " + (word(1 + rnd.nextInt(10)) :+ "</w>").mkString(" ") + " ")
      // grow merges the way training does: later pairs may reference
      // earlier merged symbols
      var syms = alphabet.map(_.toString) :+ "</w>"
      val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      for (_ <- 1 to 6 + round) {
        val a = syms(rnd.nextInt(syms.length))
        val b = syms(rnd.nextInt(syms.length))
        merges += (s"$a $b" -> (a + b))
        syms = syms :+ (a + b)
      }
      check(segs, merges.toSeq)
    }
  }
}
