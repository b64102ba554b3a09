package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BpeVocabSpec extends SparkSpec {

  import spark.implicits._

  /** Single-node reference BPE over a (word -> count) map: the
    * textbook sequential algorithm, shared-nothing from the operator's
    * distributed path.
    */
  private def referenceBpe(counts: Map[String, Long],
      k: Int): Seq[(Int, String, String, Long)] = {
    var seg: Map[Vector[String], Long] = counts.map { case (w, c) =>
      (w.map(_.toString).toVector :+ BpeVocab.EndOfWord) -> c
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (i <- 1 to k) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      seg.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => pc((a, b)) = pc.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (pc.nonEmpty) {
        val ((a, b), c) = pc.toSeq.minBy { case ((x, y), n) => (-n, s"$x $y") }
        out += ((i, s"$a $b", a + b, c))
        seg = seg.map { case (syms, cnt) =>
          // left-to-right non-overlapping merge
          val res = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
              res += a + b; j += 2
            } else { res += syms(j); j += 1 }
          }
          res.toVector -> cnt
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")
    .select($"doc_id", $"text")

  test("distributed train == single-node reference BPE (8 merges, real corpus)") {
    val counts = BpeVocab.wordCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = referenceBpe(counts, 8)
    val got = BpeVocab.train(spark, docs, "text", 8)
      .orderBy($"rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    assert(got.size == 8)
    // partitioning-invariant: the learned vocabulary is a pure
    // function of the corpus
    val again = BpeVocab.train(spark, docs.repartition(13), "text", 8)
      .orderBy($"rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(again == got)
  }

  test("segment: subwords concatenate back to the word; merged symbols appear; determinism") {
    val merges = BpeVocab.collectMerges(BpeVocab.train(spark, docs, "text", 8))
    val segged = BpeVocab.segment(docs, "text", "doc_id", merges).cache()
    try {
      // lossless: per doc, joining subwords and dropping the markers
      // reconstructs the lowercased tokenization
      val bad = segged.filter($"bpe_tokens".isNotNull)
        .withColumn("rebuilt",
          regexp_replace(concat_ws("", $"bpe_tokens"),
            java.util.regex.Pattern.quote(BpeVocab.EndOfWord), " "))
        .withColumn("expect",
          concat(concat_ws(" ",
            graft.functions.TextFunctions.tokens(lower($"text"))), lit(" ")))
        .filter(not($"rebuilt" === $"expect"))
      assert(bad.count() == 0, bad.select("doc_id").limit(5).collect().mkString(","))
      // the learned merges are actually used
      val mergedSyms = merges.map(_._2).toSet
      val used = segged.select(explode($"bpe_tokens").as("t"))
        .filter($"t".isin(mergedSyms.toSeq: _*)).count()
      assert(used > 0, "no merged symbol appears in any segmentation")
      // repartition-invariant
      val again = BpeVocab.segment(docs.repartition(13), "text", "doc_id", merges)
        .select($"doc_id", $"bpe_tokens").collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val first = segged.select($"doc_id", $"bpe_tokens").collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(again == first)
    } finally segged.unpersist()
  }
}
