package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "One two three. Four five six! Seven eight? Nine ten."),
    (2L, "Single sentence with exactly seven whitespace tokens here"),
    (3L, ""),
    (4L, null.asInstanceOf[String]),
    // one sentence far above the budget: overflows its chunk, never splits
    (5L, (1 to 20).map(i => s"w$i").mkString(" ") + ". Short tail."),
  ).toDF("doc_id", "text")

  test("budget respected at sentence granularity; boundaries at terminators") {
    val out = Chunker.sentenceChunks(docs, "text", "doc_id", maxTokens = 6)
      .orderBy($"doc_id", $"chunk_no").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // 4 sentences of 3,3,2,2 tokens at budget 6 -> fill: (3,3),(2,2)
    assert(d1.map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSeq == Seq(
      (0L, "One two three. Four five six!", 6L),
      (1L, "Seven eight? Nine ten.", 4L)))
    // doc 5: the 20-token sentence overflows chunk 0 alone; the tail
    // lands in chunk floor(20/6) = 3 (cumulative fill numbers by
    // consumed budget, not consecutively)
    val d5 = out.filter(_.getLong(0) == 5L)
    assert(d5.length == 2 && d5(0).getLong(3) == 20L &&
      d5(1).getLong(1) == 3L && d5(1).getString(2) == "Short tail.")
  }

  test("reassembly: joining chunks restores the text; empty/null yield one empty chunk") {
    val out = Chunker.sentenceChunks(docs, "text", "doc_id", maxTokens = 6)
    val rebuilt = out.groupBy($"doc_id")
      .agg(concat_ws(" ", array_sort(collect_list(struct($"chunk_no", $"chunk_text")))
        .getField("chunk_text")).as("rebuilt"))
      .join(docs, Seq("doc_id"))
      .withColumn("expect", coalesce($"text", lit("")))
      .filter($"rebuilt" =!= $"expect")
    assert(rebuilt.count() == 0,
      rebuilt.select("doc_id", "rebuilt", "expect").collect().mkString("; "))
  }

  test("partitioning-invariant") {
    def key(df: org.apache.spark.sql.DataFrame) = df.orderBy($"doc_id", $"chunk_no")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(key(Chunker.sentenceChunks(docs.repartition(7), "text", "doc_id", 6))
      == key(Chunker.sentenceChunks(docs, "text", "doc_id", 6)))
  }
}
