package graft.plans

import graft.{SparkSpec, Tables}
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differential proof that the native [[CutSpans]] kernel == the
  * `transform`/`filter`/`exists` HOF form it replaced in
  * [[graft.operators.SubstringDedup.cutSpans]] — including the HOF
  * form's NULL-poisoning quirk and every overlap shape — so q91/q94's
  * oracles are untouched by the swap.
  */
class CutSpansSpec extends SparkSpec {
  import spark.implicits._

  /** The round-7 HOF implementation, verbatim. */
  private def viaHof(docs: DataFrame, spans: DataFrame): DataFrame = {
    val spanList = spans
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__spans"))
    val covered = (p: Column, sp: Column) =>
      p >= sp.getField("span_start") && p <= sp.getField("span_end")
    docs.join(spanList, Seq("doc_id"), "left")
      .withColumn("__toks", T.tokens(col("text")))
      .withColumn("__sp",
        coalesce(col("__spans"),
          array().cast("array<struct<span_start:long,span_end:long>>")))
      .withColumn("__kept",
        filter(
          transform(col("__toks"),
            (t, i) => struct(t.as("t"), (i + 1).cast("long").as("p"))),
          s => !exists(col("__sp"), sp => covered(s.getField("p"), sp))))
      .withColumn("text_deduped",
        array_join(transform(col("__kept"), _.getField("t")), " "))
      .withColumn("n_tokens_removed",
        (size(col("__toks")) - size(col("__kept"))).cast("long"))
      .select(docs.columns.map(col) :+ col("text_deduped")
        :+ col("n_tokens_removed"): _*)
  }

  private def compare(docs: DataFrame, spans: DataFrame): Unit = {
    def m(df: DataFrame) = df
      .select(col("doc_id"), col("text_deduped"), col("n_tokens_removed"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val native = m(graft.operators.SubstringDedup.cutSpans(
      docs, spans, "text", "doc_id"))
    val hof = m(viaHof(docs, spans))
    assert(native.keySet == hof.keySet)
    native.keySet.foreach { id =>
      assert(native(id) == hof(id),
        s"doc $id diverged: native=${native(id)} hof=${hof(id)}")
    }
  }

  test("overlap shapes: disjoint, touching, nested, crossing, inverted, out-of-range") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),
      (3L, "a b c d e f g h i j"),
      (4L, "one  two\tthree   four"), // multi-whitespace normalisation
      (5L, "solo")
    ).toDF("doc_id", "text")
    val spans = Seq(
      (1L, 2L, 3L), (1L, 6L, 7L),          // disjoint
      (2L, 1L, 4L), (2L, 5L, 8L),          // touching
      (3L, 2L, 9L), (3L, 4L, 5L),          // nested
      (3L, 8L, 12L),                       // crossing + out of range
      (4L, 3L, 2L),                        // inverted: covers nothing
      (5L, 1L, 1L)                         // full cover → empty doc
    ).toDF("doc_id", "span_start", "span_end")
    compare(docs, spans)
  }

  test("no spans, null text, blank text, doc fully covered") {
    val docs = Seq(
      (1L, Some("kept entirely")),
      (2L, None),
      (3L, Some("   ")),
      (4L, Some("x y z"))
    ).toDF("doc_id", "text")
    val spans = Seq((4L, 1L, 3L)).toDF("doc_id", "span_start", "span_end")
    compare(docs, spans)
  }

  test("NULL span rows / bounds poison the document like the HOF form") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"),
        (3L, "a b c d e"), (4L, "a b c d e"))
      .toDF("doc_id", "text")
    val spans = Seq(
      (1L, Some(2L), None),      // null end: p<2 kept, p>=2 null-dropped
      (2L, Some(2L), Some(3L)),  // control: normal cut
      (3L, None, Some(3L)),      // null start: p<=3 null-dropped, p>3 kept
      (4L, Some(1L), Some(2L)),  // mixed: a real span plus
      (4L, Some(4L), None)       //   a null-end span on the same doc
    ).toDF("doc_id", "span_start", "span_end")
    compare(docs, spans)
  }

  test("real corpus: excise via kernel == excise via HOF at sf0.001") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val spans = graft.operators.SubstringDedup
      .nonCanonicalSpans(docs, "text", "doc_id", 8)
      .select(col("doc_id"), col("span_start"), col("span_end"))
    compare(docs, spans)
  }
}
