package graft.operators

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sentence-aware context-window chunking: split each document into
  * chunks of at most ~`maxTokens` whitespace tokens, breaking at
  * sentence boundaries — the preprocessing step between corpus
  * filtering and tokenization when a consumer (embedding model,
  * retrieval index, training example builder) needs bounded inputs
  * that don't sever sentences mid-thought.
  *
  * Chunk assignment is the CUMULATIVE-FILL form (sentence `i` joins
  * chunk `floor(tokens_before_i / maxTokens)`), the same scalable
  * shape as [[graft.operators.Sharding]]'s q51 packing: one window
  * cumsum per document, no sequential driver loop, identical results
  * under any partitioning. Like all cumulative fill, a sentence longer
  * than the budget overflows its chunk rather than splitting — bounded
  * by `maxTokens + longest sentence`, the standard trade against true
  * greedy (which is inherently sequential).
  *
  * Sentence boundaries are the three ASCII terminators followed by a
  * space, marked via three PLAIN replace rules (`". " → "."`
  * etc. — no capture groups, since Java and RE2 replacement syntax
  * differ) and one split on the marker. Joining a chunk's sentences
  * back with single spaces restores exactly the consumed separator,
  * so `concat(chunks) == text` whenever the text had single-space
  * separators. The q112 oracle reproduces the whole pipeline —
  * markers, token counts, window cumsum, ordered re-join — in DuckDB
  * and hash-matches the chunk STRINGS.
  *
  * Scale shape: one narrow map (mark + split), one explode, one
  * per-document window (partitioned by id — never global), one
  * hash aggregate back to (id, chunk). Shuffles on the document id
  * only.
  */
object Chunker {

  private val Marker = "\u0001"

  def sentenceChunks(df: DataFrame, textCol: String, idCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    val marked = regexp_replace(
      regexp_replace(
        regexp_replace(coalesce(col(textCol), lit("")), "\\. ", "." + Marker),
        "! ", "!" + Marker),
      "\\? ", "?" + Marker)
    val sents = df
      .select(col(idCol), posexplode(split(marked, Marker)).as(Seq("pos", "sent")))
      .withColumn("tok", T.tokenCount(col("sent")).cast("long"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sents
      .withColumn("chunk_no",
        floor((sum(col("tok")).over(w) - col("tok")) / maxTokens))
      .groupBy(col(idCol), col("chunk_no"))
      .agg(
        concat_ws(" ", array_sort(collect_list(struct(col("pos"), col("sent"))))
          .getField("sent")).as("chunk_text"),
        sum(col("tok")).as("n_tokens"))
  }
}
