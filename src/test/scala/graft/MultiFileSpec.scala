package graft

import graft.operators.{Dedup, Sampling}
import org.apache.spark.sql.DataFrame

/** Partitioning invariance: every deterministic operator must produce
  * IDENTICAL results whether the corpus arrives as one parquet file or
  * many — the single-file testdata layout is an accident of the
  * harness, not a contract, and at 100 TB every input is thousands of
  * splits. Hash-keyed determinism (AuditableHash, no RNG) is what makes
  * this exact equality (not mere row-count equality) possible.
  */
class MultiFileSpec extends SparkSpec {

  private lazy val docs1 = Tables.documents(spark, "/root/testdata/sf0.001")
  private lazy val docs8: DataFrame = {
    val dir = s"${tmpDir("multifile")}/docs"
    docs1.repartition(8).write.parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.inputFiles.length >= 8, "fixture must be multi-file")
    back
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("canonical dedup is file-layout invariant") {
    val cols = Seq("doc_id", "canonical_id", "is_duplicate")
    assert(rows(Dedup.canonical(docs8, "text", "doc_id").selectExpr(cols: _*))
      == rows(Dedup.canonical(docs1, "text", "doc_id").selectExpr(cols: _*)))
  }

  test("minhash LSH pair set is file-layout invariant") {
    def pairs(df: DataFrame) = rows(Dedup.minHashLsh(
      df, "text", "doc_id", shingleSize = 3, numHashes = 64,
      bands = 16, threshold = 0.2))
    assert(pairs(docs8) == pairs(docs1))
  }

  test("deterministic per-group capping is file-layout invariant") {
    def capped(df: DataFrame) = rows(
      Sampling.capPerGroup(df, "lang", "doc_id", cap = 10)
        .select("doc_id", "lang"))
    assert(capped(docs8) == capped(docs1))
  }
}
