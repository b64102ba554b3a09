package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Upsert invariants over generated batches: key uniqueness is
  * preserved, replay is idempotent, and non-refresh columns never
  * change for existing keys.
  */
object UpsertProps extends Properties("Upsert") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private val rowGen = for {
    k <- Gen.choose(0, 12)
    title <- Gen.oneOf("a", "b", "c")
    v <- Gen.choose(0, 100)
  } yield (s"k$k", title, v)

  private val batchGen: Gen[Seq[(String, String, Int)]] =
    Gen.listOfN(10, rowGen)

  private def df(rows: Seq[(String, String, Int)]): DataFrame =
    rows.toDF("id", "title", "v")

  private def dedup(rows: Seq[(String, String, Int)]) =
    rows.groupBy(_._1).map(_._2.maxBy(_._3)).toSeq // latest by v

  private def upsert(e: DataFrame, i: DataFrame): DataFrame =
    Upsert(e, i, "id", Seq("title"), Seq(col("v").desc, col("title").desc))

  property("result keys are unique when existing keys are") = forAll(batchGen, batchGen) {
    (a, b) =>
      val out = upsert(df(dedup(a)), df(b))
      out.groupBy("id").count().filter(col("count") > 1).isEmpty
  }

  property("replaying the same batch is idempotent") = forAll(batchGen, batchGen) {
    (a, b) =>
      val existing = df(dedup(a))
      val incoming = df(b)
      val once = upsert(existing, incoming)
      val twice = upsert(once, incoming)
      twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty
  }

  property("non-refresh columns never change for existing keys") = forAll(batchGen, batchGen) {
    (a, b) =>
      val existing = df(dedup(a))
      val out = upsert(existing, df(b))
      // v is not in refreshCols: every existing key keeps its v
      existing.select("id", "v").exceptAll(out.select("id", "v")).isEmpty
  }
}
