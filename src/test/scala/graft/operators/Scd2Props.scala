package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based SCD2 invariants (SURVEY.md §5.2-2) over generated
  * change scenarios:
  *  - exactly one active version per key, always;
  *  - history is append-only (no row of the input ever disappears);
  *  - replaying the same batch is a fixed point;
  *  - merging slice-by-slice == merging the union when slices don't
  *    share keys.
  */
object Scd2Props extends Properties("Scd2Merge") {

  // each case runs several Spark jobs; 10 generated scenarios per
  // property is plenty of state-space at sane wall-clock
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private val sentinel = "9999-12-31"

  private val keyGen = Gen.alphaLowerStr.map(_.take(3)).suchThat(_.nonEmpty)
  private val attrGen = Gen.option(Gen.oneOf("a", "b", "c", "d"))

  private case class Scenario(
      current: Seq[(String, Option[String])],
      incoming: Seq[(String, Option[String])])

  private val scenarioGen: Gen[Scenario] = for {
    curKeys <- Gen.listOfN(8, keyGen).map(_.distinct)
    curAttrs <- Gen.listOfN(curKeys.size, attrGen)
    incKeys <- Gen.listOfN(8, keyGen).map(_.distinct)
    incAttrs <- Gen.listOfN(incKeys.size, attrGen)
  } yield Scenario(curKeys.zip(curAttrs), incKeys.zip(incAttrs))

  private def toCur(rows: Seq[(String, Option[String])]): DataFrame =
    rows.toDF("k", "attr")
      .select(col("k"), col("attr"), to_date(lit(sentinel)).as("expired"))

  private def toInc(rows: Seq[(String, Option[String])]): DataFrame =
    rows.toDF("k", "attr")

  private def merge(c: DataFrame, i: DataFrame): DataFrame =
    Scd2Merge(c, i, Seq("k"), Seq("attr"), "expired", lit("2026-02-02"))

  property("exactly one active version per key") = forAll(scenarioGen) { sc =>
    val out = merge(toCur(sc.current), toInc(sc.incoming)).cache()
    val dup = out.filter(col("expired") === to_date(lit(sentinel)))
      .groupBy("k").count().filter(col("count") > 1).count()
    val allKeys = (sc.current.map(_._1) ++ sc.incoming.map(_._1)).toSet
    val activeKeys = out.filter(col("expired") === to_date(lit(sentinel)))
      .select("k").as[String].collect().toSet
    out.unpersist()
    dup == 0 && activeKeys == allKeys
  }

  property("no current row is lost (history append-only)") = forAll(scenarioGen) { sc =>
    val cur = toCur(sc.current)
    val out = merge(cur, toInc(sc.incoming))
    // every (k, attr) of current still exists (possibly expired)
    cur.select("k", "attr").exceptAll(out.select("k", "attr")).isEmpty
  }

  property("replay is a fixed point") = forAll(scenarioGen) { sc =>
    val inc = toInc(sc.incoming)
    val once = merge(toCur(sc.current), inc).cache()
    val twice = merge(once, inc)
    val same = twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty
    once.unpersist()
    same
  }

  property("singlePass == composed merge on unique-key scenarios") = forAll(scenarioGen) { sc =>
    // scenarioGen keys are distinct per side — exactly singlePass's precondition
    val cur = toCur(sc.current)
    val inc = toInc(sc.incoming)
    val composed = merge(cur, inc)
    val single = Scd2Merge.singlePass(cur, inc, Seq("k"), Seq("attr"),
      "expired", lit("2026-02-02"))
    single.exceptAll(composed).isEmpty && composed.exceptAll(single).isEmpty
  }
}
