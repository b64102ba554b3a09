package graft.jobs

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariant of the curation composition over RANDOM
  * corpora and RANDOM monotonic split points — CorpusJobSpec pins the
  * real-data case; this pins the ALGEBRA the incremental twin claims:
  * for ANY corpus A ∪ B split at an id cut,
  *
  *   fitCurationState(A) ∪ runCurationIncremental(B)
  *     == curateWithState(A ∪ B, state(A))    row for row.
  *
  * Corpora draw paragraphs from a SMALL pool so cross-document
  * paragraph/span duplication is dense at tiny sizes (the dedup stages
  * must actually fire), languages split between kept and dropped, some
  * hosts hit the blocklist, and embeddings derive deterministically
  * from ids so the SemDeDup leg participates. B may be empty (the
  * day-with-no-data edge).
  */
object CurationProps extends Properties("Curation") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(3)

  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private val paraPool = Vector(
    "alpha beta gamma delta eps zeta eta theta",
    "iota kappa lambda mu nu xi omicron pi",
    "rho sigma tau upsilon phi chi psi omega",
    "alpha beta gamma delta iota kappa lambda mu",
    "one two three four five six seven eight")

  private val langs = Vector("en", "de", "xx")

  private val corpusGen: Gen[(List[(Long, String, String, String, String)], Double)] =
    for {
      n <- Gen.choose(8, 20)
      docs <- Gen.sequence[List[(Long, String, String, String, String)],
        (Long, String, String, String, String)](
        (0 until n).map { i =>
          for {
            np <- Gen.choose(1, 3)
            paras <- Gen.listOfN(np, Gen.oneOf(paraPool))
            lang <- Gen.oneOf(langs)
            src <- Gen.oneOf("web", "book")
          } yield (i.toLong, lang, src, paras.mkString("\n\n"),
            s"h${i % 5}.example.com")
        })
      cut <- Gen.choose(0.3, 0.9)
    } yield (docs, cut)

  private val cfg = CorpusJob.CurationConfig(
    lidLangs = Seq("en", "de"), keepLangs = Seq("en", "de"),
    lidDim = 64, lidSeedCap = 10, pplDim = 128, spanTokens = 4,
    semClusters = 2, budgetTokens = 500L)

  private def emb(ids: Seq[Long]) =
    ids.map(id => (id, Array.tabulate(8)(i => ((id * 7 + i) % 13 - 6).toFloat / 6f)))
      .toDF("doc_id", "embedding")

  property("fit(A) ∪ incremental(B) == curateWithState(A ∪ B, state(A))") =
    forAll(corpusGen) { case (docs, cutFrac) =>
      val all = docs.toDF("doc_id", "lang", "source", "text", "host")
      val cut = (docs.size * cutFrac).toLong
      val a = all.filter($"doc_id" <= cut)
      val b = all.filter($"doc_id" > cut)
      val bl = Seq("h3.example.com").toDF("domain")
      val vecs = emb(docs.map(_._1))
      val state = java.nio.file.Files
        .createTempDirectory("graft_curprops").toString
      val annA = CorpusJob.fitCurationState(spark, a, state, cfg,
          Some(bl), Some(vecs))
        .collect().map(_.toString).toSeq
      val annB = CorpusJob.runCurationIncremental(spark, b, state, cfg,
          Some(bl), Some(vecs))
        .collect().map(_.toString).toSeq
      val st = CorpusJob.loadCurationState(spark, state, cfg)
      val cents = spark.read.parquet(s"$state/curation/cents")
      val ref = CorpusJob.curateWithState(all, st, cfg, Some(bl),
          Some(vecs), Some(cents))
        .collect().map(_.toString).toSeq
      (annA ++ annB).sorted == ref.sorted
    }
}
