package graft.plans

import graft.{SparkSpec, Tables}
import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

class IvfAssignSpec extends SparkSpec {
  import spark.implicits._

  private def assignCol(q: org.apache.spark.sql.Column,
      codebook: Seq[Seq[Long]], norms: Seq[Long]) =
    ColumnBridge.column(IvfAssign(ColumnBridge.expression(q), codebook, norms))

  test("native assignment == composed argmax on real embeddings (exact)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(200)
      .select($"vec_id", V.quantize($"embedding").as("q"))
    // codebook: 8 real quantized vectors through the SAME expression
    val code = emb.orderBy($"vec_id").limit(8)
      .select($"q", V.dotQ($"q", $"q").as("n2")).collect()
      .map(r => (r.getSeq[Long](0), r.getLong(1)))
    val codebook = code.map(_._1.toSeq).toSeq
    val norms = code.map(_._2).toSeq
    // composed reference: per-centroid cosine columns → array argmax
    val sims = array(code.map { case (qv, n2) =>
      V.cosineFromQuantized($"q", typedlit(qv.toSeq), V.dotQ($"q", $"q"), lit(n2))
    }.toIndexedSeq: _*)
    val both = emb
      .withColumn("native", assignCol($"q", codebook, norms))
      .withColumn("composed",
        (array_position(sims, array_max(sims)) - 1).cast("int"))
    assert(both.filter(!($"native" <=> $"composed")).isEmpty)
    assert(both.select(countDistinct($"native")).head().getLong(0) > 1,
      "degenerate fixture: everything mapped to one cell")
  }

  test("edge cases: null / null-element / ragged → null; zero norm and ties → lowest id") {
    val codebook = Seq(Seq(1000000L, 0L), Seq(0L, 1000000L))
    val norms = Seq(1000000L * 1000000L, 1000000L * 1000000L)
    val df = Seq(
      (1, Seq[java.lang.Long](1000000L, 0L)),    // exactly centroid 0
      (2, Seq[java.lang.Long](0L, 1000000L)),    // exactly centroid 1
      (3, Seq[java.lang.Long](1000000L, 1000000L)), // tie → lowest id (0)
      (4, Seq[java.lang.Long](0L, 0L)),          // zero norm: all sims 0.0 → 0
      (5, null),                                 // null vector → null
      (6, Seq[java.lang.Long](1000000L, null)),  // null element → null
      (7, Seq[java.lang.Long](1000000L)),        // ragged → null
    ).toDF("id", "q")
    def run(): Seq[Option[Int]] =
      df.orderBy($"id").select(assignCol($"q", codebook, norms)).collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
    val expected = Seq(Some(0), Some(1), Some(0), Some(0), None, None, None)
    assert(run() == expected) // codegen
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.get(key)
    try { spark.conf.set(key, "NO_CODEGEN"); assert(run() == expected) }
    finally spark.conf.set(key, old)
  }
}
