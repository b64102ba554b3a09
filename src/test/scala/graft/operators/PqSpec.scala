package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, dir)
  private lazy val cb = Pq.train(emb, "vec_id", "embedding", m = 8, k = 16)

  test("kernels: codegen == interpreted on real embeddings (exact)") {
    val df = emb.limit(100).select(
        V.quantize($"embedding").as("qv"))
      .withColumn("codes", ColumnBridge.column(graft.plans.PqEncode(
        ColumnBridge.expression($"qv"), cb.rows, cb.m)))
      .withColumn("t", ColumnBridge.column(graft.plans.PqDistTable(
        ColumnBridge.expression($"qv"), cb.rows, cb.m)))
      .withColumn("adc", ColumnBridge.column(graft.plans.PqAdc(
        ColumnBridge.expression($"codes"),
        ColumnBridge.expression($"t"), cb.m, cb.k)))
      .select($"codes", $"t", $"adc")
    def run(): Seq[String] =
      df.collect().map(_.toString).toSeq
    val gen = run()
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.get(key)
    try { spark.conf.set(key, "NO_CODEGEN"); assert(run() == gen) }
    finally spark.conf.set(key, old)
    assert(gen.nonEmpty)
  }

  test("encode: argmin matches a composed per-subspace reference; " +
      "sampled codebook vectors reconstruct exactly") {
    val enc = Pq.encode(emb, "vec_id", "embedding", cb)
    // the k sampled vectors ARE sub-centroids in every subspace →
    // distortion 0; and nothing else should be exactly representable
    // unless it duplicates a sample
    val zero = enc.filter($"distortion" === 0L).count()
    assert(zero >= cb.k, s"the ${cb.k} sampled vectors must reconstruct exactly")
    // composed reference for one subspace (sub 2): slice, per-centroid
    // exact d2, argmin with lower-code ties
    val sub = 2
    val slices = cb.rows.slice(sub * cb.k, (sub + 1) * cb.k)
    val d2s = array(slices.map { cv =>
      val diffs = (0 until cb.subDim).map { d =>
        val x = element_at($"qv", sub * cb.subDim + d + 1) - lit(cv(d))
        x * x
      }
      diffs.reduce(_ + _)
    }: _*)
    val ref = emb.select($"vec_id", V.quantize($"embedding").as("qv"))
      .withColumn("want", (array_position(d2s, array_min(d2s)) - 1).cast("int"))
      .select($"vec_id", $"want")
    val got = enc.select($"id".as("vec_id"),
      element_at($"codes", sub + 1).as("got"))
    assert(ref.join(got, "vec_id").filter($"want" =!= $"got").isEmpty)
  }

  test("adc identities: self-table ADC == distortion; out-of-range / " +
      "ragged inputs → NULL, null vector → NULL codes") {
    val enc = emb.limit(50).select(
        V.quantize($"embedding").as("qv"))
      .withColumn("codes", ColumnBridge.column(graft.plans.PqEncode(
        ColumnBridge.expression($"qv"), cb.rows, cb.m)))
      .withColumn("t", ColumnBridge.column(graft.plans.PqDistTable(
        ColumnBridge.expression($"qv"), cb.rows, cb.m)))
      .withColumn("selfAdc", ColumnBridge.column(graft.plans.PqAdc(
        ColumnBridge.expression($"codes"),
        ColumnBridge.expression($"t"), cb.m, cb.k)))
    val viaOp = Pq.encode(emb.limit(50), "vec_id", "embedding", cb)
    assert(enc.select(sum($"selfAdc")).head().getLong(0) ==
      viaOp.select(sum($"distortion")).head().getLong(0))

    val bad = Seq(
      (1, Seq.fill(8)(0), Seq.fill(127)(0L)),   // table too short → null
      (2, Seq.fill(7)(0), Seq.fill(128)(0L)),   // codes too short → null
      (3, Seq(0, 0, 0, 0, 0, 0, 0, 16), Seq.fill(128)(0L)), // code ≥ k → null
    ).toDF("id", "codes", "t")
      .select($"id", ColumnBridge.column(graft.plans.PqAdc(
        ColumnBridge.expression($"codes"),
        ColumnBridge.expression($"t"), 8, 16)).as("adc"))
    assert(bad.filter($"adc".isNotNull).isEmpty)

    val nulls = Seq(
      (1, null.asInstanceOf[Seq[java.lang.Long]]),
      (2, Seq[java.lang.Long](1L, 2L)), // ragged (dim 2 ≠ 64)
    ).toDF("id", "qv")
      .select(ColumnBridge.column(graft.plans.PqEncode(
        ColumnBridge.expression($"qv"), cb.rows, cb.m)).as("codes"))
    assert(nulls.filter($"codes".isNotNull).isEmpty)
  }

  test("probeIvfAdc at full probe == searchAdc (IVF pruning only drops, " +
      "never re-scores); restricted probe is a subset per query") {
    val codes = Pq.encode(emb, "vec_id", "embedding", cb)
    val queries = emb.filter($"vec_id" < 5)
    val (cents, cells) = IvfIndex.buildIndex(emb, "vec_id", "embedding",
      nCentroids = 8)
    val full = Pq.probeIvfAdc(codes, cells, cents, queries,
        "vec_id", "embedding", cb, topK = 10, nProbe = 8)
      .select("query_id", "id", "d2", "rank")
    val flat = Pq.searchAdc(codes, queries, "vec_id", "embedding", cb, 10)
      .select("query_id", "id", "d2", "rank")
    assert(full.exceptAll(flat).isEmpty && flat.exceptAll(full).isEmpty)

    val pruned = Pq.probeIvfAdc(codes, cells, cents, queries,
      "vec_id", "embedding", cb, topK = 10, nProbe = 2)
    // every pruned candidate must appear in the unrestricted candidate
    // set (pruning cannot invent pairs), with the SAME distance
    val allPairs = Pq.searchAdc(codes, queries, "vec_id", "embedding", cb,
      topK = 1000)
    assert(pruned.select("query_id", "id", "d2")
      .except(allPairs.select("query_id", "id", "d2")).isEmpty)
  }

  test("index roundtrip + frozen-codebook increment == batch encode") {
    val base = tmpDir("pqidx")
    val old = emb.filter($"vec_id" % 3 =!= 0)
    val inc = emb.filter($"vec_id" % 3 === 0)
    val cbAll = Pq.train(emb, "vec_id", "embedding", 8, 16)
    Pq.writeIndex(spark, cbAll, Pq.encode(old, "vec_id", "embedding", cbAll), base)
    val (cbBack, oldCodes) = Pq.readIndex(spark, base)
    assert(cbBack == cbAll, "codebook must survive the parquet roundtrip")
    val merged = oldCodes.unionByName(
      Pq.encode(inc, "vec_id", "embedding", cbBack))
    val batch = Pq.encode(emb, "vec_id", "embedding", cbAll)
    assert(merged.exceptAll(batch).isEmpty && batch.exceptAll(merged).isEmpty)
  }

  test("refine: Lloyd rounds strictly reduce total distortion here and " +
      "never (on this corpus) hurt recall") {
    val d0 = Pq.totalDistortion(emb, "vec_id", "embedding", cb)
    val cb1 = Pq.refine(emb, "vec_id", "embedding", cb, iters = 2)
    val d1 = Pq.totalDistortion(emb, "vec_id", "embedding", cb1)
    assert(d1 < d0, s"refinement should reduce distortion ($d0 -> $d1)")
    val q = emb.filter($"vec_id" < 5)
    def micro(c: Pq.Codebook): Double =
      Pq.recallAtK(emb, q, "embedding", "vec_id", 10, c)
        .select(max($"micro_recall")).head().getDouble(0)
    assert(micro(cb1) >= micro(cb), "refined codebook lost recall")
  }
}
