package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A) ++
    Array.tabulate[Byte](64)(i => (i * 7).toByte)
  private val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte) ++
    Array.tabulate[Byte](64)(i => (i * 3).toByte)
  private val tiny = Array[Byte](1, 2)

  test("format sniffing from magic bytes (pure expression, no decode)") {
    val df = Seq((1L, png), (2L, jpeg), (3L, tiny)).toDF("id", "blob")
    val fmts = df.select($"id", Multimodal.sniffFormat($"blob").as("f"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(fmts == Seq((1L, "png"), (2L, "jpeg"), (3L, "unknown")))
  }

  test("media metadata: schema contract, real image parse, stub fallback, corrupt flag") {
    // a real, complete 1x1 PNG — the parse path (ImageHeaderSpec owns
    // the parser's own matrix); `png` above is signature + garbage,
    // which the parser rightly flags corrupt (headerless container)
    val realPng = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    val df = Seq((1L, png), (2L, jpeg), (3L, tiny), (4L, realPng))
      .toDF("id", "blob")
    val out = Multimodal.withMediaMeta(spark, df, "blob", "image")
    assert(out.schema("media_meta").dataType == Multimodal.mediaMetaSchema)
    val rows = out.orderBy("id")
      .select($"id", $"media_meta.format", $"media_meta.n_bytes",
        $"media_meta.width", $"media_meta.is_corrupt")
      .collect()
    assert(rows(0).getString(1) == "png" && rows(0).getLong(2) == png.length)
    assert(rows(0).getInt(3) == 0 && rows(0).getBoolean(4),
      "png magic with no parseable header is corrupt, no dims")
    assert(rows(2).getBoolean(4), "short blob flagged corrupt")
    assert(rows(3).toSeq == Seq(4L, "png", realPng.length.toLong, 1, false),
      "a real PNG decodes its true header dims")
    // the honesty bit: only the fully-pixel-decoded PNG is
    // decoded_real; header-garbage png, jpeg and stub rows are not
    val real = out.orderBy("id")
      .select($"id", $"media_meta.decoded_real").as[(Long, Boolean)]
      .collect().toSeq
    assert(real == Seq((1L, false), (2L, false), (3L, false), (4L, true)),
      s"decoded_real flags wrong: $real")
    // determinism: same bytes → same features
    val again = Multimodal.withMediaMeta(spark, df, "blob", "image")
      .orderBy("id").select($"media_meta.width").as[Int].collect().toSeq
    assert(again == out.orderBy("id").select($"media_meta.width").as[Int].collect().toSeq)
  }

  test("frame-sample plan explodes deterministic offsets for video") {
    val df = Seq((1L, jpeg ++ jpeg)).toDF("id", "blob")
    val withMeta = Multimodal.withMediaMeta(spark, df, "blob", "video")
    val frames = Multimodal.sampleFramePlan(withMeta, "media_meta", everyMs = 1000L)
    val n = frames.count()
    val dur = withMeta.select($"media_meta.duration_ms").head().getLong(0)
    assert(n == (dur - 1) / 1000 + 1, s"dur=$dur frames=$n")
    assert(frames.select(max($"frame_idx")).head().getInt(0) == n - 1)
  }
}
