package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video ride through the pipeline as
  * opaque `binary` columns + typed metadata struct, the standard
  * pattern for 100 TB multimodal corpora (decode happens per-partition
  * close to the data; bytes never round-trip through the driver).
  *
  * The decode step is REAL for image containers: blobs sniffing as
  * PNG/JPEG/GIF parse through [[graft.plans.ImageHeader]] — true
  * header width/height plus trailer-based truncation detection, pure
  * JVM, no codec library. The pixel-decode / audio / video codec step
  * remains STUBBED (this container has no media libraries — see
  * builder brief): `decodeStubRow` derives deterministic fake
  * features from the bytes for non-image-container blobs. Everything
  * around it — the schema contract, the `mapPartitions` batch shape,
  * partition sizing, null/corrupt handling — is the real plumbing a
  * full codec would plug into.
  */
object Multimodal {

  /** Metadata struct carried alongside every media blob.
    * `decoded_real` is the honesty bit: TRUE only when the full pixel
    * raster actually decoded ([[graft.plans.PngPixels]] — PNG today);
    * header-parse-only rows (jpeg/gif/wav/mp4 dims/duration) and
    * stub-derived rows are FALSE, so a consumer can tell real decode
    * output from plumbing-tested fakes in the schema, not the docs.
    */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image|audio|video
    StructField("format", StringType),       // sniffed container format
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),       // header-derived (or stub)
    StructField("height", IntegerType),      // header-derived (or stub)
    StructField("duration_ms", LongType),    // header-derived (or stub)
    StructField("is_corrupt", BooleanType),
    StructField("decoded_real", BooleanType),
  ))

  /** Container-format sniffing from magic bytes — real (not stubbed):
    * pure expression over the first bytes of the blob.
    */
  def sniffFormat(blob: Column): Column = {
    val hexPrefix = hex(substring(blob, 1, 8))
    when(blob.isNull, lit(null).cast("string"))
      .when(hexPrefix.startsWith("89504E47"), lit("png"))
      .when(hexPrefix.startsWith("FFD8FF"), lit("jpeg"))
      .when(hexPrefix.startsWith("47494638"), lit("gif"))
      .when(hexPrefix.startsWith("52494646"), lit("riff")) // wav/avi
      .when(hexPrefix.startsWith("494433"), lit("mp3"))
      .when(substring(hexPrefix, 9, 8) === "66747970", lit("mp4"))
      .otherwise(lit("unknown"))
  }

  /** Image-header decode as a Column — [[graft.plans.ImageHeader]]'s
    * `struct<format, width, height, truncated>` (the q107 surface).
    */
  def imageHeader(blob: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.plans.ImageHeader(ColumnBridge.expression(blob)))
  }

  /** Audio/video container-header decode as a Column —
    * [[graft.plans.AvHeader]]'s `struct<format, channels, sample_rate,
    * duration_ms, truncated>` (the q108 surface).
    */
  def avHeader(blob: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.plans.AvHeader(ColumnBridge.expression(blob)))
  }

  /** The remaining codec stub (audio/video sample decode and non-PNG
    * pixel decode). In production this calls the codec library per
    * partition (JNI/FFI), never a driver loop. Here it is a
    * deterministic fake: dimensions/duration derived from a byte hash,
    * so tests are stable and the schema contract is exercised. Only
    * consulted for blobs that are NOT a recognized container — PNG
    * pixels decode for REAL ([[graft.plans.PngPixels]]), image/AV
    * headers parse for real above, and stub rows carry
    * `decoded_real = false` in the schema.
    */
  private def decodeStubRow(bytes: Array[Byte], mediaType: String): (Int, Int, Long, Boolean) =
    if (bytes == null || bytes.length < 8) (0, 0, 0L, true)
    else {
      var h = 1125899906842597L // deterministic FNV-ish fold over the blob
      var i = 0
      while (i < math.min(bytes.length, 4096)) { h = 31 * h + bytes(i); i += 1 }
      val w = 160 + (math.abs(h) % 8).toInt * 160           // 160..1280
      val ht = 120 + (math.abs(h >> 8) % 8).toInt * 120     // 120..960
      val dur = if (mediaType == "image") 0L else 1000L + math.abs(h >> 16) % 600000L
      (w, ht, dur, false)
    }

  /** Attach the metadata struct to a binary column via typed
    * `Dataset.mapPartitions` — the batch shape a vectorized decoder
    * needs (amortized per-partition init, bytes never touch the
    * driver). Staying on the Dataset API (vs `df.rdd`) keeps the schema
    * contract in the plan: Catalyst sees a `MapPartitions` over a typed
    * row encoder, upstream pruning/pushdown still applies below it, and
    * downstream operators resume whole-stage codegen above it —
    * `df.rdd` would instead sever the plan into two separate jobs'
    * lineage with an opaque RDD boundary.
    *
    * The `spark` parameter is no longer needed (no `createDataFrame`
    * re-entry) but stays for source compatibility with round-2 callers.
    */
  def withMediaMeta(spark: SparkSession, df: DataFrame, blobCol: String,
      mediaType: String): DataFrame = {
    val fmtDf = df.withColumn("__fmt", sniffFormat(col(blobCol)))
    val inSchema = fmtDf.schema
    val outSchema = StructType(
      df.schema.fields :+ StructField("media_meta", mediaMetaSchema))
    val blobIdx = inSchema.fieldIndex(blobCol)
    val fmtIdx = inSchema.fieldIndex("__fmt")
    fmtDf.mapPartitions { iter =>
      // per-partition decoder init would go here (codec handles, GPU ctx…)
      iter.map { row =>
        val bytes = if (row.isNullAt(blobIdx)) null
          else row.getAs[Array[Byte]](blobIdx)
        val fmt = if (row.isNullAt(fmtIdx)) null else row.getString(fmtIdx)
        // recognized image containers decode for REAL (header parse +
        // trailer truncation check); PNG additionally decodes its full
        // pixel raster (graft.plans.PngPixels) and earns decoded_real;
        // everything else keeps the stub, so the q49 contract for
        // non-image bytes is unchanged
        val (w, h, dur, corrupt, real) =
          if (fmt == "png" || fmt == "jpeg" || fmt == "gif") {
            val p = graft.plans.ImageHeader.parse(bytes)
            val pixelsOk = fmt == "png" && !p.truncated && p.width >= 0 &&
              graft.plans.PngPixels.decode(bytes).isDefined
            (p.width.max(0), p.height.max(0), 0L,
              p.truncated || p.width < 0, pixelsOk)
          } else if (fmt == "riff" || fmt == "mp4") {
            // WAV/MP4 headers carry a real duration; RIFF/AVI and
            // header-cut streams fall back to the stub
            val p = graft.plans.AvHeader.parse(bytes)
            if (p.durationMs >= 0) (0, 0, p.durationMs, p.truncated, false)
            else { val s = decodeStubRow(bytes, mediaType)
              (s._1, s._2, s._3, s._4, false) }
          } else { val s = decodeStubRow(bytes, mediaType)
            (s._1, s._2, s._3, s._4, false) }
        val meta = Row(mediaType, fmt,
          if (bytes == null) 0L else bytes.length.toLong, w, h, dur, corrupt,
          real)
        Row.fromSeq(row.toSeq.patch(fmtIdx, Nil, 1) :+ meta)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Deterministic frame-sampling plan for video blobs: emits
    * (frame_idx, offset_ms) rows without decoding — the shuffle-free
    * explode that downstream per-frame decoders consume.
    */
  def sampleFramePlan(df: DataFrame, metaCol: String, everyMs: Long): DataFrame =
    df.withColumn("frame_offset_ms",
        explode(sequence(lit(0L), greatest(col(s"$metaCol.duration_ms") - 1, lit(0L)),
          lit(everyMs))))
      .withColumn("frame_idx", (col("frame_offset_ms") / everyMs).cast("int"))
}
