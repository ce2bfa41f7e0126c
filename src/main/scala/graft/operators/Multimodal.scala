package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with a typed metadata struct, plus decode / feature-extract
  * plumbing.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape) is real and
  * tested, and container-header METADATA (width/height for
  * PNG/GIF/BMP/JPEG) is parsed for real — header reads need no codec. Only
  * the pixel
  * DECODE is stubbed with a deterministic fake, because this container
  * has no image/audio codecs. The stub boundary is `decodeBytes` below:
  * swap it for a real decoder (JavaCPP/ffmpeg or a `mapInPandas`-
  * equivalent Arrow batch UDF) without touching the plan shape around it.
  */
object Multimodal {

  /** Typed metadata carried next to every binary payload. */
  val metadataType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("content", BinaryType),
    StructField("meta", metadataType)))

  /** Wrap a source column as a multimodal asset: opaque bytes + metadata.
    * Width/height are parsed from the payload's REAL container header when
    * the bytes are a recognized image format (PNG/GIF/BMP/JPEG — header
    * reads, no codec needed; see [[imageWidth]]/[[imageHeight]]), and null
    * otherwise — non-image payloads carry no dimensions. */
  def toAssets(df: DataFrame, idCol: String, payloadCol: String,
               mime: String): DataFrame = {
    val content = col(payloadCol).cast("binary")
    // header sniffing only runs for declared images: a text payload that
    // happens to start with image magic bytes must not grow phantom dims.
    // Dims are computed ONCE in a staging projection: the JPEG segment
    // walk is the expensive sniff and CodegenFallback expressions are not
    // reliably merged by subexpression elimination, so referencing
    // imageWidth AND imageHeight in one projection would walk the header
    // twice (CollapseProject keeps the stage because `__dims` is used
    // twice and non-cheap).
    val dims =
      if (mime.startsWith("image/")) imageDims(content)
      else lit(null).cast("struct<width:int,height:int>")
    df.select(
      // try_cast: a non-numeric id yields null instead of an ANSI runtime
      // error (the repo's lenient-input policy, cf. Readers.ensureColumns)
      expr(s"try_cast(`$idCol` AS BIGINT)").as("asset_id"),
      content.as("content"),
      dims.as("__dims"))
      .select(
        col("asset_id"),
        col("content"),
        struct(
          lit(mime).as("mime"),
          length(col("content")).cast("long").as("n_bytes"),
          col("__dims.width").as("width"),
          col("__dims.height").as("height"),
          lit(null).cast("long").as("duration_ms")).as("meta"))
  }

  // ---- image container-header parsing (format sniffing by magic bytes) ----
  // Pure byte reads composed from codegen'd built-ins over the binary
  // column (substring → hex → conv): no UDF, no codec, fully pushed into
  // whole-stage codegen. Formats whose headers need no decompression:
  //   PNG  — IHDR width/height, big-endian u32 at offsets 16/20
  //   GIF  — logical-screen width/height, little-endian u16 at offsets 6/8
  //   BMP  — BITMAPINFOHEADER width/height, little-endian i32 at offsets
  //          18/22 (height may be negative = top-down; dimensions are |h|)
  // Unknown formats yield null, never a guess.

  /** Unsigned byte at 0-based `off` as a long column. */
  private def u8(c: Column, off: Int): Column =
    conv(hex(substring(c, off + 1, 1)), 16, 10).cast("long")

  private def be32(c: Column, off: Int): Column =
    conv(hex(substring(c, off + 1, 4)), 16, 10).cast("long")

  private def le16(c: Column, off: Int): Column =
    u8(c, off + 1) * 256 + u8(c, off)

  /** Little-endian SIGNED i32 (two's complement) at 0-based `off`. */
  private def le32s(c: Column, off: Int): Column = {
    val v = ((u8(c, off + 3) * 256 + u8(c, off + 2)) * 256 +
      u8(c, off + 1)) * 256 + u8(c, off)
    when(v >= 2147483648L, v - 4294967296L).otherwise(v)
  }

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def isPng(c: Column): Column =
    length(c) >= 24 && substring(c, 1, 8) === lit(PngSig) &&
      substring(c, 13, 4) === lit("IHDR".getBytes("US-ASCII"))

  private def isGif(c: Column): Column =
    length(c) >= 10 &&
      (substring(c, 1, 6) === lit("GIF87a".getBytes("US-ASCII")) ||
        substring(c, 1, 6) === lit("GIF89a".getBytes("US-ASCII")))

  private def isBmp(c: Column): Column =
    length(c) >= 26 && substring(c, 1, 2) === lit("BM".getBytes("US-ASCII"))

  private def isJpeg(c: Column): Column =
    length(c) >= 4 && substring(c, 1, 2) === lit(Array(0xFF, 0xD8).map(_.toByte))

  /** Dims of a PNG/GIF/BMP/JPEG payload as `struct<width, height>`, null
    * when unrecognized — the single-evaluation form [[toAssets]] uses.
    * Prefer this over separate [[imageWidth]]+[[imageHeight]] when both
    * are needed: it runs each format sniff (in particular the JPEG
    * segment walk) once per row instead of once per field. */
  def imageDims(c: Column): Column =
    when(isPng(c), struct(
        be32(c, 16).cast("int").as("width"), be32(c, 20).cast("int").as("height")))
      .when(isGif(c), struct(
        le16(c, 6).cast("int").as("width"), le16(c, 8).cast("int").as("height")))
      .when(isBmp(c), struct(
        abs(le32s(c, 18)).cast("int").as("width"), abs(le32s(c, 22)).cast("int").as("height")))
      .when(isJpeg(c), graft.functions.JpegDims.jpegDims(c))

  /** Parsed pixel width of a PNG/GIF/BMP/JPEG payload; null if not one.
    * A projection of [[imageDims]] (the one offset table) — a null struct
    * propagates a null field, so semantics match a per-format chain. */
  def imageWidth(c: Column): Column = imageDims(c).getField("width")

  /** Parsed pixel height of a PNG/GIF/BMP/JPEG payload; null if not one.
    * BMP height is |raw|: negative raw just means top-down row order. */
  def imageHeight(c: Column): Column = imageDims(c).getField("height")

  /** STUB decoder: a real implementation would decode the media container
    * and return pixel/sample data. The fake is deterministic in the bytes
    * so tests and oracles are stable. */
  private[operators] def decodeBytes(bytes: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real decode goes here; deterministic fake below
    val out = new Array[Float](dim)
    var h = 1125899906842597L // FNV-ish seed
    var i = 0
    while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
    var d = 0
    while (d < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(d) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
      d += 1
    }
    out
  }

  /** Feature extraction over asset batches: `mapPartitions` so a real
    * decoder amortizes model/codec setup per partition (the Scala analogue
    * of `mapInPandas` batching). Output: `(asset_id, feature: array<float>)`.
    */
  def extractFeatures(assets: DataFrame, dim: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("feature", ArrayType(FloatType))))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    assets.select("asset_id", "content").mapPartitions { it =>
      // per-partition setup (codec/model init) would happen here once
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1) // null payload -> empty decode
        Row(r.getLong(0),
          decodeBytes(if (bytes == null) Array.emptyByteArray else bytes, dim).toSeq)
      }
    }(enc)
  }

  /** Image resize over asset batches: REAL plumbing — same `mapPartitions`
    * decoder-amortization boundary as [[extractFeatures]], typed metadata
    * updated for real (width/height become the targets, `n_bytes` the new
    * payload length, mime and duration preserved) — around the STUB pixel
    * path: the "resized" payload is a deterministic fake derived from the
    * source bytes at the target raster (see [[decodeBytes]]'s boundary
    * note; a real decoder/encoder slots into this method without touching
    * the plan shape). Null payloads resize to null, metadata still
    * updated. */
  def resizeImages(assets: DataFrame, width: Int, height: Int): DataFrame = {
    require(width >= 1 && height >= 1,
      s"target dimensions must be positive, got ${width}x$height")
    // Int raster arithmetic: 65536x65536 would wrap to 0 (silent empty
    // payloads) and 65536x49152 to a NegativeArraySizeException per task;
    // 2^28 elements (~1 GiB of float) is already past any sane per-row
    // decode target
    require(width.toLong * height.toLong <= (1L << 28),
      s"target raster ${width}x$height exceeds 2^28 elements")
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(assetSchema)
    assets.select("asset_id", "content", "meta").mapPartitions { it =>
      // per-partition setup (codec init) would happen here once
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val resized: Array[Byte] =
          if (bytes == null) null
          else {
            val px = decodeBytes(bytes, width * height) // stub decode at target raster
            val out = new Array[Byte](px.length) // fake re-encode: 8-bit quantize
            var i = 0
            while (i < px.length) { out(i) = (px(i) * 255).toByte; i += 1 }
            out
          }
        val m = r.getStruct(2)
        Row(r.get(0), resized, Row(
          if (m == null) null else m.get(0),
          if (resized == null) null else resized.length.toLong,
          width, height,
          if (m == null) null else m.get(4)))
      }
    }(enc)
  }

  /** Frame sampling stub for video-like assets: emit every `stride`-th
    * "frame" as an offset slice of the payload — real plumbing (explode →
    * one row per frame, repartitionable), fake frames. Null-content assets
    * keep one row with a null frame (outer explode) rather than vanishing. */
  def sampleFrames(assets: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    assets.select(col("asset_id"), col("meta"),
        posexplode_outer(split_part_frames(col("content"), frameBytes, stride)))
      .withColumnsRenamed(Map("pos" -> "frame_idx", "col" -> "frame"))

  private def split_part_frames(content: org.apache.spark.sql.Column,
                                frameBytes: Int, stride: Int) = {
    val step = frameBytes * stride
    // frames whose first byte exists: i ∈ [0, ceil(len/step) - 1]
    val nFrames = ceil(length(content) / lit(step.toDouble)).cast("int")
    when(nFrames <= 0, array().cast("array<binary>"))
      .otherwise(transform(sequence(lit(0), nFrames - 1),
        i => substring(content, lit(1) + i * step, lit(frameBytes))))
  }
}
