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
  * tested; container-header METADATA (width/height for PNG/GIF/BMP/JPEG)
  * is parsed for real with codegen'd byte reads; and the pixel DECODE is
  * real too — [[decodeImage]] runs the JDK's builtin `javax.imageio`
  * codecs (JPEG/PNG/GIF/BMP ship with every JRE; no vendored native
  * libs), behind the same `mapPartitions` batching boundary a heavier
  * codec (ffmpeg for video/audio) would slot into. Non-image payloads
  * take honest fallbacks, never fakes: feature extraction falls back to
  * a byte-histogram featurizer and resize yields a null payload (you
  * cannot resample what you cannot decode — reported, not invented).
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

  /** REAL pixel decode via the JDK's builtin `javax.imageio` codecs
    * (JPEG/PNG/GIF/BMP — part of every JRE, no vendored native libs).
    * Returns `(width, height, pixels)` with pixels as packed sRGB
    * `0xAARRGGBB` ints, row-major top-down (`BufferedImage.getRGB`'s
    * contract — for 24-bit sources the channel bytes pass through
    * exactly, so an uncompressed-BMP fixture's planted values survive
    * decode bit-for-bit and a DuckDB oracle can replay them by slicing
    * the payload's pixel bytes directly). `None` when the bytes are not
    * a decodable image — the caller decides the fallback; decode never
    * invents pixels. */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes == null || bytes.length == 0) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        Some((w, h, img.getRGB(0, 0, w, h, null, 0, w)))
      }
    } catch {
      // a corrupt container must degrade to "not an image", not kill the
      // task: ImageIO throws IOException (and some plugins runtime
      // IndexOutOfBounds on truncated data) on malformed payloads
      case _: java.io.IOException | _: IndexOutOfBoundsException |
           _: IllegalArgumentException => None
    }
  }

  /** Decoded pixel rasters over asset batches: `(asset_id, width,
    * height, pixels: array<int>)` with pixels packed sRGB `0xAARRGGBB`
    * row-major top-down ([[decodeImage]]); non-decodable payloads keep
    * their row with null width/height/pixels — reported, never silently
    * dropped. `mapPartitions` is the decoder boundary (codec init
    * amortizes per partition; the per-row cost is the codec itself), and
    * the raster column stays a plain Spark array so everything
    * downstream — channel sums, pooling, thumbnail features — is
    * ordinary column arithmetic under whole-stage codegen. */
  def decodePixels(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixels", ArrayType(IntegerType))))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    assets.select("asset_id", "content").mapPartitions { it =>
      // in-memory codec scratch (ImageIO defaults to a temp-FILE cache
      // per stream — disk IO per row); idempotent, so per-partition is fine
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        decodeImage(r.getAs[Array[Byte]](1)) match {
          case Some((w, h, px)) => Row(r.get(0), w, h, px.toSeq)
          case None => Row(r.get(0), null, null, null)
        }
      }
    }(enc)
  }

  /** 64-bit difference hash (dHash, public domain) of a decoded raster:
    * pool BT.601 luminance onto a 9×8 grid (proportional box means —
    * the boxes live in RELATIVE coordinates, so the hash is invariant
    * to rescaling and even aspect distortion of the same picture), then
    * threshold horizontally adjacent cells: bit `gy*8+gx` is set iff
    * `grid(gy, gx+1) > grid(gy, gx)`. Rasters smaller than the grid
    * (w < 9 or h < 8) hash to `None` — an undersampled grid would
    * compare empty boxes; callers treat such images as unhashable, the
    * same honest degradation as a non-decodable payload. */
  private[graft] def dhash64(w: Int, h: Int, px: Array[Int]): Option[Long] =
    lumGrid(w, h, px).map(dhashOfGrid)

  /** The adjacent-cell threshold loop of [[dhash64]] over an
    * already-pooled grid — factored so the single-decode combined
    * extractor ([[imageHashGridsQ]]) derives the hash from the SAME
    * pooled field it quantizes, bit-identical to the two-pass form. */
  private[graft] def dhashOfGrid(grid: Array[Double]): Long = {
    var bits = 0L
    var b = 0
    while (b < 64) {
      if (grid(b / 8 * 9 + b % 8 + 1) > grid(b / 8 * 9 + b % 8)) bits |= 1L << b
      b += 1
    }
    bits
  }

  /** The 9×8 relative-coordinate luminance grid [[dhash64]] thresholds,
    * row-major (72 doubles, 0–255 scale) — shared by the hash and the
    * candidate-VERIFY pass so both see the identical pooled field. */
  private[graft] def lumGrid(w: Int, h: Int, px: Array[Int]): Option[Array[Double]] = {
    if (w < 9 || h < 8) None
    else {
      val grid = new Array[Double](72)
      var gy = 0
      while (gy < 8) {
        // Long box-edge arithmetic: gx * w overflows Int for w near 2^31
        val y0 = ((gy.toLong * h) / 8).toInt
        val y1 = (((gy + 1).toLong * h) / 8).toInt
        var gx = 0
        while (gx < 9) {
          val x0 = ((gx.toLong * w) / 9).toInt
          val x1 = (((gx + 1).toLong * w) / 9).toInt
          var s = 0.0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val p = px(y * w + x)
              s += 0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) +
                0.114 * (p & 0xFF)
              x += 1
            }
            y += 1
          }
          grid(gy * 9 + gx) = s / ((y1 - y0).toLong * (x1 - x0))
          gx += 1
        }
        gy += 1
      }
      Some(grid)
    }
  }

  /** Per-image QUANTIZED luminance grids for candidate verification:
    * `(asset_id, qgrid: array<long>)`, each cell `round(lum · 256)`
    * (fixed-point 1/256-luma steps). Quantizing at the decode boundary
    * makes every downstream distance an exact INTEGER sum — associative,
    * replayable, oracle-friendly — the same fixed-point discipline as
    * [[graft.operators.TextClassifier]] serving. Null qgrid for
    * undecodable or under-grid payloads, as [[imageDHash]]. */
  def luminanceGridsQ(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("qgrid", ArrayType(LongType))))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    assets.select("asset_id", "content").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val g = decodeImage(r.getAs[Array[Byte]](1))
          .flatMap { case (w, h, px) => lumGrid(w, h, px) }
          .map(_.map(v => Long.box(math.round(v * 256.0))).toSeq)
        Row(r.get(0), g.orNull)
      }
    }(enc)
  }

  /** Per-image dHash over asset batches: `(asset_id, dhash: long)` with
    * null dhash for payloads no codec claims or rasters below the 9×8
    * grid ([[dhash64]]) — reported, never dropped. Decode and hash run
    * in ONE `mapPartitions` pass (the codec boundary), so the full
    * raster never materializes in a DataFrame: 8 bytes leave per image
    * regardless of resolution — the narrow-pass shape doc-level
    * [[graft.functions.SimHash64]] has for text, which is what lets the
    * downstream banded self-join scale on the hash table alone. */
  def imageDHash(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("dhash", LongType)))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    assets.select("asset_id", "content").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val hash = decodeImage(r.getAs[Array[Byte]](1))
          .flatMap { case (w, h, px) => dhash64(w, h, px) }
        Row(r.get(0), hash.map(Long.box).orNull)
      }
    }(enc)
  }

  /** dHash AND quantized verify grid in ONE decode pass:
    * `(asset_id, dhash: long, qgrid: array<long>)` — the columns
    * [[imageDHash]] and [[luminanceGridsQ]] produce, derived from a
    * SINGLE [[decodeImage]]+[[lumGrid]] evaluation per asset (the codec
    * is the dominant cost of every image-dedup pass; the two-pass form
    * decodes the corpus once per extractor). Null hash/grid exactly as
    * the separate extractors: both are null precisely when the payload
    * is undecodable or the raster undersamples the 9×8 grid, and both
    * values are bit-identical to the separate passes by construction
    * (same pooled double field thresholded / quantized). */
  def imageHashGridsQ(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("dhash", LongType),
      StructField("qgrid", ArrayType(LongType))))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    assets.select("asset_id", "content").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        decodeImage(r.getAs[Array[Byte]](1))
          .flatMap { case (w, h, px) => lumGrid(w, h, px) } match {
          case Some(grid) =>
            Row(r.get(0), Long.box(dhashOfGrid(grid)),
              grid.map(v => Long.box(math.round(v * 256.0))).toSeq)
          case None => Row(r.get(0), null, null)
        }
      }
    }(enc)
  }

  /** Featurize a decoded raster: mean luminance (ITU-R BT.601 weights,
    * double accumulation for order-stable sums) over `dim` contiguous
    * row-major chunks — a real mean-pooled grayscale descriptor. */
  private def pooledLuminance(px: Array[Int], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val n = px.length
    var d = 0
    while (d < dim) {
      val lo = (d.toLong * n / dim).toInt
      val hi = ((d + 1).toLong * n / dim).toInt
      var s = 0.0
      var i = lo
      while (i < hi) {
        val p = px(i)
        s += (0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) +
          0.114 * (p & 0xFF)) / 255.0
        i += 1
      }
      out(d) = (if (hi > lo) s / (hi - lo) else 0.0).toFloat
      d += 1
    }
    out
  }

  /** Featurize opaque bytes: the folded byte histogram,
    * `f(d) = |{i : bytes(i) mod dim = d}| / len` — a real (if simple)
    * content descriptor for payloads no codec claims, deterministic in
    * the bytes. Empty payloads featurize to the zero vector. */
  private def byteHistogram(bytes: Array[Byte], dim: Int): Array[Float] = {
    val counts = new Array[Int](dim)
    var i = 0
    while (i < bytes.length) {
      counts((bytes(i) & 0xFF) % dim) += 1; i += 1
    }
    val out = new Array[Float](dim)
    if (bytes.length > 0) {
      var d = 0
      while (d < dim) { out(d) = counts(d).toFloat / bytes.length; d += 1 }
    }
    out
  }

  /** Feature extraction over asset batches: `mapPartitions` so the codec
    * amortizes setup per partition (the Scala analogue of `mapInPandas`
    * batching). Decodable images ([[decodeImage]]) yield the mean-pooled
    * grayscale descriptor; everything else the byte-histogram fallback —
    * both real functions of the content, both deterministic. Output:
    * `(asset_id, feature: array<float>)`. */
  def extractFeatures(assets: DataFrame, dim: Int = 16): DataFrame = {
    require(dim >= 1, s"feature dim must be positive, got $dim")
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("feature", ArrayType(FloatType))))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    assets.select("asset_id", "content").mapPartitions { it =>
      // per-partition setup (model init for a learned featurizer) here
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1) // null payload -> empty histogram
        val feat = decodeImage(bytes) match {
          case Some((_, _, px)) => pooledLuminance(px, dim)
          case None =>
            byteHistogram(if (bytes == null) Array.emptyByteArray else bytes, dim)
        }
        Row(r.getLong(0), feat.toSeq)
      }
    }(enc)
  }

  /** Image resize over asset batches — REAL end to end: decode via
    * [[decodeImage]], nearest-neighbor resample to the target raster
    * (`src = floor(dst · srcDim / dstDim)` — deterministic integer
    * arithmetic, no interpolation-kernel variance), re-encode as
    * uncompressed 24-bit BMP via the JDK's `ImageIO` writer. Typed
    * metadata updates for real (width/height become the targets,
    * `n_bytes` the new payload length, mime becomes `image/bmp`,
    * duration preserved). Null or NON-DECODABLE payloads resize to a
    * null payload with metadata still updated — you cannot resample
    * bytes no codec claims, and inventing a payload would be the stub
    * this method used to be. Same `mapPartitions` codec-amortization
    * boundary as [[extractFeatures]]. */
  def resizeImages(assets: DataFrame, width: Int, height: Int): DataFrame = {
    requireRasterTarget(width, height)
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(assetSchema)
    assets.select("asset_id", "content", "meta").mapPartitions { it =>
      // per-partition setup (codec init) would happen here once
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val resized: Array[Byte] = decodeImage(bytes) match {
          case Some((sw, sh, px)) => resampleRasterToBmp(sw, sh, px, width, height)
          case None => null
        }
        val m = r.getStruct(2)
        Row(r.get(0), resized, Row(
          if (resized == null) { if (m == null) null else m.get(0) }
          else "image/bmp",
          if (resized == null) null else resized.length.toLong,
          width, height,
          if (m == null) null else m.get(4)))
      }
    }(enc)
  }

  /** Int raster arithmetic guard shared by the resample targets:
    * 65536x65536 would wrap to 0 (silent empty payloads) and 65536x49152
    * to a NegativeArraySizeException per task; 2^28 elements (~1 GiB of
    * ARGB) is already past any sane per-row decode target. */
  private def requireRasterTarget(width: Int, height: Int): Unit = {
    require(width >= 1 && height >= 1,
      s"target dimensions must be positive, got ${width}x$height")
    require(width.toLong * height.toLong <= (1L << 28),
      s"target raster ${width}x$height exceeds 2^28 elements")
  }

  /** Nearest-neighbor resample of a decoded raster to `width`x`height`
    * and re-encode as uncompressed 24-bit BMP — the shared core of
    * [[resizeImages]] and [[transcodeVideo]] (`src = floor(dst · srcDim
    * / dstDim)`, deterministic integer arithmetic, no interpolation-
    * kernel variance). */
  private def resampleRasterToBmp(sw: Int, sh: Int, px: Array[Int],
                                  width: Int, height: Int): Array[Byte] = {
    val dst = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      // Long source-coordinate arithmetic: the 2^28 guard bounds the
      // TARGET raster only — dst_coord * src_dim can pass 2^31 for a
      // wide source (e.g. 1M-px source → width 10000) and an Int product
      // would wrap to a negative index
      val sy = ((y.toLong * sh) / height).toInt
      var x = 0
      while (x < width) {
        dst.setRGB(x, y, px(sy * sw + ((x.toLong * sw) / width).toInt))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "bmp", bos)
    bos.toByteArray
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

  // ---- audio: PCM fingerprinting + resampling at the codec boundary ----
  // The payload model is unsigned 8-bit PCM — the honest fake for a
  // container with no audio codec (the scheme of this file's header
  // comment: a real deployment slots ffmpeg decode in at exactly this
  // mapPartitions boundary; everything below the decode — relative
  // framing, energy pooling, delta-sign packing — is codec-independent).

  /** Energy-delta audio fingerprint — the one-band simplification of the
    * Haitsma & Kalker (2002, "A Highly Robust Audio Fingerprinting
    * System") energy-difference scheme, and the exact 1-D twin of
    * [[dhash64]]: pool the stream's mean absolute deviation from the
    * u8 midpoint onto 65 frames in RELATIVE coordinates (frame `k` covers
    * bytes `[k·L/65, (k+1)·L/65)`), then bit `k` is set iff
    * `energy(k+1) > energy(k)`. The two invariances that make it a
    * NEAR-dup hash rather than a byte hash:
    *  - GAIN: `s' = 128 + α(s−128)` scales every frame energy by α, so
    *    the delta-sign pattern is unchanged (up to rounding noise, which
    *    averages out over a frame);
    *  - RESAMPLING: the frames live in relative time, so a copy at a
    *    different length pools approximately the same energy curve.
    * Payloads shorter than 65 bytes (a frame would be empty) fingerprint
    * to `None` — unhashable, the [[dhash64]] degradation. */
  private[graft] def audioFingerprint64(bytes: Array[Byte]): Option[Long] =
    energyCurve(bytes).map(fingerprintOfCurve)

  /** The delta-sign packing loop of [[audioFingerprint64]] over an
    * already-pooled curve — factored so [[audioHashCurvesQ]] derives
    * the fingerprint from the SAME curve it quantizes. */
  private[graft] def fingerprintOfCurve(e: Array[Double]): Long = {
    var bits = 0L
    var b = 0
    while (b < 64) { if (e(b + 1) > e(b)) bits |= 1L << b; b += 1 }
    bits
  }

  /** The 65-frame relative-time energy curve [[audioFingerprint64]]
    * thresholds (mean absolute deviation from the u8 midpoint per frame)
    * — shared by the fingerprint and the candidate-verify pass. */
  private[graft] def energyCurve(bytes: Array[Byte]): Option[Array[Double]] = {
    if (bytes == null || bytes.length < 65) None
    else {
      val len = bytes.length
      val e = new Array[Double](65)
      var k = 0
      while (k < 65) {
        // Long edge arithmetic: k * len overflows Int for multi-GiB clips
        val b0 = ((k.toLong * len) / 65).toInt
        val b1 = (((k + 1).toLong * len) / 65).toInt
        var s = 0.0
        var i = b0
        while (i < b1) { s += math.abs((bytes(i) & 0xFF) - 128); i += 1 }
        e(k) = s / (b1 - b0)
        k += 1
      }
      Some(e)
    }
  }

  /** Per-clip QUANTIZED mean-normalized energy curves for candidate
    * verification: `(asset_id, qcurve: array<long>)`, each frame
    * `round(256 · e_k · 65 / Σe)` — dividing by the curve's own mean
    * makes the SHAPE gain-invariant (a re-gained copy scales every
    * frame equally), and the fixed-point rounding makes downstream
    * distances exact integer sums (the [[luminanceGridsQ]] discipline).
    * Null qcurve for clips too short to frame AND for silent clips
    * (Σe = 0 — a shape-of-silence has no defined normalization; such
    * clips cannot be VERIFIED as near-dups, the honest degradation). */
  def energyCurvesQ(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("qcurve", ArrayType(LongType))))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    assets.select("asset_id", "content").mapPartitions { it =>
      it.map { r =>
        val q = energyCurve(r.getAs[Array[Byte]](1)).flatMap { e =>
          val total = e.sum
          if (total <= 0.0) None
          else Some(e.map(v => Long.box(math.round(v * 65.0 * 256.0 / total))).toSeq)
        }
        Row(r.get(0), q.orNull)
      }
    }(enc)
  }

  /** Fingerprint AND quantized verify curve in ONE pass:
    * `(asset_id, afp: long, qcurve: array<long>)` — the columns
    * [[audioFingerprints]] and [[energyCurvesQ]] produce, derived from
    * a SINGLE [[energyCurve]] pooling per clip. Null semantics match
    * the separate extractors exactly: afp is null when the clip is too
    * short to frame; qcurve additionally nulls for SILENT clips
    * (Σe = 0 — hashable but unverifiable, the [[energyCurvesQ]]
    * contract). Values bit-identical to the separate passes (same
    * pooled curve thresholded / normalized). */
  def audioHashCurvesQ(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("afp", LongType),
      StructField("qcurve", ArrayType(LongType))))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    assets.select("asset_id", "content").mapPartitions { it =>
      it.map { r =>
        energyCurve(r.getAs[Array[Byte]](1)) match {
          case Some(e) =>
            val total = e.sum
            val q = if (total <= 0.0) null
              else e.map(v => Long.box(math.round(v * 65.0 * 256.0 / total))).toSeq
            Row(r.get(0), Long.box(fingerprintOfCurve(e)), q)
          case None => Row(r.get(0), null, null)
        }
      }
    }(enc)
  }

  /** Per-asset audio fingerprints: `(asset_id, afp: long)` with null afp
    * for payloads too short to frame ([[audioFingerprint64]]) — reported,
    * never dropped. One `mapPartitions` pass, 8 bytes out per asset
    * regardless of clip length — the [[imageDHash]] narrow-pass shape,
    * which is what lets the downstream banded Hamming self-join scale on
    * the fingerprint table alone. */
  def audioFingerprints(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("afp", LongType)))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    assets.select("asset_id", "content").mapPartitions { it =>
      it.map { r =>
        Row(r.get(0),
          audioFingerprint64(r.getAs[Array[Byte]](1)).map(Long.box).orNull)
      }
    }(enc)
  }

  // ---- video: concatenated-BMP container + temporal fingerprinting ----
  // The payload model is a back-to-back sequence of complete BMP frames —
  // the honest fake for a container with no video codec (the header
  // comment's scheme: a real deployment slots ffmpeg demux+decode in at
  // exactly the mapPartitions boundary below; everything past the frame
  // boundary — relative-TIME sampling, per-frame grid pooling, temporal
  // mean, delta-sign packing — is codec-independent). The container is
  // SELF-DESCRIBING: each BMP header carries its own file size (LE u32 at
  // offset 2, written by both the synth builder and `ImageIO`'s encoder),
  // so the frame walk is real container parsing, not fixed-stride slicing
  // ([[sampleFrames]] remains the generic raw slicer for formats with no
  // frame directory).

  /** Default temporal sample count of the video fingerprint surfaces:
    * [[videoDHash]]/[[videoGridsQ]]/[[transcodeVideo]] agree on it so a
    * transcoded copy's sampled frames land on the SAME source frames as
    * the base's (floor(j·F/K) composes exactly when targetFrames = K). */
  val VideoSampleFrames = 4

  /** Walk a concatenated-BMP payload into its frames via each header's
    * own file-size field: a frame is emitted only when its magic ("BM"),
    * declared size (≥ the 54-byte header), and extent (fits the payload)
    * all check out; the walk STOPS at the first violation — a malformed
    * tail degrades to "no more frames", never to invented ones. Null or
    * short payloads yield zero frames. */
  private[graft] def splitBmpFrames(bytes: Array[Byte]): Array[(Int, Array[Byte])] = {
    if (bytes == null) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    var off = 0
    var ok = true
    while (ok && off + 54 <= bytes.length &&
        bytes(off) == 'B'.toByte && bytes(off + 1) == 'M'.toByte) {
      val size = leU32(bytes, off + 2)
      if (size < 54 || off + size > bytes.length) ok = false
      else {
        out += ((off, java.util.Arrays.copyOfRange(bytes, off, (off + size).toInt)))
        off = (off + size).toInt
      }
    }
    out.toArray
  }

  /** Little-endian u32 at `off` as a Long (no sign wrap for sizes past
    * 2^31 — a hostile header must fail the bounds check, not index
    * negatively). */
  private def leU32(bytes: Array[Byte], off: Int): Long =
    (bytes(off) & 0xFFL) | ((bytes(off + 1) & 0xFFL) << 8) |
      ((bytes(off + 2) & 0xFFL) << 16) | ((bytes(off + 3) & 0xFFL) << 24)

  /** Little-endian SIGNED i32 at `off` (BITMAPINFOHEADER dims; height may
    * be negative = top-down row order, callers take |.|). */
  private def leI32(bytes: Array[Byte], off: Int): Int =
    (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8) |
      ((bytes(off + 2) & 0xFF) << 16) | ((bytes(off + 3) & 0xFF) << 24)

  /** Per-frame container metadata of concatenated-BMP video assets:
    * `(asset_id, frame_idx, frame_off, frame_bytes, width, height)` from
    * the REAL frame walk ([[splitBmpFrames]]) plus each frame's own
    * BITMAPINFOHEADER dims — header reads only, no decode. Assets with
    * zero valid frames (null, non-video, malformed-from-byte-0 payloads)
    * keep ONE row with null frame fields — reported, never dropped. */
  def videoFrameMeta(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame_off", LongType),
      StructField("frame_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    assets.select("asset_id", "content").mapPartitions { it =>
      it.flatMap { r =>
        val frames = splitBmpFrames(r.getAs[Array[Byte]](1))
        if (frames.isEmpty) Iterator.single(Row(r.get(0), null, null, null, null, null))
        else frames.iterator.zipWithIndex.map { case ((off, f), i) =>
          Row(r.get(0), i, off.toLong, f.length.toLong,
            math.abs(leI32(f, 18)), math.abs(leI32(f, 22)))
        }
      }
    }(enc)
  }

  /** Decode `k` temporally sampled frames of a concatenated-BMP payload
    * to their 9×8 luminance grids ([[lumGrid]]). Sampling lives in
    * RELATIVE time — sample `j` reads frame `floor(j·F/k)` — so a copy
    * at a different frame count pools approximately the same grids; the
    * spatial grid is [[dhash64]]'s relative-coordinate pooling, so a
    * copy at a different resolution does too. `None` when the payload
    * has no valid frames or ANY sampled frame fails to decode/grid — a
    * signature over a partial sample would compare different time
    * points across assets. */
  private[graft] def videoSampledGrids(bytes: Array[Byte],
                                       k: Int): Option[Array[Array[Double]]] = {
    val frames = splitBmpFrames(bytes)
    if (frames.isEmpty) None
    else {
      val grids = new Array[Array[Double]](k)
      var j = 0
      var ok = true
      while (ok && j < k) {
        val f = frames(((j.toLong * frames.length) / k).toInt)._2
        decodeImage(f).flatMap { case (w, h, px) => lumGrid(w, h, px) } match {
          case Some(g) => grids(j) = g
          case None => ok = false
        }
        j += 1
      }
      if (ok) Some(grids) else None
    }
  }

  /** 64-bit temporal-mean video dHash: mean the `k` sampled frames' 9×8
    * luminance grids cell-by-cell (fixed j = 0..k−1 summation order),
    * then threshold horizontally adjacent cells — [[dhash64]] over the
    * clip's TEMPORAL MEAN FRAME. Invariant to frame-rate changes
    * (relative-time sampling), spatial rescale/aspect (relative grid),
    * and any monotone per-frame contrast scaling around a shared mean
    * (adjacent-delta signs survive positive scaling). Temporal
    * REORDERING invariance is deliberate slack in the hash — the
    * candidate-verify pass ([[videoGridsQ]] distances, which ARE
    * temporally aligned) restores order sensitivity. */
  private[graft] def videoSignature64(bytes: Array[Byte], k: Int): Option[Long] =
    videoSampledGrids(bytes, k).map(signatureOfGrids(_, k))

  /** The temporal-mean + threshold tail of [[videoSignature64]] over
    * already-sampled grids — factored so [[videoHashGridsQ]] derives
    * the signature from the SAME grids it quantizes (fixed j = 0..k−1
    * summation order preserved, bit-identical to the two-pass form). */
  private[graft] def signatureOfGrids(grids: Array[Array[Double]], k: Int): Long = {
    val mean = new Array[Double](72)
    var j = 0
    while (j < k) {
      var c = 0
      while (c < 72) { mean(c) += grids(j)(c); c += 1 }
      j += 1
    }
    var c = 0
    while (c < 72) { mean(c) /= k; c += 1 }
    var bits = 0L
    var b = 0
    while (b < 64) {
      if (mean(b / 8 * 9 + b % 8 + 1) > mean(b / 8 * 9 + b % 8)) bits |= 1L << b
      b += 1
    }
    bits
  }

  /** Per-asset temporal-mean video hashes: `(asset_id, vhash: long)`,
    * null vhash for assets with no decodable sampled frames — reported,
    * never dropped. One `mapPartitions` pass over the codec boundary;
    * 8 bytes leave per clip regardless of length or resolution — the
    * [[imageDHash]] narrow-pass shape, so the downstream banded Hamming
    * self-join scales on the hash table alone. */
  def videoDHash(assets: DataFrame,
                 k: Int = VideoSampleFrames): DataFrame = {
    require(k >= 1, s"sample count must be positive, got $k")
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("vhash", LongType)))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    assets.select("asset_id", "content").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        Row(r.get(0),
          videoSignature64(r.getAs[Array[Byte]](1), k).map(Long.box).orNull)
      }
    }(enc)
  }

  /** Per-asset QUANTIZED temporally-aligned grids for candidate
    * verification: `(asset_id, qgrid: array<long>)` of k·72 cells, cell
    * `j·72 + c` = `round(lum_j(c) · 256)` — the [[luminanceGridsQ]]
    * fixed-point discipline extended along time, so the verify distance
    * (exact integer Σ|Δ|) compares frame j against frame j and a
    * temporally REORDERED clip that slipped past the order-blind hash
    * fails here. Null qgrid exactly when [[videoDHash]] is null. */
  def videoGridsQ(assets: DataFrame,
                  k: Int = VideoSampleFrames): DataFrame = {
    require(k >= 1, s"sample count must be positive, got $k")
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("qgrid", ArrayType(LongType))))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    assets.select("asset_id", "content").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val q = videoSampledGrids(r.getAs[Array[Byte]](1), k).map { grids =>
          grids.flatMap(_.map(v => Long.box(math.round(v * 256.0)))).toSeq
        }
        Row(r.get(0), q.orNull)
      }
    }(enc)
  }

  /** Temporal-mean hash AND quantized aligned grids in ONE decode pass:
    * `(asset_id, vhash: long, qgrid: array<long>)` — the columns
    * [[videoDHash]] and [[videoGridsQ]] produce, derived from a SINGLE
    * [[videoSampledGrids]] evaluation per clip (the k per-frame
    * `ImageIO` decodes are the dominant cost; the two-pass form pays
    * them once per extractor). Both columns null exactly when the clip
    * has no decodable sampled frames — the shared contract of the
    * separate extractors — and both values bit-identical to them. */
  def videoHashGridsQ(assets: DataFrame,
                      k: Int = VideoSampleFrames): DataFrame = {
    require(k >= 1, s"sample count must be positive, got $k")
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("vhash", LongType),
      StructField("qgrid", ArrayType(LongType))))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    assets.select("asset_id", "content").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        videoSampledGrids(r.getAs[Array[Byte]](1), k) match {
          case Some(grids) =>
            Row(r.get(0), Long.box(signatureOfGrids(grids, k)),
              grids.flatMap(_.map(v => Long.box(math.round(v * 256.0)))).toSeq)
          case None => Row(r.get(0), null, null)
        }
      }
    }(enc)
  }

  /** Video transcode — the [[resizeImages]]/[[resamplePcm]] analog for
    * the third modality, REAL end to end: walk the source frames
    * ([[splitBmpFrames]]), temporally resample to `targetFrames` in
    * relative time (output frame j reads source frame
    * `floor(j·F/targetFrames)` — the nearest-neighbor rule of both
    * siblings), spatially resample each selected frame to
    * `width`×`height` and re-encode ([[resampleRasterToBmp]]), then
    * re-concatenate. The output shares no bytes with its source
    * (different frame count, resolution, aspect, and encoder), so
    * byte-level exact dedup can never pair a transcoded copy with its
    * original — the gap [[videoDHash]] + banded Hamming pairing closes.
    * Payloads with no valid frames (or any undecodable selected frame)
    * transcode to a null payload with metadata still updated — you
    * cannot resample frames no codec claims; inventing them would be a
    * stub. */
  def transcodeVideo(assets: DataFrame, targetFrames: Int,
                     width: Int, height: Int): DataFrame = {
    require(targetFrames >= 1,
      s"target frame count must be positive, got $targetFrames")
    requireRasterTarget(width, height)
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(assetSchema)
    assets.select("asset_id", "content", "meta").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val frames = splitBmpFrames(r.getAs[Array[Byte]](1))
        val out: Array[Byte] =
          if (frames.isEmpty) null
          else {
            val encoded = new Array[Array[Byte]](targetFrames)
            var j = 0
            var ok = true
            while (ok && j < targetFrames) {
              val src = frames(((j.toLong * frames.length) / targetFrames).toInt)._2
              decodeImage(src) match {
                case Some((sw, sh, px)) =>
                  encoded(j) = resampleRasterToBmp(sw, sh, px, width, height)
                case None => ok = false
              }
              j += 1
            }
            if (!ok) null
            else {
              val bos = new java.io.ByteArrayOutputStream()
              encoded.foreach(bos.write)
              bos.toByteArray
            }
          }
        val m = r.getStruct(2)
        Row(r.get(0), out, Row(
          if (m == null) null else m.get(0),
          if (out == null) null else out.length.toLong,
          width, height,
          if (m == null) null else m.get(4)))
      }
    }(enc)
  }

  /** Resample a PCM-u8 payload to `targetLen` samples (nearest-neighbor,
    * relative coordinates — the 1-D twin of [[resizeImages]]) with an
    * optional GAIN applied around the u8 midpoint (clamped to [0, 255]).
    * The transcode analog for audio: the output shares no byte prefix
    * with its source at a different length, so byte-level exact dedup
    * can never pair a resampled copy with its original — which is the
    * gap [[audioFingerprints]] + banded Hamming pairing closes.
    * Null/empty payloads resample to null (you cannot resample what you
    * cannot read — reported, not invented); metadata keeps the source
    * mime and duration, with `n_bytes` updated to the new length. */
  def resamplePcm(assets: DataFrame, targetLen: Int,
                  gain: Double = 1.0): DataFrame = {
    require(targetLen >= 1, s"target length must be positive, got $targetLen")
    require(targetLen <= (1 << 28),
      s"target length $targetLen exceeds 2^28 samples")
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(assetSchema)
    assets.select("asset_id", "content", "meta").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val out: Array[Byte] =
          if (bytes == null || bytes.isEmpty) null
          else {
            val len = bytes.length
            val dst = new Array[Byte](targetLen)
            var i = 0
            while (i < targetLen) {
              // Long source-index arithmetic, as in resizeImages
              val s = (bytes(((i.toLong * len) / targetLen).toInt) & 0xFF) - 128
              val v = 128 + math.round(gain * s).toInt
              dst(i) = math.max(0, math.min(255, v)).toByte
              i += 1
            }
            dst
          }
        val m = r.getStruct(2)
        Row(r.get(0), out, Row(
          if (m == null) null else m.get(0),
          if (out == null) null else out.length.toLong,
          null, null,
          if (m == null) null else m.get(4)))
      }
    }(enc)
  }
}
