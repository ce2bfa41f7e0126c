package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with a typed metadata struct, plus decode / feature-extract
  * plumbing.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape) is real and
  * tested; the actual media decode is STUBBED with a deterministic fake —
  * this container has no image/audio codecs. The stub boundary is
  * `decodeBytes` below: swap it for a real decoder (JavaCPP/ffmpeg or a
  * `mapInPandas`-equivalent Arrow batch UDF) without touching the plan
  * shape around it.
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
    * Width/height here are deterministic pseudo-values derived from the
    * content hash (STUB — a real pipeline reads them from the container
    * format header). */
  def toAssets(df: DataFrame, idCol: String, payloadCol: String,
               mime: String): DataFrame = {
    val content = col(payloadCol).cast("binary")
    df.select(
      // try_cast: a non-numeric id yields null instead of an ANSI runtime
      // error (the repo's lenient-input policy, cf. Readers.ensureColumns)
      expr(s"try_cast(`$idCol` AS BIGINT)").as("asset_id"),
      content.as("content"),
      struct(
        lit(mime).as("mime"),
        length(content).cast("long").as("n_bytes"),
        (pmod(xxhash64(content), lit(1920)) + 1).cast("int").as("width"),
        (pmod(xxhash64(content, lit(1)), lit(1080)) + 1).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))
  }

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
