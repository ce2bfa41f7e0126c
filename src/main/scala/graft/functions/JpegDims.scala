package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StructField, StructType}

/** Pixel dimensions of a JPEG payload as `struct<width:int, height:int>`,
  * or null if the bytes are not a well-formed JPEG header stream.
  *
  * JPEG cannot be parsed with fixed-offset byte reads (the PNG/GIF/BMP
  * treatment in [[graft.operators.Multimodal]]): dimensions live in a SOF
  * segment at a data-dependent offset, behind a variable number of
  * variable-length segments (APPn/COM/DQT/...), so extraction needs a
  * segment-hopping loop — hence a native expression, the same
  * justification bar as [[ShingleHashes]]. The walk:
  *
  *  - SOI (`FF D8`) must open the stream;
  *  - each marker may be preceded by any number of `FF` fill bytes;
  *  - standalone markers (TEM `01`, RST `D0`-`D7`) carry no length;
  *  - SOF0-SOF15 (`C0`-`CF` minus DHT `C4`, JPG `C8`, DAC `CC`) carry
  *    `len(2) precision(1) height(2 BE) width(2 BE)` — both baseline
  *    (`C0`) and progressive (`C2`) land here;
  *  - any other segment is skipped via its big-endian length (which
  *    counts itself, so `len < 2` is malformed);
  *  - SOS (`DA`) or EOI (`D9`) before any SOF, a truncated buffer, or a
  *    malformed length all yield null — never a guess.
  *
  * A DNL-deferred height (SOF height 0) is returned as 0, faithfully: the
  * real height is in a DNL segment after the scan data, which a
  * header-only reader must not pretend to know.
  */
case class JpegDims(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jpeg_dims requires a binary argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = JpegDims.outType
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_dims"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val n = b.length
    @inline def u8(i: Int): Int = b(i) & 0xFF
    @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (n < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return null
    var i = 2
    while (i + 1 < n) {
      if (u8(i) != 0xFF) return null // marker expected
      var j = i + 1
      while (j < n && u8(j) == 0xFF) j += 1 // fill bytes
      if (j >= n) return null
      val m = u8(j)
      if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
        if (j + 7 >= n) return null
        if (be16(j + 1) < 8) return null // SOF must hold prec+dims
        return new GenericInternalRow(
          Array[Any](be16(j + 6), be16(j + 4))) // (width, height)
      } else if (m == 0xD9 || m == 0xDA) {
        return null // EOI / scan data before any SOF
      } else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7) || m == 0xD8) {
        i = j + 1 // standalone marker, no length
      } else {
        if (j + 2 >= n) return null
        val len = be16(j + 1)
        if (len < 2) return null // length counts itself
        i = j + 1 + len
      }
    }
    null
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JpegDims {
  import org.apache.spark.sql.graft.Bridge

  private[functions] val outType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  def jpegDims(c: Column): Column = Bridge.column(JpegDims(Bridge.expression(c)))
}
