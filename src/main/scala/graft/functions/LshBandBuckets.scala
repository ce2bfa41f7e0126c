package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All LSH band buckets of an embedding in ONE compiled pass: band `b`
  * packs the sign bits of `bitsPerBand` projections against fixed ±1
  * (Rademacher) hyperplanes into a long.
  *
  * Replaces the compose-from-built-ins formulation (`bands × bitsPerBand`
  * separate dot-product expressions against literal plane arrays), whose
  * plan-sized expression tree dominated the profile — the projections
  * themselves are a tight `bands·bits·dims` multiply-add loop. Plane
  * component for (bit, dim) is [[LshBandBuckets.planeSign]] (a splitmix64
  * finalizer — deterministic across runs, sessions, and executors), and
  * the per-bit accumulation order matches [[DotProduct]]'s sequential
  * array-order sum, so outputs are bit-identical to the composed form.
  */
case class LshBandBuckets(child: Expression, dims: Int, bands: Int, bitsPerBand: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _)
        if dims >= 1 && bands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"lsh_band_buckets requires dims >= 1, bands >= 1, bitsPerBand in [1, 63]; " +
          s"got dims=$dims bands=$bands bitsPerBand=$bitsPerBand")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"lsh_band_buckets requires array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_band_buckets"

  /** Plane matrix, laid out [bit × dim]; rebuilt lazily per deserialized
    * instance (deterministic, so every executor derives the same planes). */
  @transient private lazy val planes: Array[Double] = {
    val p = new Array[Double](bands * bitsPerBand * dims)
    var bit = 0
    while (bit < bands * bitsPerBand) {
      var d = 0
      while (d < dims) {
        p(bit * dims + d) = LshBandBuckets.planeSign(bit, d)
        d += 1
      }
      bit += 1
    }
    p
  }

  // parquet-sourced arrays typically DECLARE containsNull=true even when no
  // element is null, so nullability is enforced per row at eval, not at
  // analysis; the static flag keeps the check out of non-nullable plans
  @transient private lazy val elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // fail fast on dimension drift: silently truncating (or zero-padding)
    // would decorrelate buckets from full-vector cosine — recall loss with
    // no error, the worst failure mode for a candidate generator
    if (v.numElements() != dims)
      throw new IllegalArgumentException(
        s"lsh_band_buckets: vector has ${v.numElements()} dims, expected $dims")
    // same silent-recall-loss class: getDouble on a null slot reads 0.0 and
    // decorrelates every band from the true vector — reject it loudly
    if (elemNullable) {
      var d = 0
      while (d < dims) {
        if (v.isNullAt(d))
          throw new IllegalArgumentException(
            s"lsh_band_buckets: null element at index $d; embeddings must be dense")
        d += 1
      }
    }
    val n = dims
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var packed = 0L
      var i = 0
      while (i < bitsPerBand) {
        val bit = b * bitsPerBand + i
        val base = bit * dims
        var proj = 0.0
        var d = 0
        while (d < n) {
          proj += v.getDouble(d) * planes(base + d)
          d += 1
        }
        if (proj > 0) packed |= (1L << i)
        i += 1
      }
      out(b) = packed
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBandBuckets {

  /** Deterministic Rademacher (±1) hyperplane component for (bit, dim):
    * a splitmix64 finalizer over the packed key — fixed across runs and
    * sessions, no RNG state, so LSH buckets are reproducible. */
  def planeSign(bit: Int, dim: Int): Double = {
    var z = ((bit.toLong << 32) | (dim.toLong & 0xFFFFFFFFL)) + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= (z >>> 31)
    if ((z & 1L) == 0L) 1.0 else -1.0
  }

  import org.apache.spark.sql.graft.Bridge
  def lshBandBuckets(c: Column, dims: Int, bands: Int, bitsPerBand: Int): Column =
    Bridge.column(LshBandBuckets(Bridge.expression(c), dims, bands, bitsPerBand))
}
