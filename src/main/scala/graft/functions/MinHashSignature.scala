package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a single custom aggregate: one `Array[Long]`
  * buffer updated in one pass per input row, merged elementwise — instead
  * of `numHashes` separate `min(xxhash64(...))` aggregate expressions
  * (which widen the aggregation operator past codegen limits and evaluate
  * `numHashes` independent expression trees per row).
  *
  * Hash family: `XxHash64Function.hash(value, seed = i)` for
  * i ∈ [0, numHashes) — deterministic, seed-indexed, and computed on the
  * raw bytes once per row (the per-seed cost is just the avalanche mix).
  * Signature values are internal to the LSH pipeline (candidates are
  * re-verified with exact Jaccard), so the family only needs to be a
  * consistent min-wise hash, which this is.
  */
case class MinHashSignature(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      var i = 0
      while (i < numHashes) {
        val h = XxHash64Function.hash(v, child.dataType, i.toLong)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashSignature =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSignature =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object MinHashSignature {
  import org.apache.spark.sql.graft.Bridge

  def minhashSignature(c: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(c), numHashes)
      .toAggregateExpression())
}
