package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Linear-model margin over hashed presence features: for a feature-hash
  * array `h` (raw 64-bit hashes, e.g. [[ShingleHashes]] unigrams) and a
  * weight vector of length `dim` riding a REAL Spark broadcast, returns
  * `Σ_i weights[floorMod(h_i, dim)]` — the scoring hot loop of
  * [[graft.operators.TextClassifier]].
  *
  * Why a broadcast-handle expression and not `element_at` over a
  * `typedLit` weight array: the [[SpanSketchProbe]] rationale verbatim —
  * a 2¹⁶-slot weight literal embeds ~0.5 MiB in the expression tree and
  * re-ships per stage, while the broadcast crosses the wire once per
  * executor and the probe is a tight array loop.
  *
  * Index contract: `floorMod(h, dim)` ≡ Spark's `pmod(h, dim)` for a
  * positive modulus — the gradient aggregation and the oracle fixture
  * dump both bucket with `pmod`, so trainer, server, and DuckDB replay
  * address the same slots by construction.
  *
  * The fold runs in ARRAY ORDER (ascending `i`): callers relying on
  * bit-stable double sums get the same sequential IEEE association on
  * every evaluation. (The quantized twin [[HashedWeightSumQ]] is
  * order-free outright — integer adds are associative.)
  *
  * Not SQL-registered: the expression closes over a [[Broadcast]] handle,
  * which a SQL call site cannot construct — use the TextClassifier API. */
case class HashedWeightSum(child: Expression,
                           weights: Broadcast[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_weight_sum requires array<bigint> features, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "hashed_weight_sum"

  override protected def nullSafeEval(input: Any): Any = {
    val feats = input.asInstanceOf[ArrayData]
    val w = weights.value
    val dim = w.length
    var s = 0.0
    var i = 0
    val n = feats.numElements()
    while (i < n) {
      s += w(java.lang.Math.floorMod(feats.getLong(i), dim.toLong).toInt)
      i += 1
    }
    s
  }

  override protected def withNewChildInternal(newChild: Expression): HashedWeightSum =
    copy(child = newChild)
}

/** [[HashedWeightSum]] over FIXED-POINT weights — the serving form:
  * `Σ_i qweights[floorMod(h_i, dim)]` as an exact LONG. Integer adds are
  * associative, so the margin is bit-identical under ANY evaluation
  * order, partitioning, or replay — which is what lets a DuckDB oracle
  * re-derive the margin from the dumped per-doc feature indices and the
  * dumped quantized weight table with a plain SUM, no IEEE-order
  * ceremony. (Fixed-point inference is also the standard deployment
  * form — the int8-style serving twin of the float training weights.) */
case class HashedWeightSumQ(child: Expression,
                            qweights: Broadcast[Array[Long]])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_weight_sum_q requires array<bigint> features, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hashed_weight_sum_q"

  override protected def nullSafeEval(input: Any): Any = {
    val feats = input.asInstanceOf[ArrayData]
    val w = qweights.value
    val dim = w.length
    var s = 0L
    var i = 0
    val n = feats.numElements()
    while (i < n) {
      s += w(java.lang.Math.floorMod(feats.getLong(i), dim.toLong).toInt)
      i += 1
    }
    s
  }

  override protected def withNewChildInternal(newChild: Expression): HashedWeightSumQ =
    copy(child = newChild)
}
