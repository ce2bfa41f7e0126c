package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns with whole-stage
  * codegen — a tight scalar loop instead of the interpreted
  * `zip_with`+`aggregate` higher-order functions (which allocate an
  * intermediate array and evaluate a lambda per element, per row).
  *
  * This is the hot kernel of every embedding operator (cosine similarity,
  * near-dup pairs, ANN top-k): at n·q pair scale the HOF version is the
  * bottleneck, the codegen'd loop is memory-bandwidth bound.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // analysis-time type contract: reject anything but array<double> with a
  // clean error — getDouble() on a differently-typed UnsafeArrayData would
  // silently read garbage bytes. (ExpectsInputTypes is private[sql].)
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // parquet-sourced arrays typically DECLARE containsNull=true even when no
  // element is null, so nullability is enforced per row at eval; the static
  // flag keeps the branch out of codegen for provably-dense arrays
  @transient private lazy val anyElemNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // silently dot-producting a prefix of mismatched vectors is a wrong
    // cosine with no error — fail fast, mirroring lsh_band_buckets' guard
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"dot_product: mismatched dims: $n vs ${y.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (anyElemNullable && (x.isNullAt(i) || y.isNullAt(i)))
        throw new IllegalArgumentException(
          s"dot_product: null element at index $i; embeddings must be dense")
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nullCheck = if (anyElemNullable)
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) {
           |  throw new IllegalArgumentException(
           |    "dot_product: null element at index " + $i + "; embeddings must be dense");
           |}""".stripMargin
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_product: mismatched dims: " + $n + " vs " + $b.numElements());
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  import org.apache.spark.sql.graft.Bridge

  /** Column wrapper: both inputs must already be `array<double>`. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
