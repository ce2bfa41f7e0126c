package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Nearest-centroid id of an `array<double>` vector against a LITERAL
  * centroid matrix: squared-L2 argmin, ties to the lower id — the native
  * twin of `Similarity.assignExpr`'s `array_min`-over-distance-structs
  * form, with identical semantics bit for bit:
  *
  *  - per-centroid distance is the SEQUENTIAL sum Σ(vᵢ−cᵢ)² over
  *    ascending dims (the order the interpreted `aggregate` ran, which
  *    the DuckDB oracles replay);
  *  - the argmin compares via `Double.compare` (Spark's total order for
  *    DoubleType), starting from centroid 0 and replacing only on
  *    strictly-smaller — ties keep the lower id, exactly the
  *    `(d, i)`-struct minimum.
  *
  * Why native: the HOF form evaluates three interpreted lambdas per
  * (row, centroid, dim) and allocates an intermediate struct array per
  * row — measured ~0.2 ms/row at k=16·dims=8·m=8 (the PQ encode
  * geometry), which made `q_ann_pq`'s encode half ~2 s at sf0.1 and
  * sits in kmeansFit's per-iteration assignment scan. This loop is
  * flops-bound. The matrix rides as ONE reference object (the
  * `distStructs` plan-size discipline: never k·dims literal nodes).
  *
  * The k-means/IVF/PQ family keeps `distStructs` for the forms that
  * need DISTANCES (multi-probe ranking, centroid-dist); assignment-only
  * call sites (kmeansFit iterations, coarse labels, drift, PQ encode)
  * route here.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "nearest_centroid: centroids must be non-empty")
  require(centroids.forall(_.length == centroids.head.length),
    "nearest_centroid: centroids must share one dimensionality")

  private def dims: Int = centroids.head.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires an array<double> argument, got ${t.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  @transient private lazy val anyElemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != dims)
      throw new IllegalArgumentException(
        s"nearest_centroid: vector dims $n do not match centroid dims $dims")
    var best = 0.0
    var bestI = 0
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (anyElemNullable && x.isNullAt(i))
          throw new IllegalArgumentException(
            s"nearest_centroid: null element at index $i; vectors must be dense")
        val t = x.getDouble(i) - cent(i)
        s += t * t
        i += 1
      }
      if (c == 0 || java.lang.Double.compare(s, best) < 0) {
        best = s; bestI = c
      }
      c += 1
    }
    bestI
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bestI = ctx.freshName("bestI")
      val cent = ctx.freshName("cent")
      val nullCheck = if (anyElemNullable)
        s"""if ($a.isNullAt($i)) {
           |  throw new IllegalArgumentException(
           |    "nearest_centroid: null element at index " + $i + "; vectors must be dense");
           |}""".stripMargin
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $dims) {
         |  throw new IllegalArgumentException(
         |    "nearest_centroid: vector dims " + $n + " do not match centroid dims " + $dims);
         |}
         |double $best = 0.0;
         |int $bestI = 0;
         |for (int $c = 0; $c < ${centroids.length}; $c++) {
         |  double[] $cent = $mat[$c];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $t = $a.getDouble($i) - $cent[$i];
         |    $s += $t * $t;
         |  }
         |  if ($c == 0 || java.lang.Double.compare($s, $best) < 0) {
         |    $best = $s; $bestI = $c;
         |  }
         |}
         |${ev.value} = $bestI;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  import org.apache.spark.sql.graft.Bridge

  /** Column wrapper: input must already be `array<double>`. */
  def nearest(v: Column, centroids: Array[Array[Double]]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(v), centroids))
}
