package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Asymmetric PQ distance of a full-precision query vector to a PQ code
  * vector against a LITERAL codebook tensor: `Σ_j ‖q_j −
  * centroid_j(code_j)‖²` — the inner loop of IVF-PQ serving, which at
  * scale runs once per (query, cell-resident corpus vector) PAIR, the
  * quantity that dwarfs the per-corpus-row encode. Native codegen twin
  * of the former nested `aggregate`/`zip_with` HOF form
  * (`Similarity.adcSqDist`), with identical IEEE semantics: the inner
  * sum runs over dims ascending, the outer over subspaces ascending,
  * both as sequential `acc + x` folds — the replayable-order discipline
  * the `q_ann_pq` oracle relies on. The m×ksub×dsub tensor rides as ONE
  * reference object (the plan-size discipline shared with
  * [[NearestCentroid]]).
  *
  * Guards fail loudly (the library's dense-vector policy): a code
  * vector whose length is not `m`, a code outside `[0, ksub)`, a query
  * vector whose dims are not `m·dsub`, or a null element all raise —
  * the HOF form silently produced a NULL distance on a null code, which
  * an ascending window order would then RANK FIRST (nulls-first), the
  * silent-mis-ranking failure class this library forbids.
  */
case class AdcSqDist(left: Expression, right: Expression,
                     codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression {

  require(codebooks.nonEmpty &&
    codebooks.forall(b => b.length == codebooks.head.length &&
      b.forall(_.length == codebooks.head.head.length)),
    "adc_sq_dist: codebooks must be rectangular m x ksub x dsub")

  private def m: Int = codebooks.length
  private def ksub: Int = codebooks.head.length
  private def dsub: Int = codebooks.head.head.length

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"adc_sq_dist requires (array<double> query, array<int> codes), got " +
        s"${l.simpleString} and ${r.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_sq_dist"

  @transient private lazy val qNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull
  @transient private lazy val cNullable: Boolean =
    right.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val c = b.asInstanceOf[ArrayData]
    if (c.numElements() != m)
      throw new IllegalArgumentException(
        s"adc_sq_dist: code vector length ${c.numElements()} != m $m")
    if (q.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"adc_sq_dist: query dims ${q.numElements()} != m*dsub ${m * dsub}")
    var total = 0.0
    var j = 0
    while (j < m) {
      if (cNullable && c.isNullAt(j))
        throw new IllegalArgumentException(
          s"adc_sq_dist: null code at subspace $j; codes must be dense")
      val code = c.getInt(j)
      if (code < 0 || code >= ksub)
        throw new IllegalArgumentException(
          s"adc_sq_dist: code $code out of [0, $ksub) at subspace $j")
      val cent = codebooks(j)(code)
      var s = 0.0
      var i = 0
      while (i < dsub) {
        val qi = j * dsub + i
        if (qNullable && q.isNullAt(qi))
          throw new IllegalArgumentException(
            s"adc_sq_dist: null query element at index $qi; vectors must be dense")
        val t = q.getDouble(qi) - cent(i)
        s += t * t
        i += 1
      }
      total += s
      j += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val mat = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val qi = ctx.freshName("qi")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      val total = ctx.freshName("total")
      val code = ctx.freshName("code")
      val cent = ctx.freshName("cent")
      val cNull = if (cNullable)
        s"""if ($b.isNullAt($j)) {
           |  throw new IllegalArgumentException(
           |    "adc_sq_dist: null code at subspace " + $j + "; codes must be dense");
           |}""".stripMargin
      else ""
      val qNull = if (qNullable)
        s"""if ($a.isNullAt($qi)) {
           |  throw new IllegalArgumentException(
           |    "adc_sq_dist: null query element at index " + $qi + "; vectors must be dense");
           |}""".stripMargin
      else ""
      s"""
         |if ($b.numElements() != $m) {
         |  throw new IllegalArgumentException(
         |    "adc_sq_dist: code vector length " + $b.numElements() + " != m " + $m);
         |}
         |if ($a.numElements() != ${m * dsub}) {
         |  throw new IllegalArgumentException(
         |    "adc_sq_dist: query dims " + $a.numElements() + " != m*dsub " + ${m * dsub});
         |}
         |double $total = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $cNull
         |  int $code = $b.getInt($j);
         |  if ($code < 0 || $code >= $ksub) {
         |    throw new IllegalArgumentException(
         |      "adc_sq_dist: code " + $code + " out of [0, " + $ksub + ") at subspace " + $j);
         |  }
         |  double[] $cent = $mat[$j][$code];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $dsub; $i++) {
         |    int $qi = $j * $dsub + $i;
         |    $qNull
         |    double $t = $a.getDouble($qi) - $cent[$i];
         |    $s += $t * $t;
         |  }
         |  $total += $s;
         |}
         |${ev.value} = $total;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AdcSqDist {
  import org.apache.spark.sql.graft.Bridge

  /** Column wrapper: `qv` must be `array<double>`, `codes` `array<int>`. */
  def adc(qv: Column, codes: Column,
          codebooks: Array[Array[Array[Double]]]): Column =
    Bridge.column(AdcSqDist(Bridge.expression(qv), Bridge.expression(codes),
      codebooks))
}
