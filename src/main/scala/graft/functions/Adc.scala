package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** The two halves of table-driven ADC serving (Jégou, Douze & Schmid
  * 2011 §V-A: precompute, per query, the distance of each subvector to
  * every codebook centroid; a corpus vector's asymmetric distance is
  * then M table lookups): [[AdcTable]] runs ONCE PER QUERY ROW below
  * the cell join and emits the m·ksub table; [[AdcTableLookup]] runs
  * once per (query, cell-resident corpus vector) PAIR — the serving
  * hot loop — and does `Σ_j table[j·ksub + code_j]`, m array reads
  * instead of m·dsub multiply-adds. At the default geometry (m = 8,
  * dsub = 8) that is a 16× FLOP cut on the pair loop for a 1 KB/query
  * precompute, the trade that makes exhaustive in-cell ADC scanning
  * viable at corpus scale.
  *
  * IEEE BIT-EQUALITY with the fused per-pair form this replaces (and
  * with the `q_ann_pq` oracle's SQL replay): the table entry for
  * (j, c) is the SAME dims-ascending sequential inner sum the fused
  * loop computed for code c, and the lookup sums entries in the same
  * subspaces-ascending order — identical doubles added in an identical
  * order, so shortlist ranks cannot move between the two forms.
  *
  * Guards fail loudly (the library's dense-vector policy): a query
  * whose dims are not m·dsub or with a null element raises in
  * [[AdcTable]]; a code vector whose length is not m, a code outside
  * [0, ksub), a null code, or a table of the wrong width raises in
  * [[AdcTableLookup]] — a silent NULL distance would rank FIRST under
  * an ascending window order, the silent-mis-ranking failure class
  * this library forbids.
  */
case class AdcTable(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty &&
    codebooks.forall(b => b.length == codebooks.head.length &&
      b.forall(_.length == codebooks.head.head.length)),
    "adc_table: codebooks must be rectangular m x ksub x dsub")

  private def m: Int = codebooks.length
  private def ksub: Int = codebooks.head.length
  private def dsub: Int = codebooks.head.head.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"adc_table requires array<double> query, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "adc_table"

  @transient private lazy val qNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    if (q.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"adc_table: query dims ${q.numElements()} != m*dsub ${m * dsub}")
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val cent = codebooks(j)(c)
        var s = 0.0
        var i = 0
        while (i < dsub) {
          val qi = j * dsub + i
          if (qNullable && q.isNullAt(qi))
            throw new IllegalArgumentException(
              s"adc_table: null query element at index $qi; vectors must be dense")
          val t = q.getDouble(qi) - cent(i)
          s += t * t
          i += 1
        }
        out(j * ksub + c) = s
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val qi = ctx.freshName("qi")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      val out = ctx.freshName("out")
      val cent = ctx.freshName("cent")
      val qNull = if (qNullable)
        s"""if ($a.isNullAt($qi)) {
           |  throw new IllegalArgumentException(
           |    "adc_table: null query element at index " + $qi + "; vectors must be dense");
           |}""".stripMargin
      else ""
      s"""
         |if ($a.numElements() != ${m * dsub}) {
         |  throw new IllegalArgumentException(
         |    "adc_table: query dims " + $a.numElements() + " != m*dsub " + ${m * dsub});
         |}
         |double[] $out = new double[${m * ksub}];
         |for (int $j = 0; $j < $m; $j++) {
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double[] $cent = $mat[$j][$c];
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      int $qi = $j * $dsub + $i;
         |      $qNull
         |      double $t = $a.getDouble($qi) - $cent[$i];
         |      $s += $t * $t;
         |    }
         |    $out[$j * $ksub + $c] = $s;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `Σ_j table[j·ksub + code_j]` — [[AdcTable]]'s per-pair half; see
  * that scaladoc for the serving shape, the bit-equality argument, and
  * the guard policy. */
case class AdcTableLookup(left: Expression, right: Expression,
                          m: Int, ksub: Int) extends BinaryExpression {

  require(m >= 1 && ksub >= 1, s"adc_lookup: need m >= 1 and ksub >= 1, got $m, $ksub")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"adc_lookup requires (array<double> table, array<int> codes), got " +
        s"${l.simpleString} and ${r.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_lookup"

  @transient private lazy val tNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull
  @transient private lazy val cNullable: Boolean =
    right.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val tab = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    if (tab.numElements() != m * ksub)
      throw new IllegalArgumentException(
        s"adc_lookup: table length ${tab.numElements()} != m*ksub ${m * ksub}")
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"adc_lookup: code vector length ${codes.numElements()} != m $m")
    var total = 0.0
    var j = 0
    while (j < m) {
      if (cNullable && codes.isNullAt(j))
        throw new IllegalArgumentException(
          s"adc_lookup: null code at subspace $j; codes must be dense")
      val code = codes.getInt(j)
      if (code < 0 || code >= ksub)
        throw new IllegalArgumentException(
          s"adc_lookup: code $code out of [0, $ksub) at subspace $j")
      val ti = j * ksub + code
      if (tNullable && tab.isNullAt(ti))
        throw new IllegalArgumentException(
          s"adc_lookup: null table entry at index $ti; tables must be dense")
      total += tab.getDouble(ti)
      j += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val ti = ctx.freshName("ti")
      val total = ctx.freshName("total")
      val code = ctx.freshName("code")
      val cNull = if (cNullable)
        s"""if ($b.isNullAt($j)) {
           |  throw new IllegalArgumentException(
           |    "adc_lookup: null code at subspace " + $j + "; codes must be dense");
           |}""".stripMargin
      else ""
      val tNull = if (tNullable)
        s"""if ($a.isNullAt($ti)) {
           |  throw new IllegalArgumentException(
           |    "adc_lookup: null table entry at index " + $ti + "; tables must be dense");
           |}""".stripMargin
      else ""
      s"""
         |if ($a.numElements() != ${m * ksub}) {
         |  throw new IllegalArgumentException(
         |    "adc_lookup: table length " + $a.numElements() + " != m*ksub " + ${m * ksub});
         |}
         |if ($b.numElements() != $m) {
         |  throw new IllegalArgumentException(
         |    "adc_lookup: code vector length " + $b.numElements() + " != m " + $m);
         |}
         |double $total = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $cNull
         |  int $code = $b.getInt($j);
         |  if ($code < 0 || $code >= $ksub) {
         |    throw new IllegalArgumentException(
         |      "adc_lookup: code " + $code + " out of [0, " + $ksub + ") at subspace " + $j);
         |  }
         |  int $ti = $j * $ksub + $code;
         |  $tNull
         |  $total += $a.getDouble($ti);
         |}
         |${ev.value} = $total;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Adc {
  import org.apache.spark.sql.graft.Bridge

  /** Per-query ADC table: `qv` must be `array<double>` of m·dsub dims. */
  def table(qv: Column, codebooks: Array[Array[Array[Double]]]): Column =
    Bridge.column(AdcTable(Bridge.expression(qv), codebooks))

  /** Per-pair ADC distance: `table` from [[table]], `codes` `array<int>`. */
  def lookup(table: Column, codes: Column, m: Int, ksub: Int): Column =
    Bridge.column(AdcTableLookup(Bridge.expression(table),
      Bridge.expression(codes), m, ksub))
}
