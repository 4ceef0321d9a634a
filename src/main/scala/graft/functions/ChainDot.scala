package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Left-associated dot product of two numeric arrays — the hot kernel of
  * every similarity query (SURVEY.md §7.3 path (b): custom codegen
  * `Expression`).
  *
  * Bit-compatible with [[graft.oracle.Parity.dot]]'s explicit SQL chain
  * `(((a1·b1 + a2·b2) + a3·b3) + …)`: the loop accumulates strictly left
  * to right over double-widened elements, so the DuckDB oracle (which
  * keeps the spelled-out chain) sees identical doubles. Replacing the
  * 64-term `element_at` expression tree with a tight loop removes the
  * per-element expression-node overhead that dominated the brute-force
  * cosine scans.
  */
case class ChainDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"chain_dot expects ARRAY<FLOAT|DOUBLE> args, got ${left.dataType}, ${right.dataType}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "chain_dot"

  /** A malformed embedding must fail LOUD-consistently, not silently:
    * mismatched lengths or a null element return NULL — exactly what the
    * previous element_at chain and the DuckDB spelled-out chain produce
    * (out-of-bounds list_extract / null element → NULL propagates through
    * the whole sum) — instead of a truncated partial dot. */
  override def nullable: Boolean = true

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lGet = if (elemType(left) == FloatType) s"(double) $a.getFloat" else s"$a.getDouble"
      val rGet = if (elemType(right) == FloatType) s"(double) $b.getFloat" else s"$b.getDouble"
      val lNullable = left.dataType.asInstanceOf[ArrayType].containsNull
      val rNullable = right.dataType.asInstanceOf[ArrayType].containsNull
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val elemNullCheck =
        (if (lNullable) s"$a.isNullAt($i)" else "") +
          (if (lNullable && rNullable) " || " else "") +
          (if (rNullable) s"$b.isNullAt($i)" else "")
      val body =
        if (elemNullCheck.isEmpty)
          s"$acc += $lGet($i) * $rGet($i);"
        else
          s"""if ($elemNullCheck) { ${ev.isNull} = true; break; }
             |$acc += $lGet($i) * $rGet($i);""".stripMargin
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $body
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ChainDot =
    copy(left = newLeft, right = newRight)
}
