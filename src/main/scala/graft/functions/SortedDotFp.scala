package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Fixed-point dot product of two sparse vectors given as ASC-SORTED
  * (token, weight) parallel arrays — one linear merge per pair, replacing
  * the candidate×token explode join + pair-keyed exchange + fpSum
  * aggregate of the all-pairs verify (guide §3.3: `explode` before a join
  * multiplies the shuffle).
  *
  * Bit-equal to [[graft.oracle.Parity.fpSum]]`("wa*wb")` grouped over the
  * pair's shared tokens BY CONSTRUCTION: each matching token contributes
  * `(long) floor(wa*wb * 2^20 + 0.5)` — the identical per-row term
  * (Spark's `cast(floor(x) as bigint)` is `Math.floor(x).toLong`) — the
  * terms accumulate in exact BIGINT (order-free, and the merge happens to
  * add them in token order), and ONE final division by 2^20 produces the
  * identical double. A pair with no shared tokens returns 0.0, which the
  * caller's `score >= threshold` filter drops exactly like the empty
  * aggregation group the explode join never produced.
  *
  * Token arrays MUST be sorted ascending and distinct in UTF8 binary
  * order (`sort_array` over per-doc collected structs — UTF8String
  * comparison IS binary lexicographic, so the merge uses the same
  * comparator that sorted them); weights are the aligned per-token
  * values. Mismatched token/weight lengths on either side return NULL
  * (malformed input fails loud-consistently, the [[ChainDot]] rule).
  */
case class SortedDotFp(first: Expression, second: Expression,
                       third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  private def isA(e: Expression, t: DataType): Boolean = e.dataType match {
    case ArrayType(et, _) => et == t
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isA(first, StringType) && isA(second, DoubleType) &&
        isA(third, StringType) && isA(fourth, DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sorted_dot_fp expects (ARRAY<STRING>, ARRAY<DOUBLE>, ARRAY<STRING>, " +
        s"ARRAY<DOUBLE>), got ${children.map(_.dataType).mkString(", ")}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_dot_fp"
  override def nullable: Boolean = true

  protected override def nullSafeEval(ta: Any, wa: Any, tb: Any, wb: Any): Any =
    SortedDotFp.dot(ta.asInstanceOf[ArrayData], wa.asInstanceOf[ArrayData],
      tb.asInstanceOf[ArrayData], wb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ta, wa, tb, wb) => {
      val r = ctx.freshName("dotRes")
      s"""java.lang.Double $r =
         |  graft.functions.SortedDotFp.dot($ta, $wa, $tb, $wb);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): SortedDotFp =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

object SortedDotFp {
  /** Null on malformed (token/weight length mismatch); otherwise the
    * exact fixed-point dot — see the class doc for the parity argument. */
  def dot(ta: ArrayData, wa: ArrayData, tb: ArrayData, wb: ArrayData): java.lang.Double = {
    val na = ta.numElements(); val nb = tb.numElements()
    if (na != wa.numElements() || nb != wb.numElements()) return null
    var i = 0; var j = 0; var s = 0L
    while (i < na && j < nb) {
      val c = ta.getUTF8String(i).compareTo(tb.getUTF8String(j))
      if (c == 0) {
        s += Math.floor(wa.getDouble(i) * wb.getDouble(j) * 1048576e0 + 5e-1).toLong
        i += 1; j += 1
      } else if (c < 0) i += 1
      else j += 1
    }
    java.lang.Double.valueOf(s / 1048576e0)
  }
}
