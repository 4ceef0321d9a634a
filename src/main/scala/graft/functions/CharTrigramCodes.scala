package graft.functions

import java.util.Arrays

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct character-trigram codes of a string in ONE pass —
  * code = cp0·2^42 + cp1·2^21 + cp2 over Unicode code points, exactly the
  * values of
  * `array_sort(array_distinct(transform(sequence(1, greatest(len-2, 1)),
  *   i -> ascii(substring(s,i,1))*2^42 + ascii(substring(s,i+1,1))*2^21
  *        + ascii(substring(s,i+2,1)))))`
  * but without the ~3·len substring allocations (the shingle-generation
  * cost center of pairwise Jaccard). Missing trailing chars behave like
  * Spark's ascii('') = 0. Custom codegen Expression, SURVEY.md §7.3 (b).
  */
case class CharTrigramCodes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_trigram_codes expects STRING, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_trigram_codes"

  protected override def nullSafeEval(input: Any): Any =
    CharTrigramCodes.codes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharTrigramCodes.codes($c)")

  override protected def withNewChildInternal(newChild: Expression): CharTrigramCodes =
    copy(child = newChild)
}

object CharTrigramCodes {
  def codes(s: UTF8String): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    // n == 0: the SQL formula evaluates one term of all-ascii('') = 0 → [0].
    if (n == 0) return new GenericArrayData(Array(0L))
    val m = math.max(n - 2, 1)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val c0 = cps(i).toLong
      val c1 = if (i + 1 < n) cps(i + 1).toLong else 0L
      val c2 = if (i + 2 < n) cps(i + 2).toLong else 0L
      out(i) = c0 * 4398046511104L + c1 * 2097152L + c2
      i += 1
    }
    Arrays.sort(out)
    // in-place dedup of the sorted array
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == m) out else Arrays.copyOf(out, w))
  }
}
