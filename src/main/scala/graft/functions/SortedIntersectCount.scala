package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** |A ∩ B| for two ASC-SORTED BIGINT arrays via a linear merge — no
  * per-element hashing or set allocation (array_intersect builds a hash
  * set per call, the cost center of pairwise Jaccard at scale). Custom
  * codegen Expression per SURVEY.md §7.3 path (b).
  *
  * Inputs MUST be sorted ascending and distinct (array_sort ∘
  * array_distinct); the count equals size(array_intersect(a, b)) there.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private val ok = ArrayType(LongType, containsNull = false)
  private val okN = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType == ok || e.dataType == okN))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects ARRAY<BIGINT>, got ${left.dataType}, ${right.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def count(a: ArrayData, b: ArrayData): Long = {
    var i = 0; var j = 0; var c = 0L
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** Jaccard |A∩B| / |A∪B| of two ASC-SORTED distinct BIGINT arrays in ONE
  * expression — bit-identical to
  * `cast(sorted_intersect_count(a,b) as double) /
  *  cast(size(a) + size(b) - sorted_intersect_count(a,b) as double)`
  * (same merge count, same long arithmetic, one IEEE division), but with
  * the intersect referenced ONCE. That single reference is the point:
  * when a Jaccard threshold filter collapses into a join condition, the
  * composed form's two `inter` occurrences trigger codegen subexpression
  * elimination, which hoists the O(|A|+|B|) merge to the START of the
  * predicate — every collision row then pays the full intersect before
  * the cheap band/prune conjuncts can short-circuit (measured 8× verify
  * inflation on [[graft.operators.Dedup.ngramJaccardBanded]]'s clique-
  * heavy buckets). A single-use expression stays inline as the LAST
  * And-conjunct and runs only for rows the cheap filters pass. */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  private val ok = ArrayType(LongType, containsNull = false)
  private val okN = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType == ok || e.dataType == okN))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_jaccard expects ARRAY<BIGINT>, got ${left.dataType}, ${right.dataType}")

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "sorted_jaccard"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    SortedJaccard.jac(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedJaccard.jac($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)
}

object SortedJaccard {
  def jac(a: ArrayData, b: ArrayData): Double = {
    val inter = SortedIntersectCount.count(a, b)
    val uni = a.numElements().toLong + b.numElements().toLong - inter
    inter.toDouble / uni.toDouble
  }
}
