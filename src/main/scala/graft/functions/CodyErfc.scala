package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** erfc via W. J. Cody's SPECFUN rational approximation — the codegen
  * twin of the SQL snippet [[graft.oracle.Parity.erfc]].
  *
  * Evaluates the IDENTICAL operations in the IDENTICAL order on IEEE
  * doubles. Two load-bearing Spark-SQL-compat details (do NOT "simplify"
  * them away): `exp` must be `StrictMath.exp` — Spark SQL's exp compiles
  * to it, and it is 1 ulp off `java.lang.Math.exp` — and `floor` must
  * round-trip through BIGINT (`.toLong`) because Spark SQL's floor
  * returns LONG and saturates at ±Long.Max for infinities. With those,
  * results are bit-equal to the spelled-out snippet the DuckDB oracle
  * runs — asserted by ErfcSpec across all three branches. One method call
  * replaces ~150 expression nodes per row on the p-value hot path.
  */
case class CodyErfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"cody_erfc expects DOUBLE, got ${child.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cody_erfc"

  protected override def nullSafeEval(input: Any): Any =
    CodyErfc.erfc(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodyErfc.erfc($c)")

  override protected def withNewChildInternal(newChild: Expression): CodyErfc =
    copy(child = newChild)
}

object CodyErfc {
  // SPECFUN `calerf` coefficients — must stay textually identical to
  // graft.oracle.Parity's (the SQL snippet and this kernel are the same
  // algorithm in two syntaxes).
  private val A = Array(3.16112374387056560e0, 1.13864154151050156e2,
    3.77485237685302021e2, 3.20937758913846947e3)
  private val A4 = 1.85777706184603153e-1
  private val B = Array(2.36012909523441209e1, 2.44024637934444173e2,
    1.28261652607737228e3, 2.84423683343917062e3)
  private val C = Array(5.64188496988670089e-1, 8.88314979438837594e0,
    6.61191906371416295e1, 2.98635138197400131e2, 8.81952221241769090e2,
    1.71204761263407058e3, 2.05107837782607147e3, 1.23033935479799725e3)
  private val C8 = 2.15311535474403846e-8
  private val D = Array(1.57449261107098347e1, 1.17693950891312499e2,
    5.37181101862009858e2, 1.62138957456669019e3, 3.29079923573345963e3,
    4.36261909014324716e3, 3.43936767414372164e3, 1.23033935480374942e3)
  private val P = Array(3.05326634961232344e-1, 3.60344899949804439e-1,
    1.25781726111229246e-1, 1.60837851487422766e-2, 6.58749161529837803e-4)
  private val P5 = 1.63153871373020978e-2
  private val Q = Array(2.56852019228982242e0, 1.87295284992346047e0,
    5.27905102951428412e-1, 6.05183413124413191e-2, 2.33520497626869185e-3)
  private val SQRPI = 5.6418958354775628695e-1

  /** `xnum = first*v; for c in coefs: xnum = (xnum+c)*v; xnum + last` —
    * the exact fold [[graft.oracle.Parity.erfc]] spells out. */
  private def chain(v: Double, first: Double, coefs: Array[Double],
                    nCoefs: Int, last: Double): Double = {
    var acc = first * v
    var i = 0
    while (i < nCoefs) { acc = (acc + coefs(i)) * v; i += 1 }
    acc + last
  }

  def erfc(x: Double): Double = {
    val y = math.abs(x)
    val ysq = y * y
    if (y <= 4.6875e-1) {
      val erfNum = chain(ysq, A4, A, 3, A(3))
      val erfDen = chain(ysq, 1e0, B, 3, B(3))
      1e0 - (x * erfNum / erfDen)
    } else {
      // floor() in Spark SQL returns BIGINT — the .toLong round-trip
      // reproduces its saturation at ±Long.Max (matters only for z=±inf,
      // where it keeps p(+inf)=0 exactly like the snippet); StrictMath
      // .exp is what Spark SQL's exp compiles to (1 ulp off Math.exp).
      val ysqt = math.floor(y * 16e0).toLong / 16e0
      val scale = StrictMath.exp(-(ysqt * ysqt)) * StrictMath.exp(-((y - ysqt) * (y + ysqt)))
      val core =
        if (y <= 4e0) {
          val num2 = chain(y, C8, C, 7, C(7))
          val den2 = chain(y, 1e0, D, 7, D(7))
          scale * (num2 / den2)
        } else {
          val v = 1e0 / ysq
          val num3 = chain(v, P5, P, 4, P(4))
          val den3 = chain(v, 1e0, Q, 4, Q(4))
          scale * ((SQRPI - (v * num3 / den3)) / y)
        }
      if (x < 0e0) 2e0 - core else core
    }
  }
}
