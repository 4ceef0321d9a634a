package graft.oracle

/** Cross-engine deterministic SQL snippets.
  *
  * The driver's correctness gate hash-compares Spark results against DuckDB
  * running `SparkEntry.oracleSql`. Doubles only hash-match if both engines
  * produce *bit-identical* values, so every oracle-checked query is built
  * from operations that are deterministic across engines:
  *
  *   - IEEE-exact ops (`+ - * /` on identical operands, `sqrt`, `floor`,
  *     `abs`, comparisons) are bit-reproducible everywhere.
  *   - Sums of arbitrary doubles are NOT (association order differs), so
  *     aggregated doubles go through [[fpSum]]: quantize each row to a
  *     2^-20 fixed-point BIGINT, sum exactly in integers, divide once.
  *   - Transcendentals (`exp`, `ln`, `log2`) may differ by 1 ulp between
  *     libm implementations, so any value derived from them is passed
  *     through [[q9]] (quantize to a 1e-9 grid); the residual flip risk is
  *     ~1e-7 per value.
  *   - Rank sums need no protection: average ranks are dyadic rationals
  *     (k or k+0.5) whose sums are exact in double for n < 2^51.
  *
  * The same snippet text is used on BOTH sides: Spark evaluates it via
  * `functions.expr(...)` (parsed by Catalyst into codegen'd built-ins — no
  * UDFs) and the driver feeds the identical text to DuckDB. Only the few
  * spots where the dialects truly diverge go through [[Dialect]].
  */
object Parity {

  sealed trait Dialect
  case object SparkD extends Dialect
  case object DuckD extends Dialect

  /** Shortest round-trip decimal repr, always in exponent form: Spark SQL
    * parses plain decimal-point literals (`0.5`) as DECIMAL — which
    * silently drags whole expressions into decimal arithmetic — while
    * exponent literals (`5e-1`) are DOUBLE in BOTH engines. */
  def lit(d: Double): String = {
    val s = d.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }

  /** Quantize to a 1e-9 grid. `floor` is IEEE-exact, so given identical
    * inputs both engines agree bit-for-bit; 1-ulp input differences flip
    * the result only with probability ~ulp/1e-9 ≈ 1e-7.
    * Only valid for |x| < 2^53/1e9 ≈ 9e6. Also canonicalizes -0.0/0.0. */
  def q9(x: String): String = s"(floor(($x) * 1.0e9 + 5e-1) / 1.0e9 + 0e0)"

  /** Coarser grid for large-magnitude transcendental/interpolated outputs
    * (q9's 1e-9 grid sits too close to ulp(1e5)). */
  def q6(x: String): String = s"(floor(($x) * 1.0e6 + 5e-1) / 1.0e6 + 0e0)"

  /** NaN-safe [[q9]]: Spark's `floor` goes through BIGINT (NaN → 0) while
    * DuckDB's double floor keeps NaN, so quantizing a possibly-NaN value
    * diverges (0.0 vs NaN). The identical guard text works in BOTH
    * engines: isnan(NULL) is false/NULL in each, and q9(NULL) is NULL in
    * each, so NULL still flows through the else arm. Use for any
    * quantized column that can carry the NaN of an n<2 feature. */
  def q9n(x: String): String = s"(case when isnan($x) then ($x) else ${q9(x)} end)"

  /** Order-independent exact aggregation of a double expression: round each
    * row to 2^-20 fixed point (the *2^20 multiply is exact — power of two),
    * sum as BIGINT (exact, order-free), divide once. The outer cast makes
    * DuckDB's HUGEINT sum come back to int64 like Spark's. */
  def fpSum(x: String): String =
    s"(cast(sum(cast(floor(($x) * 1048576e0 + 5e-1) as bigint)) as bigint) / 1048576e0)"

  // ---------------------------------------------------------------------
  // erfc — W. J. Cody's rational-approximation algorithm (SPECFUN `calerf`,
  // netlib; also the basis of many libm erfc implementations). Accurate to
  // ~1 ulp over the full range, and expressible with +,-,*,/,exp,floor,abs
  // only — all present in both Spark SQL and DuckDB with identical
  // semantics. Used for the MWU two-sided p-value p = erfc(z/sqrt(2))
  // (the reference uses scipy norm.sf: /root/reference/dask_mwu/pvals.py:119).
  // ---------------------------------------------------------------------

  private val A = Seq(3.16112374387056560e0, 1.13864154151050156e2,
    3.77485237685302021e2, 3.20937758913846947e3)
  private val A4 = 1.85777706184603153e-1
  private val B = Seq(2.36012909523441209e1, 2.44024637934444173e2,
    1.28261652607737228e3, 2.84423683343917062e3)
  private val C = Seq(5.64188496988670089e-1, 8.88314979438837594e0,
    6.61191906371416295e1, 2.98635138197400131e2, 8.81952221241769090e2,
    1.71204761263407058e3, 2.05107837782607147e3, 1.23033935479799725e3)
  private val C8 = 2.15311535474403846e-8
  private val D = Seq(1.57449261107098347e1, 1.17693950891312499e2,
    5.37181101862009858e2, 1.62138957456669019e3, 3.29079923573345963e3,
    4.36261909014324716e3, 3.43936767414372164e3, 1.23033935480374942e3)
  private val P = Seq(3.05326634961232344e-1, 3.60344899949804439e-1,
    1.25781726111229246e-1, 1.60837851487422766e-2, 6.58749161529837803e-4)
  private val P5 = 1.63153871373020978e-2
  private val Q = Seq(2.56852019228982242e0, 1.87295284992346047e0,
    5.27905102951428412e-1, 6.05183413124413191e-2, 2.33520497626869185e-3)
  private val SQRPI = 5.6418958354775628695e-1

  /** SPECFUN's loop `xnum = first*v; for c in coefs: xnum = (xnum+c)*v`,
    * then `+ last`, expanded to an explicit left-to-right chain so both
    * engines evaluate in the identical order. */
  private def chain(v: String, first: String, coefs: Seq[Double], last: Double): String = {
    val folded = coefs.foldLeft(s"($first * $v)")((acc, c) => s"(($acc + ${lit(c)}) * $v)")
    s"($folded + ${lit(last)})"
  }

  /** erfc(x) for a *simple* column reference `x` (the text repeats it). */
  def erfc(x: String): String = {
    val y = s"abs($x)"
    val ysq = s"($y * $y)"
    // |x| <= 0.46875: erfc = 1 - x*P(x^2)/Q(x^2)
    val erfNum = chain(ysq, lit(A4), A.take(3), A(3))
    val erfDen = chain(ysq, "1e0", B.take(3), B(3))
    val b1 = s"(1e0 - (($x) * $erfNum / $erfDen))"
    // exp scaling used by both outer branches: exp(-ysqt^2)*exp(-(y-ysqt)(y+ysqt))
    // with ysqt = floor(16y)/16 (exact), which keeps the argument of the
    // big exp exactly representable.
    val ysqt = s"(floor($y * 16e0) / 16e0)"
    val scale = s"(exp(-($ysqt * $ysqt)) * exp(-(($y - $ysqt) * ($y + $ysqt))))"
    // 0.46875 < |x| <= 4
    val num2 = chain(y, lit(C8), C.take(7), C(7))
    val den2 = chain(y, "1e0", D.take(7), D(7))
    val b2 = s"($scale * ($num2 / $den2))"
    // |x| > 4
    val v = s"(1e0 / $ysq)"
    val num3 = chain(v, lit(P5), P.take(4), P(4))
    val den3 = chain(v, "1e0", Q.take(4), Q(4))
    val r3 = s"((${lit(SQRPI)} - ($v * $num3 / $den3)) / $y)"
    val b3 = s"($scale * $r3)"
    // reflect for negative x: erfc(x) = 2 - erfc(-x)
    s"""(case when $y <= 4.6875e-1 then $b1
       | when ($x) < 0e0 then (2e0 - (case when $y <= 4e0 then $b2 else $b3 end))
       | else (case when $y <= 4e0 then $b2 else $b3 end) end)""".stripMargin.replace("\n", "")
  }

  /** Two-sided normal-approximation p-value from a z column:
    * p = min(1, 2*Phi(-z)) = min(1, erfc(z/sqrt(2))). Spark runs the
    * codegen'd [[graft.functions.CodyErfc]] (bit-equal to the snippet —
    * same ops, same order, StrictMath.exp and a BIGINT floor round-trip
    * like Spark SQL's own); DuckDB gets the spelled-out snippet.
    *
    * Both sides guard the non-finite z shapes explicitly, mirroring
    * [[graft.operators.MwuStats.withP]] — without them the DuckDB side
    * silently disagrees: DuckDB `least` ignores NULL and treats NaN as
    * greatest (least(1.0, NULL) = 1.0), and its double `floor` keeps
    * ±inf/NaN where Spark's saturates through BIGINT, so a NaN-poisoned
    * (z NULL), n<2 (z NaN), or all-tied (z ±inf) feature would get
    * p = 1.0 from the oracle while Spark emits NULL/NaN/0. */
  def pFromZ(d: Dialect, z: String): String = d match {
    case SparkD => s"least(1e0, cody_erfc(($z / sqrt(2e0))))"
    case DuckD =>
      s"(case when $z is null then null " +
        s"when isnan($z) then 'nan'::double " +
        s"when $z = 'infinity'::double then 0e0 " +
        s"when $z = '-infinity'::double then 1e0 " +
        s"else least(1e0, ${erfc(s"($z / sqrt(2e0))")}) end)"
  }

  /** 1-based array element access — the one real dialect split. */
  def elem(d: Dialect, arr: String, i: Int): String = d match {
    case SparkD => s"element_at($arr, $i)"
    case DuckD  => s"list_extract($arr, $i)"
  }

  /** Deterministic dot product of two fixed-dim double arrays: a strict
    * left-associated sequential fold in both engines. DuckDB gets the
    * spelled-out chain a[1]*b[1] + ... + a[d]*b[d]; Spark gets the
    * codegen'd [[graft.functions.ChainDot]] loop, which accumulates in
    * the identical order over identically-widened doubles — bit-equal
    * results, ~dim× fewer expression nodes. */
  def dot(d: Dialect, a: String, b: String, dim: Int): String = d match {
    case SparkD => s"chain_dot($a, $b)"
    case DuckD =>
      (1 to dim).map(i => s"(cast(${elem(d, a, i)} as double) * cast(${elem(d, b, i)} as double))")
        .reduceLeft((x, y) => s"($x + $y)")
  }

  // ---------------------------------------------------------------------
  // Cross-engine hash family — the backbone of the oracle-checked dedup /
  // LSH queries. Spark evaluates the codepoint rolling hash through the
  // codegen'd [[graft.functions.RollingHash]] expression; DuckDB evaluates
  // [[rollingHashDuck]]; both walk the same codepoint stream mod the same
  // prime, so downstream Carter-Wegman mixes ([[cwMix]]/[[cwBit]]) —
  // whose SQL text is IDENTICAL on both sides — produce equal signatures.
  // ---------------------------------------------------------------------

  /** Prime modulus shared with [[graft.functions.RollingHash.Mod]]: all
    * hash values live in [0, CwMod), so `x * a + b` for a,b < CwMod stays
    * under 2^63 — overflow-free in BOTH engines (DuckDB BIGINT throws on
    * overflow rather than wrapping, so this bound is load-bearing). */
  final val CwMod = 1000000007L

  /** Deterministic affine parameters (a_j, b_j), a_j ∈ [1, CwMod),
    * b_j ∈ [0, CwMod) — a fixed splitmix-style walk; both engines receive
    * the resulting literals because all SQL text is generated here. */
  def cwParams(j: Int): (Long, Long) = {
    var x = 0x9E3779B97F4A7C15L * (j + 1) + 0x2545F4914F6CDD1DL
    def next(): Long = {
      x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
      x ^= x >>> 27; x *= 0x94D049BB133111EBL
      x ^= x >>> 31
      x
    }
    val a = java.lang.Long.remainderUnsigned(next(), CwMod - 1) + 1
    val b = java.lang.Long.remainderUnsigned(next(), CwMod)
    (a, b)
  }

  /** j-th Carter-Wegman affine mix of a hash-valued expression
    * (input MUST be in [0, CwMod)). Identical text for both engines —
    * plain integer literals (no `L` suffix: DuckDB rejects it; both
    * engines promote INT literal × BIGINT column to BIGINT). */
  def cwMix(j: Int, x: String): String = {
    val (a, b) = cwParams(j)
    s"((($x) * $a + $b) % $CwMod)"
  }

  /** j-th pairwise-independent hash bit of a hash-valued expression. */
  def cwBit(j: Int, x: String): String = s"(${cwMix(j, x)} % 2)"

  /** Codepoint polynomial rolling hash in DuckDB SQL — mirrors
    * [[graft.functions.RollingHash.hash]] exactly (h←h·263+cp mod 1e9+7;
    * empty string → 0; `list_reduce` seeds with the first element, which
    * equals the first iteration since cp < mod). */
  def rollingHashDuck(e: String): String =
    s"(case when length($e) = 0 then 0 " +
      s"else list_reduce(list_transform(generate_series(1, length($e)), " +
      s"i -> cast(unicode(substring($e, i, 1)) as bigint)), " +
      s"(a, b) -> (a * 263 + b) % 1000000007) end)"

  /** The dialect split for the rolling hash: Spark runs the codegen
    * expression, DuckDB the list fold. */
  def rollingHash(d: Dialect, e: String): String = d match {
    case SparkD => s"rolling_hash($e)"
    case DuckD  => rollingHashDuck(e)
  }

  /** Epoch seconds of the hour bucket of an epoch-nanos BIGINT (Spark
    * side; see [[graft.sources.Tables.read]]) / TIMESTAMP_NS (DuckDB). */
  def hourEpoch(d: Dialect, tsNanos: String): String = d match {
    case SparkD => s"(($tsNanos div 3600000000000) * 3600)"
    case DuckD  => s"((epoch_ns($tsNanos) // 3600000000000) * 3600)"
  }

  /** Epoch seconds (floored) of an epoch-nanos BIGINT / TIMESTAMP_NS. */
  def epochSec(d: Dialect, tsNanos: String): String = d match {
    case SparkD => s"($tsNanos div 1000000000)"
    case DuckD  => s"(epoch_ns($tsNanos) // 1000000000)"
  }

  /** Day index (floored epoch days) of an epoch-nanos BIGINT /
    * TIMESTAMP_NS — the cohort/retention grid unit. */
  def dayIdx(d: Dialect, tsNanos: String): String = d match {
    case SparkD => s"($tsNanos div 86400000000000)"
    case DuckD  => s"(epoch_ns($tsNanos) // 86400000000000)"
  }
}
