package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed fingerprint selection (Schleimer, Wilkerson, Aiken, SIGMOD
  * 2003) of one document as a SINGLE codegen expression — the r15 spark
  * of [[graft.operators.TextOps.winnow]]'s plan surgery. The dataflow
  * spelling exploded one row PER CHARACTER and pushed (doc, chunk,
  * pos, key) through an exchange + window sort just to take each
  * 4-frame's minimum: a corpus-characters-sized shuffle per winnow
  * call, paid by every winnow consumer (the near-dup index build /
  * append / serve, the incremental and batch winnow dedups, winnow
  * decontamination). The selection is DOC-LOCAL by definition, so this
  * expression computes it in one O(len) pass inside whole-stage
  * codegen and the operator reduces to scan → explode(selected set):
  * no exchange, no sort, nothing per-character ever leaves the scan
  * stage.
  *
  * Exact contract (bit-for-bit the windowed spelling's selected set,
  * pinned by the differential spec and by every winnow gate's DuckDB
  * oracle, which is untouched):
  *
  *   - input: the ALREADY-TRIMMED text (callers pass trim(text));
  *   - k-gram hash: [[RollingHash]]'s polynomial over Unicode CODE
  *     POINTS (same decoder), k = 5;
  *   - packed key at 1-based code-point position i:
  *     h·2^33 + (2^33−1−i) — smaller key ⇔ (smaller h, then larger i),
  *     the rightmost-tie rule;
  *   - windows: every run of w = 4 consecutive keys whose last k-gram
  *     is complete (positions 1 .. len−k+1−(w−1)); documents with no
  *     full window return the empty array (absent after explode);
  *   - output: the DISTINCT selected keys. Selections of one key are
  *     consecutive windows (a key is eligible only while in frame, and
  *     any window between two it wins is covered by their union), so
  *     consecutive-dedupe IS the distinct set — no hash set needed.
  *
  * Memory trade (the windowed spelling chunked a pathological 100 MB
  * document into bounded window tasks): this expression walks the doc
  * in one task and returns ~2/(w+1) of its positions as one long
  * array — the same per-document-array class the banded dedup family
  * already materializes (sorted fset arrays), and strictly cheaper
  * than the old shape's per-character shuffle rows for the same doc. */
case class WinnowSel(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_sel expects STRING, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_sel"

  protected override def nullSafeEval(input: Any): Any =
    WinnowSel.sel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowSel.sel($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowSel =
    copy(child = newChild)
}

object WinnowSel {
  final val K = 5 // k-gram width  — TextOps.winK
  final val W = 4 // winnow window — TextOps.winW
  private final val Pack = 8589934592L // 2^33

  /** One-pass selection; see the class doc for the contract. */
  def sel(s: UTF8String): ArrayData = {
    // decode code points once (RollingHash's decoder, vectorized over
    // the doc instead of re-run per substring row)
    val nBytes = s.numBytes
    val cps = new Array[Int](nBytes) // ≥1 byte per code point
    var len = 0
    var i = 0
    while (i < nBytes) {
      val b0 = s.getByte(i) & 0xff
      var cp = 0
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if ((b0 & 0xE0) == 0xC0) {
        cp = ((b0 & 0x1F) << 6) | (s.getByte(i + 1) & 0x3F); i += 2
      } else if ((b0 & 0xF0) == 0xE0) {
        cp = ((b0 & 0x0F) << 12) | ((s.getByte(i + 1) & 0x3F) << 6) |
          (s.getByte(i + 2) & 0x3F); i += 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3F) << 12) |
          ((s.getByte(i + 2) & 0x3F) << 6) | (s.getByte(i + 3) & 0x3F); i += 4
      }
      cps(len) = cp
      len += 1
    }
    val np = len - (K - 1) // k-gram count (1-based positions 1..np)
    if (np < W) return ArrayData.toArrayData(Array.empty[Long])
    // packed keys (position baked in — identical integers to winKey)
    val keys = new Array[Long](np)
    var j = 0
    while (j < np) {
      var h = 0L
      var t = 0
      while (t < K) {
        h = (h * RollingHash.Base + cps(j + t)) % RollingHash.Mod
        t += 1
      }
      keys(j) = h * Pack + (Pack - 1L - (j + 1L))
      j += 1
    }
    // sliding min over the np−W+1 full windows; consecutive-dedupe is
    // exactly the distinct selected set (class doc)
    val sels = new Array[Long](np - W + 1)
    var nOut = 0
    var prev = -1L // keys are positive (h ≥ 0, packed pos ≥ 0)
    var w0 = 0
    while (w0 <= np - W) {
      var m = keys(w0)
      var t = 1
      while (t < W) {
        val v = keys(w0 + t)
        if (v < m) m = v
        t += 1
      }
      if (m != prev) { sels(nOut) = m; nOut += 1; prev = m }
      w0 += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(sels, nOut))
  }
}
