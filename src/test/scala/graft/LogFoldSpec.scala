package graft

import graft.operators.LogFold

/** A4+M4 vs the reimplementation (gen_fixtures F5) — mirrors reference
  * tests/test_log_fold_change.py with bases None/2/10. */
class LogFoldSpec extends SparkSpec {

  val counts = Seq(0, 1, 5, 9, 2, 7, 3, 3).map(_.toDouble)
  val g8 = Seq("a", "a", "b", "b", "a", "b", "a", "b")

  def lfcOf(base: Option[Double]): Map[String, Double] = {
    val k = base.map(math.log).getOrElse(1.0)
    val data = counts.map(c => math.log1p(c) / k)
    LogFold.withLfc(LogFold.groupMeans(cellsOf("f", data, g8)), base)
      .select("grp", "lfc").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("natural-log data (base=None)") {
    val m = lfcOf(None)
    assert(approx(m("a"), -2.211430020345163, 1e-10))
    assert(approx(m("b"), 2.211430020345163, 1e-10))
  }

  test("base=2 and base=10 invert their log consistently (logfoldchange.py:50)") {
    assert(approx(lfcOf(Some(2.0))("a"), -2.2114300203451625, 1e-10))
    assert(approx(lfcOf(Some(10.0))("b"), 2.2114300203451625, 1e-10))
  }

  test("all-zero data: 1e-9 offset guards log(0) (test_log_fold_change.py:17)") {
    val m = LogFold.withLfc(LogFold.groupMeans(cellsOf("f", Seq.fill(8)(0.0), g8)), None)
      .select("grp", "lfc").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("a") == 0.0 && m("b") == 0.0)
  }

  test("rest mean uses the subtraction identity (logfoldchange.py:19-22)") {
    val m = LogFold.groupMeans(cellsOf("f", counts, g8))
      .select("grp", "mu1", "mu2").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx(m("a")._1, 1.5) && approx(m("a")._2, 6.0))
    assert(approx(m("b")._1, 6.0) && approx(m("b")._2, 1.5))
  }
}
