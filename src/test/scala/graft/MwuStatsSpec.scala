package graft

import graft.operators.{MwuAgg, MwuStats, Ranking}
import org.apache.spark.sql.functions._

/** M1-M3 + A5 against an independent reimplementation
  * (scripts/gen_fixtures.py; p via python math.erfc) — mirrors reference
  * tests/test_p_vals.py. */
class MwuStatsSpec extends SparkSpec {

  def fullStats(feature: String, values: Seq[Double], groups: Seq[String]) = {
    val cells = cellsOf(feature, values, groups)
    MwuStats.withP(
      MwuStats.withZ(MwuStats.withU(MwuAgg.rankSums(Ranking.withRanks(cells))),
        MwuAgg.tieTerm(cells)))
      .select("grp", "n1", "rank_sum", "u1", "u2", "sigma", "z", "p")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
  }

  val g6 = Seq("a", "b", "a", "b", "a", "b")

  test("ties fixture: U/z/p per group (gen_fixtures F1)") {
    val st = fullStats("f1", Seq(2, 2, 3, 2, 3, 3).map(_.toDouble), g6)
    val (n1, r1, u1, u2, sig, z, p) = st("a")
    assert(n1 == 3 && r1 == 12.0 && u1 == 6.0 && u2 == 3.0)
    assert(approx(sig, 2.012461179749811))
    assert(approx(z, 0.4969039949999532))
    assert(approx(p, 0.6192567541768621, 1e-12))
    // returned U is U1, not max(U1,U2) — reference pvals.py:125
    assert(st("b")._3 == 3.0 && st("b")._4 == 6.0)
    // same two-sided z/p for complementary groups
    assert(st("b")._6 == z && st("b")._7 == p)
  }

  test("all rows identical: sigma=0, z=-inf, p clipped to 1 (test_p_vals.py:36-47)") {
    val st = fullStats("f2", Seq.fill(6)(4.0), g6)
    val (_, _, u1, u2, sig, z, p) = st("a")
    assert(u1 == 4.5 && u2 == 4.5 && sig == 0.0)
    assert(z.isNegInfinity)
    assert(p == 1.0)
  }

  test("3-group random fixture matches reimplementation (gen_fixtures F3)") {
    val vals = Seq(-42, 27, 15, -7, -7, 35, -42, 19, -30, -41, 2, 47,
      23, 26, 21, 28, 1, -38, 33, -5, 0, -13, -32, 42).map(_.toDouble)
    val grps = (0 until 24).map(i => Seq("x", "y", "z")(i % 3))
    val st = fullStats("f", vals, grps)
    val exp = Map(
      "x" -> (8L, 79.5, 43.5, 84.5, 16.322830104142344, 1.2252777166947586, 0.2204706012578783),
      "y" -> (8L, 100.5, 64.5, 63.5, 16.322830104142344, 0.0, 1.0),
      "z" -> (8L, 120.0, 84.0, 44.0, 16.322830104142344, 1.1946457737773897, 0.23222545717541465))
    for ((g, (n1, r1, u1, u2, sig, z, p)) <- exp) {
      val (gn1, gr1, gu1, gu2, gsig, gz, gp) = st(g)
      assert(gn1 == n1 && gr1 == r1 && gu1 == u1 && gu2 == u2, s"group $g ints")
      assert(approx(gsig, sig) && approx(gz, z), s"group $g sigma/z")
      assert(approx(gp, p, 1e-12), s"group $g p")
    }
    // U1 + U2 = n1*n2 identity (pvals.py:115)
    st.values.foreach { case (n1, _, u1, u2, _, _, _) => assert(u1 + u2 == n1 * (24 - n1)) }
  }

  test("NaN feature propagates null U/z/p/p_adj end-to-end; tie term stays finite") {
    import org.apache.spark.sql.functions.lit
    val cells = cellsOf("good", Seq(1.0, 2.0, 3.0, 4.0), Seq("a", "b", "a", "b"))
      .unionAll(cellsOf("bad", Seq(1.0, Double.NaN, 3.0, 3.0), Seq("a", "b", "a", "b")))
    val st = MwuStats.withBH(MwuStats.withP(
      MwuStats.withZ(MwuStats.withU(MwuAgg.rankSums(Ranking.withRanks(cells))),
        MwuAgg.tieTerm(cells))))
    val bad = st.filter(st("feature_id") === "bad").collect()
    bad.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("u1")) && r.isNullAt(r.fieldIndex("z")))
      assert(r.isNullAt(r.fieldIndex("p")) && r.isNullAt(r.fieldIndex("p_adj")))
      assert(r.getLong(r.fieldIndex("tie_term")) == 6L) // the 3.0 pair
    }
    val good = st.filter(st("feature_id") === "good").collect()
    good.foreach(r => assert(!r.isNullAt(r.fieldIndex("p_adj"))))
  }

  test("n<2 feature: NaN z propagates to NaN p/p_adj; valid rows' BH unaffected") {
    // n=1 → sigma=NaN → z=NaN; reference 2*norm.sf(NaN)=NaN, but Spark's
    // least() treats NaN as greatest and would clip to 1.0 without the
    // isnan guard in withP; the NaN row must also stay out of the valid
    // rows' BH windows (bh_m / suffix-min).
    val cells = cellsOf("good", Seq(1.0, 2.0, 3.0, 4.0), Seq("a", "b", "a", "b"))
      .unionAll(cellsOf("tiny", Seq(1.0), Seq("a")))
    val st = MwuStats.withBH(MwuStats.withP(
      MwuStats.withZ(MwuStats.withU(MwuAgg.rankSums(Ranking.withRanks(cells))),
        MwuAgg.tieTerm(cells))))
    val rows = st.collect().map(r =>
      (r.getString(r.fieldIndex("feature_id")), r.getString(r.fieldIndex("grp"))) ->
        (r.getDouble(r.fieldIndex("z")), r.getDouble(r.fieldIndex("p")),
          r.getDouble(r.fieldIndex("p_adj")))).toMap
    val (tz, tp, tadj) = rows(("tiny", "a"))
    assert(tz.isNaN && tp.isNaN && tadj.isNaN)
    // grp "a" has one valid feature (good) → bh_m=1, bh_i=1 → p_adj = min(1, p)
    val (_, gp, gadj) = rows(("good", "a"))
    assert(!gp.isNaN && gadj == math.min(1.0, gp))
  }

  test("BH step-up matches reimplementation incl. tied p (gen_fixtures F4)") {
    import spark.implicits._
    val df = Seq(("f1", 0.01), ("f2", 0.04), ("f3", 0.04), ("f4", 0.8))
      .toDF("feature_id", "p").withColumn("grp", lit("g"))
    val adj = MwuStats.withBH(df).orderBy("feature_id")
      .select("p_adj").collect().map(_.getDouble(0))
    val exp = Seq(0.04, 0.05333333333333334, 0.05333333333333334, 0.8)
    assert(adj.zip(exp).forall { case (a, b) => approx(a, b) })
  }

  test("BH on real 3-group p's (gen_fixtures F4 first case)") {
    import spark.implicits._
    val df = Seq(("x", 0.2204706012578783), ("y", 1.0), ("z", 0.23222545717541465))
      .toDF("feature_id", "p").withColumn("grp", lit("g"))
    val adj = MwuStats.withBH(df).orderBy("feature_id")
      .select("p_adj").collect().map(_.getDouble(0))
    val exp = Seq(0.348338185763122, 1.0, 0.348338185763122)
    assert(adj.zip(exp).forall { case (a, b) => approx(a, b) })
  }
}
