package graft

import graft.api.MwuApi
import graft.operators.Ranking
import org.apache.spark.sql.functions._

/** End-to-end through the compatibility facade — the reference user's
  * call sequence (rank → ranksum/tie → mwu → lfc → create_df). */
class MwuApiSpec extends SparkSpec {
  import spark.implicits._

  test("reference call sequence end-to-end with vars join and top-n") {
    val vals = Seq(-42, 27, 15, -7, -7, 35, -42, 19, -30, -41, 2, 47,
      23, 26, 21, 28, 1, -38, 33, -5, 0, -13, -32, 42).map(_.toDouble)
    val grps = (0 until 24).map(i => Seq("x", "y", "z")(i % 3))
    val cells = cellsOf("f0", vals.map(v => math.log1p(math.abs(v))), grps)
      .unionAll(cellsOf("f1", vals.map(v => math.log1p(2 * math.abs(v))), grps))

    val ranked = MwuApi.rankData(spark, cells)
    val stats = MwuApi.mannWhitneyU(
      MwuApi.computeInGroupRanksum(ranked), MwuApi.computeTieTerm(cells))
    val lfc = MwuApi.computeLogfoldchange(cells)
    val vars = Seq(("f0", "GENE_A"), ("f1", "GENE_B")).toDF("feature_id", "gene_name")
    val table = MwuApi.createDf(stats, lfc, vars, topN = Some(1))

    assert(table.columns.toSeq == Seq("grp", "gene", "U", "p_value", "p_adjusted",
      "logfoldchange", "abs_logfoldchange", "rk"))
    assert(table.count() == 3) // one row per group
    assert(table.select("gene").collect().map(_.getString(0))
      .forall(Set("GENE_A", "GENE_B").contains))
    // p in range, U consistent with direct operator composition
    table.collect().foreach { r =>
      assert(r.getAs[Double]("p_value") >= 0.0 && r.getAs[Double]("p_value") <= 1.0)
    }
  }

  test("split-relation input (cells + obs) matches the inline-group pipeline") {
    val vals = Seq(1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 4.0, 2.5)
    val grps = Seq("a", "b", "a", "b", "a", "b", "a", "b")
    val inline = graft.operators.Pipeline.markerStats(spark,
      cellsOf("f", vals, grps)).orderBy("grp", "rk").collect()
    val cells = vals.zipWithIndex.map { case (v, i) => (i.toLong, "f", v) }
      .toDF("obs_id", "feature_id", "value")
    val obs = grps.zipWithIndex.map { case (g, i) => (i.toLong, g) }.toDF("obs_id", "grp")
    val split = MwuApi.rankGeneGroupsFromObs(spark, cells, obs)
      .orderBy("grp", "rk").collect()
    assert(inline.sameElements(split))
    // invalid obs (duplicate membership) rejected up front
    val dup = (obs.collect().map(r => (r.getLong(0), r.getString(1))) :+ ((0L, "b")))
      .toSeq.toDF("obs_id", "grp")
    intercept[graft.operators.Validation.ValidationException](
      MwuApi.rankGeneGroupsFromObs(spark, cells, dup))
  }

  test("masks facade matches groups of the cells relation") {
    val obs = Seq((0L, "b"), (1L, "a")).toDF("obs_id", "grp")
    assert(MwuApi.getMasks(obs).columns.toSeq ==
      Seq("obs_id", "grp", "mask_a", "mask_b"))
  }

  test("per-group sink writes sanitized directories (S6, rank_gene_groups.py:294-307)") {
    val out = java.nio.file.Files.createTempDirectory("graft_sink_").toString + "/markers"
    val df = Seq(("N O*", "g1", 1.0), ("A", "g2", 2.0)).toDF("grp", "gene", "abs_lfc")
    graft.operators.MarkerTable.writePerGroup(
      graft.operators.MarkerTable.topK(df, None), out)
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("grp_dir="))
    assert(dirs.toSet == Set("grp_dir=N_O_", "grp_dir=A"))
  }
}
