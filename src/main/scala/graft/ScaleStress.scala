package graft

import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale stress: widen lineitem into F synthetic features (F × 600k cells
  * at sf0.1) and run the full MWU pipeline — evidence that the plan
  * scales in the feature dimension (features shard freely across the
  * hash shuffle; every feature has n_obs rows, so partitions stay
  * balanced by construction).
  *
  * `SPARK_GRAFT_SF_DIR=… sbt "runMain graft.ScaleStress [nFeatures]"`
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val nFeat = if (args.nonEmpty) args(0).toInt else 32
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = graft.sources.Tables.read(spark, sfDir, "lineitem")
    // F deterministic synthetic features per row: value_i = log1p of a
    // per-feature affine mix of the measures (distinct distributions, all
    // positive); grp = l_returnflag
    val cells = li.select(col("l_returnflag").as("grp"),
        explode(expr(s"sequence(0, ${nFeat - 1})")).as("fi"),
        col("l_extendedprice"), col("l_quantity"), col("l_discount"))
      .select(col("grp"),
        concat(lit("f"), col("fi")).as("feature_id"),
        log1p(col("l_extendedprice") * (lit(1.0) + col("fi") * col("l_discount"))
          + col("fi") * col("l_quantity")).as("value"))

    val nCells = cells.count()
    val t0 = System.nanoTime()
    val res = Pipeline.markerStats(spark, cells, Pipeline.Config(topN = Some(5)))
    val n = res.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"stress":"mwu_pipeline","features":$nFeat,"cells":$nCells,"out_rows":$n,"sec":$sec%.2f,"cells_per_sec":${(nCells / sec).toLong}}""")
    spark.stop()
  }
}
