package graft
import org.apache.spark.sql.SparkSession

/** Same-code A/B bench: times each named query under BOTH statistics —
  * the pre-r12 `df.count()` (Catalyst rewrites the count and prunes
  * work) and the honest full-plan `queryExecution.toRdd.count()` — with
  * the frozen host-speed calibration leg per pass. Self-contained (no
  * dependency on [[Bench]]'s members) so the IDENTICAL file drops into
  * an old-sha worktree: running it there and at HEAD on the same idle
  * host decomposes a cross-round per-query delta into
  * (statistic change) × (host drift, via calibration) × (real code
  * change). Usage:
  *   SPARK_GRAFT_SF_DIR=… runMain graft.AbBench q1 q2 …
  */
object AbBench {
  private def calibrate(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 8000000000L, 1L, 32)
      .selectExpr(
        "sum(((id % 1000003) * 2654435761 + 2862933) % 1000) as s")
      .collect()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "events", "documents", "embeddings").foreach { t =>
      try graft.sources.Tables.read(spark, sfDir, t).foreach(_ => ())
      catch { case _: Throwable => }
    }
    val names = args.toSeq
    val stats: Seq[(String, org.apache.spark.sql.DataFrame => Long)] = Seq(
      "count" -> ((df: org.apache.spark.sql.DataFrame) => df.count()),
      "full" -> ((df: org.apache.spark.sql.DataFrame) =>
        df.queryExecution.toRdd.count()))
    calibrate(spark) // untimed warm-up of the calibration leg itself
    for (pass <- 1 to 3) {
      val cal = calibrate(spark)
      println(f"ABBENCH pass=$pass calibration=$cal%.3f")
      for (n <- names; (statName, statFn) <- stats) {
        val t0 = System.nanoTime()
        val c = try statFn(SparkEntry.queries(n)(spark, sfDir))
                catch { case e: Throwable => System.err.println(e); -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        println(f"ABBENCH pass=$pass q=$n stat=$statName rows=$c sec=$sec%.3f")
      }
    }
    spark.stop()
  }
}
