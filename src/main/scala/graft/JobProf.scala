package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB profiler for one query (measurement tooling, guide §1):
  * registers a listener that prints every Spark job's wall-clock and
  * call site while the named query runs under the bench statistic.
  * Build-inclusive queries (index lifecycles, rebuild gates) are many
  * small actions — per-query seconds alone cannot say WHICH verb's
  * job dominates; this decomposes them without the UI (headless host).
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.JobProf <query> [passes]
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args(0)
    val passes = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
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
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var enabled = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (enabled) {
        val site = Option(js.properties.getProperty("callSite.short"))
          .orElse(Option(js.properties.getProperty("spark.job.description")))
          .getOrElse(js.stageInfos.headOption.map(_.name).getOrElse("?"))
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (enabled) {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"JOBPROF job=${je.jobId}%4d sec=$sec%7.3f  $site")
        }
      }
    })
    for (pass <- 1 to passes) {
      println(s"===== pass $pass: $name =====")
      enabled = pass == passes // profile only the warm last pass
      val t0 = System.nanoTime()
      val c = Bench.evalRows(SparkEntry.queries(name)(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      // let listener events drain before the summary line
      Thread.sleep(300)
      println(f"JOBPROF TOTAL pass=$pass q=$name rows=$c sec=$sec%.2f")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
