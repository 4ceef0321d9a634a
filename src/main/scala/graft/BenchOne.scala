package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    for (pass <- 1 to 3; n <- names) {
      val t0 = System.nanoTime()
      val c = Bench.evalRows(SparkEntry.queries(n)(spark, dir))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"BENCHONE pass=$pass q=$n rows=$c sec=$sec%.2f")
    }
    spark.stop()
  }
}
