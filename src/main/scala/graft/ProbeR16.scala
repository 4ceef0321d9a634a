package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-16 measurement scratch (guide §1: measure first) — NOT part of
  * the shipped surface; counts the join masses behind the full-probe
  * incremental winnow dedups and the all-pairs verify to size the
  * candidate-generation respelling before writing it. */
object ProbeR16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.sources.Tables.read(spark, dir, "documents")
    val fps = graft.operators.TextOps.winnow(docs)
      .select("doc_id", "fp").distinct().localCheckpoint()
    println(s"PROBE fps=${fps.count()}")
    val hist = fps.filter(expr("doc_id % 5 < 4"))
      .select(col("doc_id").as("hist_id"), col("fp"))
    val inc = fps.filter(expr("doc_id % 5 >= 4"))
    println(s"PROBE hist=${hist.count()} inc=${inc.count()}")
    // current spelling's masses
    val hj = inc.join(hist, "fp")
    println(s"PROBE hist_fanout=${hj.count()}")
    println(s"PROBE hist_pairs=${hj.select("doc_id", "hist_id").distinct().count()}")
    val bj = inc.join(inc.select(col("doc_id").as("e_id"), col("fp")), "fp")
      .filter(col("e_id") < col("doc_id"))
    println(s"PROBE batch_fanout=${bj.count()}")
    println(s"PROBE batch_pairs=${bj.select("doc_id", "e_id").distinct().count()}")
    // hot-fp profile
    fps.groupBy("fp").agg(count(lit(1)).as("dfp"))
      .groupBy(expr("cast(ln(dfp)/ln(10) as int)").as("log10df"))
      .agg(count(lit(1)).as("n_fps"), sum(col("dfp") * col("dfp")).as("sum_df2"))
      .orderBy("log10df").show()
    // prefix-filtered candidate masses (minShared=3, thr 1/2)
    val dfp = fps.groupBy("fp").agg(count(lit(1)).as("dfp"))
    val wd = Window.partitionBy("doc_id").orderBy(col("dfp").asc, col("fp").asc)
    val pref = inc.join(dfp, "fp")
      .withColumn("rk", row_number().over(wd))
      .withColumn("n_fp", count(lit(1)).over(Window.partitionBy("doc_id")))
      .withColumn("t", greatest(lit(3L), expr("cast(ceil(n_fp * 1 / 2) as bigint)")))
      .filter(col("rk") <= col("n_fp") - col("t") + 1)
      .select("doc_id", "fp").localCheckpoint()
    println(s"PROBE pref_rows=${pref.count()} (inc rows were ${inc.count()})")
    val phj = pref.join(hist, "fp")
    println(s"PROBE pref_hist_fanout=${phj.count()}")
    println(s"PROBE pref_hist_cands=${phj.select("doc_id", "hist_id").distinct().count()}")
    val pbj = pref.join(inc.select(col("doc_id").as("e_id"), col("fp")), "fp")
      .filter(col("e_id") < col("doc_id"))
    println(s"PROBE pref_batch_fanout=${pbj.count()}")
    println(s"PROBE pref_batch_cands=${pbj.select("doc_id", "e_id").distinct().count()}")
    // per-doc fset sizes (verify cost proxy)
    fps.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .agg(avg("n"), max("n"), expr("percentile(n, 5e-1)")).show()
    spark.stop()
  }
}
