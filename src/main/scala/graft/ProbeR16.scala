package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-16 measurement scratch (guide §1: measure first) — NOT part of
  * the shipped surface. First run sized the incremental-winnow prefix
  * respelling (numbers in Dedup.incrementalWinnowFrom's scaladoc); this
  * run sizes the same trick for the batch winnowOverlap (dedup_winnow):
  * smaller-side-only rarest prefix vs the full df-cut fp self-join. */
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
    val nDocs = docs.select("doc_id").distinct().count()
    val kept = fps.join(
      fps.groupBy("fp").agg(count(lit(1)).as("dfp"))
        .filter(col("dfp") * 10 <= lit(nDocs)).select("fp"),
      "fp").localCheckpoint()
    println(s"PROBE fps=${fps.count()} kept=${kept.count()}")
    // current spelling
    val pj = kept.select(col("doc_id").as("doc_a"), col("fp"))
      .join(kept.select(col("doc_id").as("doc_b"), col("fp")), "fp")
      .filter(col("doc_a") < col("doc_b"))
    println(s"PROBE overlap_fanout=${pj.count()}")
    println(s"PROBE overlap_pairs=${pj.select("doc_a", "doc_b").distinct().count()}")
    // smaller-side prefix: doc D probes with its (n - max(3, ceil(n/2)) + 1)
    // rarest kept fps; pair generated only when (n, id) of the prefix side
    // is lexicographically smaller than the other side's
    val dfp = kept.groupBy("fp").agg(count(lit(1)).as("dfp"))
    val wd = Window.partitionBy("doc_id").orderBy(col("dfp").asc, col("fp").asc)
    val pref = kept.join(dfp, "fp")
      .withColumn("rk", row_number().over(wd))
      .withColumn("n_fp", count(lit(1)).over(Window.partitionBy("doc_id")))
      .withColumn("t", greatest(lit(3L), expr("cast(ceil(n_fp * 1 / 2) as bigint)")))
      .filter(col("rk") <= col("n_fp") - col("t") + 1)
      .select(col("doc_id").as("doc_a"), col("n_fp").as("n_a"), col("fp"))
      .localCheckpoint()
    val sz = kept.groupBy("doc_id").agg(count(lit(1)).as("n_b"))
    val other = kept.select(col("doc_id").as("doc_b"), col("fp"))
      .join(sz.select(col("doc_id").as("doc_b"), col("n_b")), "doc_b")
    val cj = pref.join(other, "fp")
      .filter(col("n_a") < col("n_b") ||
        (col("n_a") === col("n_b") && col("doc_a") =!= col("doc_b")))
    println(s"PROBE pref_rows=${pref.count()}")
    println(s"PROBE pref_fanout=${cj.count()}")
    println(s"PROBE pref_cands=${cj.select(least(col("doc_a"), col("doc_b")),
      greatest(col("doc_a"), col("doc_b"))).distinct().count()}")
    spark.stop()
  }
}
