package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-bucketing both sides of a recurring join
  * key removes the per-query shuffle entirely — the storage-layout lever
  * for repeated 100 TB joins (SURVEY.md §4 / BASELINE.md perf plan). */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key runs with ZERO exchanges") {
    val li = Tables.read(spark, sf("sf0.001"), "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val o = Tables.read(spark, sf("sf0.001"), "orders")
      .select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_b")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$p")
      // and it returns the same rows as the shuffled join
      assert(joined.count() == li.join(o, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
