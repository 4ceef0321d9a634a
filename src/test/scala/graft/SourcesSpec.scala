package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Source-format breadth: CSV/JSON round-trips preserve the marker-stats
  * relation; approximate sketches track exact answers. */
class SourcesSpec extends SparkSpec {

  test("CSV and JSON round-trip the marker stats relation") {
    val df = SparkEntry.queries("mwu_markers")(spark, sf("sf0.001"))
    val rows = df.orderBy("grp", "rk").collect().toSeq
    val base = java.nio.file.Files.createTempDirectory("graft_fmt_").toString
    Tables.writeCsv(df, s"$base/csv")
    Tables.writeJson(df, s"$base/json")
    val csv = Tables.readCsv(spark, s"$base/csv", df.schema)
      .orderBy("grp", "rk").collect().toSeq
    val json = Tables.readJson(spark, s"$base/json", df.schema)
      .orderBy("grp", "rk").collect().toSeq
    assert(csv == rows, "csv round-trip")
    assert(json == rows, "json round-trip")
  }

  test("schema evolution: mergeSchema unifies old and new shard layouts") {
    // the ingestion reality of a long-lived corpus: yesterday's shards
    // lack the column today's pipeline adds. mergeSchema must surface
    // the union schema with NULLs for the missing column, and a
    // column-pruned read of only the old columns must not touch the new
    // one at all
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evo_").toString
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/day=1")
    Seq((3L, "gamma", "en")).toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/day=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("doc_id", "text", "lang", "day"))
    val rows = merged.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some("en")))
    // old-column projection stays readable without the merged schema
    assert(spark.read.parquet(dir).select("doc_id", "text").count() == 3)
  }

  test("approximate sketches track exact answers (HLL distinct, KLL quantile)") {
    val li = Tables.read(spark, sf("sf0.01"), "lineitem")
    val r = li.agg(
      countDistinct("l_orderkey").as("exact_d"),
      approx_count_distinct("l_orderkey", 0.02).as("approx_d"),
      expr("percentile(l_extendedprice, 5e-1)").as("exact_med"),
      expr("approx_percentile(l_extendedprice, 5e-1, 1000)").as("approx_med"))
      .collect().head
    val (ed, ad) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(ad - ed) / ed < 0.05, s"HLL: exact=$ed approx=$ad")
    val (em, am) = (r.getDouble(2), r.getDouble(3))
    assert(math.abs(am - em) / em < 0.02, s"quantile: exact=$em approx=$am")
  }
}
