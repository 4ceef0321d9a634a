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

  test("schema pre-flight: clean fixtures pass; a deliberate type mutation is named") {
    import graft.sources.Preflight
    // the shipped fixtures must be pre-flight-green (Verify now gates on it)
    assert(Preflight.diagnose(spark, sf("sf0.001")).isEmpty)
    // mutate ONE column type (documents.n_chars bigint -> double) in a
    // copied fixture dir: the diagnostic must name exactly that column
    val dir = java.nio.file.Files.createTempDirectory("graft_preflight_")
    val src = java.nio.file.Paths.get(sf("sf0.001"))
    val it = java.nio.file.Files.list(src)
    try it.forEach(p => java.nio.file.Files.copy(p, dir.resolve(p.getFileName.toString)))
    finally it.close()
    val mutPath = dir.resolve("documents.parquet")
    java.nio.file.Files.delete(mutPath)
    spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
      .withColumn("n_chars", org.apache.spark.sql.functions.col("n_chars").cast("double"))
      .coalesce(1).write.parquet(dir.resolve("documents_tmp").toString)
    val part = new java.io.File(dir.resolve("documents_tmp").toString).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath, mutPath)
    val d = Preflight.diagnose(spark, dir.toString)
    assert(d.exists(_.startsWith("documents.n_chars: double")),
      s"expected the mutated column to be named, got: $d")
    assert(d.size == 1, s"only the mutation should be flagged: $d")
    val ex = intercept[IllegalStateException](Preflight.check(spark, dir.toString))
    assert(ex.getMessage.contains("documents.n_chars"))
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
