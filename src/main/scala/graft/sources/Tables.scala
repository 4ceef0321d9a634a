package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table readers + wide→long melt (SURVEY.md §1.1, §7.1).
  *
  * The engine's canonical input is the long "cells" relation
  * `(grp, feature_id, value)` — the Spark rendering of the reference's
  * column-chunked dense matrix (/root/reference/dask_mwu/rank_data.py:204-247:
  * rows of one feature never split across chunks; here one hash shuffle on
  * `feature_id` co-partitions them for free, and scales to any number of
  * features/rows).
  */
object Tables {

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark's reader rejects;
    // read nanos as epoch-nanos BIGINT (DuckDB sees TIMESTAMP_NS — the
    // oracle uses epoch_ns for the same integer).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Melt `featureCols` of a wide table into long format. `stack` is a
    * single codegen'd generator — no shuffle, embarrassingly parallel
    * (SURVEY.md §7.5 "melt cost at scale"). */
  def melt(df: DataFrame, groupCol: String, featureCols: Seq[String]): DataFrame = {
    val stackArgs = featureCols.map(c => s"'$c', `$c`").mkString(", ")
    df.select(
      col(groupCol).as("grp"),
      expr(s"stack(${featureCols.size}, $stackArgs) as (feature_id, value)"))
      .select(col("grp"), col("feature_id"), col("value").cast("double").as("value"))
  }

  /** CSV/JSON round-trip support (source-format breadth beyond the
    * parquet testdata; S6 writes CSV too). Schema travels explicitly —
    * CSV carries a header, JSON is schema-on-read with the supplied
    * schema to keep types stable. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String,
               schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Melt SQL for the DuckDB oracle — UNION ALL keeps it ANSI. */
  def meltSql(table: String, groupCol: String, featureCols: Seq[String]): String =
    featureCols.map(c =>
      s"select $groupCol as grp, '$c' as feature_id, cast($c as double) as value from $table")
      .mkString(" union all ")
}
