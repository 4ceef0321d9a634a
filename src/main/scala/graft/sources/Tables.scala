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
    // The engine-internal contract for event time is epoch-nanos BIGINT
    // (every downstream window/sessionize/as-of does integer arithmetic
    // on it; DuckDB's oracle reads the same integer via epoch_ns).
    // The physical parquet type has varied across fixture generations —
    // TIMESTAMP(NANOS) (readable only as long via the legacy conf) and
    // TIMESTAMP(MICROS) (arrives as TIMESTAMP_NTZ) — so normalize any
    // timestamp-typed `ts` here, at the single source choke point.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  /** Map any timestamp-typed `ts` onto the epoch-nanos BIGINT contract
    * (identity when `ts` is already BIGINT or absent). Streaming readers
    * declare [[rawSchema]] and apply this to the stream, so batch and
    * stream see the identical relation whatever the fixture's physical
    * type. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) =>
        // NTZ wall-clock digits are defined to be UTC instants (DuckDB's
        // epoch_ns reads them that way); timestampdiff on NTZ values is
        // pure wall-clock arithmetic, so this holds under ANY session
        // timezone — a cast-to-instant spelling would silently shift ts
        // by the zone offset in a non-UTC session
        df.withColumn("ts", expr(
          "timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts) * 1000"))
      case Some(TimestampType) =>
        df.withColumn("ts", expr("unix_micros(ts) * 1000"))
      case _ => df
    }
  }

  /** The file's native schema (pre-[[normalizeTs]]) — what a streaming
    * reader must declare to read the bytes as written. */
  def rawSchema(spark: SparkSession, sfDir: String, name: String): org.apache.spark.sql.types.StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet").schema
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
