package graft.streaming

import graft.oracle.Parity
import graft.oracle.Parity.SparkD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface over the `events` table (SURVEY.md §2.9:
  * the reference is batch-only; this is the driver's extension surface).
  *
  * The hourly tumbling aggregate matches [[graft.operators.EventOps.hourly]]
  * exactly (same fixed-point sum), so the batch SQL doubles as the
  * streaming oracle — a stream/batch differential test.
  */
object EventStream {

  /** Hourly tumbling window counts with a watermark for late data.
    * `ts` is epoch-nanos BIGINT (Tables.read) → event-time TIMESTAMP for
    * the watermark/window machinery; the output key is epoch seconds,
    * identical to the batch [[graft.operators.EventOps.hourly]]. */
  def hourlyAgg(stream: DataFrame): DataFrame =
    stream
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_t", "1 hour")
      .groupBy(window(col("ts_t"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr(Parity.fpSum("value")).as("v"))
      .select(expr("unix_micros(w.start) div 1000000").as("hour_epoch"),
        col("event_type"), col("n"), col("v"))

  /** Drives the streaming query synchronously over the static events
    * parquet (staged into a stream-source directory) and returns the final
    * result as a batch DataFrame — used by Verify/Bench. */
  def runOnce(spark: SparkSession, sfDir: String): DataFrame = {
    val src = java.nio.file.Files.createTempDirectory("graft_stream_src_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      src.resolve("events.parquet"))
    val schema = graft.sources.Tables.read(spark, sfDir, "events").schema
    val stream = spark.readStream.schema(schema).parquet(src.toString)
    val qName = "graft_stream_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = hourlyAgg(stream).writeStream
      .outputMode("complete").format("memory").queryName(qName)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(qName)
  }
}
