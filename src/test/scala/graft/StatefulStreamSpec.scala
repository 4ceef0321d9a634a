package graft

import graft.operators.EventOps
import graft.sources.Tables
import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stateful streaming sessionization vs the batch lag+cumsum plan:
  * closed streaming sessions must equal every batch session except each
  * user's open tail. */
class StatefulStreamSpec extends SparkSpec {

  test("flatMapGroupsWithState sessionizer matches batch sessionize on closed sessions") {
    val sfDir = sf("sf0.001")
    // drive the stream one-shot
    val src = java.nio.file.Files.createTempDirectory("graft_sess_src_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"), src.resolve("events.parquet"))
    val schema = Tables.read(spark, sfDir, "events").schema
    val stream = spark.readStream.schema(schema).parquet(src.toString)
    val qn = "sess_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = EventStream.sessionizeStream(stream, gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName(qn)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table(qn)
      .select("user_id", "session_id", "n_events", "start_ns", "end_ns")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

    // batch reference minus each user's last (still-open) session
    val batch = EventOps.sessionize(Tables.read(spark, sfDir, "events"), gapMinutes = 30)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val closed = batch
      .withColumn("max_sess", max("session_id").over(w))
      .filter(col("session_id") < col("max_sess"))
      .select("user_id", "session_id", "n_events", "ts_min", "ts_max")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

    assert(streamed.nonEmpty)
    assert(streamed == closed)
  }
}
