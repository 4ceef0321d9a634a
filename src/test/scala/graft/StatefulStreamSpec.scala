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

  test("watermark drops events later than the lateness bound (append mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val h = 3600L * 1000000000L // one hour in nanos
    val input = MemoryStream[(Long, String, Double)]
    val agg = graft.streaming.EventStream.hourlyAgg(
      input.toDF().toDF("ts", "event_type", "value"))
    val qn = "wm_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = agg.writeStream.outputMode("append").format("memory").queryName(qn)
      .trigger(Trigger.ProcessingTime(0)).start()
    // batch 1: events in hours 0 and 3 → watermark advances to hour 2
    input.addData((h / 10, "a", 1.0), (3L * h + 1, "a", 1.0))
    q.processAllAvailable()
    // batch 2: a LATE event in hour 0 (beyond the 1h lateness bound) and
    // an on-time event in hour 3
    input.addData((h / 2, "a", 1.0), (3L * h + 2, "a", 1.0))
    q.processAllAvailable()
    // batch 3: advance event time far so hour-3 window closes and emits
    input.addData((10L * h, "a", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table(qn).orderBy("hour_epoch")
      .collect().map(r => (r.getLong(0), r.getLong(r.fieldIndex("n")))).toMap
    // hour 0 closed with ONLY the batch-1 event; the late one was dropped
    assert(out(0L) == 1L, s"late event must be dropped: $out")
    // hour 3 kept both on-time events
    assert(out(3L * 3600) == 2L, s"on-time events kept: $out")
  }

  test("sessionizer uses floored-second gaps like batch (sub-second boundary case)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // raw nano gap = 1800.7s > 1800s, but floored-second gap = 1800 (not >
    // 1800): batch keeps the session open, so streaming must too.
    val t1 = 200000000L            // 0.2 s  → sec 0
    val t2 = 1800900000000L        // 1800.9 s → sec 1800
    val t3 = 10000000000000L       // 10000 s — far gap, closes the session
    val input = MemoryStream[(Long, Long)]
    val qn = "sessgap_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = EventStream.sessionizeStream(
        input.toDF().toDF("user_id", "ts"), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName(qn)
      .trigger(Trigger.ProcessingTime(0)).start()
    input.addData((1L, t1), (1L, t2), (1L, t3))
    q.processAllAvailable()
    q.stop()
    val out = spark.table(qn)
      .select("session_id", "n_events", "start_ns", "end_ns")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // exactly one closed session containing BOTH t1 and t2
    assert(out.toSeq == Seq((1L, 2L, t1, t2)), out.mkString(","))
  }

  test("flatMapGroupsWithState sessionizer matches batch sessionize on closed sessions") {
    val sfDir = sf("sf0.001")
    // drive the stream one-shot
    val src = java.nio.file.Files.createTempDirectory("graft_sess_src_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"), src.resolve("events.parquet"))
    val schema = Tables.rawSchema(spark, sfDir, "events")
    val stream = Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(src.toString))
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

  test("streaming HLL: register state carries across micro-batches (final snapshot = batch build)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // two event types, users split MID-TYPE across two micro-batches
    // with overlap (duplicate users across batches must not re-count)
    val b1 = (1L to 400L).map(u => ("click", u)) ++ (1L to 150L).map(u => ("view", u))
    val b2 = (201L to 700L).map(u => ("click", u)) ++ (100L to 300L).map(u => ("view", u))
    val input = MemoryStream[(String, Long)]
    val qn = "hll_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = EventStream.hllStream(input.toDF().toDF("event_type", "user_id"))
      .writeStream.outputMode("append").format("memory").queryName(qn)
      .trigger(Trigger.ProcessingTime(0)).start()
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    q.stop()
    val snaps = spark.table(qn)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // two snapshots per key (one per batch); the final one must equal the
    // single-pass register build over ALL data
    val fin = snaps.groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._2) }
    val rh = "rolling_hash(cast(user_id as string))"
    val expected = (b1 ++ b2).toDF("event_type", "user_id")
      .selectExpr("event_type",
        s"cast(${graft.operators.Hll.regSql(rh)} as int) as reg",
        s"cast(${graft.operators.Hll.rhoSql(rh)} as int) as rho")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      .groupBy(_._1).map { case (k, rows) =>
        val regs = Array.fill(graft.operators.Hll.m)(0: Byte)
        rows.foreach { case (_, reg, rho) => if (rho > regs(reg)) regs(reg) = rho.toByte }
        val (vz, est) = graft.operators.Hll.estimate(regs)
        k -> (vz, est)
      }
    assert(fin.keySet == Set("click", "view"))
    fin.foreach { case (k, (_, n, vz, est)) =>
      assert(n == (if (k == "click") 900L else 351L), s"$k n_obs=$n")
      assert((vz, est) == expected(k), s"$k: streamed ($vz, $est) != ${expected(k)}")
    }
  }

  test("stateful anomaly scorer reproduces the batch window bit-for-bit, incl. across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val sfDir = sf("sf0.001")
    // split the events MID-USER across two micro-batches: the second
    // batch's frames must pull fixed-point state carried from the first
    val all = Tables.read(spark, sfDir, "events")
      .select("user_id", "event_id", "ts", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._3, t._2))
    val (b1, b2) = all.splitAt(all.length / 2)
    val input = MemoryStream[(Long, Long, Long, Double)]
    val qn = "anom_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = EventStream.anomalyStream(
        input.toDF().toDF("user_id", "event_id", "ts", "value"))
      .writeStream.outputMode("append").format("memory").queryName(qn)
      .trigger(Trigger.ProcessingTime(0)).start()
    input.addData(b1.toSeq); q.processAllAvailable()
    input.addData(b2.toSeq); q.processAllAvailable()
    q.stop()
    val streamed = spark.table(qn)
      .select("event_id", "n_prior", "z")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    val batch = SparkEntry.queries("q_anomaly")(spark, sfDir)
      .select("event_id", "n_prior", "z")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(streamed.size == batch.size)
    assert(streamed == batch)
  }

  test("checkpoint restart: a stopped-and-restarted stateful query recovers state exactly once") {
    // the fault-tolerance contract a cluster deploy relies on: run the
    // stateful EWMA over HALF the events to a parquet sink with a
    // checkpoint, STOP the query (simulating a crash/redeploy), drop the
    // second half into the source, restart from the SAME checkpoint —
    // the union of both runs' emissions must equal the batch answer
    // exactly (state recovered, no duplicates, no gaps)
    import spark.implicits._
    val sfDir = sf("sf0.001")
    val all = Tables.read(spark, sfDir, "events")
      .select("user_id", "event_id", "ts", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._3 / 1000L, t._2)) // µs order: the batch window sorts by (ts div 1000, event_id)
    val (b1, b2) = all.splitAt(all.length / 2)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rst_ck_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_rst_out_").toString
    val src = java.nio.file.Files.createTempDirectory("graft_rst_src_").toString
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id bigint, event_id bigint, ts bigint, value double")
    def stage(rows: Seq[(Long, Long, Long, Double)], part: String): Unit =
      rows.toDF("user_id", "event_id", "ts", "value")
        .coalesce(1).write.mode("overwrite").parquet(s"$src/$part")
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(src)
      val q = EventStream.ewmaStream(stream)
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    stage(b1.toSeq, "p1")
    runOnce() // first run: half the events, then "crash"
    stage(b2.toSeq, "p2")
    runOnce() // restart from the same checkpoint
    val streamed = spark.read.parquet(out)
      .select("event_id", "us", "ewma")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.length == streamed.toSet.size, "duplicate emissions after restart")
    val batch = SparkEntry.queries("q_ewma")(spark, sfDir)
      .select("event_id", "us", "ewma")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed.toSet == batch)
  }

  test("stateful TWAP: two micro-batches emit exactly what one batch does (state carry)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val all = Tables.read(spark, sf("sf0.001"), "events")
      .select("user_id", "event_id", "ts", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._3 / 1000L, t._2)) // µs order (the delivery contract)
    def run(batches: Seq[Seq[(Long, Long, Long, Double)]]): Set[String] = {
      val input = MemoryStream[(Long, Long, Long, Double)]
      val qn = "twap_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = EventStream.twapStream(
          input.toDF().toDF("user_id", "event_id", "ts", "value"))
        .writeStream.outputMode("append").format("memory").queryName(qn)
        .trigger(Trigger.ProcessingTime(0)).start()
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(qn).collect().map(_.toString).toSet
    }
    val (b1, b2) = all.splitAt(all.length / 2)
    val once = run(Seq(all.toSeq))
    val twice = run(Seq(b1.toSeq, b2.toSeq))
    assert(once.nonEmpty && once == twice)
  }

  test("stateful EWMA reproduces the batch lag windows bit-for-bit, incl. across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val sfDir = sf("sf0.001")
    // split MID-USER: second-batch EWMAs must read the last-7 buffer
    // carried from the first batch
    val all = Tables.read(spark, sfDir, "events")
      .select("user_id", "event_id", "ts", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._3 / 1000L, t._2)) // µs order: the batch window sorts by (ts div 1000, event_id)
    val (b1, b2) = all.splitAt(all.length / 2)
    val input = MemoryStream[(Long, Long, Long, Double)]
    val qn = "ewma_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = EventStream.ewmaStream(
        input.toDF().toDF("user_id", "event_id", "ts", "value"))
      .writeStream.outputMode("append").format("memory").queryName(qn)
      .trigger(Trigger.ProcessingTime(0)).start()
    input.addData(b1.toSeq); q.processAllAvailable()
    input.addData(b2.toSeq); q.processAllAvailable()
    q.stop()
    val streamed = spark.table(qn)
      .select("event_id", "us", "ewma")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = SparkEntry.queries("q_ewma")(spark, sfDir)
      .select("event_id", "us", "ewma")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed.size == batch.size)
    assert(streamed == batch)
  }
}
