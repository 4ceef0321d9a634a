package graft

import graft.operators.EventOps
import graft.sources.Tables

/** Stream/batch differential (SURVEY.md §2.9): the Structured Streaming
  * hourly aggregate must equal the batch plan on the same data. */
class StreamBatchSpec extends SparkSpec {

  test("streaming hourly agg equals batch hourly agg on sf0.001 events") {
    val batch = EventOps.hourly(Tables.read(spark, sf("sf0.001"), "events"))
      .orderBy("hour_epoch", "event_type").collect()
    val stream = graft.streaming.EventStream.runOnce(spark, sf("sf0.001"))
      .orderBy("hour_epoch", "event_type").collect()
    assert(batch.length == stream.length && batch.length > 0)
    batch.zip(stream).foreach { case (b, s) => assert(b == s) }
  }

  test("stream_neardup_crud runner: the streamed CDC history serves identically to a batch-built equivalent index") {
    // drives the REAL gate runner (seed build + 4 foreachBatch
    // micro-batches from a cloned session + outer-session serve) — the
    // r11 lesson: the oracle gate's runners need a spec that executes
    // them, or a cross-session staleness bug ships silently
    import org.apache.spark.sql.functions._
    import graft.operators.NearDupIndex
    val streamed = graft.streaming.EventStream
      .runNearDupCrudOnce(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val docs = Tables.read(spark, sf("sf0.001"), "documents")
    val hist = col("doc_id") % 5 < 4
    val idx = graft.Scratch.dir("ndidx_crud_batch_")
    NearDupIndex.writeNearDupIndex(docs.filter(hist && col("doc_id") % 3 === 0), idx)
    NearDupIndex.appendNearDupIndex(docs.filter(hist && col("doc_id") % 3 === 1), idx)
    NearDupIndex.appendNearDupIndex(docs.filter(hist && col("doc_id") % 3 === 2), idx)
    NearDupIndex.deleteFromNearDupIndex(
      docs.filter(col("doc_id") % 10 === 1).select("doc_id")
        .join(NearDupIndex.indexedIds(spark, idx), Seq("doc_id"), "left_semi"), idx)
    val batch = NearDupIndex.serveNearDup(spark, idx,
      docs.filter(col("doc_id") % 5 >= 4)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(streamed.nonEmpty, "streamed serve returned nothing")
    assert(streamed == batch,
      "streamed CDC history serves differently from the batch-built index")
  }

  test("stream_sparse_crud runner: the streamed CDC history serves identically to a survivors rebuild") {
    import org.apache.spark.sql.functions._
    val streamed = graft.streaming.EventStream
      .runSparseCrudOnce(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val docs = Tables.read(spark, sf("sf0.001"), "documents")
    val surv = graft.Scratch.dir("sidx_crud_surv_")
    graft.operators.SparseIndex.writeSparseIndex(
      docs.filter(col("doc_id") % 5 =!= 3), surv)
    val rebuild = graft.operators.SparseIndex
      .sparseRetrievalStored(spark, surv).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(streamed.nonEmpty, "streamed serve returned nothing")
    assert(streamed == rebuild,
      "streamed CDC history serves differently from the survivors rebuild")
  }

  test("streaming trending top-k equals the batch rank over hourly counts") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("hour_epoch")
      .orderBy(col("n").desc, col("event_type").asc)
    val batch = EventOps.hourly(Tables.read(spark, sf("sf0.001"), "events"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("hour_epoch", "event_type", "n", "rk")
      .orderBy("hour_epoch", "rk").collect()
    val stream = graft.streaming.EventStream.runTrendingOnce(spark, sf("sf0.001"))
      .orderBy("hour_epoch", "rk").collect()
    assert(batch.length == stream.length && batch.length > 0)
    batch.zip(stream).foreach { case (b, s) => assert(b == s) }
    // every hour contributes at most k rows, ranks are 1..k
    stream.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= 3 && rows.map(_.getLong(3)).sorted.sameElements(1L to rows.length.toLong))
    }
  }

  test("streaming scd2 emits exactly the batch closed versions; open tails stay in state") {
    import org.apache.spark.sql.functions._
    val batch = EventOps.scd2(Tables.read(spark, sf("sf0.001"), "events"))
    val closed = batch.filter(col("valid_to").isNotNull)
      .select("user_id", "version", "tier", "valid_from", "valid_to")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val stream = graft.streaming.EventStream.runScd2Once(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(stream == closed && stream.nonEmpty)
    // exactly one open (current) version per key remains unemitted
    val open = batch.filter(col("valid_to").isNull).count()
    assert(open == batch.select("user_id").distinct().count())
  }

  test("streaming transitions equal the batch lag-window matrix") {
    import org.apache.spark.sql.functions._
    val batch = EventOps.transitions(Tables.read(spark, sf("sf0.001"), "events"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    val stream = graft.streaming.EventStream.runTransitionsOnce(spark, sf("sf0.001"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(stream == batch && stream.nonEmpty)
  }

  test("drift post-pass: an hour collapsed into one bin maximizes D") {
    import spark.implicits._
    // hours 0,1: uniform over bins 0..3; hour 2: everything in bin 3
    val hist = (for { h <- 0L to 1L; b <- 0L to 3L } yield (h, b, 25L))
      .toDF("hour_epoch", "bin", "n")
      .unionByName(Seq((2L, 3L, 100L)).toDF("hour_epoch", "bin", "n"))
    val d = graft.streaming.EventStream.driftFromHist(hist).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(d(2L) > d(0L) && d(0L) == d(1L), s"d=$d")
    // hour 2's ECDF is 0 until bin 3; the global has 1/2 at bin 0 ... :
    // gap peaks at bin 2 with global cum 125+125+... exact check below
    assert(math.abs(d(2L) - 0.5) < 1e-12) // global F(bin2)=150/300 vs 0
  }

  test("stream-static broadcast join equals the batch join on sf0.001") {
    import org.apache.spark.sql.functions._
    val events = Tables.read(spark, sf("sf0.001"), "events")
    val customers = Tables.read(spark, sf("sf0.001"), "customer")
      .select("c_custkey", "c_mktsegment")
    val batch = graft.streaming.EventStream.joinSegments(events, customers)
      .orderBy("c_mktsegment").collect()
    val stream = graft.streaming.EventStream.runJoinOnce(spark, sf("sf0.001"))
      .orderBy("c_mktsegment").collect()
    assert(batch.length == stream.length && batch.length > 0)
    batch.zip(stream).foreach { case (b, s) => assert(b == s) }
  }
}
