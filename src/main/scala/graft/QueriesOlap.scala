package graft

import graft.operators.{EventOps, Quantiles, Stats}
import graft.oracle.Parity
import graft.oracle.Parity.fpSum
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational/OLAP breadth queries over the TPC-H-ish tables — scans,
  * multi-way joins, windows, event-time buckets, JSON extraction.
  * Money sums go through [[Parity.fpSum]] (order-independent); everything
  * else is exact integer/rational arithmetic.
  */
object QueriesOlap {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-shaped pricing summary: hash-agg with map-side combine,
    // filters/pruning reach the parquet scan
    "q1_agg" -> ((s, dir) => {
      Tables.read(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"), // integer-valued → exact any order
          expr(fpSum("l_extendedprice")).as("sum_base_price"),
          expr(fpSum("l_extendedprice * (1e0 - l_discount)")).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order").cast("double"))
        .withColumn("avg_price", col("sum_base_price") / col("count_order").cast("double"))
    }),
    // same aggregate through the two-stage SALTED plan (skew-resilient);
    // exact integer partials make it bit-identical — it shares q1_agg's
    // oracle, proving operator equivalence
    "q1_salted" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
      val stage1 = Seq(
        sum("l_quantity").as("__qty"),
        sum(expr("cast(floor((l_extendedprice) * 1048576e0 + 5e-1) as bigint)")).as("__base"),
        sum(expr("cast(floor((l_extendedprice * (1e0 - l_discount)) * 1048576e0 + 5e-1) as bigint)")).as("__disc"),
        count(lit(1)).as("__cnt"))
      val stage2 = Seq(
        sum("__qty").as("sum_qty"),
        (sum("__base").cast("long") / lit(1048576e0)).as("sum_base_price"),
        (sum("__disc").cast("long") / lit(1048576e0)).as("sum_disc_price"),
        sum("__cnt").cast("long").as("count_order"))
      graft.operators.SkewAgg.salted(li, Seq("l_returnflag", "l_linestatus"), 8, stage1, stage2)
        .withColumn("avg_qty", col("sum_qty") / col("count_order").cast("double"))
        .withColumn("avg_price", col("sum_base_price") / col("count_order").cast("double"))
    }),
    // fact ⋈ dim through the AUTO-SALTING skew join: per-key counts flag
    // keys ≥ hotRatio × mean (the q_skew_profile decision, consumed per
    // key), only those salt; shares the plain-join oracle, proving the
    // operator row-identical to the unsalted join
    "q_skew_join" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
      val p = Tables.read(s, dir, "part")
        .withColumnRenamed("p_partkey", "l_partkey")
        .select("l_partkey", "p_brand")
      graft.operators.SkewJoin.skewJoin(li, p, "l_partkey", nSalt = 4, hotRatio = 2)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          expr(fpSum("l_extendedprice * (1e0 - l_discount)")).as("revenue"))
    }),
    // 5-way star join: fact → orders → customer → broadcast dims
    "q_join_revenue" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
      val o = Tables.read(s, dir, "orders")
      val c = Tables.read(s, dir, "customer")
      val n = Tables.read(s, dir, "nation")
      val r = Tables.read(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(expr(fpSum("l_extendedprice * (1e0 - l_discount)")).as("revenue"),
          count(lit(1)).as("n_items"))
    }),
    // per-segment top-5 customers by order spend (join + agg + window)
    "q_top_customers" -> ((s, dir) => {
      val o = Tables.read(s, dir, "orders")
      val c = Tables.read(s, dir, "customer")
      val spend = o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment", "c_custkey", "c_name")
        .agg(expr(fpSum("o_totalprice")).as("spend"), count(lit(1)).as("n_orders"))
      val w = Window.partitionBy("c_mktsegment").orderBy(col("spend").desc, col("c_custkey").asc)
      spend.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= 5)
    }),
    // per-group winsorization: clip at the group's [p5, p95] — the
    // analytics-feeds-transform pattern (quantiles broadcast back onto
    // the fact)
    "q_winsorize" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
      val bounds = li.groupBy("l_returnflag").agg(
        expr(Parity.q6("percentile(l_extendedprice, 5e-2)")).as("lo"),
        expr(Parity.q6("percentile(l_extendedprice, 95e-2)")).as("hi"))
      li.join(broadcast(bounds), "l_returnflag")
        .withColumn("clipped",
          least(greatest(col("l_extendedprice"), col("lo")), col("hi")))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), expr(fpSum("clipped")).as("sum_clipped"),
          min("lo").as("lo"), min("hi").as("hi"))
    }),
    // ROLLUP subtotal hierarchy (grouping sets; NULL marks subtotals in
    // both engines)
    "q1_rollup" -> ((s, dir) => {
      Tables.read(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), expr(fpSum("l_extendedprice")).as("sum_price"))
    }),
    // PIVOT: hourly event counts spread across event-type columns
    "q_events_pivot" -> ((s, dir) => {
      Tables.read(s, dir, "events")
        .withColumn("hour_epoch", expr(Parity.hourEpoch(Parity.SparkD, "ts")))
        .groupBy("hour_epoch")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
    }),
    // ratio-to-report: each (flag, status) cell's share of its flag's
    // total — the frameless window-aggregate shape (partition sum, no
    // ordering). The window runs over ALREADY-AGGREGATED fixed-point
    // BIGINTs, so the partition sum is exact under any evaluation order
    // and the share is one IEEE division
    "q_share" -> ((s, dir) => {
      val w = Window.partitionBy("l_returnflag")
      Tables.read(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(expr("sum(cast(floor(l_quantity * 1048576e0 + 5e-1) as bigint))").as("qty_fp"))
        .withColumn("share", expr("cast(qty_fp as double)") / sum("qty_fp").over(w).cast("double"))
        .select(col("l_returnflag"), col("l_linestatus"),
          expr("(qty_fp / 1048576e0)").as("sum_qty"), col("share"))
    }),
    // exact interpolated quantiles per group (Spark percentile ≡ DuckDB
    // quantile_cont up to ulps; q6-quantized)
    "q_percentiles" -> ((s, dir) => {
      Tables.read(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("grp"))
        .agg(
          expr(Parity.q6("percentile(l_extendedprice, 25e-2)")).as("p25"),
          expr(Parity.q6("percentile(l_extendedprice, 5e-1)")).as("p50"),
          expr(Parity.q6("percentile(l_extendedprice, 75e-2)")).as("p75"),
          expr(Parity.q6("percentile(l_discount, 5e-1)")).as("p50_disc"))
    }),
    // TPC-H Q6 shape: the filter-only revenue-delta aggregate — every
    // predicate (date range, discount band, quantity cap) is scan-level,
    // so the whole query is a pushed-down parquet scan + one partial
    // agg; PlanSpec asserts the PushedFilters line. Discount comparisons
    // are exact double compares on identical parquet values
    "q_forecast" -> ((s, dir) =>
      Tables.read(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01") &&
          col("l_discount") >= expr("2e-2") && col("l_discount") <= expr("8e-2") &&
          col("l_quantity") < expr("24e0"))
        .agg(expr(fpSum("l_extendedprice * l_discount")).as("revenue"),
          count(lit(1)).as("n_rows"))),
    // TPC-H Q3-shaped: date-filtered 3-way join, global top-10 by revenue
    "q_shipping" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
      val o = Tables.read(s, dir, "orders")
      val c = Tables.read(s, dir, "customer")
      li.filter(col("l_shipdate") > lit("1998-01-01"))
        .join(o.filter(col("o_orderdate") < lit("1998-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(c.filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey")
        .agg(expr(fpSum("l_extendedprice * (1e0 - l_discount)")).as("revenue"),
          // o_orderdate is TIMESTAMP_NTZ; session UTC makes the cast
          // epoch equal DuckDB's naive epoch_us
          expr("min(unix_micros(cast(o_orderdate as timestamp)) div 1000000)").as("order_epoch"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),
    // event-time tumbling hour buckets
    "q_events_window" -> ((s, dir) => EventOps.hourly(Tables.read(s, dir, "events"))),
    // JSON sink round-trip: the hourly aggregate written as JSON lines
    // and read back with its schema — with the parquet checkpoint
    // (mwu_checkpoint) and per-group CSV sink (mwu_sink) this puts every
    // sink format inside the oracle gate; doubles survive via Jackson's
    // shortest-round-trip rendering
    // ORC sink round-trip (same hourly agg, same oracle): with parquet
    // (checkpoint), CSV (per-group sink), JSON and bucketed tables this
    // closes the format matrix; ORC is binary so doubles round-trip
    // bit-exactly without the shortest-string dance
    "q_orc_sink" -> ((s, dir) => {
      val tmp = graft.Scratch.dir("graft_orc_")
      val agg = EventOps.hourly(Tables.read(s, dir, "events"))
      agg.write.mode("overwrite").orc(tmp)
      s.read.schema(agg.schema).orc(tmp)
    }),
    "q_json_sink" -> ((s, dir) => {
      val tmp = graft.Scratch.dir("graft_json_")
      val agg = EventOps.hourly(Tables.read(s, dir, "events"))
      Tables.writeJson(agg, tmp)
      Tables.readJson(s, tmp, agg.schema)
    }),
    // JSON prop extraction + aggregate
    "q_events_json" -> ((s, dir) => EventOps.propStats(Tables.read(s, dir, "events"))),
    // sessionization (lag + cumsum windows; epoch output for determinism)
    "q_sessions" -> ((s, dir) => {
      EventOps.sessionize(Tables.read(s, dir, "events"), gapMinutes = 30)
        .select(col("user_id"), col("session_id"), col("n_events"),
          expr("ts_min div 1000").as("start_us"),
          expr("ts_max div 1000").as("end_us"))
    }),
    // per-user trailing-window rolling aggregates (exact dyadic sums)
    "q_user_rolling" -> ((s, dir) => EventOps.rolling(Tables.read(s, dir, "events"))),
    // NATIVE session windows (session_window) — the declarative twin of
    // the lag+cumsum q_sessions and the flatMapGroupsWithState stream.
    // Boundary semantics the edge gate caught: Spark merges TOUCHING
    // windows (gap == 30min still merges; only gap > 30min splits), and
    // end = last event + gap — the oracle spells exactly that µs
    // lag/cumsum arithmetic
    "q_session_window" -> ((s, dir) =>
      Tables.read(s, dir, "events")
        .withColumn("tsm", timestamp_micros(expr("ts div 1000")))
        .groupBy(col("user_id"), session_window(col("tsm"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          expr("unix_micros(w.start)").as("start_us"),
          expr("unix_micros(w.end)").as("end_us"), col("n_events"))),
    // sliding event-time windows (1h / 15min)
    "q_events_sliding" -> ((s, dir) => EventOps.sliding(Tables.read(s, dir, "events"))),
    // Structured Streaming hourly agg — stream/batch differential: the
    // oracle is the BATCH hourly SQL
    "stream_hourly" -> ((s, dir) => graft.streaming.EventStream.runOnce(s, dir)),
    // watermark DROP-semantics differential: two staged micro-batches
    // with planted beyond-watermark (must drop) and within-watermark
    // late (must merge) rows; oracle = batch agg over the admitted set
    "stream_late_drop" -> ((s, dir) =>
      graft.streaming.EventStream.runLateDropOnce(s, dir)),
    // exactly-once foreachBatch MERGE sink: planted post-commit crash,
    // restart, re-delivered batch idempotently skipped; oracle = the
    // single-shot batch MERGE (no dupes, no losses)
    "stream_upsert" -> ((s, dir) =>
      graft.streaming.EventStream.runUpsertOnce(s, dir)),
    // streaming ANN index ingestion: micro-batches fold into the stored
    // IVF-PQ index via the exact append algebra; the served answer is
    // bit-identical to a batch rebuild (shares its oracle)
    "stream_ann_ingest" -> ((s, dir) =>
      graft.streaming.EventStream.runAnnIngestOnce(s, dir)),
    // streaming ANN index CRUD: interleaved append + DELETE micro-
    // batches (CDC-shaped op column) fold into the stored index via the
    // exact append algebra and the idempotent tombstone path; the
    // served answer after the mixed history is bit-identical to a
    // survivors-only batch rebuild (the fifth physical history on
    // ann_ivfpq_delete's oracle)
    "stream_ann_crud" -> ((s, dir) =>
      graft.streaming.EventStream.runAnnCrudOnce(s, dir)),
    // streaming SPARSE index CRUD: the same CDC history folded into the
    // token-bucketed posting index via the exact df-moment algebra +
    // idempotent doc tombstones; serve == survivors-only rebuild
    "stream_sparse_crud" -> ((s, dir) =>
      graft.streaming.EventStream.runSparseCrudOnce(s, dir)),
    // streaming NEAR-DUP index CRUD: seed build (freezing the stop cut
    // there) + CDC add/delete micro-batches from foreachBatch's CLONED
    // session (the r11 staleness shape) into the standing near-dup
    // index; the OUTER session's shard serve hash-matches one
    // declarative oracle with the deleted ids excluded
    "stream_neardup_crud" -> ((s, dir) =>
      graft.streaming.EventStream.runNearDupCrudOnce(s, dir)),
    // dropDuplicatesWithinWatermark state-TTL differential: dup with
    // live state drops, dup after expiry re-emits; oracle = the TTL
    // rule in set algebra
    "stream_dedup_ttl" -> ((s, dir) =>
      graft.streaming.EventStream.runDedupTtlOnce(s, dir)),
    // stateful-agg restart/recovery: one window's contributions split
    // across a checkpoint restart must combine; exactly-once file sink
    "stream_restart_agg" -> ((s, dir) =>
      graft.streaming.EventStream.runRestartAggOnce(s, dir)),
    // streaming trending top-k (12th pattern): the stream maintains the
    // incremental (hour, type) counts; top-k is a tiny batch window over
    // the emitted aggregate — the dashboard topology
    "stream_trending" -> ((s, dir) =>
      graft.streaming.EventStream.runTrendingOnce(s, dir)),
    // streaming drift ALERT (14th pattern): per-hour KS distance of the
    // hour's binned distribution vs the stream's reference — histogram
    // count state in the stream, exact ECDF arithmetic in the post-pass
    "stream_drift" -> ((s, dir) =>
      graft.streaming.EventStream.runDriftOnce(s, dir)),
    // streaming fixed-bin value histogram per hour (drift monitoring);
    // state bounded by hours×bins, oracle = identical batch aggregate
    "stream_histogram" -> ((s, dir) =>
      graft.streaming.EventStream.runHistogramOnce(s, dir)),
    // streaming dropDuplicates state — oracle is the batch distinct count
    "stream_dedup" -> ((s, dir) => graft.streaming.EventStream.runDedupOnce(s, dir)),
    // stateful MERGEABLE-SKETCH streaming: per-event_type HLL registers
    // in the state store (constant bytes/key), per-batch snapshot
    // emissions, final snapshot = the batch relational build exactly
    // (HLL insertion is idempotent+commutative) — shares Hll's spelling
    "stream_hll" -> ((s, dir) => graft.streaming.EventStream.runHllOnce(s, dir)),
    // streaming CDC latest-row materialized view (complete-mode max_by,
    // one state row per key) — shares the batch q_latest oracle
    "stream_latest" -> ((s, dir) =>
      graft.streaming.EventStream.runLatestOnce(s, dir)),
    // stateful streaming EWMA (last-7 fixed-point buffer per user, the
    // smallest state of the stateful patterns) — shares the batch
    // q_ewma oracle bit-for-bit
    "stream_ewma" -> ((s, dir) =>
      graft.streaming.EventStream.runEwmaOnce(s, dir)),
    // stateful streaming TWAP: one pending reading + three accumulators
    // per user; hours emit exactly when the first later-hour event
    // arrives (oracle = batch TWAP restricted to complete hours)
    "stream_twap" -> ((s, dir) =>
      graft.streaming.EventStream.runTwapOnce(s, dir)),
    // stream-static broadcast enrichment join — oracle is the batch join
    "stream_join" -> ((s, dir) => graft.streaming.EventStream.runJoinOnce(s, dir)),
    // stateful sessionization (flatMapGroupsWithState) — closed sessions
    // equal the batch sessions minus each user's open tail
    "stream_sessions" -> ((s, dir) => graft.streaming.EventStream.runSessionsOnce(s, dir)),
    // stateful trailing-window anomaly scoring — the streaming twin of
    // q_anomaly, custom per-user fixed-point state; full stream/batch
    // differential (shares the batch oracle row-for-row)
    "stream_anomaly" -> ((s, dir) => graft.streaming.EventStream.runAnomalyOnce(s, dir)),
    // calendar rollup: year/month extraction (o_orderdate is NTZ — both
    // engines extract the same naive calendar fields)
    "q_calendar" -> ((s, dir) =>
      Tables.read(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"))
        .agg(count(lit(1)).as("n_orders"), expr(fpSum("o_totalprice")).as("revenue"))),
    // set operations: customer cohorts by order year — intersect/except
    "q_setops" -> ((s, dir) => {
      val o = Tables.read(s, dir, "orders")
        .select(col("o_custkey"), year(col("o_orderdate")).as("y"))
      val a = o.filter(col("y") <= 1995).select("o_custkey").distinct()
      val b = o.filter(col("y") >= 1996).select("o_custkey").distinct()
      val both = a.intersect(b).agg(count(lit(1)).as("n")).select(lit("both").as("cohort"), col("n"))
      val onlyA = a.except(b).agg(count(lit(1)).as("n")).select(lit("early_only").as("cohort"), col("n"))
      val onlyB = b.except(a).agg(count(lit(1)).as("n")).select(lit("late_only").as("cohort"), col("n"))
      both.union(onlyA).union(onlyB)
    }),
    // ntile quartiles of event value per type (deterministic total order)
    "q_events_ntile" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy(col("value").asc, col("event_id").asc)
      Tables.read(s, dir, "events")
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .groupBy("event_type", "quartile")
        .agg(count(lit(1)).as("n"), expr(fpSum("value")).as("v"))
    }),
    // rows above their group's exact mean (correlated-aggregate compare;
    // the mean is a fixed-point ratio, so the comparison is deterministic)
    "q_above_avg" -> ((s, dir) => {
      val w = Window.partitionBy("l_returnflag")
      Tables.read(s, dir, "lineitem")
        .withColumn("grp_sum", expr(
          "sum(cast(floor(l_extendedprice * 1048576e0 + 5e-1) as bigint))").over(w))
        .withColumn("grp_n", count(lit(1)).over(w))
        .withColumn("grp_avg", (col("grp_sum") / lit(1048576.0)) / col("grp_n").cast("double"))
        .filter(col("l_extendedprice") > col("grp_avg"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_above"), expr(fpSum("l_extendedprice")).as("sum_above"))
    }),
    // CUBE grouping-set lattice over the Q1 keys (rollup's sibling)
    "q1_cube" -> ((s, dir) =>
      Tables.read(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), expr(fpSum("l_extendedprice")).as("sum_price"))),
    // anti join (Q22 shape): customers with no URGENT order, per segment
    "q_anti_join" -> ((s, dir) => {
      val c = Tables.read(s, dir, "customer")
      val o = Tables.read(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_idle"), expr(fpSum("c_acctbal")).as("acctbal_sum"))
    }),
    // semi join: customers with at least one URGENT order, per nation
    "q_semi_join" -> ((s, dir) => {
      val c = Tables.read(s, dir, "customer")
      val o = Tables.read(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n_urgent_cust"))
    }),
    // lead window: inter-event gap seconds per user, aggregated per type
    // (exact integer gaps; avg is a single division)
    "q_events_lead" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      Tables.read(s, dir, "events")
        .withColumn("nxt", lead("ts", 1).over(w))
        .filter(col("nxt").isNotNull)
        .withColumn("gap_sec", expr("(nxt - ts) div 1000000000"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          sum("gap_sec").as("sum_gap_sec"),
          max("gap_sec").as("max_gap_sec"))
        .withColumn("avg_gap_sec",
          col("sum_gap_sec").cast("double") / col("n_gaps").cast("double"))
    }),
    // DAILY cohort retention matrix with rates — the fine-grained
    // sibling of the weekly q_retention: cell (cohort, offset) carries
    // distinct returning users, the cohort size, AND the rate; runs on
    // the (user, day) grid, the event stream is touched once
    "q_retention_daily" -> ((s, dir) =>
      EventOps.retention(Tables.read(s, dir, "events"))),
    // as-of join: each purchase enriched with the user's latest
    // at-or-before click (EventOps.asofJoin — the merge-shape temporal
    // enrichment, one shuffle + one sort, never a per-row range scan)
    "q_asof" -> ((s, dir) => {
      val ev = Tables.read(s, dir, "events")
      val left = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id")
      val right = ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "event_id", "value")
      EventOps.asofJoin(left, right, "user_id", "ts", "event_id",
          payload = Seq("event_id", "ts", "value"))
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000000000").as("ts_sec"),
          col("asof_event_id").as("click_id"),
          col("asof_value").as("click_value"),
          expr("(ts - asof_ts) div 1000000000").as("gap_sec"))
    }),
    // 2D skyline (Pareto front: min price AND min quantity per flag) —
    // the preference-query operator. Scale-correct two-phase plan: a
    // LOCAL skyline per (flag, hash-bucket) via sort + strict prefix-min
    // prunes every locally-dominated point (sound: a point dominated in
    // any subset is dominated globally), then the tiny survivor set pays
    // the global per-flag pass; the oracle is the direct single-pass
    // spelling, equal by the pruning theorem
    "q_skyline" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val pts = Tables.read(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          col("l_extendedprice").as("price"), col("l_quantity").as("qty"))
        .distinct()
        .withColumn("bkt", expr("pmod(hash(price, qty), 16)"))
      def skyline(df: DataFrame, parts: Seq[String]): DataFrame = {
        val w = Window.partitionBy(parts.map(col): _*)
          .orderBy(col("price").asc, col("qty").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        df.withColumn("pm", min("qty").over(w))
          .filter(col("pm").isNull || col("pm") > col("qty"))
          .drop("pm")
      }
      skyline(skyline(pts, Seq("flag", "bkt")), Seq("flag"))
        .select("flag", "price", "qty")
    }),
    // golden-record survivorship (MDM): fuzzy name pairs -> min-label
    // clusters -> one surviving record per entity cluster with field-
    // level survivorship rules (min key, longest name with
    // lexicographically-greatest tie-break via struct max, max price) —
    // the entity-resolution composition over three proven components
    "q_golden" -> ((s, dir) => {
      val part = Tables.read(s, dir, "part")
      val pairs = graft.operators.TextOps.fuzzyPairs(part, "p_name")
      val ids = part.groupBy(col("p_name").as("name"))
        .agg(min("p_partkey").as("nid"))
      val e = pairs
        .join(ids.select(col("name").as("name_a"), col("nid").as("doc_a")), "name_a")
        .join(ids.select(col("name").as("name_b"), col("nid").as("doc_b")), "name_b")
        .select("doc_a", "doc_b")
      val clusters = graft.operators.Dedup.clusterLabels(e)
      part.join(ids, col("p_name") === col("name"))
        .join(clusters, col("nid") === col("doc_id"), "left")
        .withColumn("cluster", coalesce(col("cluster_id"), col("nid")))
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_members"),
          min("p_partkey").as("golden_key"),
          expr("max(struct(length(p_name) as l, p_name as nm)).nm").as("name"),
          max("p_retailprice").as("max_price"))
    }),
    // bitmap-index conjunction: per-dimension bit_or word packing, then
    // the two-dim count via word-aligned AND + popcount — the fact table
    // is read once to build the indexes and never again
    "q_bitmap" -> ((s, dir) =>
      EventOps.bitmapConjunction(Tables.read(s, dir, "events"))),
    // incremental view maintenance: base aggregate + delta batch merged
    // by summing partial states (count/fpSum are monoids) — oracle is
    // the full recompute, hash equality proves the merge exact
    "q_incr_agg" -> ((s, dir) =>
      EventOps.hourlyIncremental(Tables.read(s, dir, "events"))),
    // SCD Type-2 dimension build: compress the per-user update stream
    // into versioned validity intervals (run-collapse on the tiered
    // attribute, then version/valid_to/is_current windows) — one shuffle
    // on the dimension key, three windows over one sort
    "q_scd2" -> ((s, dir) => EventOps.scd2(Tables.read(s, dir, "events"))),
    // streaming SCD2 maintenance (13th pattern): per-key state = the one
    // OPEN version; arriving updates close/extend it, emitting finished
    // validity intervals — oracle is the batch SCD2 closed-version set
    "stream_scd2" -> ((s, dir) =>
      graft.streaming.EventStream.runScd2Once(s, dir)),
    // per-user hourly gap-fill + linear interpolation: dense hour axis
    // GENERATED per key (sequence+explode, span capped — output is
    // keys x span regardless of input rows), bracketing observations via
    // two ignore-nulls windows, bit-exact interpolation arithmetic
    "q_gapfill" -> ((s, dir) => EventOps.gapfill(Tables.read(s, dir, "events"))),
    // cumulative distinct users per day (growth analytics): windowed
    // COUNT DISTINCT doesn't exist — the first-occurrence flag (min day
    // per user) + day-grid cumulative sum is the scale-correct spelling
    "q_cumulative_users" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val firstDay = Tables.read(s, dir, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("d"))
        .groupBy("user_id").agg(min("d").as("first_d"))
        .groupBy(col("first_d").as("d")).agg(count(lit(1)).as("new_users"))
      val active = Tables.read(s, dir, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("d"))
        .distinct()
        .groupBy("d").agg(count(lit(1)).as("active_users"))
      val w = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      active.join(firstDay, Seq("d"), "left")
        .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
        .withColumn("cum_users", sum("new_users").over(w))
        .select("d", "active_users", "new_users", "cum_users")
    }),
    // RFM segmentation (CRM staple): per-user recency/frequency/monetary
    // -> quintiles via the GRID-cumulative rank path (per distinct
    // metric value: users-below count from a grid-sized window; bucket =
    // floor(5*rank_below/total) — never a single-partition ntile over
    // the user relation) -> segment histogram
    "q_rfm" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.read(s, dir, "events")
      val rfm = ev.groupBy("user_id").agg(
        max("ts").as("r"), count(lit(1)).as("f"),
        expr(fpSum("value")).as("m"))
      val nUsers = rfm.agg(count(lit(1)).as("nu"))
      def quintile(metric: String): DataFrame = {
        val grid = rfm.groupBy(col(metric).as("v")).agg(count(lit(1)).as("nv"))
        val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
        grid.withColumn("below", coalesce(sum("nv").over(w), lit(0L)))
          .crossJoin(broadcast(nUsers))
          // bucket 1..5 by the fraction of users strictly below this value
          .withColumn(s"q_$metric", expr("least(4, (below * 5) div nu) + 1"))
          .select(col("v").as(metric), col(s"q_$metric"))
      }
      rfm.join(quintile("r"), "r").join(quintile("f"), "f").join(quintile("m"), "m")
        .groupBy("q_r", "q_f", "q_m")
        .agg(count(lit(1)).as("n_users"))
    }),
    // period-over-period reporting: monthly revenue per returnflag with
    // lag delta and percent change — the MoM dashboard staple; exact
    // fixed-point revenue, IEEE-exact ratio of identical operands
    "q_mom_change" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_returnflag").orderBy("m")
      Tables.read(s, dir, "lineitem")
        .groupBy(col("l_returnflag"),
          expr("(year(l_shipdate) * 12 + month(l_shipdate))").cast("long").as("m"))
        .agg(expr(fpSum("l_extendedprice")).as("rev"))
        .withColumn("prev", lag(col("rev"), 1).over(w))
        .withColumn("delta", col("rev") - col("prev"))
        .withColumn("pct", expr(
          "case when prev is null or prev = 0e0 then null else (rev - prev) / prev end"))
        .select("l_returnflag", "m", "rev", "prev", "delta", "pct")
    }),
    // gaps-and-islands: maximal runs of consecutive ACTIVE HOURS per
    // user via the h - dense_rank constancy trick — one sort carries
    // the rank and the island aggregate keys off the derived constant
    "q_islands" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("h")
      Tables.read(s, dir, "events")
        .select(col("user_id"), expr("ts div 3600000000000").as("h"))
        .distinct()
        .withColumn("grpk", col("h") - dense_rank().over(w).cast("long"))
        .groupBy("user_id", "grpk")
        .agg(min("h").as("h_start"), max("h").as("h_end"),
          count(lit(1)).as("n_hours"))
        .drop("grpk")
    }),
    // first-order Markov transitions (path analysis): per-user lag
    // window -> pair counts -> exact-ratio transition probabilities
    "q_transitions" -> ((s, dir) =>
      EventOps.transitions(Tables.read(s, dir, "events"))),
    // streaming transition extraction (15th pattern): one-string-per-user
    // state, each event emits (from, to) and replaces it; matrix built
    // in the batch post-pass — oracle is the batch lag-window spelling
    "stream_transitions" -> ((s, dir) =>
      graft.streaming.EventStream.runTransitionsOnce(s, dir)),
    // temporal-proximity range "join" as a RANGE window frame: per event,
    // how many of the same user's events land in the following 10 minutes
    // — the frame shares the sessionization shuffle shape and is the
    // scale-correct rendering of a bounded self range join
    // stream-stream interval join (purchases ⋈ same-user clicks within
    // the prior 2 h) — watermarked both sides, append mode, AvailableNow;
    // oracle = the identical batch micro-precision range join
    "stream_interval" -> ((s, dir) =>
      graft.streaming.EventStream.runIntervalOnce(s, dir)),
    // TPC-H Q4 shape: correlated EXISTS as a left-semi join with a
    // non-equi residual (orders with a lineitem shipped >60 days after
    // the order date), counted per priority
    "q_exists" -> ((s, dir) => {
      val o = Tables.read(s, dir, "orders")
      val li = Tables.read(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      o.join(li, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("interval 60 days"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_late_orders"))
    }),
    // TPC-H Q7 shape: cross-nation trade volume — fact joins supplier and
    // customer sides, each resolved to its nation (tiny dims broadcast),
    // aggregated per ordered nation pair
    "q_nation_volume" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val sup = Tables.read(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val o = Tables.read(s, dir, "orders").select("o_orderkey", "o_custkey")
      val c = Tables.read(s, dir, "customer").select("c_custkey", "c_nationkey")
      val n = Tables.read(s, dir, "nation").select("n_nationkey", "n_name")
      li.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n.select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sk"))
        .join(broadcast(n.select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("ck"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(count(lit(1)).as("n_items"),
          expr(fpSum("l_extendedprice * (1e0 - l_discount)")).as("volume"))
    }),
    // TPC-H Q14 shape: promo revenue share per ship month — conditional
    // aggregation over a fact⋈dim join (no broadcast hint: part is
    // SF-proportional, AQE picks broadcast at small SF and shuffle at 100×)
    "q_promo_share" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
        .select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
      val p = Tables.read(s, dir, "part").select("p_partkey", "p_type")
      li.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(year(col("l_shipdate")).cast("long").as("y"),
          month(col("l_shipdate")).cast("long").as("m"))
        .agg(
          expr(fpSum("case when p_type = 'PROMO' then l_extendedprice * (1e0 - l_discount) else 0e0 end"))
            .as("promo_revenue"),
          expr(fpSum("l_extendedprice * (1e0 - l_discount)")).as("total_revenue"))
        .withColumn("promo_share",
          lit(100e0) * col("promo_revenue") / col("total_revenue"))
    }),
    // TPC-H Q13 shape: customer order-count distribution — LEFT OUTER
    // join (zero-order customers must survive) + two-level aggregation
    "q_cust_dist" -> ((s, dir) => {
      val c = Tables.read(s, dir, "customer").select("c_custkey")
      val o = Tables.read(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_custkey", "o_orderkey")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
    }),
    // TPC-H Q17 shape: revenue lost to small orders — correlated per-part
    // mean rendered as a window sharing the join's partitioning (the
    // avg is an exact integral-sum ratio, so the comparison is
    // deterministic); one row out
    "q_avg_yearly" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val p = Tables.read(s, dir, "part")
        .filter(col("p_brand") === "Brand#1").select("p_partkey")
      val w = Window.partitionBy("l_partkey")
      li.join(p, col("l_partkey") === col("p_partkey"))
        .withColumn("avg_qty",
          sum("l_quantity").over(w) / count(lit(1)).over(w).cast("double"))
        .filter(col("l_quantity") < lit(2e-1) * col("avg_qty"))
        .agg(count(lit(1)).as("n_small"),
          (expr(fpSum("l_extendedprice")) / lit(7e0)).as("avg_yearly"))
    }),
    // TPC-H Q18 shape: large-volume orders — HAVING on a fact rollup,
    // joined back to orders + customer, global top-100
    "q_large_orders" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem").select("l_orderkey", "l_quantity")
      val big = li.groupBy("l_orderkey")
        .agg(sum("l_quantity").as("sum_qty"))
        .filter(col("sum_qty") > 150)
      val o = Tables.read(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      val c = Tables.read(s, dir, "customer").select("c_custkey", "c_name")
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          expr("unix_micros(cast(o_orderdate as timestamp)) div 1000000").as("order_epoch"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    }),
    // TPC-H Q19 shape: OR-of-ANDs join residual — the disjunction mixes
    // part and lineitem predicates per arm, so Catalyst must extract the
    // common l_quantity/p_size bounds as pushdown-able conjuncts while
    // the full disjunction stays a join residual
    "q_disjunctive" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      val p = Tables.read(s, dir, "part").select("p_partkey", "p_brand", "p_size")
      li.join(p, col("l_partkey") === col("p_partkey"))
        .filter(expr(disjunctiveArms))
        .agg(count(lit(1)).as("n_items"),
          expr(fpSum("l_extendedprice * (1e0 - l_discount)")).as("revenue"))
    }),
    // relative-standing windows: percent_rank + cume_dist of each
    // event's value within its type — both are exact integer ratios
    // (rank−1)/(n−1) and n_le/n, so bit-deterministic in both engines
    "q_events_cume" -> ((s, dir) => {
      val w = Window.partitionBy("event_type")
        .orderBy(col("value").asc, col("event_id").asc)
      Tables.read(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
    }),
    "q_events_range" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc)
        .rangeBetween(Window.currentRow, 600L * 1000000000L)
      Tables.read(s, dir, "events")
        .withColumn("n_next_10m", count(lit(1)).over(w) - 1L)
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000000000").as("ts_sec"), col("n_next_10m"))
    }),
    // PageRank over the part co-purchase graph: 5 power iterations as
    // pure dataflow (join + fpSum aggregate per round, localCheckpoint
    // per round so lineage stays flat); oracle = the identical iteration
    // unrolled as materialized CTEs
    "graph_pagerank" -> ((s, dir) =>
      graft.operators.Graph.pageRank(Tables.read(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey"))),
    // triangle counting with degree orientation: each triangle generated
    // once at its (deg, id)-minimum vertex; wedge fan-out bounded by
    // out-degree (the hub-proof plan). Exact integer counts
    // synchronous label-propagation communities (self-vote + min-label
    // tie-break -> bit-reproducible fixed-round output); per round one
    // node-keyed join + count + argmax window, label frame checkpointed
    "graph_lpa" -> ((s, dir) =>
      graft.operators.Graph.labelCommunities(Tables.read(s, dir, "lineitem"))),
    "graph_triangles" -> ((s, dir) =>
      graft.operators.Graph.triangles(Tables.read(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey"))),
    // blocked fuzzy self-join (entity resolution): last-token blocking +
    // Levenshtein ≤ 3 over distinct part names — candidate generation is
    // linear in block sizes, never all-pairs
    "fuzzy_pairs" -> ((s, dir) =>
      graft.operators.TextOps.fuzzyPairs(Tables.read(s, dir, "part"), "p_name")),
    // classical statistics from order-free fixed-point moment sums (the
    // engines' own corr/covar are partitioning-dependent in the low
    // bits): per-group Pearson r, OLS fit, Welch t group-vs-rest, and a
    // chi-square independence test with Wilson–Hilferty + Cody-erfc p.
    // The price column is pre-scaled by an exact power of two to honor
    // the fixed-point overflow contract (Stats scaladoc).
    "stat_corr" -> ((s, dir) =>
      Stats.corr(Tables.read(s, dir, "lineitem"), "l_returnflag",
        "l_quantity", "(l_extendedprice / 1024e0)")),
    "stat_ols" -> ((s, dir) =>
      Stats.ols(Tables.read(s, dir, "lineitem"), "l_returnflag",
        "l_quantity", "(l_extendedprice / 1024e0)")),
    "stat_ttest" -> ((s, dir) =>
      Stats.welchT(Tables.read(s, dir, "lineitem"), "l_returnflag",
        "l_discount")),
    // Poisson bootstrap of the per-group price mean: 32 deterministic
    // replicates in ONE map-side-combined pass — the scale-out CI
    // machinery (each row's replicate weights derive from a hash, so no
    // global resampling pass exists anywhere)
    // two-sample Kolmogorov-Smirnov over binned ECDFs: the distribution-
    // free drift test next to the MWU location test — grid aggregate,
    // grid-sized cumulative window, exact integer ECDF ratios
    "stat_ks" -> ((s, dir) => Stats.ks(Tables.read(s, dir, "events"))),
    // robust dispersion: median absolute deviation as TWO deterministic
    // histogram-median passes (no fact shuffle either pass)
    "stat_mad" -> ((s, dir) =>
      Quantiles.mad(Tables.read(s, dir, "lineitem"), "l_extendedprice")),
    // Gini concentration of per-user value mass: tie-averaged rank-sum
    // identity over the value grid (the aggregated-rank path), exact
    // BIGINT until one division
    "stat_gini" -> ((s, dir) => Stats.gini(Tables.read(s, dir, "events"))),
    // mutual information I(event_type; value tier): cell-sized joint +
    // broadcast marginals, per-cell ln on the 1e-9 unit grid, exact
    // BIGINT term sum — the feature-selection dependence statistic
    "stat_mi" -> ((s, dir) => Stats.mutualInfo(Tables.read(s, dir, "events"))),
    // join-key skew profile (the pre-flight before a 100 TB shuffle
    // join): per-key multiplicities collapse to the count GRID, then
    // key count / max / p99 (grid-cumulative) / mean / skew ratio — the
    // numbers that decide salting or AQE skew thresholds
    "q_skew_profile" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val keys = Tables.read(s, dir, "lineitem")
        .groupBy("l_partkey").agg(count(lit(1)).as("c"))
      val grid = keys.groupBy("c").agg(count(lit(1)).as("nk"))
      val w = Window.orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = grid.agg(sum("nk").as("n_keys"), sum(expr("c * nk")).as("n_rows"),
        max("c").as("max_c"))
      val p99 = grid.withColumn("cum", sum("nk").over(w))
        .crossJoin(broadcast(tot))
        .filter(expr("cum * 100 >= n_keys * 99"))
        .agg(min("c").as("p99_c"))
      tot.crossJoin(broadcast(p99))
        .selectExpr("n_keys", "n_rows", "max_c", "p99_c",
          "cast(n_rows as double) / cast(n_keys as double) as mean_c",
          "cast(max_c as double) / (cast(n_rows as double) / cast(n_keys as double)) as skew_ratio")
    }),
    // table profiling (the ANALYZE-TABLE primitive feeding a CBO): one
    // scan via stack -> per-column count/ndv/min/max/mean — the stats
    // collection pass a warehouse runs before planning
    "q_profile" -> ((s, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val stackArgs = cols.map(c => s"'$c', $c").mkString(", ")
      Tables.read(s, dir, "lineitem")
        .selectExpr(s"stack(${cols.size}, $stackArgs) as (col_name, v)")
        .groupBy("col_name")
        .agg(count(lit(1)).as("n"), count(col("v")).as("n_nonnull"),
          countDistinct(col("v")).as("ndv"),
          min("v").as("mn"), max("v").as("mx"),
          expr(s"${fpSum("v")} / cast(count(v) as double)").as("mean"))
    }),
    // lag-1..3 autocorrelation of the hourly series: Pearson over the
    // lag-joined hour grid — corr's moment/guard discipline verbatim
    "ts_acf" -> ((s, dir) => Stats.acf(Tables.read(s, dir, "events"))),
    "stat_bootstrap" -> ((s, dir) =>
      Stats.bootstrap(Tables.read(s, dir, "lineitem"), "l_returnflag",
        "(l_extendedprice / 1024e0)",
        "concat(cast(l_orderkey as string), '_', cast(l_linenumber as string))")),
    "stat_chisq" -> ((s, dir) => {
      val j = Tables.read(s, dir, "orders").join(
        Tables.read(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      Stats.chisq(j, "c_mktsegment", "o_orderpriority")
    }),
    // explicit GROUPING SETS lattice (beyond rollup/cube: a hand-picked
    // set of grouping combinations) with grouping() flags disambiguating
    // the NULL-as-total rows from genuine NULL keys — one Expand + one
    // hash agg, the flags are free
    "q_grouping_sets" -> ((s, dir) => {
      Tables.read(s, dir, "lineitem").createOrReplaceTempView("li_gs")
      s.sql(groupingSetsSql("li_gs"))
    }),
    // conversion funnel view → click → purchase: stage k's timestamp is
    // the user's FIRST stage-k event strictly after their stage-(k−1)
    // time — three conditional-min aggs, every shuffle keyed on user_id
    // so AQE coalesces them onto one partitioning
    "q_funnel" -> ((s, dir) => {
      // µs granularity throughout: DuckDB truncates TIMESTAMP(NANOS) to
      // its µs timestamp, so sub-µs nanos must never reach a comparison
      // or an output column
      val e = Tables.read(s, dir, "events")
        .select(col("user_id"), col("event_type"), expr("ts div 1000").as("us"))
      val g1 = e.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("us"))).as("t1"))
      val g2 = e.join(g1, "user_id").groupBy("user_id")
        .agg(min(when(col("event_type") === "click" && col("us") > col("t1"),
          col("us"))).as("t2"))
      val g3 = e.join(g2, "user_id").groupBy("user_id")
        .agg(min(when(col("event_type") === "purchase" && col("us") > col("t2"),
          col("us"))).as("t3"))
      g1.join(g2, "user_id").join(g3, "user_id")
        .select(col("user_id"), col("t1"), col("t2"), col("t3"),
          expr("case when t3 is not null then 3 when t2 is not null then 2 " +
            "when t1 is not null then 1 else 0 end").cast("long").as("stage"))
    }),
    // weekly retention cohorts: users grouped by first-active week, one
    // row per (cohort, week offset) with distinct active users — pure
    // integer day/week arithmetic on the nanosecond epoch
    "q_retention" -> ((s, dir) => {
      val d = Tables.read(s, dir, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
        .distinct()
      val f = d.groupBy("user_id").agg(min("day").as("fday"))
      d.join(f, "user_id")
        .select(col("user_id"), expr("fday div 7").as("cohort_week"),
          expr("(day - fday) div 7").as("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct("user_id").as("n_users"))
    }),
    // MERGE/upsert (SCD-style dimension maintenance) as a full-outer
    // join: order-derived changes apply onto the customer snapshot —
    // matched keys update, unmatched-change keys insert, untouched rows
    // carry over; Spark OSS has no MERGE INTO, this IS the Spark-first
    // spelling (one co-partitioned full outer join, no driver loop)
    "q_upsert" -> ((s, dir) => {
      val changes = Tables.read(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1998-01-01"))
        .select(expr("case when o_custkey % 10 = 0 then o_custkey + 10000000 " +
          "else o_custkey end").as("u_key"), col("o_totalprice"))
        .groupBy("u_key")
        .agg(count(lit(1)).as("n_orders"),
          expr(fpSum("o_totalprice")).as("delta"))
      Tables.read(s, dir, "customer").select("c_custkey", "c_acctbal")
        .join(changes, col("c_custkey") === col("u_key"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("u_key")).as("key"),
          expr("coalesce(c_acctbal, 0e0) + coalesce(delta, 0e0)").as("acctbal_new"),
          expr("case when c_custkey is null then 'insert' " +
            "when u_key is null then 'carry' else 'update' end").as("action"))
    }),
    // deterministic fixed-grid histogram quantiles of the price column —
    // the order-free (hence oracle-checkable) stand-in for
    // approx_percentile: exact bin counts, estimate = first bin edge
    // reaching ⌈p·N⌉, error ≤ one bin width; the fact column never
    // shuffles (two map-side-combined aggs + a 64-row window)
    "sketch_quantiles" -> ((s, dir) =>
      Quantiles.hist(Tables.read(s, dir, "lineitem"), "l_extendedprice")),
    // TPC-H Q5 shape: local-supplier volume — the distinctive join is the
    // EQUALITY BETWEEN TWO DIMENSION KEYS (c_nationkey = s_nationkey)
    // threaded through the fact: lineitem⋈orders⋈customer⋈supplier with
    // the customer/supplier nations constrained equal, then the tiny
    // nation⋈region chain broadcast on top
    "q_local_supplier" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val o = Tables.read(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
        .select("o_orderkey", "o_custkey")
      val c = Tables.read(s, dir, "customer").select("c_custkey", "c_nationkey")
      val su = Tables.read(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val n = Tables.read(s, dir, "nation")
      val r = Tables.read(s, dir, "region").filter(col("r_name") === "ASIA")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(expr(fpSum("l_extendedprice * (1e0 - l_discount)")).as("revenue"),
          count(lit(1)).as("n_items"))
    }),
    // partitioned-layout sink: write documents hive-partitioned by lang,
    // read back ONE partition — the scan must prune to that directory
    // (PartitionFilters, asserted in PlanSpec): the data-layout story
    // that turns a 100 TB full scan into a per-language slice
    "sink_partitioned" -> ((s, dir) => {
      val tmp = graft.Scratch.dir("graft_part_")
      Tables.read(s, dir, "documents")
        .select("doc_id", "lang", "source", "n_chars")
        .write.mode("overwrite").partitionBy("lang").parquet(tmp)
      s.read.parquet(tmp).filter(col("lang") === "en")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
    }),
    // small-files compaction: a fragmented table (32 shard files — the
    // streaming-ingest debris every lakehouse accumulates) rewritten
    // into 4 right-sized files with coalesce (no shuffle: file merge is
    // a read-side concat), then queried. The aggregate is layout-
    // independent (that's what makes it oracle-checkable); the file-count
    // drop itself is asserted in OperatorsSpec
    "sink_compact" -> ((s, dir) => {
      val frag = graft.Scratch.dir("graft_frag_")
      val compact = graft.Scratch.dir("graft_comp_")
      Tables.read(s, dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_quantity")
        .repartition(32)
        .write.mode("overwrite").parquet(frag)
      s.read.parquet(frag).coalesce(4)
        .write.mode("overwrite").parquet(compact)
      s.read.parquet(compact)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), expr(fpSum("l_quantity")).as("sum_qty"))
    }),
    // TPC-H Q8 shape: a nation's market share of one region's revenue
    // per order year — the fact resolves BOTH endpoints (customer side
    // gates the region, supplier side labels the competitor), and the
    // share is a conditional-fpSum ratio; supplier/customer join with no
    // hints (SF-proportional — AQE decides), nation/region broadcast
    "q_market_share" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val o = Tables.read(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
      val c = Tables.read(s, dir, "customer").select("c_custkey", "c_nationkey")
      val su = Tables.read(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val n = Tables.read(s, dir, "nation")
      val r = Tables.read(s, dir, "region").filter(col("r_name") === "AMERICA")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n.select(col("n_nationkey").as("cnk"), col("n_regionkey"))),
          col("c_nationkey") === col("cnk"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("snk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("y"))
        .agg(
          expr(fpSum("case when supp_nation = 'NATION_1' then l_extendedprice * (1e0 - l_discount) else 0e0 end"))
            .as("nation_volume"),
          expr(fpSum("l_extendedprice * (1e0 - l_discount)")).as("total_volume"))
        .withColumn("mkt_share", col("nation_volume") / col("total_volume"))
    }),
    // TPC-H Q10 shape: returned-item revenue — one-quarter orders join
    // the 'R'-flagged fact, per-customer rollup carries the nation label
    // through the aggregate, global top-20 by lost revenue
    "q_returned" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val o = Tables.read(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01") &&
          col("o_orderdate") < lit("1997-07-01"))
        .select("o_orderkey", "o_custkey")
      val c = Tables.read(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
      val n = Tables.read(s, dir, "nation").select("n_nationkey", "n_name")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(expr(fpSum("l_extendedprice * (1e0 - l_discount)")).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),
    // TPC-H Q21 topology: suppliers who were the SOLE late supplier on a
    // multi-supplier order. The reference shape is a double correlated
    // subquery (EXISTS another supplier / NOT EXISTS another late one);
    // the scale-correct Spark rendering is one per-(order, supplier)
    // aggregate plus order-level windows SHARING that shuffle's
    // partitioning — the fact shuffles once on l_orderkey, then once
    // more key-sized on the supplier rollup; top-10 by orderBy+limit
    "q_waiting" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
      val o = Tables.read(s, dir, "orders").select("o_orderkey", "o_orderdate")
      val perSupp = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          (col("l_shipdate") > col("o_orderdate") + expr("interval 30 days")).cast("int"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max("late").as("late"))
      val w = Window.partitionBy("l_orderkey")
      val credited = perSupp
        .withColumn("n_supp", count(lit(1)).over(w))
        .withColumn("n_late", sum("late").over(w))
        .filter(col("late") === 1 && col("n_late") === 1 && col("n_supp") > 1)
      val counts = credited.groupBy("l_suppkey")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("l_suppkey").asc)
        .limit(10)
      counts.join(Tables.read(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
    }),
    // ranking/navigation window-function SUITE in one gate — the SQL
    // surface a migrating user reaches for daily: percent_rank,
    // cume_dist, ntile, lag/lead with offsets + defaults, nth_value,
    // and running first/last over an explicit ROWS frame. The synthetic
    // lineitem has duplicate (l_orderkey, l_linenumber) pairs, so the
    // sort key also carries l_quantity and l_extendedprice: rows tied
    // on the FULL key are interchangeable for every output column
    // (the navigated value l_quantity is itself in the key), making
    // the output multiset order-invariant — full hash gate, no
    // quantization (percent_rank/cume_dist are exact integer ratios)
    "q_window_suite" -> ((s, dir) => {
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
          col("l_quantity").asc, col("l_extendedprice").asc)
      val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.read(s, dir, "lineitem")
        .filter(col("l_orderkey") % 7 === 0) // keep the gate row count sane
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_returnflag"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          ntile(7).over(w).cast("long").as("bucket"),
          lag(col("l_quantity"), 2, -1.0).over(w).as("lag2"),
          lead(col("l_quantity"), 3, -1.0).over(w).as("lead3"),
          nth_value(col("l_quantity"), 5).over(wr).as("nth5"),
          first(col("l_quantity")).over(wr).as("first_q"),
          last(col("l_quantity")).over(wr).as("last_q"))
    }),
    // string-function SUITE in one gate — the everyday scalar surface a
    // migrating user expects, restricted to functions whose semantics
    // are provably identical across engines (char-based, 1-indexed,
    // empty-on-out-of-range): translate, reverse, lpad/rpad, repeat,
    // left/right, replace, instr, split_part, ascii (codepoint of the
    // first char — exercised on multibyte text by the edge dataset),
    // char_length, concat_ws. One row per document, no shuffle
    "q_string_suite" -> ((s, dir) =>
      Tables.read(s, dir, "documents").selectExpr(
        "doc_id",
        "substring(trim(coalesce(text, '')), 1, 40) as s40",
        "translate(substring(trim(coalesce(text, '')), 1, 40), 'aeiou', '01234') as tr",
        "reverse(substring(trim(coalesce(text, '')), 1, 12)) as rev",
        "lpad(substring(trim(coalesce(text, '')), 1, 7), 12, '*') as lp",
        "rpad(substring(trim(coalesce(text, '')), 1, 7), 12, '#') as rp",
        "repeat(substring(trim(coalesce(text, '')), 1, 3), 3) as rep",
        "left(trim(coalesce(text, '')), 5) as l5",
        "right(trim(coalesce(text, '')), 5) as r5",
        "replace(substring(trim(coalesce(text, '')), 1, 40), ' ', '_') as repl",
        "cast(instr(trim(coalesce(text, '')), 'data') as bigint) as pos_data",
        "split_part(trim(coalesce(text, '')), ' ', 2) as word2",
        "cast(ascii(trim(coalesce(text, ''))) as bigint) as first_cp",
        "cast(char_length(trim(coalesce(text, ''))) as bigint) as n_chars",
        "concat_ws('|', left(trim(coalesce(text, '')), 3), right(trim(coalesce(text, '')), 3)) as cw")),
    // datetime-function SUITE in one gate: calendar-field extraction
    // (year/month/day/hour/minute), date_trunc to day and hour, and
    // day-difference arithmetic — all on the µs grid under the UTC
    // session both engines run with (the engine's epoch-nanos BIGINT
    // contract converts via timestamp_micros; DuckDB's native micros
    // timestamp reads the same instants). ISO day-of-week via the
    // Jan-1-1970-was-a-Thursday modular identity — pure integer
    // arithmetic, sidestepping the engines' different dow numbering
    "q_datetime_suite" -> ((s, dir) =>
      Tables.read(s, dir, "events").selectExpr(
        "event_id",
        "cast(year(timestamp_micros(ts div 1000)) as bigint) as y",
        "cast(month(timestamp_micros(ts div 1000)) as bigint) as mo",
        "cast(day(timestamp_micros(ts div 1000)) as bigint) as d",
        "cast(hour(timestamp_micros(ts div 1000)) as bigint) as h",
        "cast(minute(timestamp_micros(ts div 1000)) as bigint) as mi",
        "cast(unix_micros(date_trunc('day', timestamp_micros(ts div 1000))) as bigint) as day_us",
        "cast(unix_micros(date_trunc('hour', timestamp_micros(ts div 1000))) as bigint) as hour_us",
        "cast((ts div 86400000000000 + 3) % 7 + 1 as bigint) as iso_dow",
        "cast(ts div 86400000000000 as bigint) as day_idx")),
    // array/collection SUITE in one gate: size, membership, 1-based
    // position (absent → 0 on both engines via coalesce), inclusive
    // slicing, sorted distinct, negative indexing, and a fold to a
    // string so the compare hashes scalars, not engine-specific list
    // renderings. Spark's slice(start, LENGTH) is mirrored as DuckDB's
    // inclusive list_slice(begin, END) — the one semantic seam, mapped
    // explicitly
    "q_array_suite" -> ((s, dir) =>
      Tables.read(s, dir, "documents").selectExpr(
        "doc_id",
        "cast(size(split(trim(coalesce(text, '')), ' ')) as bigint) as n_tok",
        "array_contains(split(trim(coalesce(text, '')), ' '), 'data') as has_data",
        "cast(coalesce(nullif(array_position(split(trim(coalesce(text, '')), ' '), 'data'), 0), 0) as bigint) as pos_data",
        "concat_ws('~', slice(split(trim(coalesce(text, '')), ' '), 2, 3)) as mid3",
        "concat_ws('~', array_sort(array_distinct(split(trim(coalesce(text, '')), ' ')))) as uniq_sorted",
        "element_at(split(trim(coalesce(text, '')), ' '), -1) as last_tok",
        "element_at(split(trim(coalesce(text, '')), ' '), 1) as first_tok")),
    // exact-percentile + aggregate SUITE: percentile_cont at 25/50/75
    // over the integral-valued quantity column (interpolation lands on
    // exact halves — no float-formula drift), min/max, bool_and /
    // bool_or, and a distinct count. Grouped by returnflag: three
    // rows, every value exact
    "q_agg_suite" -> ((s, dir) =>
      Tables.read(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.25e0)").as("p25"),
          expr("percentile(l_quantity, 0.5e0)").as("p50"),
          expr("percentile(l_quantity, 0.75e0)").as("p75"),
          min("l_quantity").as("qmin"),
          max("l_quantity").as("qmax"),
          expr("bool_and(l_quantity > 0e0)").as("all_pos"),
          expr("bool_or(l_discount > 9e-2)").as("any_big_disc"),
          count_distinct(col("l_linestatus")).as("n_status"))),
    // PIVOT: long→wide reshaping through the DataFrame pivot API with an
    // EXPLICIT value list (never values-discovery — that is a separate
    // collect job and nondeterministic column order); sums ride the
    // fixed-point grid. Oracle = conditional aggregation, which is
    // exactly what Catalyst lowers pivot to
    "q_pivot" -> ((s, dir) =>
      Tables.read(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(expr(fpSum("l_extendedprice")))
        .select(col("l_linestatus"), col("A").as("rev_a"),
          col("N").as("rev_n"), col("R").as("rev_r"))),
    // UNPIVOT (wide→long melt) through the Dataset.unpivot API — the
    // relational inverse, the same reshaping the MWU melt path uses
    "q_unpivot" -> ((s, dir) =>
      Tables.read(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "measure", "val")
        // Dataset.unpivot RETAINS rows whose measure value is NULL,
        // unlike SQL UNPIVOT's default EXCLUDE NULLS — pin the SQL
        // semantics explicitly so a null-carrying measure column cannot
        // diverge `n` from the oracle's `where val is not null`
        // (advice r8; null measure row planted in the edge dataset)
        .filter(col("val").isNotNull)
        .groupBy("measure")
        .agg(count(lit(1)).as("n"), expr(fpSum("val")).as("total"))),
    // regex SUITE: extract (group 1), replace-all, match test, and
    // match count — patterns follow the PII-scrub discipline (no
    // backslash escapes: [0-9] not \d, so the same literal is an
    // identically-interpreted regex in java.util.regex and RE2). The
    // one semantic seam is replace: Spark replaces ALL matches while
    // DuckDB defaults to FIRST — the oracle passes the 'g' flag
    "q_regex_suite" -> ((s, dir) =>
      Tables.read(s, dir, "documents").selectExpr(
        "doc_id",
        "regexp_extract(coalesce(text, ''), '([0-9]+)', 1) as first_num",
        "regexp_replace(coalesce(text, ''), '[0-9]+', '#') as masked",
        "coalesce(text, '') rlike '[0-9]' as has_digit",
        "cast(size(regexp_extract_all(coalesce(text, ''), '[0-9]+', 0)) as bigint) as n_nums",
        "regexp_extract(coalesce(text, ''), '([a-z]+) ([a-z]+)', 2) as second_word")),
    // JSON SUITE: path extraction as string and as BIGINT, a missing
    // path (NULL in both engines), and schema introspection via the
    // key list. Spark's get_json_object ↔ DuckDB's json_extract_string
    // share the $.path syntax; json_object_keys ↔ json_keys both return
    // the key array (folded to a string for hashing)
    "q_json_suite" -> ((s, dir) =>
      Tables.read(s, dir, "events").selectExpr(
        "event_id",
        "get_json_object(props, '$.k') as k_str",
        "cast(get_json_object(props, '$.k') as bigint) as k_num",
        "get_json_object(props, '$.missing') as absent",
        "concat_ws(',', json_object_keys(props)) as keys")),
    // CDC latest-row-per-key compaction: each user's most recent event —
    // row_number over (ts desc, event_id desc) = 1, which Spark executes
    // as WindowGroupLimit (per-partition running top-1, no full sort
    // materialization); the upsert-log → current-state pass
    "q_latest" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.read(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type"), expr("ts div 1000").as("us"), col("value"))
    }),
    // trailing-window anomaly score: each event's z-score against the
    // SAME USER's prior hour — the drift/outlier monitor of an event
    // pipeline. Moments ride order-free fixed-point sums over a RANGE
    // frame that ends at 1 ns BEFORE the current row: the frame is a
    // pure function of the timestamp values (ties in ts can never
    // reorder a double accumulation — there are no doubles to
    // accumulate), and z is computed from exact-integer ratios, so the
    // output is bit-deterministic under any partitioning
    "q_anomaly" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc)
        .rangeBetween(-3600L * 1000000000L, -1L)
      Tables.read(s, dir, "events")
        .withColumn("v_fp", expr("cast(floor(value * 1024e0 + 5e-1) as bigint)"))
        .withColumn("n_prior", count(lit(1)).over(w))
        .withColumn("s1", sum("v_fp").over(w))
        .withColumn("s2", sum(expr("v_fp * v_fp")).over(w))
        .select(col("event_id"), col("user_id"), col("n_prior"),
          expr(anomalyZ).as("z"))
    }),
    // time-weighted average (TWAP) per user-hour — the telemetry/finance
    // aggregation where each reading holds until the next one: weight =
    // milliseconds until the next same-user event, clamped to the hour
    // boundary (the last reading of an hour extends to its end). All
    // arithmetic is exact integers — ns timestamps, ms weights,
    // fixed-point values — so the weighted mean is a ratio of exact
    // sums; the lead window and the hour aggregate share the user_id
    // shuffle
    "q_twap" -> ((s, dir) => {
      // µs granularity throughout (the q_funnel rule): DuckDB truncates
      // TIMESTAMP(NANOS) to µs, so sub-µs nanos must never reach the
      // ordering or the weight arithmetic
      val w = Window.partitionBy("user_id").orderBy(col("tsu").asc, col("event_id").asc)
      Tables.read(s, dir, "events")
        .withColumn("tsu", expr("ts div 1000"))
        .withColumn("next_us", lead("tsu", 1).over(w))
        .withColumn("hour", expr("tsu div 3600000000"))
        .withColumn("dt_ms", expr(
          "(least(coalesce(next_us, (hour + 1) * 3600000000), " +
            "(hour + 1) * 3600000000) - tsu) div 1000"))
        .withColumn("v_fp", expr("cast(floor(value * 1048576e0 + 5e-1) as bigint)"))
        .groupBy("user_id", "hour")
        .agg(count(lit(1)).as("n_events"),
          sum("dt_ms").as("held_ms"),
          sum(expr("v_fp * dt_ms")).as("vw"))
        .withColumn("twap", expr(
          "case when held_ms = 0 then null " +
            "else (vw / 1048576e0) / cast(held_ms as double) end"))
        .select("user_id", "hour", "n_events", "held_ms", "twap")
    }),
    // exponentially-weighted moving average (EventOps.ewma — power-of-two
    // weights over fixed-point values, exact BIGINT num/den, one shuffle)
    "q_ewma" -> ((s, dir) => EventOps.ewma(Tables.read(s, dir, "events"))),
    // last-touch attribution: every purchase credited to the same user's
    // most recent PRIOR click — the IGNORE NULLS last_value window (the
    // one frame primitive the rest of the surface doesn't exercise);
    // integer ids and µs epochs only, so no float surface at all
    "q_last_touch" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("tsu").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.read(s, dir, "events")
        .withColumn("tsu", expr("ts div 1000"))
        .withColumn("click_id",
          last(expr("case when event_type = 'click' then event_id end"), ignoreNulls = true).over(w))
        .withColumn("click_us",
          last(expr("case when event_type = 'click' then ts div 1000 end"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("tsu").as("purchase_us"), col("click_id"), col("click_us"))
    }),
    // range-clustered sorted layout: lineitem rewritten
    // repartitionByRange + sortWithinPartitions on ship date, then a
    // date-range query over the result. The time-series layout story at
    // 100 TB: range partitioning clusters each date into few files and
    // the in-file sort tightens parquet row-group min/max bounds, so a
    // date-bounded scan prunes to a sliver of the table (the same
    // motivation as Z-ordering, in one dimension). The aggregate is
    // layout-independent — that's what makes it oracle-checkable
    // schema evolution across batches: an old batch without `n_chars`
    // and a new batch with it live in ONE dataset; mergeSchema read
    // unifies (missing column -> NULL), the aggregate coalesces — the
    // years-of-parquet reality at 100 TB, where columns arrive midstream
    "sink_evolve" -> ((s, dir) => {
      val tmp = graft.Scratch.dir("graft_evolve_")
      val docs = Tables.read(s, dir, "documents")
      docs.filter(col("doc_id") % 2 === 0).select("doc_id", "lang")
        .write.mode("overwrite").parquet(tmp + "/batch1")
      docs.filter(col("doc_id") % 2 === 1).select("doc_id", "lang", "n_chars")
        .write.mode("overwrite").parquet(tmp + "/batch2")
      s.read.option("mergeSchema", "true")
        .parquet(tmp + "/batch1", tmp + "/batch2")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("n_chars"), lit(0L))).as("sum_chars"))
    }),
    // Z-order clustered layout (OPTIMIZE ZORDER shape): Morton-interleave
    // two bucketed keys, range-sort the write by z so BOTH dims cluster
    // into every file, answer a rectangle query from the read-back with
    // the bucket predicates pushed to the scan; oracle recomputes the
    // identical Morton keys from the raw table
    "sink_zorder" -> ((s, dir) =>
      graft.operators.Zorder.rectangleOverZSink(Tables.read(s, dir, "lineitem"))),
    // Hilbert-curve clustered sink (the liquid-clustering layout):
    // unit-adjacent index walk — tighter rectangles per file than the
    // Morton diagonals; same pushed-bucket read-back, oracle recomputes
    // the unrolled xy2d levels bit-for-bit
    "sink_hilbert" -> ((s, dir) =>
      graft.operators.Hilbert.rectangleOverHilbertSink(Tables.read(s, dir, "lineitem"))),
    // SCHEMA EVOLUTION round trip (the add-a-column migration every
    // long-lived warehouse table survives): era-1 files lack the
    // priority column, era-2 files carry it, and a mergeSchema read
    // reconciles both vintages — old rows surface the new column as
    // NULL. Oracle computes the same union from the raw table.
    "sink_evolve" -> ((s, dir) => {
      val tmp = graft.Scratch.dir("graft_evolve_")
      val o = Tables.read(s, dir, "orders")
      o.filter(col("o_orderdate") < lit("1997-01-01"))
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$tmp/era=1")
      o.filter(col("o_orderdate") >= lit("1997-01-01"))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$tmp/era=2")
      s.read.option("mergeSchema", "true").parquet(tmp)
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n"),
          expr(fpSum("o_totalprice")).as("total"))
    }),
    "sink_sorted" -> ((s, dir) => {
      val tmp = graft.Scratch.dir("graft_sort_")
      Tables.read(s, dir, "lineitem")
        .select("l_orderkey", "l_shipdate", "l_extendedprice", "l_quantity")
        .repartitionByRange(8, col("l_shipdate"))
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("l_shipdate") >= lit("1997-06-01") &&
          col("l_shipdate") < lit("1997-09-01"))
        .groupBy(month(col("l_shipdate")).cast("long").as("m"))
        .agg(count(lit(1)).as("n_items"),
          expr(fpSum("l_extendedprice")).as("revenue"),
          sum("l_quantity").as("sum_qty"))
    }),
    // TPC-H Q15 shape: per-supplier revenue for one quarter, then keep
    // the max-revenue supplier(s) — the aggregate-then-self-max pattern;
    // the max is a 1-row broadcast, supplier joins post-aggregation so
    // AQE picks the join strategy (supplier is NOT dimension-small at
    // 100 TB)
    "q_top_supplier" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1997-04-01"))
        .select("l_suppkey", "l_extendedprice", "l_discount")
      val rev = li.groupBy(col("l_suppkey").as("supplier_no"))
        .agg(expr(fpSum("l_extendedprice * (1e0 - l_discount)")).as("total_revenue"))
      val top = rev.join(broadcast(rev.agg(max("total_revenue").as("mx"))),
        col("total_revenue") === col("mx")).drop("mx")
      Tables.read(s, dir, "supplier")
        .join(top, col("s_suppkey") === col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    }),
    // Q2 shape: min-cost supplier per part within a region — the
    // correlated-min-with-lookup-chain topology, rendered as one
    // per-part window over the (part, supplier) min unit price. Unit
    // price is one IEEE division on identical operands; min is
    // order-free; ties break on suppkey. Nation/region dims broadcast.
    "q_min_cost" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .filter(col("l_quantity") > 0.0)
      val sup = Tables.read(s, dir, "supplier")
        .join(broadcast(Tables.read(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.read(s, dir, "region")
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name")
      val parts = Tables.read(s, dir, "part")
        .filter(col("p_size") < 10).select("p_partkey")
      val perSupp = li.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .groupBy("p_partkey", "s_suppkey", "s_name")
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("min_cost"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("p_partkey")
        .orderBy(col("min_cost").asc, col("s_suppkey").asc)
      perSupp.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
    }),
    // Q11 shape: groups kept by comparison against a GLOBAL scalar —
    // per-part shipped value > 1.5× the mean part value (SF-invariant,
    // unlike Q11's absolute fraction: at 10× the parts each holds ~1/10
    // the share). Both sides are fixed-point sums over the same rows, so
    // part sums add up to the total exactly and the threshold compare is
    // deterministic; the 1-row total broadcasts. The summand (price·qty,
    // ~5e6/row — the largest-magnitude global sum in the suite) is
    // pre-scaled by 2^14 per the fpSum overflow contract: without it the
    // 2^20-scaled total passes Long range near SF1, where Spark's
    // sum(bigint) wraps silently while DuckDB sums in HUGEINT. Scaled,
    // the fixed-point total stays exact to ~SF1000; both the /2^14 and
    // the multiply-back are exact power-of-two IEEE ops on identical
    // operands in both engines.
    "q_important_parts" -> ((s, dir) => {
      val sval = "(l_extendedprice * l_quantity / 16384e0)"
      val li = Tables.read(s, dir, "lineitem")
        .select("l_partkey", "l_extendedprice", "l_quantity")
      val perPart = li.groupBy("l_partkey")
        .agg(expr(s"(${fpSum(sval)} * 16384e0)").as("part_value"))
      val total = li.agg(expr(s"(${fpSum(sval)} * 16384e0)").as("total_value"),
        countDistinct("l_partkey").as("n_parts"))
      perPart.join(broadcast(total),
        col("part_value") > col("total_value") / col("n_parts").cast("double") * 1.5)
        .select("l_partkey", "part_value")
    }),
    // Q16 shape: per-(brand, size) distinct-supplier counts with a
    // NOT-IN exclusion list on both dimensions (excluded brand, and the
    // "complaint" suppliers as a broadcast anti-join)
    "q_parts_suppliers" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem").select("l_partkey", "l_suppkey")
      val parts = Tables.read(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#13")
        .select("p_partkey", "p_brand", "p_size")
      val bad = Tables.read(s, dir, "supplier")
        .filter(col("s_name").endsWith("7")).select("s_suppkey")
      li.join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(parts, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
    }),
    // Q20 shape: the nested semi-join chain — suppliers who DOMINATE
    // some part (shipped > 30% of its 1997 volume). Per-(part, supp)
    // and per-part quantities are exact integer fixed-point sums; the
    // qualifying pairs semi-join back to the supplier dim.
    "q_excess_suppliers" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .select("l_partkey", "l_suppkey", "l_quantity")
      val perPair = li.groupBy("l_partkey", "l_suppkey")
        .agg(expr(fpSum("l_quantity")).as("supp_qty"))
      val perPart = li.groupBy(col("l_partkey").as("pk"))
        .agg(expr(fpSum("l_quantity")).as("part_qty"))
      val dominant = perPair.join(perPart,
        col("l_partkey") === col("pk") &&
          col("supp_qty") > col("part_qty") * 0.3)
        .select("l_suppkey").distinct()
      Tables.read(s, dir, "supplier")
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    }),
    // Q22 shape: rich-but-inactive segmentation — customers above the
    // positive-balance average (global scalar from exact fixed-point
    // sum/count) with NO urgent orders (anti join against the filtered
    // order subset — every synthetic customer has SOME order, so the
    // unfiltered anti-join would be vacuously empty), grouped by a
    // substring "country code" of the name. One broadcast scalar + one
    // anti join.
    "q_inactive_rich" -> ((s, dir) => {
      val cust = Tables.read(s, dir, "customer")
        .withColumn("code", expr("substring(c_name, length(c_name) - 1, 2)"))
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg((expr(fpSum("c_acctbal")) /
          count(lit(1)).cast("double")).as("avg_bal"))
      val urgent = Tables.read(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      cust.join(broadcast(avgBal), col("c_acctbal") > col("avg_bal"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("code")
        .agg(count(lit(1)).as("n_cust"), expr(fpSum("c_acctbal")).as("total_bal"))
    })
  )

  /** GROUPING SETS query — identical text runs in Spark SQL and DuckDB
    * (same lattice syntax, same grouping() flag semantics). */
  private def groupingSetsSql(table: String): String =
    s"""select l_returnflag, l_linestatus,
       | cast(grouping(l_returnflag) as bigint) as g_rf,
       | cast(grouping(l_linestatus) as bigint) as g_ls,
       | cast(count(*) as bigint) as n,
       | ${fpSum("l_quantity")} as sum_qty
       |from $table
       |group by grouping sets ((l_returnflag, l_linestatus),
       | (l_returnflag), ())""".stripMargin.replace("\n", " ")

  /** Shared z-score text for q_anomaly: mean and E[x²] are ratios of
    * exact integers (fixed-point sums from the window), variance is one
    * subtraction of identical doubles, sqrt is IEEE-exact in both
    * engines. NULL when the prior window has < 2 events or zero
    * variance. */
  private val anomalyZ: String = {
    val mean = "((cast(s1 as double) / 1024e0) / cast(n_prior as double))"
    val ex2 = "((cast(s2 as double) / 1048576e0) / cast(n_prior as double))"
    s"case when n_prior >= 2 and ($ex2 - $mean * $mean) > 0e0 " +
      s"then (value - $mean) / sqrt($ex2 - $mean * $mean) else null end"
  }

  /** Shared oracle for q_latest AND stream_latest (batch WindowGroupLimit
    * vs complete-mode max_by state — the same view either way). */
  private lazy val latestSql: String =
    """select user_id, event_id as last_event_id, event_type,
      | epoch_ns(ts) // 1000 as us, value
      |from (select *, row_number() over (partition by user_id
      |  order by epoch_ns(ts) desc, event_id desc) as rn from events)
      |where rn = 1""".stripMargin.replace("\n", " ")

  /** Batch TWAP oracle — also the base of stream_twap's complete-hours
    * restriction. */
  private lazy val twapSql: String =
    """select user_id, hour, cast(n_events as bigint) as n_events,
      | cast(held_ms as bigint) as held_ms,
      | case when held_ms = 0 then null
      |  else (vw / 1048576e0) / cast(held_ms as double) end as twap
      |from (
      | select user_id, hour, count(*) as n_events, sum(dt_ms) as held_ms,
      |  cast(sum(v_fp * dt_ms) as bigint) as vw
      | from (
      |  select user_id, hour,
      |   (least(coalesce(next_us, (hour + 1) * 3600000000),
      |     (hour + 1) * 3600000000) - tsu) // 1000 as dt_ms,
      |   cast(floor(value * 1048576e0 + 5e-1) as bigint) as v_fp
      |  from (
      |   select user_id, value, epoch_ns(ts) // 1000 as tsu,
      |    epoch_ns(ts) // 3600000000000 as hour,
      |    lead(epoch_ns(ts) // 1000) over (partition by user_id
      |      order by epoch_ns(ts) // 1000 asc, event_id asc) as next_us
      |   from events))
      | group by user_id, hour)""".stripMargin.replace("\n", " ")

  /** Shared oracle for q_ewma AND stream_ewma (batch lag windows vs
    * last-7 streaming state — identical exact-integer arithmetic). */
  private lazy val ewmaSql: String = {
    val num = (0 until 8).map(k => s"coalesce(l$k * ${1L << (7 - k)}, 0)").mkString(" + ")
    val den = (0 until 8).map(k =>
      s"case when l$k is not null then ${1L << (7 - k)} else 0 end").mkString(" + ")
    val lags = (1 until 8).map(k =>
      s"lag(v_fp, $k) over (partition by user_id order by tsu asc, event_id asc) as l$k")
      .mkString(", ")
    s"""select user_id, event_id, tsu as us,
       | cast(($num) as double) / cast(($den) as double) / 1048576e0 as ewma
       |from (
       | select user_id, event_id, tsu, v_fp as l0, $lags
       | from (select user_id, event_id, epoch_ns(ts) // 1000 as tsu,
       |   cast(floor(value * 1048576e0 + 5e-1) as bigint) as v_fp
       |  from events) b) w""".stripMargin.replace("\n", " ")
  }

  /** Shared oracle for q_anomaly AND stream_anomaly (the stream/batch
    * differential: the stateful streaming path must reproduce the batch
    * window bit-for-bit). */
  private lazy val anomalySql: String =
    s"""select event_id, user_id, n_prior, $anomalyZ as z
       |from (
       | select event_id, user_id, value,
       |  count(*) over w as n_prior,
       |  sum(v_fp) over w as s1,
       |  sum(v_fp * v_fp) over w as s2
       | from (select event_id, user_id, value, epoch_ns(ts) as tsn,
       |   cast(floor(value * 1024e0 + 5e-1) as bigint) as v_fp from events)
       | window w as (partition by user_id order by tsn asc
       |  range between 3600000000000 preceding and 1 preceding))"""
      .stripMargin.replace("\n", " ")

  /** Q19-style OR-of-ANDs residual, shared text (integer bounds on a
    * double column compare identically in both engines). */
  private val disjunctiveArms =
    "((p_brand = 'Brand#1' and p_size between 1 and 15 and l_quantity between 1 and 11)" +
      " or (p_brand = 'Brand#2' and p_size between 1 and 25 and l_quantity between 10 and 20)" +
      " or (p_brand = 'Brand#3' and p_size between 1 and 35 and l_quantity between 20 and 30))"

  private val sessionsOracle =
    """with e as (
      | select user_id, ts,
      |  case when lag(ts) over (partition by user_id order by ts) is null
      |    or (epoch_ns(ts) // 1000000000)
      |       - (epoch_ns(lag(ts) over (partition by user_id order by ts)) // 1000000000) > 1800
      |   then 1 else 0 end as new_session
      | from events)
      |select user_id, cast(session_id as bigint) as session_id,
      | cast(count(*) as bigint) as n_events,
      | cast(min(us) as bigint) as start_us, cast(max(us) as bigint) as end_us
      |from (
      | select user_id, epoch_ns(ts) // 1000 as us,
      |  sum(new_session) over (partition by user_id order by ts
      |    rows between unbounded preceding and current row) as session_id
      | from e)
      |group by user_id, session_id""".stripMargin.replace("\n", " ")

  private val q1Oracle =
    s"""select l_returnflag, l_linestatus,
       | cast(sum(l_quantity) as double) as sum_qty,
       | ${fpSum("l_extendedprice")} as sum_base_price,
       | ${fpSum("l_extendedprice * (1e0 - l_discount)")} as sum_disc_price,
       | cast(count(*) as bigint) as count_order,
       | cast(sum(l_quantity) as double) / cast(count(*) as double) as avg_qty,
       | ${fpSum("l_extendedprice")} / cast(count(*) as double) as avg_price
       |from lineitem group by l_returnflag, l_linestatus""".stripMargin.replace("\n", " ")

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1Oracle,
    "q1_salted" -> q1Oracle,
    // plain unsalted join — equality proves skewJoin exact
    "q_skew_join" ->
      s"""select p_brand, cast(count(*) as bigint) as n,
         | ${fpSum("l_extendedprice * (1e0 - l_discount)")} as revenue
         |from lineitem join part on l_partkey = p_partkey
         |group by p_brand""".stripMargin.replace("\n", " "),
    "q_join_revenue" ->
      s"""select r_name, n_name,
         | ${fpSum("l_extendedprice * (1e0 - l_discount)")} as revenue,
         | cast(count(*) as bigint) as n_items
         |from lineitem
         | join orders on l_orderkey = o_orderkey
         | join customer on o_custkey = c_custkey
         | join nation on c_nationkey = n_nationkey
         | join region on n_regionkey = r_regionkey
         |group by r_name, n_name""".stripMargin.replace("\n", " "),
    "q_top_customers" ->
      s"""select * from (
         | select c_mktsegment, c_custkey, c_name, spend, n_orders,
         |  cast(row_number() over (partition by c_mktsegment
         |    order by spend desc, c_custkey asc) as bigint) as rk
         | from (
         |  select c_mktsegment, c_custkey, c_name,
         |   ${fpSum("o_totalprice")} as spend, cast(count(*) as bigint) as n_orders
         |  from orders join customer on o_custkey = c_custkey
         |  group by c_mktsegment, c_custkey, c_name))
         |where rk <= 5""".stripMargin.replace("\n", " "),
    "q_winsorize" ->
      (s"""with b as (select l_returnflag,
          |  ${Parity.q6("quantile_cont(l_extendedprice, 5e-2)")} as lo,
          |  ${Parity.q6("quantile_cont(l_extendedprice, 95e-2)")} as hi
          | from lineitem group by l_returnflag)
          |select l.l_returnflag, cast(count(*) as bigint) as n,
          | ${fpSum("least(greatest(l_extendedprice, lo), hi)")} as sum_clipped,
          | min(lo) as lo, min(hi) as hi
          |from lineitem l join b on l.l_returnflag = b.l_returnflag
          |group by l.l_returnflag""".stripMargin.replace("\n", " ")),
    "q1_rollup" ->
      (s"""select l_returnflag, l_linestatus, cast(count(*) as bigint) as n,
          | ${fpSum("l_extendedprice")} as sum_price
          |from lineitem group by rollup(l_returnflag, l_linestatus)"""
        .stripMargin.replace("\n", " ")),
    "q_events_pivot" -> {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val cols = types.map(t =>
        s"cast(count(*) filter (where event_type = '$t') as bigint) as $t").mkString(", ")
      s"""select ${Parity.hourEpoch(Parity.DuckD, "ts")} as hour_epoch, $cols
         |from events group by 1""".stripMargin.replace("\n", " ")
    },
    "q_percentiles" ->
      (s"""select l_returnflag as grp,
          | ${Parity.q6("quantile_cont(l_extendedprice, 25e-2)")} as p25,
          | ${Parity.q6("quantile_cont(l_extendedprice, 5e-1)")} as p50,
          | ${Parity.q6("quantile_cont(l_extendedprice, 75e-2)")} as p75,
          | ${Parity.q6("quantile_cont(l_discount, 5e-1)")} as p50_disc
          |from lineitem group by l_returnflag""".stripMargin.replace("\n", " ")),
    "q_shipping" ->
      s"""select l_orderkey,
         | ${fpSum("l_extendedprice * (1e0 - l_discount)")} as revenue,
         | cast(min(epoch_us(o_orderdate) // 1000000) as bigint) as order_epoch
         |from lineitem
         | join orders on l_orderkey = o_orderkey
         | join customer on o_custkey = c_custkey
         |where l_shipdate > timestamp '1998-01-01'
         | and o_orderdate < timestamp '1998-01-01'
         | and c_mktsegment = 'BUILDING'
         |group by l_orderkey
         |order by revenue desc, l_orderkey asc limit 10""".stripMargin.replace("\n", " "),
    "q_events_window" -> EventOps.hourlySql(),
    "q_json_sink" -> EventOps.hourlySql(),
    "q_orc_sink" -> EventOps.hourlySql(),
    "q_events_json" -> EventOps.propStatsSql(),
    "q_sessions" -> sessionsOracle,
    "q_session_window" ->
      """with e as (select user_id, event_id, epoch_ns(ts) // 1000 as tsu from events),
        |m as (select user_id, event_id, tsu,
        |  case when tsu - lag(tsu) over (partition by user_id
        |    order by tsu, event_id) > 1800000000 then 1 else 0 end as ns from e),
        |s as (select user_id, tsu, sum(ns) over (partition by user_id
        |  order by tsu, event_id
        |  rows between unbounded preceding and current row) as sid from m)
        |select user_id, cast(min(tsu) as bigint) as start_us,
        | cast(max(tsu) + 1800000000 as bigint) as end_us,
        | cast(count(*) as bigint) as n_events
        |from s group by user_id, sid""".stripMargin.replace("\n", " "),
    "q_user_rolling" -> EventOps.rollingSql(),
    "q_events_sliding" -> EventOps.slidingSql(),
    "stream_hourly" -> EventOps.hourlySql(),
    "stream_late_drop" -> graft.streaming.EventStream.lateDropSql(),
    "stream_upsert" -> graft.streaming.EventStream.upsertSql(),
    "stream_ann_ingest" -> graft.operators.Pq.ivfAdcSql(),
    "stream_ann_crud" -> graft.operators.Pq.ivfAdcSql(
      table = "(select * from embeddings where vec_id % 5 <> 3)"),
    "stream_sparse_crud" -> graft.operators.TextOps.sparseRetrievalSql(
      table = "(select * from documents where doc_id % 5 <> 3)"),
    "stream_neardup_crud" -> graft.operators.NearDupIndex.serveSql(
      stopPred = "doc_id % 5 < 4 and doc_id % 3 = 0",
      histPred = "doc_id % 5 < 4 and doc_id % 10 <> 1",
      incPred = "doc_id % 5 >= 4"),
    "stream_dedup_ttl" -> graft.streaming.EventStream.dedupTtlSql(),
    "stream_restart_agg" -> graft.streaming.EventStream.restartAggSql(),
    "stream_trending" ->
      s"""with h as (select ${Parity.hourEpoch(Parity.DuckD, "ts")} as hour_epoch,
         | event_type, cast(count(*) as bigint) as n from events group by 1, 2)
         |select hour_epoch, event_type, n, rk from (
         | select hour_epoch, event_type, n,
         |  cast(row_number() over (partition by hour_epoch
         |   order by n desc, event_type asc) as bigint) as rk from h)
         |where rk <= 3""".stripMargin.replace("\n", " "),
    "stream_histogram" ->
      s"""select ${Parity.hourEpoch(Parity.DuckD, "ts")} as hour_epoch,
         | ${graft.streaming.EventStream.histBinExpr} as bin,
         | cast(count(*) as bigint) as n
         |from events group by 1, 2""".stripMargin.replace("\n", " "),
    "stream_dedup" ->
      """select event_type, cast(count(distinct user_id) as bigint) as n_distinct_users
        |from events group by event_type""".stripMargin.replace("\n", " "),
    "stream_drift" ->
      s"""with h as (select ${Parity.hourEpoch(Parity.DuckD, "ts")} as hour_epoch,
         |  ${graft.streaming.EventStream.histBinExpr} as bin,
         |  cast(count(*) as bigint) as n from events group by 1, 2),
         |dense as (select hour_epoch, bin, coalesce(n, 0) as n from
         | (select distinct hour_epoch from h) cross join
         | (select distinct bin from h) left join h using (hour_epoch, bin)),
         |g as (select bin, cast(sum(n) as bigint) as gn from dense group by 1),
         |gc as (select bin, sum(gn) over (order by bin
         |  rows between unbounded preceding and current row) as gcum from g),
         |gt as (select max(gcum) as gt from gc),
         |hc as (select hour_epoch, bin,
         |  sum(n) over (partition by hour_epoch order by bin
         |   rows between unbounded preceding and current row) as hcum,
         |  sum(n) over (partition by hour_epoch) as htot from dense)
         |select hour_epoch, cast(max(htot) as bigint) as n_events,
         | max(abs(cast(hcum as double) / cast(htot as double)
         |  - cast(gcum as double) / cast(gt as double))) as d
         |from hc join gc using (bin) cross join gt
         |group by hour_epoch""".stripMargin.replace("\n", " "),
    "stream_join" ->
      s"""select c_mktsegment, cast(count(*) as bigint) as n, ${fpSum("value")} as v
         |from events join customer on user_id = c_custkey
         |group by c_mktsegment""".stripMargin.replace("\n", " "),
    "stream_sessions" ->
      s"""with s as ($sessionsOracle)
         |select user_id, session_id, n_events, start_us, end_us from (
         | select s.*, max(session_id) over (partition by user_id) as mx from s)
         |where session_id < mx""".stripMargin.replace("\n", " "),
    "q_setops" ->
      """with a as (select distinct o_custkey from orders where year(o_orderdate) <= 1995),
        |b as (select distinct o_custkey from orders where year(o_orderdate) >= 1996)
        |select 'both' as cohort, cast(count(*) as bigint) as n from (select * from a intersect select * from b)
        |union all
        |select 'early_only', cast(count(*) as bigint) from (select * from a except select * from b)
        |union all
        |select 'late_only', cast(count(*) as bigint) from (select * from b except select * from a)"""
        .stripMargin.replace("\n", " "),
    "q_events_ntile" ->
      s"""select event_type, cast(quartile as bigint) as quartile,
         | cast(count(*) as bigint) as n, ${fpSum("value")} as v
         |from (select event_type, value,
         |  ntile(4) over (partition by event_type order by value asc, event_id asc) as quartile
         | from events)
         |group by event_type, quartile""".stripMargin.replace("\n", " "),
    "q_above_avg" ->
      s"""select l_returnflag, cast(count(*) as bigint) as n_above,
         | ${fpSum("l_extendedprice")} as sum_above
         |from (
         | select l_returnflag, l_extendedprice,
         |  (cast(sum(cast(floor(l_extendedprice * 1048576e0 + 5e-1) as bigint))
         |     over (partition by l_returnflag) as bigint) / 1048576e0)
         |   / cast(count(*) over (partition by l_returnflag) as double) as grp_avg
         | from lineitem)
         |where l_extendedprice > grp_avg
         |group by l_returnflag""".stripMargin.replace("\n", " "),
    "q1_cube" ->
      s"""select l_returnflag, l_linestatus, cast(count(*) as bigint) as n,
         | ${fpSum("l_extendedprice")} as sum_price
         |from lineitem group by cube(l_returnflag, l_linestatus)"""
        .stripMargin.replace("\n", " "),
    "q_anti_join" ->
      s"""select c_mktsegment, cast(count(*) as bigint) as n_idle,
         | ${fpSum("c_acctbal")} as acctbal_sum
         |from customer
         |where not exists (select 1 from orders
         |  where o_custkey = c_custkey and o_orderpriority = '1-URGENT')
         |group by c_mktsegment""".stripMargin.replace("\n", " "),
    "q_semi_join" ->
      """select cast(c_nationkey as bigint) as nationkey,
        | cast(count(*) as bigint) as n_urgent_cust
        |from customer
        |where exists (select 1 from orders
        |  where o_custkey = c_custkey and o_orderpriority = '1-URGENT')
        |group by c_nationkey""".stripMargin.replace("\n", " "),
    "q_calendar" ->
      s"""select cast(year(o_orderdate) as bigint) as y,
         | cast(month(o_orderdate) as bigint) as m,
         | cast(count(*) as bigint) as n_orders, ${fpSum("o_totalprice")} as revenue
         |from orders group by 1, 2""".stripMargin.replace("\n", " "),
    "q_events_lead" ->
      """select event_type, cast(n_gaps as bigint) as n_gaps,
        | cast(sum_gap_sec as bigint) as sum_gap_sec,
        | cast(max_gap_sec as bigint) as max_gap_sec,
        | cast(sum_gap_sec as double) / cast(n_gaps as double) as avg_gap_sec
        |from (
        | select event_type, count(*) as n_gaps, sum(gap_sec) as sum_gap_sec,
        |  max(gap_sec) as max_gap_sec
        | from (
        |  select event_type,
        |   (epoch_ns(lead(ts) over (partition by user_id order by ts asc, event_id asc))
        |    - epoch_ns(ts)) // 1000000000 as gap_sec
        |  from events)
        | where gap_sec is not null
        | group by event_type)""".stripMargin.replace("\n", " "),
    "q_asof" -> EventOps.asofSql(),
    "q_retention_daily" -> EventOps.retentionSql(),
    "q_string_suite" ->
      """select doc_id,
        | substring(trim(coalesce(text, '')), 1, 40) as s40,
        | translate(substring(trim(coalesce(text, '')), 1, 40), 'aeiou', '01234') as tr,
        | reverse(substring(trim(coalesce(text, '')), 1, 12)) as rev,
        | lpad(substring(trim(coalesce(text, '')), 1, 7), 12, '*') as lp,
        | rpad(substring(trim(coalesce(text, '')), 1, 7), 12, '#') as rp,
        | repeat(substring(trim(coalesce(text, '')), 1, 3), 3) as rep,
        | left(trim(coalesce(text, '')), 5) as l5,
        | right(trim(coalesce(text, '')), 5) as r5,
        | replace(substring(trim(coalesce(text, '')), 1, 40), ' ', '_') as repl,
        | cast(instr(trim(coalesce(text, '')), 'data') as bigint) as pos_data,
        | split_part(trim(coalesce(text, '')), ' ', 2) as word2,
        | cast(ascii(trim(coalesce(text, ''))) as bigint) as first_cp,
        | cast(length(trim(coalesce(text, ''))) as bigint) as n_chars,
        | concat_ws('|', left(trim(coalesce(text, '')), 3), right(trim(coalesce(text, '')), 3)) as cw
        |from documents""".stripMargin.replace("\n", " "),
    "q_array_suite" ->
      """select doc_id,
        | cast(len(string_split(trim(coalesce(text, '')), ' ')) as bigint) as n_tok,
        | list_contains(string_split(trim(coalesce(text, '')), ' '), 'data') as has_data,
        | cast(coalesce(list_position(string_split(trim(coalesce(text, '')), ' '), 'data'), 0) as bigint) as pos_data,
        | coalesce(array_to_string(list_slice(string_split(trim(coalesce(text, '')), ' '), 2, 4), '~'), '') as mid3,
        | coalesce(array_to_string(list_sort(list_distinct(string_split(trim(coalesce(text, '')), ' '))), '~'), '') as uniq_sorted,
        | list_extract(string_split(trim(coalesce(text, '')), ' '), -1) as last_tok,
        | list_extract(string_split(trim(coalesce(text, '')), ' '), 1) as first_tok
        |from documents""".stripMargin.replace("\n", " "),
    "q_json_suite" ->
      """select event_id,
        | case when json_valid(props) then json_extract_string(props, '$.k') end as k_str,
        | cast(case when json_valid(props) then json_extract_string(props, '$.k') end as bigint) as k_num,
        | case when json_valid(props) then json_extract_string(props, '$.missing') end as absent,
        | coalesce(case when json_valid(props)
        |   then array_to_string(json_keys(props), ',') end, '') as keys
        |from events""".stripMargin.replace("\n", " "),
    "q_regex_suite" ->
      """select doc_id,
        | regexp_extract(coalesce(text, ''), '([0-9]+)', 1) as first_num,
        | regexp_replace(coalesce(text, ''), '[0-9]+', '#', 'g') as masked,
        | regexp_matches(coalesce(text, ''), '[0-9]') as has_digit,
        | cast(len(regexp_extract_all(coalesce(text, ''), '[0-9]+', 0)) as bigint) as n_nums,
        | regexp_extract(coalesce(text, ''), '([a-z]+) ([a-z]+)', 2) as second_word
        |from documents""".stripMargin.replace("\n", " "),
    "q_pivot" -> {
      def rev(f: String) =
        fpSum(s"case when l_returnflag = '$f' then l_extendedprice end")
      s"""select l_linestatus, ${rev("A")} as rev_a, ${rev("N")} as rev_n,
         | ${rev("R")} as rev_r
         |from lineitem group by 1""".stripMargin.replace("\n", " ")
    },
    "q_unpivot" ->
      s"""with u as (
         | select l_orderkey, l_linenumber, 'l_quantity' as measure, l_quantity as val from lineitem
         | union all select l_orderkey, l_linenumber, 'l_discount', l_discount from lineitem
         | union all select l_orderkey, l_linenumber, 'l_tax', l_tax from lineitem)
         |select measure, cast(count(*) as bigint) as n, ${fpSum("val")} as total
         |from u where val is not null group by 1""".stripMargin.replace("\n", " "),
    "q_agg_suite" ->
      """select l_returnflag,
        | quantile_cont(l_quantity, 0.25e0) as p25,
        | quantile_cont(l_quantity, 0.5e0) as p50,
        | quantile_cont(l_quantity, 0.75e0) as p75,
        | min(l_quantity) as qmin,
        | max(l_quantity) as qmax,
        | bool_and(l_quantity > 0e0) as all_pos,
        | bool_or(l_discount > 9e-2) as any_big_disc,
        | cast(count(distinct l_linestatus) as bigint) as n_status
        |from lineitem group by 1""".stripMargin.replace("\n", " "),
    "q_datetime_suite" ->
      """select event_id,
        | cast(year(ts) as bigint) as y,
        | cast(month(ts) as bigint) as mo,
        | cast(day(ts) as bigint) as d,
        | cast(hour(ts) as bigint) as h,
        | cast(minute(ts) as bigint) as mi,
        | cast(epoch_us(date_trunc('day', ts)) as bigint) as day_us,
        | cast(epoch_us(date_trunc('hour', ts)) as bigint) as hour_us,
        | cast((epoch_ns(ts) // 86400000000000 + 3) % 7 + 1 as bigint) as iso_dow,
        | cast(epoch_ns(ts) // 86400000000000 as bigint) as day_idx
        |from events""".stripMargin.replace("\n", " "),
    "q_window_suite" ->
      """select l_orderkey, cast(l_linenumber as bigint) as l_linenumber,
        | l_returnflag,
        | percent_rank() over w as pr,
        | cume_dist() over w as cd,
        | cast(ntile(7) over w as bigint) as bucket,
        | lag(l_quantity, 2, -1e0) over w as lag2,
        | lead(l_quantity, 3, -1e0) over w as lead3,
        | nth_value(l_quantity, 5) over wr as nth5,
        | first_value(l_quantity) over wr as first_q,
        | last_value(l_quantity) over wr as last_q
        |from lineitem where l_orderkey % 7 = 0
        |window w as (partition by l_returnflag
        |  order by l_orderkey asc, l_linenumber asc,
        |   l_quantity asc, l_extendedprice asc),
        |wr as (partition by l_returnflag
        |  order by l_orderkey asc, l_linenumber asc,
        |   l_quantity asc, l_extendedprice asc
        |  rows between unbounded preceding and current row)"""
        .stripMargin.replace("\n", " "),
    "q_scd2" -> EventOps.scd2Sql(),
    "stream_scd2" ->
      s"""select user_id, version, tier, valid_from, valid_to
         |from (${EventOps.scd2Sql()})
         |where valid_to is not null""".stripMargin.replace("\n", " "),
    "q_incr_agg" -> EventOps.hourlyIncrementalSql(),
    "q_bitmap" -> EventOps.bitmapConjunctionSql(),
    "q_golden" -> {
      val ePairs =
        s"""select a.nid as doc_a, b.nid as doc_b
           |from (${graft.operators.TextOps.fuzzyPairsSql("part", "p_name")}) fp
           | join nameids a on fp.name_a = a.name
           | join nameids b on fp.name_b = b.name""".stripMargin.replace("\n", " ")
      s"""with nameids as (select p_name as name, min(p_partkey) as nid
         | from part group by 1),
         |${graft.operators.Dedup.labelPropCtes(ePairs)},
         |lab as (select p.p_partkey, p.p_name, p.p_retailprice,
         |  coalesce(l8.lbl, n.nid) as cluster
         | from part p join nameids n on p.p_name = n.name
         |  left join l8 on n.nid = l8.id)
         |select cluster, cast(count(*) as bigint) as n_members,
         | min(p_partkey) as golden_key,
         | (max(struct_pack(l := length(p_name), nm := p_name))).nm as name,
         | max(p_retailprice) as max_price
         |from lab group by cluster""".stripMargin.replace("\n", " ")
    },
    "q_skyline" ->
      """with pts as (select distinct l_returnflag as flag,
        |  l_extendedprice as price, l_quantity as qty from lineitem)
        |select flag, price, qty from (
        | select flag, price, qty,
        |  min(qty) over (partition by flag order by price asc, qty asc
        |    rows between unbounded preceding and 1 preceding) as pm
        | from pts)
        |where pm is null or pm > qty""".stripMargin.replace("\n", " "),
    "sink_evolve" ->
      """select lang, cast(count(*) as bigint) as n_docs,
        | cast(sum(case when doc_id % 2 = 1 then n_chars else 0 end) as bigint)
        |  as sum_chars
        |from documents group by lang""".stripMargin.replace("\n", " "),
    "q_gapfill" -> EventOps.gapfillSql(),
    "q_transitions" -> EventOps.transitionsSql(),
    "stream_transitions" -> EventOps.transitionsSql(),
    "q_cumulative_users" ->
      """with ud as (select user_id, epoch_ns(ts) // 86400000000000 as d
        | from events),
        |fd as (select first_d as d, cast(count(*) as bigint) as new_users
        | from (select user_id, min(d) as first_d from ud group by 1)
        | group by 1),
        |ad as (select d, cast(count(*) as bigint) as active_users
        | from (select distinct user_id, d from ud) group by 1)
        |select ad.d, active_users,
        | coalesce(new_users, 0) as new_users,
        | cast(sum(coalesce(new_users, 0)) over (order by ad.d
        |   rows between unbounded preceding and current row) as bigint) as cum_users
        |from ad left join fd on ad.d = fd.d""".stripMargin.replace("\n", " "),
    "q_rfm" -> {
      def qCte(metric: String): String =
        s"""q$metric as (select v as $metric,
           |  cast(least(4, (below * 5) // nu) + 1 as bigint) as q_$metric
           | from (select v, cast(coalesce(sum(nv) over w, 0) as bigint) as below
           |   from (select $metric as v, cast(count(*) as bigint) as nv
           |     from rfm group by 1)
           |   window w as (order by v rows between unbounded preceding
           |     and 1 preceding)), nu)""".stripMargin.replace("\n", " ")
      s"""with rfm as (select user_id, max(epoch_ns(ts)) as r,
         |  cast(count(*) as bigint) as f, ${fpSum("value")} as m
         | from events group by 1),
         |nu as (select cast(count(*) as bigint) as nu from rfm),
         |${qCte("r")}, ${qCte("f")}, ${qCte("m")}
         |select q_r, q_f, q_m, cast(count(*) as bigint) as n_users
         |from rfm join qr using (r) join qf using (f) join qm using (m)
         |group by 1, 2, 3""".stripMargin.replace("\n", " ")
    },
    "q_mom_change" ->
      s"""with m as (select l_returnflag,
         |  cast(year(l_shipdate) * 12 + month(l_shipdate) as bigint) as m,
         |  ${fpSum("l_extendedprice")} as rev
         | from lineitem group by 1, 2)
         |select l_returnflag, m, rev,
         | lag(rev) over w as prev,
         | rev - lag(rev) over w as delta,
         | case when lag(rev) over w is null or lag(rev) over w = 0e0
         |  then null else (rev - lag(rev) over w) / lag(rev) over w end as pct
         |from m window w as (partition by l_returnflag order by m)"""
        .stripMargin.replace("\n", " "),
    "q_islands" ->
      """with uh as (select distinct user_id,
        |  epoch_ns(ts) // 3600000000000 as h from events),
        |g as (select user_id, h,
        |  h - cast(dense_rank() over (partition by user_id order by h) as bigint) as grpk
        | from uh)
        |select user_id, min(h) as h_start, max(h) as h_end,
        | cast(count(*) as bigint) as n_hours
        |from g group by user_id, grpk""".stripMargin.replace("\n", " "),
    "q_exists" ->
      """select o_orderpriority, cast(count(*) as bigint) as n_late_orders
        |from orders o
        |where exists (select 1 from lineitem l
        |  where l.l_orderkey = o.o_orderkey
        |  and l.l_shipdate > o.o_orderdate + interval 60 day)
        |group by o_orderpriority""".stripMargin.replace("\n", " "),
    "q_nation_volume" ->
      s"""select ns.n_name as supp_nation, nc.n_name as cust_nation,
         | cast(count(*) as bigint) as n_items,
         | ${fpSum("l_extendedprice * (1e0 - l_discount)")} as volume
         |from lineitem
         | join supplier on l_suppkey = s_suppkey
         | join orders on l_orderkey = o_orderkey
         | join customer on o_custkey = c_custkey
         | join nation ns on s_nationkey = ns.n_nationkey
         | join nation nc on c_nationkey = nc.n_nationkey
         |where ns.n_name <> nc.n_name
         |group by ns.n_name, nc.n_name""".stripMargin.replace("\n", " "),
    "stream_interval" ->
      """select p.event_id as p_id, c.event_id as c_id,
        | p.user_id as user_id,
        | (epoch_ns(p.ts) // 1000 - epoch_ns(c.ts) // 1000) // 1000000 as gap_sec
        |from events p join events c
        | on p.user_id = c.user_id
        | and p.event_type = 'purchase' and c.event_type = 'click'
        | and epoch_ns(p.ts) // 1000 >= epoch_ns(c.ts) // 1000
        | and epoch_ns(p.ts) // 1000 <= epoch_ns(c.ts) // 1000 + 7200000000"""
        .stripMargin.replace("\n", " "),
    "q_promo_share" -> {
      val promo = fpSum("case when p_type = 'PROMO' then l_extendedprice * (1e0 - l_discount) else 0e0 end")
      val total = fpSum("l_extendedprice * (1e0 - l_discount)")
      s"""select cast(year(l_shipdate) as bigint) as y,
         | cast(month(l_shipdate) as bigint) as m,
         | $promo as promo_revenue, $total as total_revenue,
         | 100e0 * $promo / $total as promo_share
         |from lineitem join part on l_partkey = p_partkey
         |group by 1, 2""".stripMargin.replace("\n", " ")
    },
    "q_cust_dist" ->
      """select c_count, cast(count(*) as bigint) as custdist
        |from (select c_custkey, cast(count(o_orderkey) as bigint) as c_count
        | from customer left join
        |  (select o_custkey, o_orderkey from orders
        |   where o_orderpriority = '1-URGENT') o
        |  on c_custkey = o_custkey
        | group by c_custkey)
        |group by c_count""".stripMargin.replace("\n", " "),
    "q_avg_yearly" ->
      s"""select cast(count(*) as bigint) as n_small,
         | ${fpSum("l_extendedprice")} / 7e0 as avg_yearly
         |from (select l_quantity, l_extendedprice,
         |  sum(l_quantity) over (partition by l_partkey)
         |   / cast(count(*) over (partition by l_partkey) as double) as avg_qty
         | from lineitem join part on l_partkey = p_partkey
         | where p_brand = 'Brand#1')
         |where l_quantity < 2e-1 * avg_qty""".stripMargin.replace("\n", " "),
    "q_large_orders" ->
      """select c_name, c_custkey, o_orderkey,
        | cast(epoch_us(o_orderdate) // 1000000 as bigint) as order_epoch,
        | o_totalprice, sum_qty
        |from (select l_orderkey, cast(sum(l_quantity) as double) as sum_qty
        |  from lineitem group by l_orderkey having sum(l_quantity) > 150) big
        | join orders on l_orderkey = o_orderkey
        | join customer on o_custkey = c_custkey
        |order by o_totalprice desc, o_orderkey asc limit 100"""
        .stripMargin.replace("\n", " "),
    "q_disjunctive" ->
      s"""select cast(count(*) as bigint) as n_items,
         | ${fpSum("l_extendedprice * (1e0 - l_discount)")} as revenue
         |from lineitem join part on l_partkey = p_partkey
         |where $disjunctiveArms""".stripMargin.replace("\n", " "),
    "sketch_quantiles" -> Quantiles.histSql("lineitem", "l_extendedprice"),
    "q_local_supplier" ->
      s"""select n_name, ${fpSum("l_extendedprice * (1e0 - l_discount)")} as revenue,
         | cast(count(*) as bigint) as n_items
         |from lineitem
         | join orders on l_orderkey = o_orderkey
         | join customer on o_custkey = c_custkey
         | join supplier on l_suppkey = s_suppkey and c_nationkey = s_nationkey
         | join nation on s_nationkey = n_nationkey
         | join region on n_regionkey = r_regionkey
         |where r_name = 'ASIA'
         | and o_orderdate >= timestamp '1997-01-01'
         | and o_orderdate < timestamp '1998-01-01'
         |group by n_name""".stripMargin.replace("\n", " "),
    "sink_zorder" -> graft.operators.Zorder.rectangleSql(),
    "sink_hilbert" -> graft.operators.Hilbert.rectangleSql(),
    // era-1 rows surface the evolved column as NULL — same union the
    // mergeSchema read reconciles
    "sink_evolve" ->
      s"""select case when o_orderdate >= timestamp '1997-01-01'
         |  then o_orderpriority end as prio,
         | cast(count(*) as bigint) as n,
         | ${fpSum("o_totalprice")} as total
         |from orders group by 1""".stripMargin.replace("\n", " "),
    "sink_sorted" ->
      s"""select cast(month(l_shipdate) as bigint) as m,
         | cast(count(*) as bigint) as n_items,
         | ${fpSum("l_extendedprice")} as revenue,
         | cast(sum(l_quantity) as double) as sum_qty
         |from lineitem
         |where l_shipdate >= timestamp '1997-06-01'
         | and l_shipdate < timestamp '1997-09-01'
         |group by 1""".stripMargin.replace("\n", " "),
    "sink_partitioned" ->
      """select source, cast(count(*) as bigint) as n_docs,
        | cast(sum(n_chars) as bigint) as sum_chars
        |from documents where lang = 'en' group by source"""
        .stripMargin.replace("\n", " "),
    "q_grouping_sets" -> groupingSetsSql("lineitem"),
    "sink_compact" ->
      s"""select l_returnflag, cast(count(*) as bigint) as n,
         | ${fpSum("l_quantity")} as sum_qty
         |from lineitem group by l_returnflag""".stripMargin.replace("\n", " "),
    "fuzzy_pairs" -> graft.operators.TextOps.fuzzyPairsSql("part", "p_name"),
    "graph_pagerank" -> graft.operators.Graph.pageRankSql(),
    "graph_triangles" -> graft.operators.Graph.trianglesSql(),
    "graph_lpa" -> graft.operators.Graph.labelCommunitiesSql(),
    "stat_corr" -> Stats.corrSql("lineitem", "l_returnflag",
      "l_quantity", "(l_extendedprice / 1024e0)"),
    "stat_ols" -> Stats.olsSql("lineitem", "l_returnflag",
      "l_quantity", "(l_extendedprice / 1024e0)"),
    "stat_ttest" -> Stats.welchTSql("lineitem", "l_returnflag", "l_discount"),
    "stat_ks" -> Stats.ksSql(),
    "stat_mi" -> Stats.mutualInfoSql(),
    "stat_mad" -> Quantiles.madSql("lineitem", "l_extendedprice"),
    "stat_gini" -> Stats.giniSql(),
    "q_skew_profile" ->
      """with keys as (select l_partkey, cast(count(*) as bigint) as c
        | from lineitem group by 1),
        |grid as (select c, cast(count(*) as bigint) as nk from keys group by 1),
        |tot as (select cast(sum(nk) as bigint) as n_keys,
        |  cast(sum(c * nk) as bigint) as n_rows,
        |  cast(max(c) as bigint) as max_c from grid),
        |p99 as (select cast(min(c) as bigint) as p99_c from
        | (select c, cast(sum(nk) over (order by c
        |    rows between unbounded preceding and current row) as bigint) as cum
        |  from grid), tot where cum * 100 >= n_keys * 99)
        |select n_keys, n_rows, max_c, p99_c,
        | cast(n_rows as double) / cast(n_keys as double) as mean_c,
        | cast(max_c as double) / (cast(n_rows as double) / cast(n_keys as double))
        |  as skew_ratio
        |from tot, p99""".stripMargin.replace("\n", " "),
    "q_profile" -> Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(c =>
        s"""select '$c' as col_name, cast(count(*) as bigint) as n,
           | cast(count($c) as bigint) as n_nonnull,
           | cast(count(distinct $c) as bigint) as ndv,
           | min($c) as mn, max($c) as mx,
           | ${fpSum(c)} / cast(count($c) as double) as mean
           |from lineitem""".stripMargin.replace("\n", " "))
      .mkString(" union all "),
    "ts_acf" -> Stats.acfSql(),
    "stat_bootstrap" -> Stats.bootstrapSql("lineitem", "l_returnflag",
      "(l_extendedprice / 1024e0)",
      "concat(cast(l_orderkey as varchar), '_', cast(l_linenumber as varchar))"),
    "stat_chisq" -> Stats.chisqSql(
      "select c_mktsegment, o_orderpriority from orders " +
        "join customer on o_custkey = c_custkey",
      "c_mktsegment", "o_orderpriority"),
    "q_funnel" ->
      """with e as (select user_id, event_type, epoch_ns(ts) // 1000 as us from events),
        |g1 as (select user_id,
        |  min(case when event_type = 'view' then us end) as t1
        | from e group by user_id),
        |g2 as (select e.user_id,
        |  min(case when event_type = 'click' and us > t1 then us end) as t2
        | from e join g1 on e.user_id = g1.user_id group by e.user_id),
        |g3 as (select e.user_id,
        |  min(case when event_type = 'purchase' and us > t2 then us end) as t3
        | from e join g2 on e.user_id = g2.user_id group by e.user_id)
        |select g1.user_id, t1, t2, t3,
        | cast(case when t3 is not null then 3 when t2 is not null then 2
        |  when t1 is not null then 1 else 0 end as bigint) as stage
        |from g1 join g2 on g1.user_id = g2.user_id
        | join g3 on g1.user_id = g3.user_id"""
        .stripMargin.replace("\n", " "),
    "q_retention" ->
      """with d as (select distinct user_id,
        |  epoch_ns(ts) // 86400000000000 as day from events),
        |f as (select user_id, min(day) as fday from d group by user_id)
        |select fday // 7 as cohort_week, (day - fday) // 7 as week_offset,
        | cast(count(distinct d.user_id) as bigint) as n_users
        |from d join f on d.user_id = f.user_id
        |group by 1, 2""".stripMargin.replace("\n", " "),
    "q_upsert" ->
      s"""with changes as (select
         |  case when o_custkey % 10 = 0 then o_custkey + 10000000
         |   else o_custkey end as u_key,
         |  cast(count(*) as bigint) as n_orders,
         |  ${fpSum("o_totalprice")} as delta
         | from orders where o_orderdate >= timestamp '1998-01-01'
         | group by 1)
         |select coalesce(c_custkey, u_key) as key,
         | coalesce(c_acctbal, 0e0) + coalesce(delta, 0e0) as acctbal_new,
         | case when c_custkey is null then 'insert'
         |  when u_key is null then 'carry' else 'update' end as action
         |from customer full outer join changes on c_custkey = u_key"""
        .stripMargin.replace("\n", " "),
    "q_market_share" -> {
      val nat = fpSum("case when n2.n_name = 'NATION_1' then l_extendedprice * (1e0 - l_discount) else 0e0 end")
      val tot = fpSum("l_extendedprice * (1e0 - l_discount)")
      s"""select cast(year(o_orderdate) as bigint) as y,
         | $nat as nation_volume, $tot as total_volume,
         | $nat / $tot as mkt_share
         |from lineitem
         | join orders on l_orderkey = o_orderkey
         | join customer on o_custkey = c_custkey
         | join nation n1 on c_nationkey = n1.n_nationkey
         | join region on n1.n_regionkey = r_regionkey
         | join supplier on l_suppkey = s_suppkey
         | join nation n2 on s_nationkey = n2.n_nationkey
         |where r_name = 'AMERICA'
         |group by 1""".stripMargin.replace("\n", " ")
    },
    "q_returned" ->
      s"""select c_custkey, c_name, c_acctbal, n_name,
         | ${fpSum("l_extendedprice * (1e0 - l_discount)")} as revenue
         |from lineitem
         | join orders on l_orderkey = o_orderkey
         | join customer on o_custkey = c_custkey
         | join nation on c_nationkey = n_nationkey
         |where l_returnflag = 'R'
         | and o_orderdate >= timestamp '1997-01-01'
         | and o_orderdate < timestamp '1997-07-01'
         |group by c_custkey, c_name, c_acctbal, n_name
         |order by revenue desc, c_custkey asc limit 20"""
        .stripMargin.replace("\n", " "),
    "q_waiting" ->
      """with ps as (select l_orderkey, l_suppkey,
        |  max(case when l_shipdate > o_orderdate + interval 30 day
        |    then 1 else 0 end) as late
        | from lineitem join orders on l_orderkey = o_orderkey
        | group by l_orderkey, l_suppkey),
        |cr as (select l_suppkey from (
        |  select l_suppkey, late,
        |   count(*) over (partition by l_orderkey) as n_supp,
        |   sum(late) over (partition by l_orderkey) as n_late
        |  from ps) where late = 1 and n_late = 1 and n_supp > 1),
        |cn as (select l_suppkey, cast(count(*) as bigint) as numwait
        | from cr group by l_suppkey
        | order by numwait desc, l_suppkey asc limit 10)
        |select s_suppkey, s_name, numwait
        |from cn join supplier on l_suppkey = s_suppkey"""
        .stripMargin.replace("\n", " "),
    "q_anomaly" -> anomalySql,
    "stream_anomaly" -> anomalySql,
    "q_twap" -> twapSql,
    "stream_twap" ->
      // the stream emits a (user, hour) exactly when a later-hour event
      // arrives — i.e. the batch TWAP restricted to COMPLETE hours
      // (user's max event µs past the hour end); the open tail stays in
      // state (the stream_sessions open-session discipline)
      s"""select t.user_id, t.hour, t.n_events, t.held_ms, t.twap
         |from ($twapSql) t
         |join (select user_id, max(epoch_ns(ts) // 1000) as mx
         |  from events group by user_id) m on t.user_id = m.user_id
         |where m.mx >= (t.hour + 1) * 3600000000"""
        .stripMargin.replace("\n", " "),
    "q_latest" -> latestSql,
    "q_share" ->
      """select l_returnflag, l_linestatus, (qty_fp / 1048576e0) as sum_qty,
        | cast(qty_fp as double) / cast(sum(qty_fp) over (partition by l_returnflag) as double) as share
        |from (select l_returnflag, l_linestatus,
        |  cast(sum(cast(floor(l_quantity * 1048576e0 + 5e-1) as bigint)) as bigint) as qty_fp
        | from lineitem group by 1, 2) a""".stripMargin.replace("\n", " "),
    "stream_latest" -> latestSql,
    "stream_hll" -> graft.operators.Hll.eventsHllSql(),
    "q_forecast" ->
      s"""select ${fpSum("l_extendedprice * l_discount")} as revenue,
         | cast(count(*) as bigint) as n_rows
         |from lineitem
         |where l_shipdate >= timestamp '1997-01-01'
         | and l_shipdate < timestamp '1998-01-01'
         | and l_discount >= 2e-2 and l_discount <= 8e-2
         | and l_quantity < 24e0""".stripMargin.replace("\n", " "),
    "q_ewma" -> ewmaSql,
    "stream_ewma" -> ewmaSql,
    "q_last_touch" ->
      """select user_id, event_id as purchase_id, tsu as purchase_us,
        | click_id, click_us
        |from (select user_id, event_id, event_type, tsu,
        |  last_value(case when event_type = 'click' then event_id end ignore nulls)
        |   over (partition by user_id order by tsu asc, event_id asc
        |    rows between unbounded preceding and 1 preceding) as click_id,
        |  last_value(case when event_type = 'click' then tsu end ignore nulls)
        |   over (partition by user_id order by tsu asc, event_id asc
        |    rows between unbounded preceding and 1 preceding) as click_us
        | from (select user_id, event_id, event_type,
        |   epoch_ns(ts) // 1000 as tsu from events) b) w
        |where event_type = 'purchase'""".stripMargin.replace("\n", " "),
    "q_top_supplier" ->
      s"""with rev as (select l_suppkey as supplier_no,
         |  ${fpSum("l_extendedprice * (1e0 - l_discount)")} as total_revenue
         | from lineitem
         | where l_shipdate >= timestamp '1997-01-01'
         |  and l_shipdate < timestamp '1997-04-01'
         | group by l_suppkey)
         |select s_suppkey, s_name, total_revenue
         |from supplier join rev on s_suppkey = supplier_no
         |where total_revenue = (select max(total_revenue) from rev)"""
        .stripMargin.replace("\n", " "),
    "q_events_cume" ->
      """select event_id, event_type, value,
        | percent_rank() over (partition by event_type
        |  order by value asc, event_id asc) as pr,
        | cume_dist() over (partition by event_type
        |  order by value asc, event_id asc) as cd
        |from events""".stripMargin.replace("\n", " "),
    "q_events_range" ->
      """select event_id, user_id, tsn // 1000000000 as ts_sec,
        | cast(n_next_10m as bigint) as n_next_10m
        |from (
        | select event_id, user_id, tsn,
        |  count(*) over (partition by user_id order by tsn asc
        |    range between current row and 600000000000 following) - 1 as n_next_10m
        | from (select event_id, user_id, epoch_ns(ts) as tsn from events))"""
        .stripMargin.replace("\n", " "),
    "q_min_cost" ->
      """select p_partkey, s_suppkey, s_name, min_cost from (
        | select p_partkey, s_suppkey, s_name, min_cost,
        |  row_number() over (partition by p_partkey
        |   order by min_cost asc, s_suppkey asc) as rn
        | from (
        |  select p_partkey, s_suppkey, s_name,
        |   min(l_extendedprice / l_quantity) as min_cost
        |  from lineitem
        |  join supplier on l_suppkey = s_suppkey
        |  join nation on s_nationkey = n_nationkey
        |  join region on n_regionkey = r_regionkey and r_name = 'EUROPE'
        |  join part on l_partkey = p_partkey and p_size < 10
        |  where l_quantity > 0e0
        |  group by p_partkey, s_suppkey, s_name))
        |where rn = 1""".stripMargin.replace("\n", " "),
    "q_important_parts" -> {
      val sval = "(l_extendedprice * l_quantity / 16384e0)"
      s"""with t as (select (${fpSum(sval)} * 16384e0) as total_value,
         |  cast(count(distinct l_partkey) as bigint) as n_parts from lineitem),
         |p as (select l_partkey, (${fpSum(sval)} * 16384e0) as part_value
         |  from lineitem group by l_partkey)
         |select l_partkey, part_value from p, t
         |where part_value > total_value / cast(n_parts as double) * 15e-1"""
        .stripMargin.replace("\n", " ")
    },
    "q_parts_suppliers" ->
      """select p_brand, p_size, cast(count(distinct l_suppkey) as bigint) as supplier_cnt
        |from lineitem
        |join part on l_partkey = p_partkey and p_brand <> 'Brand#13'
        |where l_suppkey not in (select s_suppkey from supplier where s_name like '%7')
        |group by p_brand, p_size""".stripMargin.replace("\n", " "),
    "q_excess_suppliers" ->
      s"""with li as (select l_partkey, l_suppkey, l_quantity from lineitem
         |  where l_shipdate >= timestamp '1997-01-01'
         |   and l_shipdate < timestamp '1998-01-01'),
         |pair as (select l_partkey, l_suppkey, ${fpSum("l_quantity")} as supp_qty
         |  from li group by l_partkey, l_suppkey),
         |pp as (select l_partkey as pk, ${fpSum("l_quantity")} as part_qty
         |  from li group by l_partkey)
         |select s_suppkey, s_name from supplier
         |where s_suppkey in (
         | select distinct l_suppkey from pair join pp on l_partkey = pk
         | where supp_qty > part_qty * 3e-1)""".stripMargin.replace("\n", " "),
    "q_inactive_rich" ->
      s"""with c as (select c_custkey, c_acctbal,
         |  substring(c_name, length(c_name) - 1, 2) as code from customer),
         |a as (select ${fpSum("c_acctbal")} / cast(count(*) as double) as avg_bal
         |  from customer where c_acctbal > 0e0)
         |select code, cast(count(*) as bigint) as n_cust,
         | ${fpSum("c_acctbal")} as total_bal
         |from c, a
         |where c_acctbal > avg_bal
         | and not exists (select 1 from orders
         |   where o_custkey = c_custkey and o_orderpriority = '1-URGENT')
         |group by code""".stripMargin.replace("\n", " ")
  )
}
