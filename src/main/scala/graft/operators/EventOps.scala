package graft.operators

import graft.oracle.Parity
import graft.oracle.Parity.{DuckD, SparkD}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-table operators: event-time windows, JSON prop extraction,
  * sessionization (SURVEY.md §7.6 extension surface over `events`).
  *
  * `ts` arrives as epoch-nanos BIGINT (see [[graft.sources.Tables.read]]);
  * all outputs are epoch integers, keeping timestamps out of the
  * cross-engine compare entirely.
  */
object EventOps {

  /** Tumbling hour aggregate keyed by epoch seconds. `v` uses fixed-point
    * summation ([[Parity.fpSum]]) for cross-engine determinism. */
  def hourly(events: DataFrame): DataFrame =
    events
      .withColumn("hour_epoch", expr(Parity.hourEpoch(SparkD, "ts")))
      .groupBy("hour_epoch", "event_type")
      .agg(count(lit(1)).as("n"), expr(Parity.fpSum("value")).as("v"))

  def hourlySql(table: String = "events"): String =
    s"""select ${Parity.hourEpoch(DuckD, "ts")} as hour_epoch, event_type,
       | cast(count(*) as bigint) as n, ${Parity.fpSum("value")} as v
       |from $table group by 1, 2""".stripMargin.replace("\n", " ")

  /** Cohort retention matrix — the classic product-analytics operator:
    * users cohort by their FIRST-activity day, cell (cohort, offset) =
    * distinct users of that cohort active `offset` days later, with the
    * rate against the cohort size. Runs entirely on the (user, day)
    * GRID: one distinct projection collapses the event stream, then a
    * per-user min and grid-sized aggregates/joins — the raw stream is
    * touched once and nothing windows over it. Counts are exact
    * integers; the rate is one exact division — full hash gate. */
  def retention(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"),
        expr(s"cast(${Parity.dayIdx(SparkD, "ts")} as bigint)").as("day"))
      .distinct()
    val first = days.groupBy("user_id").agg(min("day").as("cohort"))
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("n_users"))
    days.join(first, "user_id")
      .groupBy(col("cohort"), (col("day") - col("cohort")).as("day_offset"))
      .agg(countDistinct("user_id").as("n_active"))
      .join(sizes, "cohort")
      .withColumn("rate",
        col("n_active").cast("double") / col("n_users").cast("double"))
      .select("cohort", "day_offset", "n_active", "n_users", "rate")
  }

  /** DuckDB mirror of [[retention]]. */
  def retentionSql(table: String = "events"): String =
    s"""with days as (select distinct user_id,
       |  cast(${Parity.dayIdx(DuckD, "ts")} as bigint) as day from $table),
       |fst as (select user_id, min(day) as cohort from days group by 1),
       |sizes as (select cohort, cast(count(*) as bigint) as n_users
       |  from fst group by 1),
       |act as (select cohort, day - cohort as day_offset,
       |  cast(count(distinct user_id) as bigint) as n_active
       | from days join fst using (user_id) group by 1, 2)
       |select cohort, day_offset, n_active, n_users,
       | cast(n_active as double) / cast(n_users as double) as rate
       |from act join sizes using (cohort)""".stripMargin.replace("\n", " ")

  /** JSON prop extraction. The library path uses the native
    * `get_json_object`; the oracle extracts the same scalar with an
    * identical regex — both produce the digits as a string → BIGINT. */
  val kRegex = "\"k\": ([0-9]+)"

  def propStats(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .withColumn("avg_k", col("sum_k").cast("double") / col("n").cast("double"))

  def propStatsSql(table: String = "events"): String =
    s"""select event_type, cast(count(*) as bigint) as n,
       | cast(sum(k) as bigint) as sum_k,
       | cast(min(k) as bigint) as min_k, cast(max(k) as bigint) as max_k,
       | cast(cast(sum(k) as bigint) as double) / cast(count(*) as double) as avg_k
       |from (select event_type,
       |  cast(nullif(regexp_extract(props, '$kRegex', 1), '') as bigint) as k
       |  from $table)
       |group by event_type""".stripMargin.replace("\n", " ")

  /** As-of join — enrich each left row with the latest right row at or
    * before its timestamp, per key (the temporal-enrichment operator the
    * prompt class of engines ships natively; Spark lacks it).
    *
    * Spark-first rendering: NOT a per-row range join (quadratic in
    * events/key) but the merge shape — tag the sides, union, and take a
    * running `last(payload, ignoreNulls)` over ONE window ordered by
    * (ts, side, order). Right rows sort before co-timestamped left rows
    * (side 0 < 1), giving inclusive "at-or-before" semantics; `order`
    * breaks right-side ts ties deterministically (greatest order wins —
    * the latest write). One shuffle on the key + one sort — exactly the
    * distributed merge an as-of join compiles to at 100 TB, and every
    * payload column rides the same Window operator.
    *
    * Both frames must carry `key`, `ts`, `order`; left keeps all its
    * columns, right contributes `payload` columns renamed `asof_<c>`
    * (NULL where no right row precedes). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               order: String, payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fixed = Seq(key, ts, order)
    val leftOther = left.columns.toSeq.filterNot(fixed.contains)
    val lSel = fixed.map(col) ++ Seq(lit(1).as("_side")) ++ leftOther.map(col) ++
      payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"asof_$c"))
    val rSel = fixed.map(col) ++ Seq(lit(0).as("_side")) ++
      leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      payload.map(c => col(c).as(s"asof_$c"))
    val u = left.select(lSel: _*).unionByName(right.select(rSel: _*))
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("_side").asc, col(order).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val enriched = payload.foldLeft(u)((df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w)))
    enriched.filter(col("_side") === 1).drop("_side")
  }

  /** DuckDB mirror of [[asofJoin]] for the events demo (purchase rows
    * enriched with the user's latest at-or-before click): the identical
    * union + running-last spelling, so tie semantics match bit-for-bit
    * (DuckDB's native ASOF JOIN would leave right-side ts ties
    * unspecified). */
  def asofSql(table: String = "events"): String =
    s"""with l as (select user_id, epoch_ns(ts) as tsn, event_id, 1 as side,
       |  cast(null as bigint) as a_id, cast(null as bigint) as a_tsn,
       |  cast(null as double) as a_val
       | from $table where event_type = 'purchase'),
       |r as (select user_id, epoch_ns(ts) as tsn, event_id, 0 as side,
       |  event_id as a_id, epoch_ns(ts) as a_tsn, value as a_val
       | from $table where event_type = 'click'),
       |u as (select * from l union all select * from r),
       |wn as (select user_id, tsn, event_id, side,
       |  last_value(a_id ignore nulls) over win as asof_event_id,
       |  last_value(a_tsn ignore nulls) over win as asof_tsn,
       |  last_value(a_val ignore nulls) over win as asof_value
       | from u
       | window win as (partition by user_id order by tsn asc, side asc, event_id asc
       |   rows between unbounded preceding and current row))
       |select event_id, user_id, tsn // 1000000000 as ts_sec,
       | asof_event_id as click_id, asof_value as click_value,
       | (tsn - asof_tsn) // 1000000000 as gap_sec
       |from wn where side = 1""".stripMargin.replace("\n", " ")

  /** Per-user rolling aggregate: trailing `window`-row sum/avg of the
    * fixed-point-quantized value, ordered by (ts, event_id). Quantized
    * dyadic addends make the rolling double sums exact → deterministic
    * cross-engine with no rounding. */
  def rolling(events: DataFrame, window: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(window - 1), Window.currentRow)
    events
      .withColumn("vq", expr(
        "cast(floor(value * 1048576e0 + 5e-1) as bigint) / 1048576e0"))
      .withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("roll_sum", sum("vq").over(w))
      .withColumn("roll_avg", col("roll_sum") / col("roll_n").cast("double"))
      .select("event_id", "user_id", "roll_n", "roll_sum", "roll_avg")
  }

  def rollingSql(table: String = "events", window: Int = 5): String = {
    val w = s"over (partition by user_id order by ts, event_id " +
      s"rows between ${window - 1} preceding and current row)"
    s"""select event_id, user_id,
       | cast(count(*) $w as bigint) as roll_n,
       | sum(cast(floor(value * 1048576e0 + 5e-1) as bigint) / 1048576e0) $w as roll_sum,
       | (sum(cast(floor(value * 1048576e0 + 5e-1) as bigint) / 1048576e0) $w)
       |   / cast(count(*) $w as double) as roll_avg
       |from $table""".stripMargin.replace("\n", " ")
  }

  /** Sliding event-time windows (1h window, 15min slide): each event lands
    * in 4 epoch-aligned buckets — the Spark `window()` semantics, spelled
    * as an explode so the DuckDB oracle can mirror it exactly. */
  def sliding(events: DataFrame): DataFrame =
    events
      .withColumn("ts_t", expr("timestamp_micros(ts div 1000)"))
      .withColumn("w", expr("window(ts_t, '1 hour', '15 minutes')"))
      .select(expr("unix_micros(w.start) div 1000000").as("win_start"),
        col("event_type"), col("value"))
      .groupBy("win_start", "event_type")
      .agg(count(lit(1)).as("n"), expr(Parity.fpSum("value")).as("v"))

  def slidingSql(table: String = "events"): String =
    s"""select win_start, event_type, cast(count(*) as bigint) as n,
       | ${Parity.fpSum("value")} as v
       |from (
       |  select ((epoch_ns(ts) // 900000000000) - k) * 900 as win_start,
       |         event_type, value
       |  from $table cross join (select unnest([0, 1, 2, 3]) as k))
       |group by win_start, event_type""".stripMargin.replace("\n", " ")

  /** Session windows per user: a new session starts after `gapMinutes` of
    * inactivity — the classic lag+cumsum pattern, one shuffle on user_id. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val gapSec = gapMinutes * 60L
    val sec = expr(Parity.epochSec(SparkD, "ts"))
    val prevSec = expr(Parity.epochSec(SparkD, "prev_ts"))
    events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || (sec - prevSec) > gapSec, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min("ts").as("ts_min"), max("ts").as("ts_max"))
  }

  /** Exponentially-weighted moving average over each user's last 8
    * events, decay 1/2 — the trailing-feature op of event feature
    * engineering. Weights are POWERS OF TWO over fixed-point values, so
    * numerator and denominator are exact BIGINTs (no float-order
    * dependence); the 8 lags share one window spec → one shuffle + one
    * sort. ewma = (Σ 2^(7-k)·v_fp[i-k]) / (Σ 2^(7-k) present) / 2^20;
    * missing history drops terms (first events average a shorter tail).
    * The streaming twin is [[graft.streaming.EventStream.ewmaStream]]. */
  /** SCD Type-2 dimension build — compress a per-key update stream into
    * versioned validity intervals, the standard warehouse shape for
    * "attribute history" (Kimball SCD2; Delta/Iceberg MERGE pipelines
    * build exactly this relation). The changing attribute here is the
    * event value bucketed into integer tiers (`floor(value / 20)`), so
    * consecutive updates genuinely repeat and the run-collapse step is
    * exercised — a new version opens only when the tier CHANGES.
    *
    * Scale shape: one shuffle on the dimension key (user_id) feeding
    * three windows over the SAME (key, ts, event_id) sort — Spark plans
    * one Exchange + one Sort and pipelines the change-flag lag, the
    * version cumsum, and the valid_to lead through it. No joins, no
    * driver state; 100 TB of updates is one sort-merge pass per key.
    * Intervals are epoch-nanos integers: `valid_to` is NULL on the
    * current (open) version, `is_current` materializes that flag. */
  def scd2(events: DataFrame, eventType: String = "purchase"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .filter(col("event_type") === eventType)
      .withColumn("tier", expr("cast(floor(value / 20e0) as bigint)"))
      .withColumn("prev_tier", lag(col("tier"), 1).over(order))
      // first row per key opens version 1; after that only tier changes do
      .withColumn("chg",
        when(col("prev_tier").isNull || col("tier") =!= col("prev_tier"), 1L)
          .otherwise(0L))
      .filter(col("chg") === 1L)
      .withColumn("version", row_number().over(order).cast("long"))
      .withColumn("valid_from", col("ts"))
      .withColumn("valid_to", lead(col("ts"), 1).over(order))
      .withColumn("is_current", col("valid_to").isNull)
      .select("user_id", "version", "tier", "valid_from", "valid_to",
        "is_current")
  }

  /** DuckDB mirror of [[scd2]] — identical window spelling; the raw
    * parquet `ts` is a TIMESTAMP there, mapped onto the same epoch-nanos
    * integers via `epoch_ns`. */
  def scd2Sql(table: String = "events", eventType: String = "purchase"): String =
    s"""with upd as (
       | select user_id, epoch_ns(ts) as tsn, event_id,
       |  cast(floor(value / 20e0) as bigint) as tier
       | from $table where event_type = '$eventType'),
       |chg as (
       | select user_id, tsn, event_id, tier,
       |  lag(tier) over (partition by user_id order by tsn, event_id) as prev_tier
       | from upd),
       |runs as (
       | select user_id, tsn, event_id, tier from chg
       | where prev_tier is null or tier <> prev_tier)
       |select user_id,
       | cast(row_number() over w as bigint) as version, tier,
       | tsn as valid_from,
       | lead(tsn) over w as valid_to,
       | (lead(tsn) over w is null) as is_current
       |from runs
       |window w as (partition by user_id order by tsn, event_id)"""
      .stripMargin.replace("\n", " ")

  /** First-order Markov transition matrix of the event stream — the
    * path-analysis primitive (what follows what, per user journey):
    * P(next type | type) from per-user consecutive event pairs. One
    * user-keyed sort feeds the lag window; pair counts aggregate
    * map-side; probabilities are exact integer ratios of the pair count
    * over the source type's outgoing total (a window over the
    * cell-sized count relation). */
  def transitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("next_type", lead(col("event_type"), 1).over(order))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("out_total",
        sum("n").over(Window.partitionBy("from_type")))
      .withColumn("p", col("n").cast("double") / col("out_total").cast("double"))
      .select("from_type", "to_type", "n", "p")
  }

  /** DuckDB mirror of [[transitions]]. */
  def transitionsSql(table: String = "events"): String =
    s"""with seq as (select user_id, event_type,
       |  lead(event_type) over (partition by user_id
       |   order by ts, event_id) as next_type
       | from $table),
       |pairs as (select event_type as from_type, next_type as to_type,
       |  cast(count(*) as bigint) as n
       | from seq where next_type is not null group by 1, 2)
       |select from_type, to_type, n,
       | cast(n as double) / cast(sum(n) over (partition by from_type) as double) as p
       |from pairs""".stripMargin.replace("\n", " ")

  /** Bitmap-index conjunction — the OLAP bitmap join: build one bitmap
    * index per low-cardinality dimension (64 row-locators packed per
    * BIGINT word via `bit_or`), then answer the two-dimensional count
    * with a word-aligned AND + popcount instead of touching fact rows.
    * This is how column stores answer multi-predicate counts over
    * low-cardinality columns: the index relation is rows/64 words per
    * distinct value, the conjunction join is keyed on the word index,
    * and each output cell costs one popcount per word — at 100 TB the
    * fact table is scanned once to BUILD the indexes and never again.
    *
    * The row locator is `event_id` (unique and dense). The oracle is
    * the direct GROUP BY count — hash equality proves the whole bitmap
    * mechanics (pack, AND, popcount) lossless. */
  def bitmapConjunction(events: DataFrame): DataFrame = {
    val e = events
      .withColumn("word", expr("event_id div 64"))
      .withColumn("bm", expr("shiftleft(cast(1 as bigint), cast(event_id % 64 as int))"))
      .withColumn("tier", expr("cast(floor(value / 25e0) as bigint)"))
    val idxT = e.groupBy("event_type", "word").agg(expr("bit_or(bm)").as("wt"))
    val idxV = e.groupBy("tier", "word").agg(expr("bit_or(bm)").as("wv"))
    idxT.join(idxV, "word")
      .groupBy("event_type", "tier")
      .agg(sum(expr("cast(bit_count(wt & wv) as bigint)")).as("n_rows"))
      .filter(col("n_rows") > 0)
  }

  /** Oracle of [[bitmapConjunction]]: the direct two-dimension count. */
  def bitmapConjunctionSql(table: String = "events"): String =
    s"""select event_type, cast(floor(value / 25e0) as bigint) as tier,
       | cast(count(*) as bigint) as n_rows
       |from $table group by 1, 2""".stripMargin.replace("\n", " ")

  /** Incremental view maintenance of the hourly aggregate — the
    * materialized-view refresh pattern: the standing view (events up to
    * the data-derived cut) and the newly arrived delta batch are
    * aggregated SEPARATELY, then merged by summing partial states —
    * never recomputing the base. Works because count and the
    * fixed-point sum are commutative monoids: [[Parity.fpSum]] outputs
    * are exact multiples of 2^-20, so merging partials is exact and
    * order-free — the same property that makes the aggregate
    * map-side-combinable inside one job makes it incrementally
    * maintainable ACROSS jobs. The oracle is the plain full recompute
    * ([[hourlySql]]); hash equality is the IVM correctness proof.
    *
    * At 100 TB the base aggregate is a stored view-sized relation (hours
    * × types) and each refresh touches only the delta — this query runs
    * both sides from source to keep it self-contained and checkable. */
  def hourlyIncremental(events: DataFrame): DataFrame = {
    val cut = events.agg(expr("max(event_id) div 2").as("cut"))
    val tagged = events.crossJoin(broadcast(cut))
    def part(df: DataFrame): DataFrame = df
      .withColumn("hour_epoch", expr(Parity.hourEpoch(SparkD, "ts")))
      .groupBy("hour_epoch", "event_type")
      .agg(count(lit(1)).as("n"), expr(Parity.fpSum("value")).as("v"))
    val base = part(tagged.filter(col("event_id") <= col("cut")))
    val delta = part(tagged.filter(col("event_id") > col("cut")))
    base.unionByName(delta)
      .groupBy("hour_epoch", "event_type")
      .agg(sum("n").as("n"), sum("v").as("v"))
  }

  /** Oracle of [[hourlyIncremental]] is the FULL recompute — equality
    * proves the partial-state merge exact. */
  def hourlyIncrementalSql(table: String = "events"): String =
    hourlySql(table)

  /** Gap-fill + linear interpolation of a per-key hourly series — the
    * time-series densification operator (`time_bucket_gapfill` /
    * `interpolate` in the timeseries-DB world). Present hours carry the
    * fixed-point hourly sum; missing hours inside each key's observed
    * span are generated and linearly interpolated between the bracketing
    * observations. The axis ends at the last observation inside the
    * `capHours` window, so every emitted 'interp' row is bracketed and
    * non-NULL — the cap bounds output size without fabricating an
    * unbracketed tail.
    *
    * Scale shape: the observed series aggregates map-side (one shuffle on
    * (user, hour)); spans are a per-key 2-value aggregate; the dense hour
    * axis is GENERATED with `sequence` + explode — never joined against a
    * calendar table — and the interpolation is two ignore-nulls windows
    * over one (key, hour) sort. Span per key is capped at `capHours`
    * buckets (the documented scale knob: densification output is
    * keys x span, independent of input row count). All arithmetic is
    * fixed-point or exact IEEE division of identical operands, so the
    * interpolated doubles are bit-identical cross-engine. */
  def gapfill(events: DataFrame, eventType: String = "click",
              capHours: Int = 240): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events
      .filter(col("event_type") === eventType)
      .withColumn("h", expr("ts div 3600000000000"))
      .groupBy("user_id", "h")
      .agg(expr(Parity.fpSum("value")).as("v"))
    // clamp the axis at the LAST OBSERVATION inside the cap window, not
    // at the raw cap bound: otherwise hours past the final in-cap
    // observation would have no bracketing next_v and emit rows claiming
    // src='interp' with a NULL value. Every generated hour is therefore
    // bracketed by observations on both sides. The window + groupBy both
    // key on user_id, so this is still one shuffle.
    val spans = hourly
      .withColumn("hmin0",
        min("h").over(Window.partitionBy("user_id")))
      .filter(col("h") <= col("hmin0") + lit(capHours - 1L))
      .groupBy("user_id")
      .agg(min("h").as("hmin"), max("h").as("hcap"))
    val axis = spans
      .select(col("user_id"), explode(expr("sequence(hmin, hcap)")).as("h"))
    val w = Window.partitionBy("user_id").orderBy("h")
    val prevW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nextW = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    axis.join(hourly, Seq("user_id", "h"), "left")
      .withColumn("obs_h", when(col("v").isNotNull, col("h")))
      .withColumn("prev_h", last(col("obs_h"), ignoreNulls = true).over(prevW))
      .withColumn("prev_v", last(col("v"), ignoreNulls = true).over(prevW))
      .withColumn("next_h", first(col("obs_h"), ignoreNulls = true).over(nextW))
      .withColumn("next_v", first(col("v"), ignoreNulls = true).over(nextW))
      .withColumn("filled", when(col("v").isNotNull, col("v")).otherwise(
        expr("""prev_v + (next_v - prev_v) *
               | (cast(h - prev_h as double) / cast(next_h - prev_h as double))"""
          .stripMargin.replace("\n", " "))))
      .withColumn("src", when(col("v").isNotNull, lit("obs")).otherwise(lit("interp")))
      .select("user_id", "h", "filled", "src")
  }

  /** DuckDB mirror of [[gapfill]] — `unnest(generate_series(...))`
    * generates the same dense axis; the interpolation expression text is
    * identical, so the doubles match bit-for-bit. */
  def gapfillSql(table: String = "events", eventType: String = "click",
                 capHours: Int = 240): String =
    s"""with hourly as (
       | select user_id, epoch_ns(ts) // 3600000000000 as h,
       |  ${Parity.fpSum("value")} as v
       | from $table where event_type = '$eventType' group by 1, 2),
       |spans as (
       | select user_id, min(h) as hmin, max(h) as hcap
       | from (select user_id, h,
       |   min(h) over (partition by user_id) as hmin0 from hourly) t
       | where h <= hmin0 + ${capHours - 1} group by 1),
       |axis as (
       | select user_id, unnest(generate_series(hmin, hcap)) as h from spans),
       |joined as (
       | select a.user_id, a.h, hr.v,
       |  case when hr.v is not null then a.h end as obs_h
       | from axis a left join hourly hr
       |   on a.user_id = hr.user_id and a.h = hr.h),
       |br as (
       | select user_id, h, v,
       |  last_value(obs_h ignore nulls) over wp as prev_h,
       |  last_value(v ignore nulls) over wp as prev_v,
       |  first_value(obs_h ignore nulls) over wn as next_h,
       |  first_value(v ignore nulls) over wn as next_v
       | from joined
       | window wp as (partition by user_id order by h
       |   rows between unbounded preceding and current row),
       | wn as (partition by user_id order by h
       |   rows between current row and unbounded following))
       |select user_id, h,
       | case when v is not null then v
       |  else prev_v + (next_v - prev_v) *
       |   (cast(h - prev_h as double) / cast(next_h - prev_h as double)) end
       |  as filled,
       | case when v is not null then 'obs' else 'interp' end as src
       |from br""".stripMargin.replace("\n", " ")

  def ewma(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("tsu").asc, col("event_id").asc)
    val withLags = (1 until 8).foldLeft(
      events
        .withColumn("tsu", expr("ts div 1000"))
        .withColumn("v_fp", expr("cast(floor(value * 1048576e0 + 5e-1) as bigint)"))
        .withColumn("l0", col("v_fp"))) {
      (df, k) => df.withColumn(s"l$k", lag(col("v_fp"), k).over(w))
    }
    val num = (0 until 8).map(k => s"coalesce(l$k * ${1L << (7 - k)}, 0)").mkString(" + ")
    val den = (0 until 8).map(k =>
      s"case when l$k is not null then ${1L << (7 - k)} else 0 end").mkString(" + ")
    withLags
      .withColumn("ewma", expr(
        s"cast(($num) as double) / cast(($den) as double) / 1048576e0"))
      .select(col("user_id"), col("event_id"), col("tsu").as("us"), col("ewma"))
  }
}
