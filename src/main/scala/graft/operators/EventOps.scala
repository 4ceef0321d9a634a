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
}
