package graft.operators

import graft.oracle.Parity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic fixed-grid histogram quantiles — the bounded-memory
  * percentile estimator for a 100 TB column. Spark's own
  * `approx_percentile` (Greenwald-Khanna) is merge-order dependent, so
  * its output cannot cross-engine hash-check; an equi-width histogram is
  * order-free by construction: bin counts are exact integers under any
  * partitioning, so the estimate — bin upper edge of the first bin whose
  * cumulative count reaches ⌈p·N⌉ — is bit-reproducible, with error
  * bounded by one bin width.
  *
  * Scale shape: one tight min/max/count agg (map-side combined), one
  * ≤`bins`-group agg over the broadcast-augmented scan (map-side
  * combined: each partition emits ≤ bins rows), and a window over the
  * `bins`-row histogram. The fact column is scanned twice but never
  * shuffled — the only movement is two ≤`bins`-row relations.
  */
object Quantiles {

  /** Percent points reported (integer percents — exact literals). */
  val Percents: Seq[Int] = Seq(25, 50, 75, 90, 99)

  /** Bin index of a value: ⌊(x−mn)·B/(mx−mn)⌋ clamped to [0, B−1]; a
    * constant-column (mx = mn) degenerates to bin 0 rather than a
    * division by zero (whose NULL-vs-NaN outcome differs per engine). */
  private def binExpr(x: String, bins: Int): String =
    s"(case when mx = mn then 0 else " +
      s"greatest(0, least(${bins - 1}, cast(floor((($x) - mn) * ${bins}e0 / (mx - mn)) as bigint))) end)"

  /** ⌈p·N/100⌉ as exact integer arithmetic: (N·p + 99) div 100. */
  private val targetExpr = "((n_total * p + 99) - ((n_total * p + 99) % 100)) / 100"

  /** Upper edge of the chosen bin, quantized to the 1e-9 grid. */
  private def estExpr(bins: Int): String =
    Parity.q9(s"(mn + (cast(qbin as double) + 1e0) * (mx - mn) / ${bins}e0)")

  /** Histogram-quantile estimates of `column` (default 64 bins). Output:
    * one row per percent point — p, chosen bin, cumulative count at that
    * bin, estimate. */
  def hist(df: DataFrame, column: String, bins: Int = 64): DataFrame = {
    val x = df.select(col(column).cast("double").as("x"))
    val scalars = x.agg(min("x").as("mn"), max("x").as("mx"),
      count(lit(1)).as("n_total"))
    val histo = x.crossJoin(broadcast(scalars))
      .select(expr(binExpr("x", bins)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    // bins-row relation: the single-partition running sum is over ≤ 64 rows
    val cum = histo.withColumn("cum", sum("cnt").over(
      Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val targets = scalars.select(col("n_total"),
        explode(lit(Percents.toArray)).as("p"))
      .select(col("p").cast("long").as("p"),
        expr(targetExpr).cast("long").as("target"))
    val chosen = cum.crossJoin(broadcast(targets))
      .filter(col("cum") >= col("target"))
      .groupBy("p").agg(min("bin").as("qbin"))
    chosen.join(cum.select(col("bin"), col("cum")), col("qbin") === col("bin"))
      .crossJoin(broadcast(scalars))
      .select(col("p"), col("qbin"), col("cum").cast("long").as("n_le"),
        expr(estExpr(bins)).as("q_est"))
  }

  /** Median absolute deviation — the robust dispersion statistic
    * (outlier-resistant sigma: MAD·1.4826 estimates the stddev of a
    * normal), composed as TWO passes of the deterministic histogram
    * median: median(x), then median(|x − median|). Each pass keeps the
    * histogram scale shape (no fact shuffle, bins-row relations); the
    * deviation column is exact IEEE arithmetic against the q9-gridded
    * median, so the whole two-pass composition stays bit-deterministic
    * with error bounded by one bin width per pass. */
  def mad(df: DataFrame, column: String, bins: Int = 64): DataFrame = {
    val med = hist(df, column, bins).filter(col("p") === 50)
      .select(col("q_est").as("med"))
    val dev = df.select(col(column).cast("double").as("x0"))
      .crossJoin(broadcast(med))
      .select(expr("abs(x0 - med)").as("dev"))
    val m2 = hist(dev, "dev", bins).filter(col("p") === 50)
      .select(col("q_est").as("mad"))
    med.crossJoin(broadcast(m2))
      .select(col("med"), col("mad"),
        expr(Parity.q9("mad * 1.4826e0")).as("sigma_est"))
  }

  /** DuckDB mirror of [[mad]] — the hist subqueries nest as derived
    * tables (WITH inside a subquery; outer CTEs stay visible). */
  def madSql(table: String, column: String, bins: Int = 64): String =
    s"""with med as (select q_est as med from (${histSql(table, column, bins)})
       |  where p = 50),
       |devt as (select abs(cast($column as double) - med) as dev
       | from $table, med),
       |m2 as (select q_est as mad from (${histSql("devt", "dev", bins)})
       |  where p = 50)
       |select med, mad, ${Parity.q9("mad * 1.4826e0")} as sigma_est
       |from med, m2""".stripMargin.replace("\n", " ")

  /** DuckDB mirror of [[hist]]. */
  def histSql(table: String, column: String, bins: Int = 64): String = {
    val pList = Percents.mkString("[", ", ", "]")
    s"""with x as (select cast($column as double) as x from $table),
       |s as (select min(x) as mn, max(x) as mx,
       |  cast(count(*) as bigint) as n_total from x),
       |h as (select ${binExpr("x", bins)} as bin,
       |  cast(count(*) as bigint) as cnt from x, s group by 1),
       |c as (select bin, cast(sum(cnt) over (order by bin asc
       |  rows between unbounded preceding and current row) as bigint) as cum from h),
       |t as (select cast(p as bigint) as p,
       |  cast($targetExpr as bigint) as target
       |  from (select unnest($pList) as p), s),
       |q as (select p, min(bin) as qbin from c, t
       |  where cum >= target group by p)
       |select p, qbin, cum as n_le, ${estExpr(bins)} as q_est
       |from q, c, s where qbin = c.bin""".stripMargin.replace("\n", " ")
  }
}
