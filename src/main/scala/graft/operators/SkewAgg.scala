package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient aggregation: two-stage salted hash aggregate.
  *
  * A plain `groupBy(k).agg(sum)` sends every row of a hot key to one
  * reducer. Salting splits each key into `salt` sub-keys (uniform via a
  * deterministic hash of the full row spread), pre-aggregates, then
  * combines — the hot key's work fans out `salt`-ways. Worth it only for
  * genuinely skewed keys: the MWU pipeline is skew-free by construction
  * (every feature has n_obs rows), but extension workloads (e.g. revenue
  * by country, dedup buckets by language) are not.
  *
  * For exact-integer aggregates (counts, fixed-point sums) the result is
  * bit-identical to the unsalted plan — `q1_salted` hash-matches
  * `q1_agg`'s oracle.
  */
object SkewAgg {

  /** Two-stage salted aggregation: `aggs` run per (keys, salt) sub-group,
    * `combine` merges the partials per key. The salt is a uniform
    * deterministic hash of the whole row. */
  def salted(df: DataFrame, keys: Seq[String], salt: Int,
             aggs: Seq[Column], combine: Seq[Column]): DataFrame = {
    val saltCol = pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salt.toLong))
    val partial = df.withColumn("__salt", saltCol)
      .groupBy((keys :+ "__salt").map(col): _*).agg(aggs.head, aggs.tail: _*)
    partial.groupBy(keys.map(col): _*).agg(combine.head, combine.tail: _*)
  }
}
