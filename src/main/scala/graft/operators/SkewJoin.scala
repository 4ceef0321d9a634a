package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resilient shuffle join driven by the join-key skew profile.
  *
  * `q_skew_profile` measures per-key multiplicities and a skew ratio —
  * the pre-flight before a 100 TB shuffle join. This operator CONSUMES
  * that decision instead of leaving it a readout: the fact side's
  * per-key counts flag keys whose multiplicity is ≥ `hotRatio` × the
  * mean (the profile's skew-ratio predicate, applied per key as an
  * exact integer comparison `c · n_keys ≥ hotRatio · n_rows`), and ONLY
  * the flagged keys are salted. Hot fact rows scatter across `nSalt`
  * sub-keys via a deterministic whole-row hash (the [[SkewAgg]]
  * discipline); the dim side replicates ONLY its hot-key rows `nSalt`
  * ways; cold keys ride salt 0 untouched, and the join key becomes
  * (key, salt). Inner-join semantics are exactly preserved: null keys
  * never match, and each hot fact row still meets each matching dim row
  * exactly once — on its one salt.
  *
  * Scale shape: the per-key count aggregate combines map-side before
  * its shuffle; the flagged set is bounded by n_keys / hotRatio keys
  * (every hot key carries ≥ hotRatio · mean rows and the counts sum to
  * n_keys · mean), and in real skewed data is far smaller — when that
  * bound exceeds `maxBroadcastKeys` the two flag joins fall back to
  * shuffle joins automatically (same semantics, enforced in code, not
  * left to the caller's hotRatio choice). The replicated small
  * side grows by |hot| × nSalt rows only, and the big fact relation is
  * scanned once and shuffled once, on (key, salt).
  *
  * Compare AQE's `skewJoin` (runtime partition splitting): that
  * rebalances OVERSIZED PARTITIONS after the fact, but a single hot KEY
  * still lands in one partition post-split only for sort-merge joins
  * with no aggregation downstream; explicit per-key salting also covers
  * the hash-aggregate-after-join shape and clusters without AQE.
  */
object SkewJoin {

  /** Inner-join `fact` ⋈ `dim` on `key` (same column name both sides),
    * salting only the keys the skew profile flags as hot. Result is
    * row-identical to `fact.join(dim, key)`.
    *
    * The hot-flag set is broadcast ONLY when its proven upper bound
    * n_keys / hotRatio (each flagged key carries ≥ hotRatio · mean rows
    * of the n_keys · mean total) fits `maxBroadcastKeys`; an
    * adversarial distribution where the flagged set itself is huge
    * degrades to shuffle flag joins — same semantics, no driver OOM.
    * The decision is driver-side from the pre-flight totals, never from
    * collecting the hot keys themselves. Per-key counts materialize
    * once (eager localCheckpoint, n_keys rows of (key, count) —
    * distributed, ~tens of GB even at 1e9 keys) and feed the pre-flight
    * read and both flag-join builds. */
  def skewJoin(fact: DataFrame, dim: DataFrame, key: String,
               nSalt: Int = 8, hotRatio: Int = 10,
               maxBroadcastKeys: Long = 4000000L): DataFrame = {
    val counts = fact.groupBy(key).agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val totRow = counts.agg(count(lit(1)).as("__n_keys"),
      coalesce(sum("__c"), lit(0L)).as("__n_rows")).head()
    val nKeys = totRow.getLong(0)
    val nRows = totRow.getLong(1)
    // hot  ⇔  c ≥ hotRatio · (n_rows / n_keys), as exact integers
    val hot = counts
      .filter(col("__c") * lit(nKeys) >= lit(nRows) * lit(hotRatio.toLong))
      .select(col(key), lit(true).as("__hot"))
    val hotSide =
      if (hotRatio > 0 && nKeys / hotRatio <= maxBroadcastKeys) broadcast(hot)
      else hot
    val factS = fact.join(hotSide, Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot"),
          pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(nSalt.toLong)).cast("int"))
          .otherwise(lit(0)))
      .drop("__hot")
    // cold dim rows keep their single salt-0 copy; hot dim rows fan out
    // across every salt the fact side can scatter to
    val dimS = dim.join(hotSide, Seq(key), "left")
      .withColumn("__salt", explode(
        when(col("__hot"), sequence(lit(0), lit(nSalt - 1)))
          .otherwise(array(lit(0)))))
      .drop("__hot")
    factS.join(dimS, Seq(key, "__salt")).drop("__salt")
  }
}
