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
  * n_keys · mean), and in real skewed data is far smaller — `hotRatio`
  * is the knob that keeps it broadcastable (an adversarial corpus where
  * n_keys/hotRatio itself is too big to broadcast would swap the two
  * flag joins for shuffle joins, same semantics). The replicated small
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
    * row-identical to `fact.join(dim, key)`. */
  def skewJoin(fact: DataFrame, dim: DataFrame, key: String,
               nSalt: Int = 8, hotRatio: Int = 10): DataFrame = {
    val counts = fact.groupBy(key).agg(count(lit(1)).as("__c"))
    val tot = counts.agg(count(lit(1)).as("__n_keys"), sum("__c").as("__n_rows"))
    // hot  ⇔  c ≥ hotRatio · (n_rows / n_keys), as exact integers
    val hot = counts.crossJoin(broadcast(tot))
      .filter(col("__c") * col("__n_keys") >= col("__n_rows") * lit(hotRatio.toLong))
      .select(col(key), lit(true).as("__hot"))
    val factS = fact.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot"),
          pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(nSalt.toLong)).cast("int"))
          .otherwise(lit(0)))
      .drop("__hot")
    // cold dim rows keep their single salt-0 copy; hot dim rows fan out
    // across every salt the fact side can scatter to
    val dimS = dim.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt", explode(
        when(col("__hot"), sequence(lit(0), lit(nSalt - 1)))
          .otherwise(array(lit(0)))))
      .drop("__hot")
    factS.join(dimS, Seq(key, "__salt")).drop("__salt")
  }
}
