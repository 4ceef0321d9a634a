package graft.operators

import graft.oracle.Parity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered data layout — the multi-dimensional
  * locality sink behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleave
  * the bits of two bucketed sort keys so that a RANGE-sorted write
  * clusters BOTH dimensions into every file, and a rectangle predicate
  * on either (or both) keys prunes most row groups via parquet min/max
  * stats. A single-column sort clusters one dimension and leaves the
  * other spanning its full range in every file; the Morton interleave is
  * what makes two-dimensional skipping possible at 100 TB.
  *
  * All of the arithmetic is BIGINT `*`/`|`/`&` (shifts spelled as
  * multiplications, fully parenthesized — operator precedence differs
  * between engines), so the identical expression text runs in Spark SQL
  * and DuckDB and the oracle can recompute the clustering keys
  * bit-for-bit without ever seeing the written files.
  */
object Zorder {

  /** Bucket a key onto 0..255 given its inclusive max: exact IEEE
    * divide + floor (same text both engines; values < 2^53). */
  def bucket(key: String, mx: String): String =
    s"cast(floor(cast(($key) * 256 as double) / cast(($mx) + 1 as double)) as bigint)"

  /** Spread the low 8 bits of `v` onto even bit positions (0..14) via
    * the standard mask-shift doubling (shifts as multiplies). */
  def spread(v: String): String = {
    val a = s"((((($v) * 16) | ($v)) & 3855))"
    val b = s"(((($a) * 4) | ($a)) & 13107)"
    s"(((($b) * 2) | ($b)) & 21845)"
  }

  /** Morton code of two 8-bit buckets: `bx` bits on odd positions, `by`
    * on even. */
  def morton(bx: String, by: String): String =
    s"((${spread(bx)} * 2) | ${spread(by)})"

  /** Z-cluster lineitem on (l_partkey, l_suppkey): compute the Morton
    * key against the data-derived bucket strides (two maxes — a 1-row
    * broadcast, scale-free), range-partition + sort the write by `z`,
    * and answer a rectangle query from the read-back — the predicate is
    * on the BUCKET columns, so it reaches the parquet scan as min/max
    * skippable filters over a layout where both dims are clustered.
    * Result: per z-tile row counts + fixed-point revenue (≤256 rows). */
  def rectangleOverZSink(lineitem: DataFrame, files: Int = 8): DataFrame = {
    val mx = lineitem.agg(max("l_partkey").as("pmax"), max("l_suppkey").as("smax"))
    val keyed = lineitem
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .crossJoin(broadcast(mx))
      .withColumn("bx", expr(bucket("l_partkey", "pmax")))
      .withColumn("by", expr(bucket("l_suppkey", "smax")))
      .withColumn("z", expr(morton("bx", "by")))
      .select("z", "bx", "by", "l_extendedprice")
    val tmp = graft.Scratch.dir("graft_zorder_")
    keyed
      .repartitionByRange(files, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(tmp)
    lineitem.sparkSession.read.parquet(tmp)
      .filter(col("bx").between(64, 127) && col("by").between(32, 95))
      .groupBy(expr("z div 256").as("tile"))
      .agg(count(lit(1)).as("n"),
        expr(Parity.fpSum("l_extendedprice")).as("revenue"))
  }

  /** DuckDB mirror of [[rectangleOverZSink]] — recomputes the identical
    * bucket/Morton keys from the raw table (the sink round-trip is
    * value-preserving, so the relational answer is the same). */
  def rectangleSql(table: String = "lineitem"): String = {
    val bx = bucket("l_partkey", "pmax")
    val by = bucket("l_suppkey", "smax")
    s"""with mx as (select max(l_partkey) as pmax, max(l_suppkey) as smax
       | from $table),
       |keyed as (
       | select $bx as bx, $by as by,
       |  ${morton(bx, by)} as z, l_extendedprice
       | from $table, mx)
       |select z // 256 as tile, cast(count(*) as bigint) as n,
       | ${Parity.fpSum("l_extendedprice")} as revenue
       |from keyed
       |where bx between 64 and 127 and by between 32 and 95
       |group by 1""".stripMargin.replace("\n", " ")
  }
}
