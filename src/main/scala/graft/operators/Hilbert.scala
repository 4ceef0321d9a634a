package graft.operators

import graft.oracle.Parity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hilbert-curve clustered data layout — the locality-stronger sibling
  * of [[Zorder]] (Delta Lake's `OPTIMIZE ... ZORDER` has grown exactly
  * this variant as "liquid clustering"): unlike the Morton curve, whose
  * bit-interleave takes long diagonal jumps between quadrants, every
  * consecutive pair of Hilbert indices is GRID-ADJACENT, so a
  * range-sorted write packs tighter rectangles into every file and a
  * rectangle predicate prunes more row groups at the same file count.
  *
  * The index is the standard iterative quadrant-rotation walk (the
  * classic xy2d loop: extract the top bit of each coordinate, accumulate
  * the quadrant's s² offset, reflect/transpose the frame, descend),
  * UNROLLED into eight pure-SQL levels. Each level is CASE/`&`/
  * arithmetic only — no XOR operator (spelled as a CASE over the four
  * (rx, ry) cells), every shift a multiply, everything parenthesized —
  * so the IDENTICAL expression text runs in Spark SQL and DuckDB and
  * the oracle recomputes the clustering keys bit-for-bit without seeing
  * the written files. The spec proves the curve property itself:
  * exhaustively over the full 256×256 grid, the map is a bijection and
  * consecutive indices are unit-adjacent — the defining Hilbert
  * locality no Morton code has. */
object Hilbert {

  /** Grid order (indices cover [0, 256²)). */
  val N = 256

  /** One xy2d level at scale `s` over state columns (hx, hy, hd):
    * returns (next-x, next-y, next-d) expression text. d accumulates
    * s²·quadrant BEFORE the frame rotates; the ry=0 arms reflect with
    * N−1−· (the full-grid complement — stale high bits are ignored by
    * the smaller masks that follow) and transpose. */
  private[graft] def level(s: Int): (String, String, String) = {
    val rx = s"(case when ((hx) & $s) > 0 then 1 else 0 end)"
    val ry = s"(case when ((hy) & $s) > 0 then 1 else 0 end)"
    // (3·rx) XOR ry without an XOR operator: the four cells spelled out
    val q = s"(case when $rx = 0 and $ry = 0 then 0 when $rx = 0 then 1 " +
      s"when $ry = 0 then 3 else 2 end)"
    val nd = s"((hd) + ${s.toLong * s} * $q)"
    val nx = s"(case when $ry = 1 then (hx) when $rx = 0 then (hy) " +
      s"else (${N - 1} - (hy)) end)"
    val ny = s"(case when $ry = 1 then (hy) when $rx = 0 then (hx) " +
      s"else (${N - 1} - (hx)) end)"
    (nx, ny, nd)
  }

  private val scales: Seq[Int] = (0 until 8).map(i => N / 2 >> i) // 128..1

  /** Hilbert-cluster lineitem on (l_partkey, l_suppkey): bucket both
    * keys to 0..255 ([[Zorder.bucket]]), walk the eight unrolled levels
    * to the Hilbert index, range-partition + sort the write by `h`, and
    * answer a rectangle query from the read-back — the predicate is on
    * the BUCKET columns, so it reaches the parquet scan as min/max
    * skippable filters over a layout where both dims cluster with
    * unit-step locality. Result: per h-tile row counts + fixed-point
    * revenue (≤256 rows). */
  def rectangleOverHilbertSink(lineitem: DataFrame, files: Int = 8): DataFrame = {
    val mx = lineitem.agg(max("l_partkey").as("pmax"), max("l_suppkey").as("smax"))
    var keyed = lineitem
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .crossJoin(broadcast(mx))
      .withColumn("bx", expr(Zorder.bucket("l_partkey", "pmax")))
      .withColumn("by", expr(Zorder.bucket("l_suppkey", "smax")))
      .selectExpr("bx", "by", "l_extendedprice",
        "bx as hx", "by as hy", "cast(0 as bigint) as hd")
    scales.foreach { s =>
      val (nx, ny, nd) = level(s)
      keyed = keyed.selectExpr("bx", "by", "l_extendedprice",
        s"$nx as hx__", s"$ny as hy__", s"$nd as hd__")
        .withColumnRenamed("hx__", "hx")
        .withColumnRenamed("hy__", "hy")
        .withColumnRenamed("hd__", "hd")
    }
    val tmp = graft.Scratch.dir("graft_hilbert_")
    keyed.selectExpr("hd as h", "bx", "by", "l_extendedprice")
      .repartitionByRange(files, col("h"))
      .sortWithinPartitions("h")
      .write.mode("overwrite").parquet(tmp)
    lineitem.sparkSession.read.parquet(tmp)
      .filter(col("bx").between(64, 127) && col("by").between(32, 95))
      .groupBy(expr("h div 256").as("tile"))
      .agg(count(lit(1)).as("n"),
        expr(Parity.fpSum("l_extendedprice")).as("revenue"))
  }

  /** DuckDB mirror of [[rectangleOverHilbertSink]] — the identical
    * unrolled levels as chained CTEs (the sink round-trip is
    * value-preserving, so the relational answer is the same). */
  def rectangleSql(table: String = "lineitem"): String = {
    val bx = Zorder.bucket("l_partkey", "pmax")
    val by = Zorder.bucket("l_suppkey", "smax")
    val sb = new StringBuilder
    sb ++= s"with mx as (select max(l_partkey) as pmax, max(l_suppkey) as smax from $table), "
    sb ++= s"h0 as (select $bx as bx, $by as by, l_extendedprice, " +
      s"$bx as hx, $by as hy, cast(0 as bigint) as hd " +
      s"from $table cross join mx)"
    scales.zipWithIndex.foreach { case (s, i) =>
      val (nx, ny, nd) = level(s)
      sb ++= s", h${i + 1} as (select bx, by, l_extendedprice, " +
        s"$nx as hx, $ny as hy, $nd as hd from h$i)"
    }
    sb ++= " select hd // 256 as tile, cast(count(*) as bigint) as n, " +
      s"${Parity.fpSum("l_extendedprice")} as revenue " +
      "from h8 where bx between 64 and 127 and by between 32 and 95 " +
      "group by 1"
    sb.toString
  }
}
