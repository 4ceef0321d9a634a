package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Host-speed calibration: a FROZEN, data-free, CPU-bound micro-run
    * timed once per pass and recorded in the artifact. The host's speed
    * drifts across days (r10: the identical sha measured ~13% slower on
    * every query a day later), so round-over-round slopes read from
    * artifacts alone conflate host drift with real regressions — this
    * leg lets `compare_bench.py --normalize` divide the drift out
    * without re-benching an old sha in a worktree. The workload is a
    * codegen'd 32-slice range aggregate: deterministic, no IO, no
    * shuffle, ~1 s — it measures the same JVM+CPU path the queries run
    * on. DO NOT change the workload, the range, or the slice count:
    * normalization depends on every round's artifact carrying the
    * IDENTICAL micro-run. */
  def calibrate(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    // overflow-free mix (max ~2e15 < 2^63) so the workload is identical
    // under ANSI and legacy arithmetic — a frozen workload must not
    // depend on overflow semantics
    spark.range(0L, 8000000000L, 1L, 32)
      .selectExpr(
        "sum(((id % 1000003) * 2654435761 + 2862933) % 1000) as s")
      .collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** Evaluate a gate relation the way the correctness dump consumes it:
    * execute the FULL physical plan and iterate every output row
    * (InternalRows — no driver transfer, no external-Row conversion).
    * `df.count()` is NOT that statistic: Catalyst rewrites the count
    * aggregate and prunes whatever the count doesn't need — measured at
    * 10× data, `Dedup.keepFirst(docs).count()` ran in 7 s because the
    * decision left-join (and with it the whole banded candidate pass)
    * was ELIMINATED, vs 24 s for the relation the oracle checks; the
    * data-card aggregate pruned the same work (12×/3× under-measured at
    * sf0.1). Every timed row forces the plan the gate is graded on. */
  def evalRows(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, file listing, parquet footers) and the
    // OS page cache for EVERY input table, so no measured query absorbs
    // one-time init or a cold first read (round-1 driver runs showed a
    // single cold documents scan inflating one query 8×)
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "events", "documents", "embeddings").foreach { t =>
      try graft.sources.Tables.read(spark, sfDir, t).foreach(_ => ())
      catch { case _: Throwable => }
    }
    // SPARK_GRAFT_ONLY=a,b,c restricts the run (local iteration only; the
    // harness never sets it, so driver rounds always measure everything)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // run in SORTED name order: HashMap iteration order reshuffles every
    // query's neighbors whenever a query is added, and neighbor effects
    // are real (r12: the multimodal family measured 2x slower in the
    // full run vs solo purely from new predecessors' heap pressure) —
    // sorted order pins each query's context across rounds, so per-query
    // round-over-round ratios compare like for like
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // three back-to-back passes: single-pass numbers mix first-execution
    // JIT / codegen-compile time into whichever queries run early, which
    // showed up as phantom 1.5-2× "regressions" between rounds, and the
    // round-8 two-pass totals still gapped 32% (349→265 s) — pass 1
    // absorbs warm-up, so the min needs two steady-state passes behind
    // it. The reported per-query time is the min over passes; all pass
    // totals and per-pass maps are kept so run-to-run variance is
    // visible in the artifact.
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "3").toInt
    // per-query OUTPUT row counts (evalRows computes them anyway):
    // recorded in the artifact so a future statistic or plan change
    // decomposes into rows×cost without re-running old shas (verdict r12)
    val rowCounts = scala.collection.mutable.Map.empty[String, Long]
    // one UNTIMED calibration first: the timed per-pass runs must
    // measure host speed, not the micro-run's own JIT/codegen warm-up
    // (measured: cold 0.95 s vs warm ~0.3 s on the same host)
    calibrate(spark)
    val calibrations = scala.collection.mutable.ArrayBuffer.empty[Double]
    val passes = (1 to rounds).map { _ =>
      calibrations += calibrate(spark)
      selected.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val n = try { evalRows(fn(spark, sfDir)) }
                catch { case _: Throwable => -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        rowCounts(name) = n
        // iterative queries (pageRank, BPE, LR, label propagation) pin
        // their localCheckpoint RDD blocks in the block manager; left
        // alone they accumulate across the run and slow later queries
        // (measured: pass-2 pageRank 20 s vs 11 s isolated). A real
        // deploy's jobs exit their JVMs; the shared-session bench must
        // clean up between queries instead — BLOCKING, so the eviction
        // work lands outside the next query's timed window.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        // start the next query from a settled heap: without this, a
        // heavy predecessor's garbage lands in the successor's timed
        // window (same neighbor effect the sorted order pins) — the gc
        // runs OUTSIDE the timed window by construction
        System.gc()
        name -> sec
      }.toMap
    }
    val results = selected.map { case (name, _) =>
      name -> passes.map(_(name)).min
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val passTotals = passes.map(_.values.sum).mkString("[", ",", "]")
    val calib = calibrations.mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"pass_totals":$passTotals,"calibration":$calib,"sf":"$sfDir"}"""
    println(line)
    // the driver's BENCH_r{N}.json preserves only a truncated log tail
    // (round 7 kept 26 of 242 per-query times) — persist the FULL
    // per-query map as a repo artifact so like-for-like regression
    // checks across rounds never starve. Per-pass maps included: the
    // min hides run-to-run variance the comparison needs to see.
    try {
      val perPass = passes.zipWithIndex.map { case (p, i) =>
        "\"pass" + (i + 1) + "\":" + p.toSeq.sortBy(_._1)
          .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      }.mkString(",")
      val rowsJson = rowCounts.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      val full = s"""{"artifact":"full per-query bench (min over $rounds passes; per-pass maps for variance)","sf":"$sfDir","cpus":$cpus,"n_queries":${results.size},"total_sec":$total,"pass_totals":$passTotals,"calibration":$calib,"queries":$qs,"rows":$rowsJson,$perPass}"""
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
        full.getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"BENCH_FULL.json write skipped: $e")
    }
    spark.stop()
  }
}
