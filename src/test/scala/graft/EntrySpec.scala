package graft

/** The driver smoke-checks `SparkEntry.entry` with ITS OWN session —
  * which on Spark 4 defaults to ANSI mode. The flagship must survive
  * both ANSI settings (zero-denominator branches are explicitly guarded
  * in the operators, not left to IEEE). */
class EntrySpec extends SparkSpec {

  test("entry returns marker rows under ANSI mode (driver-like session)") {
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val df = SparkEntry.entry(spark)
      assert(df.count() > 0)
      assert(df.columns.contains("p_value") && df.columns.contains("logfoldchange"))
    } finally spark.conf.set("spark.sql.ansi.enabled", "false")
  }

  test("every registered query has either an oracle or is explicitly rows-only") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    val rowsOnly = q -- o
    // since round 4 even the k-means queries gate through recall-boolean
    // oracles (ann_ivf, ann_pq_trained) — every query is oracle-checked
    assert(rowsOnly.isEmpty, s"unexpected rows-only set: $rowsOnly")
  }
}
