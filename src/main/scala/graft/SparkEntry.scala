package graft

import graft.operators.Pipeline
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the three registries (core MWU pipeline, OLAP
  * breadth, LLM-data-pipeline extensions); every oracle-checked entry is
  * engineered for bit-deterministic cross-engine results (see
  * [[graft.oracle.Parity]]). Entries absent from `oracleSql`
  * (hash-family-internal ops) get the driver's rows-only check.
  */
object SparkEntry {

  /** Flagship: full MWU marker pipeline (rank → U/z/p → BH → lfc → top-k)
    * on the melted lineitem measures at sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val cells = QueriesMwu.liCells(spark, "/root/testdata/sf0.001")
      .withColumn("value", log1p(col("value")))
    Pipeline.markerStats(spark, cells, Pipeline.Config(topN = Some(3)))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesMwu.queries ++ QueriesOlap.queries ++ QueriesLlm.queries

  def oracleSql: Map[String, String] =
    QueriesMwu.oracles ++ QueriesOlap.oracles ++ QueriesLlm.oracles
}
