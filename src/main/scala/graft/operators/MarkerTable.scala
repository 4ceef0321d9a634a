package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W5 + S6 — per-group top-k marker tables and the result sink
  * (reference /root/reference/dask_mwu/create_df.py:70-134,
  * scratch/rank_gene_groups.py:294-307).
  *
  * The reference yields one pandas frame per category; here it's ONE
  * distributed frame with a per-group row_number — per-category splitting
  * happens only at the sink via partitionBy (no driver loop).
  * The reference's `sort_values` is an unstable sort (create_df.py:129);
  * we add a deterministic `gene` tie-break (SURVEY.md §7.5).
  */
object MarkerTable {

  /** Ranks rows per group by `abs_lfc` (desc by default, mirroring
    * `ascending=False`); `topN=None` keeps all rows (create_df.py:112). */
  def topK(stats: DataFrame, topN: Option[Int], ascending: Boolean = false,
           orderCol: String = "abs_lfc", geneCol: String = "gene"): DataFrame = {
    val ord = if (ascending) col(orderCol).asc else col(orderCol).desc
    val w = Window.partitionBy("grp").orderBy(ord, col(geneCol).asc)
    val rk = stats.withColumn("rk", row_number().over(w).cast("long"))
    topN.map(k => rk.filter(col("rk") <= k)).getOrElse(rk)
  }

  /** S6: one file tree per group; group value sanitized like the
    * reference's `re.sub("[^a-zA-Z0-9]", "_")` (rank_gene_groups.py:105). */
  def writePerGroup(markers: DataFrame, outDir: String, format: String = "csv"): Unit =
    markers
      .withColumn("grp_dir", regexp_replace(col("grp"), "[^a-zA-Z0-9]", "_"))
      .write.mode("overwrite").partitionBy("grp_dir")
      .option("header", "true").format(format).save(outDir)
}
