package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Group-membership operators (reference `get_masks`,
  * /root/reference/dask_mwu/rank_data.py:41-87).
  *
  * Spark never materializes the (n_obs × n_groups) one-hot matrix on the
  * hot path — groupBy replaces mask-multiply (SURVEY.md §1.1). These
  * helpers exist for the API surface: group extraction with the
  * reference's sorted-distinct ordering, and an explicit one-hot pivot
  * for consumers that want mask columns.
  */
object Masks {

  /** Sorted distinct group labels with a dense index — np.unique order
    * (rank_data.py:77: ascending, deduplicated). */
  def groups(obs: DataFrame, groupCol: String = "grp"): Seq[String] =
    obs.select(col(groupCol).cast("string")).distinct()
      .orderBy(groupCol).collect().map(_.getString(0)).toSeq

  private def sanitize(s: String): String = s.replaceAll("[^a-zA-Z0-9]", "_")

  /** One-hot mask columns `mask_<group>` per observation (chunk layout
    * `(n_obs, 1)` per group column in the reference — here just column
    * projections, prunable for free). Group order = sorted distinct. */
  def oneHot(obs: DataFrame, groupCol: String = "grp"): DataFrame = {
    val gs = groups(obs, groupCol)
    require(gs.nonEmpty, "get_masks: empty group labels (reference rank_data.py:64-70)")
    val maskCols = gs.map(g =>
      when(col(groupCol) === lit(g), lit(true)).otherwise(lit(false)).as(s"mask_${sanitize(g)}"))
    obs.select(col("*") +: maskCols: _*)
  }
}
