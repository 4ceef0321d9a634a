package graft.operators

import graft.oracle.Parity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed logistic-regression training over hashed text features —
  * the quality/language classifier a curation pipeline trains IN the
  * engine (the fastText-style linear model over
  * [[TextOps.hashFeatures]] slots), expressed as full-batch gradient
  * descent in pure dataflow.
  *
  * Scale shape per iteration: the sparse feature stream joins the
  * broadcast weight vector (bucket-count rows — 256 here, a few million
  * for a big hash space; AQE shuffle-joins past broadcast size), one
  * doc-sized aggregate forms margins, one bucket-sized aggregate forms
  * the gradient, and the weight update is a map over the weight vector.
  * Nothing collects to the driver; iteration lineage is flattened with
  * `localCheckpoint` (the [[Graph.pageRank]]/[[Bpe]] discipline).
  *
  * Cross-engine determinism (oracle = the identical iterations unrolled
  * as CTEs): both per-doc margins and per-bucket gradients ride
  * [[Parity.fpSum]] (order-free exact BIGINT sums); the sigmoid's `exp`
  * is the one transcendental, so probabilities are quantized to the 1e-9
  * grid ([[Parity.q9]]) before they enter the gradient — the same
  * discipline as the p-value chain. Labels, counts, and the learning
  * rate are exact dyadics, so the weight trajectory is bit-identical in
  * both engines (modulo the documented ~1e-7 q9 flip risk per value).
  */
object Classifier {

  /** sigmoid, q9-quantized — shared text over a `margin` column. */
  private val pExpr = Parity.q9("1e0 / (1e0 + exp(-margin))")

  /** The GD loop over a prepared (checkpointed) feature stream — shared
    * by [[lrTrain]] and [[lrScore]] so scoring never pays a second
    * tokenize+hash pass over the corpus. */
  private def trainOnFeats(feats: DataFrame, labels: DataFrame, nDocs: Long,
                           iters: Int, lrNum: Int, lrDen: Int): DataFrame = {
    var w = feats.select(col("bucket")).distinct()
      .withColumn("w", expr("0e0")).localCheckpoint()
    for (_ <- 1 to iters) {
      val margins = feats.join(broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(expr(Parity.fpSum("w * cnt")).as("margin"))
      val probs = margins.join(labels, "doc_id")
        .selectExpr("doc_id", s"$pExpr as p", "y")
      val grad = feats.join(probs, "doc_id")
        .groupBy("bucket")
        .agg(expr(Parity.fpSum("(p - y) * cnt")).as("g"))
      w = w.join(grad, "bucket")
        .selectExpr("bucket",
          s"(w - ($lrNum / ${lrDen}e0) * (g / ${nDocs}e0)) as w")
        .localCheckpoint()
    }
    w
  }

  private def labelsOf(docs: DataFrame): DataFrame =
    docs.selectExpr("doc_id", "case when lang = 'en' then 1e0 else 0e0 end as y")

  /** Train `iters` full-batch GD steps of P(lang = 'en' | hashed tokens);
    * returns the final weight vector (bucket, w9) with w9 on the q9 grid
    * for a stable dump. */
  def lrTrain(docs: DataFrame, buckets: Int = 256, iters: Int = 3,
              lrNum: Int = 1, lrDen: Int = 2): DataFrame = {
    val feats = TextOps.hashFeatures(docs, buckets).localCheckpoint()
    trainOnFeats(feats, labelsOf(docs), docs.count(), iters, lrNum, lrDen)
      .selectExpr("bucket", s"${Parity.q9("w")} as w9")
  }

  /** SCORE the corpus with the trained model: per-language counts
    * (n_docs, predicted-positive at the 0.5 threshold, is_en flag) — the
    * audit a curation rollout reads before trusting the filter. The
    * confusion cells are read off directly: in the lang='en' row
    * n_pred_en IS the true-positive count, in every other row it is that
    * language's false-positive count. One more margin pass with the
    * final weights; thresholding at 1/2 is an exact compare on the q9
    * grid. Documents with no features have no margin and are excluded
    * (same inner join in the oracle). */
  def lrScore(docs: DataFrame, buckets: Int = 256, iters: Int = 3): DataFrame = {
    val feats = TextOps.hashFeatures(docs, buckets).localCheckpoint()
    val w = trainOnFeats(feats, labelsOf(docs), docs.count(), iters, 1, 2)
      .selectExpr("bucket", s"${Parity.q9("w")} as w")
    val margins = feats.join(broadcast(w), "bucket")
      .groupBy("doc_id")
      .agg(expr(Parity.fpSum("w * cnt")).as("margin"))
    margins
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .selectExpr("lang", s"$pExpr as p")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("case when p > 5e-1 then 1 else 0 end")).as("n_pred_en"))
      .withColumn("is_en", expr("case when lang = 'en' then 1 else 0 end").cast("long"))
  }

  /** Shared CTE chain: features f, labels, doc count, and the unrolled
    * weight iteration w0..w`iters`. */
  private def lrCtes(buckets: Int, iters: Int, lrNum: Int, lrDen: Int,
                     table: String): String = {
    val sb = new StringBuilder
    sb ++= s"with f as (${TextOps.hashFeaturesSql(buckets, table)}), "
    sb ++= s"lab as (select doc_id, case when lang = 'en' then 1e0 else 0e0 end as y from $table), "
    sb ++= s"nd as (select cast(count(*) as bigint) as n_docs from $table), "
    sb ++= "w0 as (select distinct bucket, 0e0 as w from f)"
    for (k <- 1 to iters) {
      sb ++= s", m$k as (select doc_id, ${Parity.fpSum("w * cnt")} as margin " +
        s"from f join w${k - 1} using (bucket) group by doc_id)"
      sb ++= s", p$k as (select doc_id, $pExpr as p, y " +
        s"from m$k join lab using (doc_id))"
      sb ++= s", g$k as (select bucket, ${Parity.fpSum("(p - y) * cnt")} as g " +
        s"from f join p$k using (doc_id) group by bucket)"
      sb ++= s", w$k as (select bucket, " +
        s"(w - ($lrNum / ${lrDen}e0) * (g / (cast(n_docs as double) + 0e0))) as w " +
        s"from w${k - 1} join g$k using (bucket) cross join nd)"
    }
    sb.toString
  }

  /** DuckDB mirror of [[lrScore]]. */
  def lrScoreSql(buckets: Int = 256, iters: Int = 3,
                 table: String = "documents"): String =
    lrCtes(buckets, iters, 1, 2, table) +
      s", wf as (select bucket, ${Parity.q9("w")} as w from w$iters)" +
      s", sm as (select doc_id, ${Parity.fpSum("w * cnt")} as margin " +
      "from f join wf using (bucket) group by doc_id)" +
      s", sp as (select lang, $pExpr as p " +
      s"from sm join (select doc_id, lang from $table) d using (doc_id))" +
      " select lang, cast(count(*) as bigint) as n_docs, " +
      "cast(sum(case when p > 5e-1 then 1 else 0 end) as bigint) as n_pred_en, " +
      "cast(case when lang = 'en' then 1 else 0 end as bigint) as is_en " +
      "from sp group by lang"

  /** Calibration audit of the trained model — the reliability diagram a
    * curation rollout checks before trusting thresholded probabilities:
    * predictions bucketed into deciles of p, with per-decile document
    * count, positive count, and exact fixed-point mean predicted p. A
    * well-calibrated model has mean_p ≈ positive rate per decile; a
    * collapsed or over-confident model shows up immediately. One more
    * margin pass over the shared checkpointed feature stream (no second
    * tokenize), aggregate-sized output. Deciles are exact integer math
    * on the q9-gridded p (`floor(p·10)` capped at 9); mean_p goes
    * through [[Parity.fpSum]] so the double aggregate is order-free. */
  def lrCalibration(docs: DataFrame, buckets: Int = 256, iters: Int = 3): DataFrame = {
    val feats = TextOps.hashFeatures(docs, buckets).localCheckpoint()
    val w = trainOnFeats(feats, labelsOf(docs), docs.count(), iters, 1, 2)
      .selectExpr("bucket", s"${Parity.q9("w")} as w")
    feats.join(broadcast(w), "bucket")
      .groupBy("doc_id")
      .agg(expr(Parity.fpSum("w * cnt")).as("margin"))
      .join(labelsOf(docs), "doc_id")
      .selectExpr(s"$pExpr as p", "y")
      .selectExpr("least(cast(floor(p * 1e1) as bigint), 9) as decile", "p", "y")
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("cast(y as bigint)")).as("n_pos"),
        expr(Parity.fpSum("p")).as("sum_p"))
      .withColumn("mean_p", col("sum_p") / col("n_docs").cast("double"))
      .select("decile", "n_docs", "n_pos", "mean_p")
  }

  /** DuckDB mirror of [[lrCalibration]]. */
  def lrCalibrationSql(buckets: Int = 256, iters: Int = 3,
                       table: String = "documents"): String =
    lrCtes(buckets, iters, 1, 2, table) +
      s", wf as (select bucket, ${Parity.q9("w")} as w from w$iters)" +
      s", sm as (select doc_id, ${Parity.fpSum("w * cnt")} as margin " +
      "from f join wf using (bucket) group by doc_id)" +
      s", sp as (select $pExpr as p, y from sm join lab using (doc_id))" +
      ", dc as (select least(cast(floor(p * 1e1) as bigint), 9) as decile, p, y from sp)" +
      " select decile, cast(count(*) as bigint) as n_docs, " +
      "cast(sum(cast(y as bigint)) as bigint) as n_pos, " +
      s"(${Parity.fpSum("p")} / cast(count(*) as double)) as mean_p " +
      "from dc group by decile"

  /** ROC AUC of the trained classifier via the Mann–Whitney identity —
    * AUC = (R_pos − n_pos(n_pos+1)/2) / (n_pos·n_neg) where R_pos is the
    * positive class's tie-averaged rank sum: the engine's own MWU core
    * doubles as model evaluation (AUC IS the normalized U statistic).
    *
    * Scale shape: ranks are NOT computed per row. Scores land on the q9
    * grid, so the corpus collapses to the distinct-score relation first
    * (map-side combined) and average ranks fall out of cumulative counts
    * over that grid — the aggregated-rank plan from the MWU rank
    * shoot-out (~100× less sort volume; the only window runs over the
    * grid-sized relation). All rank arithmetic stays in BIGINT (doubled
    * rank sums avoid the .5 halves), one exact division at the end. */
  def lrAuc(docs: DataFrame, buckets: Int = 256, iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val feats = TextOps.hashFeatures(docs, buckets).localCheckpoint()
    val w = trainOnFeats(feats, labelsOf(docs), docs.count(), iters, 1, 2)
      .selectExpr("bucket", s"${Parity.q9("w")} as w")
    val grid = feats.join(broadcast(w), "bucket")
      .groupBy("doc_id")
      .agg(expr(Parity.fpSum("w * cnt")).as("margin"))
      .join(labelsOf(docs), "doc_id")
      .selectExpr(s"${Parity.q9("margin")} as m9", "y")
      .groupBy("m9")
      .agg(count(lit(1)).as("n"),
        sum(expr("case when y = 1e0 then 1 else 0 end")).as("np"))
    val cum = Window.orderBy("m9")
      .rowsBetween(Window.unboundedPreceding, -1)
    grid
      .withColumn("cum_before", coalesce(sum("n").over(cum), lit(0L)))
      // doubled tie-averaged rank of every row at this score:
      // 2·avg_rank = 2·cum_before + n + 1
      .selectExpr("np", "n", "(np * (2 * cum_before + n + 1)) as r2_term")
      .agg(sum("np").as("n_pos"), sum(expr("n - np")).as("n_neg"),
        sum("r2_term").as("r2"))
      .selectExpr("n_pos", "n_neg",
        """(cast(r2 - n_pos * (n_pos + 1) as double) /
          | cast(2 * n_pos * n_neg as double)) as auc"""
          .stripMargin.replace("\n", " "))
  }

  /** DuckDB mirror of [[lrAuc]] — identical grid/cumulative spelling. */
  def lrAucSql(buckets: Int = 256, iters: Int = 3,
               table: String = "documents"): String =
    lrCtes(buckets, iters, 1, 2, table) +
      s", wf as (select bucket, ${Parity.q9("w")} as w from w$iters)" +
      s", sm as (select doc_id, ${Parity.fpSum("w * cnt")} as margin " +
      "from f join wf using (bucket) group by doc_id)" +
      s", sc as (select ${Parity.q9("margin")} as m9, y " +
      "from sm join lab using (doc_id))" +
      ", grid as (select m9, cast(count(*) as bigint) as n, " +
      "cast(sum(case when y = 1e0 then 1 else 0 end) as bigint) as np " +
      "from sc group by m9)" +
      ", cumg as (select np, n, coalesce(sum(n) over (order by m9 " +
      "rows between unbounded preceding and 1 preceding), 0) as cum_before " +
      "from grid)" +
      ", tot as (select cast(sum(np) as bigint) as n_pos, " +
      "cast(sum(n - np) as bigint) as n_neg, " +
      "cast(sum(np * (2 * cum_before + n + 1)) as bigint) as r2 from cumg)" +
      " select n_pos, n_neg, " +
      "(cast(r2 - n_pos * (n_pos + 1) as double) / " +
      "cast(2 * n_pos * n_neg as double)) as auc from tot"

  /** DuckDB mirror of the `mm_lr_infer` scoring pass: train (the same
    * unrolled CTEs), score every document, round-trip the margin
    * through REAL exactly like the float32 `Feature` vector the
    * [[Multimodal.LrTextModel]] emits (IEEE nearest — identical to the
    * JVM's `.toFloat`), then sigmoid on the q9 grid. */
  def lrInferSql(buckets: Int = 256, iters: Int = 3,
                 table: String = "documents"): String =
    lrCtes(buckets, iters, 1, 2, table) +
      s", wf as (select bucket, ${Parity.q9("w")} as w from w$iters)" +
      s", sm as (select doc_id, ${Parity.fpSum("w * cnt")} as margin " +
      "from f join wf using (bucket) group by doc_id)" +
      ", fm as (select doc_id, cast(cast(margin as real) as double) as m from sm)" +
      s" select doc_id, m, ${Parity.q9("1e0 / (1e0 + exp(-m))")} as p9 from fm"

  /** DuckDB mirror of [[lrTrain]] — the unrolled iteration. */
  def lrTrainSql(buckets: Int = 256, iters: Int = 3,
                 lrNum: Int = 1, lrDen: Int = 2,
                 table: String = "documents"): String =
    lrCtes(buckets, iters, lrNum, lrDen, table) +
      s" select bucket, ${Parity.q9("w")} as w9 from w$iters"
}
