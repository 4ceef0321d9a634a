package graft.operators

import graft.oracle.Parity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed one-hidden-layer MLP over hashed text features — the
  * learned NON-LINEAR quality classifier ([[Classifier]]'s logistic
  * regression generalized with a ReLU hidden layer), trained as
  * full-batch gradient descent in pure dataflow and served through the
  * partition-batched [[Multimodal.BatchModel]] contract.
  *
  * Scale shape per iteration: the sparse feature stream joins the
  * broadcast layer-1 weights (buckets × hidden rows), one
  * (doc, hidden)-sized aggregate forms pre-activations, the hidden
  * relation is materialized ONCE and feeds the forward margin and both
  * backward passes, gradients land in two bounded aggregates
  * (buckets × hidden and hidden rows), and the weight updates are maps
  * over weight-vector-sized relations. The only corpus-proportional
  * join is backprop's feats ⋈ hidden-deltas fan-out (nnz × hidden
  * rows — the true cost of dense backprop over sparse inputs). Nothing
  * collects to the driver during training; iteration lineage flattens
  * with `localCheckpoint` (the [[Graph.pageRank]]/[[Bpe]] discipline).
  *
  * Cross-engine determinism (oracle = the identical iterations unrolled
  * as materialized CTEs): every per-doc and per-weight sum rides
  * [[Parity.fpSum]] (order-free exact BIGINT terms); the hidden
  * activation is ReLU — `greatest(z, 0)` — which is EXACT, so unlike a
  * tanh/sigmoid hidden layer no transcendental enters the weight
  * trajectory at all; the output sigmoid is the one transcendental and
  * its probability is q9-quantized before the error signal forms
  * (the [[Classifier]] discipline). Deterministic dyadic init (mixed
  * signs, asymmetric across hidden units — zero init would freeze a
  * ReLU network by symmetry) keeps both engines on the same trajectory
  * from step 0.
  */
object Mlp {

  /** q9'd output sigmoid over a `margin` column — shared text. */
  private val pExpr = Parity.q9("1e0 / (1e0 + exp(-margin))")

  /** Deterministic dyadic inits, shared textually with the oracle:
    * layer 1 in {-3..3}/8 mixing bucket and unit index, layer 2 in
    * {-1,0,1}/4 (a zero unit un-freezes after one step: its h ≠ 0
    * drives a non-zero layer-2 gradient). */
  private val w1Init = "(cast((bucket * 31 + j * 17) % 7 - 3 as double) / 8e0)"
  private val w2Init = "(cast(j % 3 - 1 as double) / 4e0)"

  private def labelsOf(docs: DataFrame): DataFrame =
    docs.selectExpr("doc_id", "case when lang = 'en' then 1e0 else 0e0 end as y")

  /** The GD loop over a prepared (checkpointed) feature stream; returns
    * the final (layer-1, layer-2) weight relations, unquantized. */
  private def trainOnFeats(feats: DataFrame, labels: DataFrame, nDocs: Long,
                           hidden: Int, iters: Int,
                           lrNum: Int, lrDen: Int): (DataFrame, DataFrame) = {
    val spark = feats.sparkSession
    val js = spark.range(hidden).selectExpr("cast(id as bigint) as j")
    var w1 = feats.select(col("bucket")).distinct().crossJoin(js)
      .selectExpr("bucket", "j", s"$w1Init as w").localCheckpoint()
    var w2 = js.selectExpr("j", s"$w2Init as w").localCheckpoint()
    for (_ <- 1 to iters) {
      // forward: pre-activations z and ReLU h — ONE materialization
      // feeds the margin, the layer-2 gradient, and backprop
      val h = feats.join(broadcast(w1), "bucket")
        .groupBy("doc_id", "j")
        .agg(expr(Parity.fpSum("w * cnt")).as("z"))
        .withColumn("h", expr("greatest(z, 0e0)"))
        .localCheckpoint()
      val margins = h.join(broadcast(w2), "j")
        .groupBy("doc_id")
        .agg(expr(Parity.fpSum("w * h")).as("margin"))
      // error signal d = p − y, exact on the 1e-9 grid
      val probs = margins.join(labels, "doc_id")
        .selectExpr("doc_id", s"($pExpr - y) as d")
        .localCheckpoint()
      val g2 = h.join(probs, "doc_id")
        .groupBy("j").agg(expr(Parity.fpSum("d * h")).as("g"))
      // hidden deltas: dh = d · w2 · ReLU'(z); ReLU' is an exact compare
      val dh = h.join(probs, "doc_id").join(broadcast(w2), "j")
        .selectExpr("doc_id", "j",
          "(d * w * case when z > 0e0 then 1e0 else 0e0 end) as dh")
      val g1 = feats.join(dh, "doc_id")
        .groupBy("bucket", "j").agg(expr(Parity.fpSum("dh * cnt")).as("g"))
      w1 = w1.join(g1, Seq("bucket", "j"))
        .selectExpr("bucket", "j",
          s"(w - ($lrNum / ${lrDen}e0) * (g / ${nDocs}e0)) as w")
        .localCheckpoint()
      w2 = w2.join(g2, "j")
        .selectExpr("j",
          s"(w - ($lrNum / ${lrDen}e0) * (g / ${nDocs}e0)) as w")
        .localCheckpoint()
    }
    (w1, w2)
  }

  /** Train `iters` full-batch GD steps of the MLP; returns BOTH weight
    * layers in one relation — (layer, i, j, w9) with layer 1 rows
    * (bucket, unit) and layer 2 rows (unit, 0) — q9'd for a stable
    * dump. */
  def mlpTrain(docs: DataFrame, buckets: Int = 256, hidden: Int = 4,
               iters: Int = 2, lrNum: Int = 1, lrDen: Int = 2): DataFrame = {
    val feats = TextOps.hashFeatures(docs, buckets).localCheckpoint()
    val (w1, w2) = trainOnFeats(feats, labelsOf(docs), docs.count(),
      hidden, iters, lrNum, lrDen)
    w1.selectExpr("cast(1 as bigint) as layer", "bucket as i", "j",
        s"${Parity.q9("w")} as w9")
      .unionByName(w2.selectExpr("cast(2 as bigint) as layer", "j as i",
        "cast(0 as bigint) as j", s"${Parity.q9("w")} as w9"))
  }

  /** Train and return the q9'd weight ARRAYS for the batch-model serving
    * path — a bounded driver collect (buckets × hidden + hidden doubles;
    * the [[Pq]] bounded-collect precedent). */
  def trainedArrays(docs: DataFrame, buckets: Int = 256, hidden: Int = 4,
                    iters: Int = 2): (Array[Array[Double]], Array[Double]) = {
    val dumped = mlpTrain(docs, buckets, hidden, iters).collect()
    val m1 = Array.ofDim[Double](buckets, hidden)
    val m2 = new Array[Double](hidden)
    dumped.foreach { r =>
      if (r.getLong(0) == 1L) m1(r.getLong(1).toInt)(r.getLong(2).toInt) = r.getDouble(3)
      else m2(r.getLong(1).toInt) = r.getDouble(3)
    }
    (m1, m2)
  }

  /** Load an L-layer weight artifact — [[mlpTrain]]'s (layer, i, j, w9)
    * dump format generalized: layer ℓ ∈ 1..L, i = input index, j =
    * output-unit index (the final 1-unit layer uses j = 0) — into dense
    * per-layer matrices for [[Multimodal.MlpStackModel]]. A bounded,
    * MODEL-sized driver collect (Σℓ nᵢ·nⱼ doubles — the [[Pq]]
    * bounded-collect precedent), which is the point: the serving path
    * consumes a parquet artifact, so weights can come from THIS
    * engine's trainer, a previous run, or any external trainer that
    * writes the format — weight-source-agnostic serving under the
    * zero-deps constraint. Layer 1 is padded to `buckets` input rows
    * (hash buckets the training corpus never populated score 0,
    * exactly as [[trainedArrays]]' zero-initialized dense dump). */
  def loadWeights(spark: org.apache.spark.sql.SparkSession, dir: String,
                  buckets: Int = 256): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(dir).select("layer", "i", "j", "w9").collect()
    require(rows.nonEmpty, s"empty weight artifact at $dir")
    val byLayer = rows.groupBy(_.getLong(0)).toSeq.sortBy(_._1)
    val layerIds = byLayer.map(_._1)
    require(layerIds == (1L to layerIds.length.toLong),
      s"weight artifact layers must be contiguous from 1, got $layerIds")
    byLayer.map { case (layer, rs) =>
      val niData = rs.map(_.getLong(1)).max.toInt + 1
      val ni = if (layer == 1L) math.max(niData, buckets) else niData
      val nj = rs.map(_.getLong(2)).max.toInt + 1
      val m = Array.ofDim[Double](ni, nj)
      rs.foreach(r => m(r.getLong(1).toInt)(r.getLong(2).toInt) = r.getDouble(3))
      m
    }.toArray
  }

  /** Shared CTE chain: features, labels, doc count, the hidden-unit
    * axis, and the unrolled two-layer weight iteration. CTEs referenced
    * more than once are `materialized` (the inlining-re-evaluation
    * gotcha). */
  private def mlpCtes(buckets: Int, hidden: Int, iters: Int,
                      lrNum: Int, lrDen: Int, table: String): String = {
    val sb = new StringBuilder
    sb ++= s"with f as materialized (${TextOps.hashFeaturesSql(buckets, table)}), "
    sb ++= s"lab as (select doc_id, case when lang = 'en' then 1e0 else 0e0 end as y from $table), "
    sb ++= s"nd as (select cast(count(*) as bigint) as n_docs from $table), "
    sb ++= s"js as (select cast(unnest(generate_series(0, ${hidden - 1})) as bigint) as j), "
    sb ++= s"w1_0 as materialized (select bucket, j, $w1Init as w " +
      "from (select distinct bucket from f) cross join js), "
    sb ++= s"w2_0 as materialized (select j, $w2Init as w from js)"
    for (k <- 1 to iters) {
      sb ++= s", h$k as materialized (select doc_id, j, z, greatest(z, 0e0) as h from " +
        s"(select doc_id, j, ${Parity.fpSum("w * cnt")} as z " +
        s"from f join w1_${k - 1} using (bucket) group by doc_id, j))"
      sb ++= s", m$k as (select doc_id, ${Parity.fpSum("w * h")} as margin " +
        s"from h$k join w2_${k - 1} using (j) group by doc_id)"
      sb ++= s", p$k as materialized (select doc_id, ($pExpr - y) as d " +
        s"from m$k join lab using (doc_id))"
      sb ++= s", g2_$k as (select j, ${Parity.fpSum("d * h")} as g " +
        s"from h$k join p$k using (doc_id) group by j)"
      sb ++= s", dh$k as (select doc_id, j, " +
        "(d * w * case when z > 0e0 then 1e0 else 0e0 end) as dh " +
        s"from h$k join p$k using (doc_id) join w2_${k - 1} using (j))"
      sb ++= s", g1_$k as (select bucket, j, ${Parity.fpSum("dh * cnt")} as g " +
        s"from f join dh$k using (doc_id) group by bucket, j)"
      sb ++= s", w1_$k as materialized (select bucket, j, " +
        s"(w - ($lrNum / ${lrDen}e0) * (g / (cast(n_docs as double) + 0e0))) as w " +
        s"from w1_${k - 1} join g1_$k using (bucket, j) cross join nd)"
      sb ++= s", w2_$k as materialized (select j, " +
        s"(w - ($lrNum / ${lrDen}e0) * (g / (cast(n_docs as double) + 0e0))) as w " +
        s"from w2_${k - 1} join g2_$k using (j) cross join nd)"
    }
    sb.toString
  }

  /** DuckDB mirror of [[mlpTrain]] — the unrolled two-layer iteration. */
  def mlpTrainSql(buckets: Int = 256, hidden: Int = 4, iters: Int = 2,
                  lrNum: Int = 1, lrDen: Int = 2,
                  table: String = "documents"): String =
    mlpCtes(buckets, hidden, iters, lrNum, lrDen, table) +
      s" select cast(1 as bigint) as layer, bucket as i, j, ${Parity.q9("w")} as w9 from w1_$iters" +
      s" union all select cast(2 as bigint) as layer, j as i, cast(0 as bigint) as j, ${Parity.q9("w")} as w9 from w2_$iters"

  /** DuckDB mirror of the `mm_mlp_infer` scoring pass: train (the same
    * unrolled CTEs), score every document through the q9'd weights —
    * layer-1 fixed-point sums, exact ReLU, layer-2 fixed-point sum —
    * round-trip the margin through REAL exactly like the float32
    * `Feature` vector [[Multimodal.MlpTextModel]] emits, then sigmoid
    * on the q9 grid. */
  def mlpInferSql(buckets: Int = 256, hidden: Int = 4, iters: Int = 2,
                  table: String = "documents"): String =
    mlpCtes(buckets, hidden, iters, 1, 2, table) +
      s", wf1 as materialized (select bucket, j, ${Parity.q9("w")} as w from w1_$iters)" +
      s", wf2 as materialized (select j, ${Parity.q9("w")} as w from w2_$iters)" +
      s", zf as materialized (select doc_id, j, greatest(z, 0e0) as h from " +
      s"(select doc_id, j, ${Parity.fpSum("w * cnt")} as z " +
      "from f join wf1 using (bucket) group by doc_id, j))" +
      s", sm as (select doc_id, ${Parity.fpSum("w * h")} as margin " +
      "from zf join wf2 using (j) group by doc_id)" +
      ", fm as (select doc_id, cast(cast(margin as real) as double) as m from sm)" +
      s" select doc_id, m, ${Parity.q9("1e0 / (1e0 + exp(-m))")} as p9 from fm"
}
