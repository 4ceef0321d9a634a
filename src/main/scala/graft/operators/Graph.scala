package graft.operators

import graft.oracle.Parity
import graft.oracle.Parity.{fpSum, q9}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed graph analytics, Spark-first: PageRank over the part
  * co-purchase graph (parts that appear in the same order are
  * neighbors). The iteration is the classic dataflow spelling — no graph
  * library, no driver-side adjacency: each round is one join (ranks onto
  * edges) plus one aggregate (contributions per destination), i.e. two
  * hash shuffles over edge-partitioned data, which is exactly how it
  * runs at 1000-executor scale.
  *
  * Determinism: each round's contribution sum goes through
  * [[Parity.fpSum]] (per-row 2^-20 fixed point, exact BIGINT sum), so
  * rank vectors are bit-identical under any partitioning — and the
  * DuckDB oracle can replay the SAME iteration unrolled as materialized
  * CTEs (the `dedup_groups` trick; plain CTEs would inline and
  * re-evaluate the edge build exponentially).
  *
  * Spark-loop gotcha encoded here: each round `localCheckpoint()`s the
  * rank frame — without it the lineage doubles per iteration and the
  * optimizer re-plans the whole history.
  */
object Graph {

  /** Damping 0.85 spelled as exponent-form literals (Parity trap). */
  private val D = "85e-2"
  private val OneMinusD = "15e-2"

  /** PageRank over part co-purchase: fixed `iters` power iterations,
    * top-`topK` parts by rank. Per-order pair fan-out is bounded by the
    * basket size (≤13² here; a retail-scale basket cap is the standard
    * guard). Single-item orders contribute no edges, so isolated parts
    * are not graph nodes — documented contract, same in the oracle. */
  def pageRank(lineitem: DataFrame, iters: Int = 5, topK: Int = 20): DataFrame = {
    val op = lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    // edge build stays a SELF-JOIN deliberately: a collect_set-per-order
    // gather with nested transform/filter pair generation moves the fact
    // once instead of three times, but higher-order array lambdas run
    // INTERPRETED (no whole-stage codegen) — measured 52 s vs 28 s at the
    // 4×-replica stress, the extra shuffles are cheaper than losing
    // codegen on 300M generated structs
    val edges = op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") =!= col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst"))
      .distinct()
      .localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // edges pre-joined with out-degrees once and materialized. NOT
    // re-partitioned first: localCheckpoint erases partitioning from
    // the planner's view (measured on this Spark: the checkpoint scan
    // reports UnknownPartitioning, so a pre-checkpoint repartition is
    // one full edge exchange bought for nothing — the r15 plan audit
    // found every iteration re-exchanging AND re-sorting this table
    // behind a comment claiming the layout was reused)
    val we = edges.join(deg, "src").localCheckpoint()
    // the node count is a bounded driver scalar (ONE count job): riding
    // it through the loop as a broadcast 1-row cross join re-planned
    // the deg aggregate inside a broadcast future EVERY iteration
    // (r15 plan audit: 14 BroadcastExchanges, each re-aggregating the
    // edge checkpoint twice — the winnowOverlap driver-literal trade,
    // measured there at +6s for the dataflow spelling)
    val nn = deg.count()
    // the rank frames stay UNmaterialized: each round references the
    // previous one exactly once, so lineage grows linearly (unlike the
    // self-referencing label-propagation loop, which must checkpoint per
    // round) and all `iters` rounds pipeline into one DAG whose only big
    // leaf is the materialized edge table.
    // The per-iteration join SHIPS THE RANK VECTOR, never the edges:
    // size-gated explicit broadcast (the serveNearDup discipline) —
    // node-sized rank rows (~32 B each) under the session broadcast
    // threshold pin a BroadcastHashJoin so the edge table is neither
    // exchanged nor sorted in any round; above the gate the planner's
    // shuffle join takes over (nodes are catalog-sized at 100 TB, so
    // the gate trips to shuffle exactly when a broadcast would OOM)
    val bcastRanks = {
      val thresh = docsThreshold(lineitem)
      thresh > 0 && nn * 32L <= thresh
    }
    def rankSide(df: DataFrame): DataFrame =
      if (bcastRanks) broadcast(df) else df
    var r = deg.selectExpr("src as node",
      s"(1e0 / cast(${nn}L as double)) as r")
    for (_ <- 1 to iters) {
      r = we.join(rankSide(r), col("src") === col("node"))
        .selectExpr("dst", "(r / cast(deg as double)) as c")
        .groupBy("dst").agg(expr(fpSum("c")).as("s"))
        .selectExpr("dst as node",
          s"($OneMinusD / cast(${nn}L as double) + $D * s) as r")
    }
    // top-k via sort+limit (TakeOrderedAndProject), NOT a row_number
    // window with no partition key: the windowed spelling moved the
    // whole node-sized rank vector to one task (the WindowExec
    // single-partition warning) — rank assignment over the topK
    // survivors is bounded by topK
    r.orderBy(col("r").desc, col("node").asc).limit(topK)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("r").desc, col("node").asc)).cast("long"))
      .selectExpr("node", s"cast(${nn}L as bigint) as n_nodes",
        s"${q9("r")} as rank9", "rn")
  }

  /** The session broadcast threshold, read off the frame's session —
    * the size gate for shipping node-sized rank/label vectors as
    * broadcasts. */
  private def docsThreshold(df: DataFrame): Long =
    df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold

  /** DuckDB mirror of [[pageRank]]: the identical iteration unrolled as
    * MATERIALIZED CTEs. */
  def pageRankSql(table: String = "lineitem", iters: Int = 5,
                  topK: Int = 20): String = {
    val rounds = (1 to iters).map { i =>
      val prev = s"r${i - 1}"
      s"""c$i as (select dst, ${fpSum("(r / cast(deg as double))")} as s
         | from we join $prev on we.src = $prev.node group by dst),
         |r$i as materialized (select dst as node,
         | ($OneMinusD / cast(nn as double) + $D * s) as r from c$i, n)"""
        .stripMargin
    }.mkString(",\n")
    s"""with op as materialized (select distinct l_orderkey as ok,
       |  l_partkey as p from $table),
       |edges as materialized (select distinct a.p as src, b.p as dst
       | from op a join op b on a.ok = b.ok and a.p <> b.p),
       |deg as materialized (select src, cast(count(*) as bigint) as deg
       | from edges group by src),
       |n as (select cast(count(*) as bigint) as nn from deg),
       |we as materialized (select edges.src, dst, deg
       | from edges join deg on edges.src = deg.src),
       |r0 as materialized (select src as node, (1e0 / cast(nn as double)) as r
       | from deg, n),
       |$rounds
       |select node, cast(nn as bigint) as n_nodes, ${q9("r")} as rank9, rn
       |from (select node, nn, r,
       |  row_number() over (order by r desc, node asc) as rn
       | from r$iters, n)
       |where rn <= $topK""".stripMargin.replace("\n", " ")
  }

  /** Triangle counting over the co-purchase graph with DEGREE
    * ORIENTATION — the classic distributed trick (public; e.g.
    * Suri–Vassilvitskii "Counting triangles and the curse of the last
    * reducer"): orient every undirected edge from its (degree, id)-
    * smaller endpoint to the larger, so each triangle is generated
    * exactly once at its minimum vertex and the wedge fan-out per vertex
    * is bounded by the out-degree (O(√m) for arbitrary graphs instead of
    * the max raw degree — the hub that breaks the naive plan). Shapes:
    * two hash joins on vertex keys + one aggregate; everything shuffles
    * by vertex/edge keys, never all-pairs. Returns the top-`topK`
    * vertices by triangle membership (exact integer counts).
    *
    * Edges carry a SUPPORT threshold (co-purchased in >= `minSupport`
    * distinct orders): the raw one-co-occurrence graph over a shared
    * part universe is near-complete, so its triangle count is noise and
    * cubic-ish work (measured 56 s at sf0.1); thresholding is how real
    * co-occurrence similarity graphs are built before triangle/community
    * analysis (~3 s at sf0.1 after the cut). */
  def triangles(lineitem: DataFrame, topK: Int = 20, minSupport: Int = 2): DataFrame = {
    val op = lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    // support-thresholded undirected edge set, canonical u < v by id
    val und = op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .select("u", "v")
      .localCheckpoint()
    val deg = und.select(col("u").as("p")).union(und.select(col("v").as("p")))
      .groupBy("p").agg(count(lit(1)).as("deg"))
    val e = und
      .join(deg.select(col("p").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("p").as("v"), col("deg").as("dv")), "v")
      .selectExpr(
        "case when du < dv or (du = dv and u < v) then u else v end as src",
        "case when du < dv or (du = dv and u < v) then v else u end as dst")
      .localCheckpoint()
    // wedges at the oriented apex; (b, c) canonical by id so the closing
    // edge probes the undirected set directly
    val wedges = e.as("e1").join(e.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("ta"), col("e1.dst").as("tb"), col("e2.dst").as("tc"))
    val tri = wedges.join(und,
        col("tb") === col("u") && col("tc") === col("v"))
      .select("ta", "tb", "tc")
    tri.selectExpr("ta as p")
      .union(tri.selectExpr("tb as p"))
      .union(tri.selectExpr("tc as p"))
      .groupBy("p").agg(count(lit(1)).as("n_tri"))
      .orderBy(col("n_tri").desc, col("p").asc)
      .limit(topK)
  }

  /** Label-propagation community detection (Raghavan et al. 2007) over
    * the support-thresholded co-purchase graph — the cheap community
    * pass run before expensive per-community work (modularity, summary
    * stats). SYNCHRONOUS variant with two determinism anchors the async
    * original lacks: every node votes over its neighbors' PREVIOUS-round
    * labels plus its own (the self-vote), and the winning label is
    * argmax by (count desc, label asc) — so a 2-node swap cycle
    * collapses to the smaller id instead of oscillating, and the result
    * after a FIXED `iters` rounds is bit-reproducible under any
    * partitioning (no convergence claim — the fixed-round output is the
    * contract, same as [[pageRank]]).
    *
    * Scale shape per round: one hash join (labels onto the symmetric
    * edge list, node-keyed), one count aggregate, one per-node argmax
    * window — node×degree-sized exchanges, never all-pairs. The label
    * frame is `localCheckpoint`ed per round (self-referencing loop:
    * lineage would double otherwise). Returns the community-size
    * histogram (label of each community = its minimum-ish attractor id,
    * size = member count). */
  def labelCommunities(lineitem: DataFrame, iters: Int = 6,
                       minSupport: Int = 2): DataFrame = {
    val op = lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    val und = op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .select("u", "v")
    // no pre-checkpoint repartition (r15): localCheckpoint erases
    // partitioning from the planner's view (see [[pageRank]]), so the
    // old repartition(v) was one full edge exchange bought for nothing
    val sym = und.union(und.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    var labels = sym.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
      .localCheckpoint()
    // per-round join ships the node-sized label vector, never the edge
    // table: size-gated broadcast, same argument and gate as
    // [[pageRank]]'s rank vector (label frames stay node-count-sized
    // every round — the count is paid once)
    val bcastLabels = {
      val thresh = docsThreshold(lineitem)
      thresh > 0 && labels.count() * 32L <= thresh
    }
    def labelSide(df: DataFrame): DataFrame =
      if (bcastLabels) broadcast(df) else df
    for (i <- 1 to iters) {
      val votes = sym.join(labelSide(labels), col("v") === col("node"))
        .select(col("u").as("n2"), col("lbl"))
        .union(labels.select(col("node").as("n2"), col("lbl")))
        .groupBy("n2", "lbl").agg(count(lit(1)).as("c"))
      // argmax by (c desc, lbl asc) as a max-of-struct AGGREGATE rather
      // than a rank window: both hash aggs combine map-side, so the
      // exchange carries partial maxima instead of the full vote list
      // and no per-round sort exists (measured ~1.6x on the sf0.1 graph)
      labels = votes
        .groupBy(col("n2").as("node"))
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("lbl"))
      // r16 (guide §1.2 job-count; JobProf: LPA is ~35 small jobs, all
      // barrier/planning overhead at node scale): the checkpoint still
      // truncates the self-referencing lineage every round (the plan is
      // a LogicalRDD either way), but LAZY — the RDD materializes inside
      // the next round's first job instead of a dedicated per-round
      // action — and the FINAL round skips it entirely (its labels are
      // referenced exactly once, by the community rollup, so lineage
      // never doubles past it).
      if (i < iters) labels = labels.localCheckpoint(eager = false)
    }
    labels.groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_members"))
  }

  /** DuckDB mirror of [[labelCommunities]]: identical rounds unrolled as
    * MATERIALIZED CTEs (the inlining-re-evaluation gotcha). */
  def labelCommunitiesSql(table: String = "lineitem", iters: Int = 6,
                          minSupport: Int = 2): String = {
    val rounds = (1 to iters).map { i =>
      val prev = s"l${i - 1}"
      s"""v$i as (select n2, lbl, count(*) as c from (
         |  select sym.u as n2, lbl from sym join $prev on sym.v = $prev.node
         |  union all select node as n2, lbl from $prev) t group by 1, 2),
         |l$i as materialized (select n2 as node, lbl from (
         |  select n2, lbl,
         |   row_number() over (partition by n2 order by c desc, lbl asc) as rn
         |  from v$i) where rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""with op as materialized (select distinct l_orderkey as ok,
       |  l_partkey as p from $table),
       |und as materialized (select u, v from (
       |  select a.p as u, b.p as v, count(*) as support
       |  from op a join op b on a.ok = b.ok and a.p < b.p group by 1, 2)
       | where support >= $minSupport),
       |sym as materialized (select u, v from und
       | union all select v as u, u as v from und),
       |l0 as materialized (select node, node as lbl from
       | (select distinct u as node from sym)),
       |$rounds
       |select lbl as community, cast(count(*) as bigint) as n_members
       |from l$iters group by 1""".stripMargin.replace("\n", " ")
  }

  /** DuckDB mirror of [[triangles]]. */
  def trianglesSql(table: String = "lineitem", topK: Int = 20,
                   minSupport: Int = 2): String =
    s"""with op as materialized (select distinct l_orderkey as ok,
       |  l_partkey as p from $table),
       |und as materialized (select u, v from (
       |  select a.p as u, b.p as v, count(*) as support
       |  from op a join op b on a.ok = b.ok and a.p < b.p group by 1, 2)
       | where support >= $minSupport),
       |deg as (select p, cast(count(*) as bigint) as deg from (
       |  select u as p from und union all select v as p from und) t group by p),
       |e as materialized (select
       |  case when du < dv or (du = dv and u < v) then u else v end as src,
       |  case when du < dv or (du = dv and u < v) then v else u end as dst
       | from und
       |  join (select p as u, deg as du from deg) d1 using (u)
       |  join (select p as v, deg as dv from deg) d2 using (v)),
       |tri as (select e1.src as ta, e1.dst as tb, e2.dst as tc
       | from e e1 join e e2 on e1.src = e2.src and e1.dst < e2.dst
       |  join und on e1.dst = und.u and e2.dst = und.v)
       |select p, cast(count(*) as bigint) as n_tri from (
       | select ta as p from tri union all select tb as p from tri
       | union all select tc as p from tri) x
       |group by p order by n_tri desc, p asc limit $topK"""
      .stripMargin.replace("\n", " ")
}
