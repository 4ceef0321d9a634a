package graft.operators

import graft.oracle.Parity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PCA over the embedding corpus — HASH-CHECKED end to end,
  * which is unusual for an eigen decomposition and possible here because
  * every stage is forced onto cross-engine-deterministic arithmetic:
  *
  *   1. moments: the corpus pass computes E[x_i·x_j] and E[x_i] with
  *      [[Parity.fpSum]] (order-free exact fixed-point sums), so the
  *      centered covariance entries are identical doubles in both
  *      engines. One explode + one (i,j)-keyed aggregate that combines
  *      map-side into a dim²-bounded relation — the corpus never
  *      shuffles, matching [[Similarity.standardize]]'s physics.
  *   2. eigenvectors: `rounds` fixed power-iteration steps (+ one
  *      deflation for the second component), every dot/normalize a
  *      strict left-to-right fold with a `+0.0` sign-of-zero
  *      canonicalization — the same chain contract as
  *      [[graft.functions.ChainDot]]. Spark runs the iteration on the
  *      driver over the COLLECTED dim²-bounded moment relation (the
  *      [[Pq.trainCodebook]] bounded-collect precedent: dim·(dim+1)
  *      rows, a constant independent of corpus size); DuckDB runs the
  *      IDENTICAL iteration as unrolled recursive CTE rounds on list
  *      values. Fixed round count means parity needs no convergence
  *      argument — both engines compute the same function of the data.
  *   3. projection: per-vector scores p1/p2 via the codegen'd
  *      chain-dot against the literal eigenvector (Spark) vs the
  *      spelled-out list fold (DuckDB).
  *
  * At 100 TB the moment pass is the only corpus-sized stage; dim² stays
  * driver-bounded for any realistic embedding width (d=1024 → 1M
  * doubles). Power iteration is the standard top-k eigensolver when
  * k ≪ d (Halko et al. 2011 randomized variants are the next step up).
  */
object Pca {

  private val dim = Similarity.dim
  private val rounds = 24

  /** Strict left fold of products, seeded with the FIRST product like
    * DuckDB's `list_reduce`, then `+0.0` to canonicalize -0.0 — the
    * shared chain contract. */
  private def fold(ps: Array[Double]): Double = {
    var acc = ps(0)
    var k = 1
    while (k < ps.length) { acc = acc + ps(k); k += 1 }
    acc + 0.0
  }

  private def matvec(c: Array[Array[Double]], v: Array[Double]): Array[Double] =
    Array.tabulate(dim)(i => fold(Array.tabulate(dim)(k => c(i)(k) * v(k))))

  private def normalize(v: Array[Double]): Array[Double] = {
    val nrm = math.sqrt(fold(v.map(x => x * x)))
    if (nrm == 0.0) v else v.map(x => x / nrm)
  }

  /** `rounds` power-iteration steps from a FULL-SUPPORT deterministic
    * start (a sparse e_i start dies instantly when its column of C is
    * zero — the matvec hits the zero-norm guard and sticks at 0).
    * Component 1 starts all-ones, component 2 alternating ±1 so the two
    * starts are not collinear; both spelled identically in the oracle. */
  private def iterate(c: Array[Array[Double]], alternating: Boolean): Array[Double] = {
    var v = Array.tabulate(dim) { k =>
      if (!alternating) 1.0 else if ((k + 1) % 2 == 1) 1.0 else -1.0
    }
    (1 to rounds).foreach(_ => v = normalize(matvec(c, v)))
    v
  }

  /** Rayleigh quotient λ = (C·v)·v of a unit vector (one extra matvec,
    * same fold). */
  private def rayleigh(c: Array[Array[Double]], v: Array[Double]): Double = {
    val y = matvec(c, v)
    fold(Array.tabulate(dim)(k => y(k) * v(k)))
  }

  /** Top-2 PCA projection of every vector: (vec_id, p1, p2). */
  def project(emb: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val li = emb.select(col("vec_id"), col("embedding"),
        explode(expr(s"sequence(1, $dim)")).as("i"))
      .select(col("vec_id"), col("embedding"), col("i"),
        expr("cast(element_at(embedding, i) as double)").as("xi"))
    // ONE corpus pass for both moments: the j=0 sentinel (xj=1) makes
    // E[x_i·1] = E[x_i], and xi*1e0 is bit-identical to xi, so the mean
    // lands on the same fpSum grid as the oracle's separate mu CTE
    val mom = li.withColumn("j", explode(expr(s"sequence(0, $dim)")))
      .select(col("i"), col("j"), col("xi"),
        expr("case when j = 0 then 1e0 else cast(element_at(embedding, j) as double) end").as("xj"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"), expr(Parity.fpSum("xi * xj")).as("sxx"))
      .selectExpr("cast(i as int) as i", "cast(j as int) as j",
        "sxx / cast(n as double) as exx")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val mu = (1 to dim).map(i => i -> mom((i, 0))).toMap
    // centered covariance, spelled exactly like the oracle's cmat CTE
    val c1 = Array.tabulate(dim, dim)((i, j) => mom((i + 1, j + 1)) - mu(i + 1) * mu(j + 1))
    val v1 = iterate(c1, alternating = false)
    val lam = rayleigh(c1, v1)
    val c2 = Array.tabulate(dim, dim)((i, j) => c1(i)(j) - lam * (v1(i) * v1(j)))
    val v2 = iterate(c2, alternating = true)
    def lit64(v: Array[Double]) = s"array(${v.map(Parity.lit).mkString(", ")})"
    emb.select(col("vec_id"),
      expr(s"(chain_dot(embedding, ${lit64(v1)}) + 0e0)").as("p1"),
      expr(s"(chain_dot(embedding, ${lit64(v2)}) + 0e0)").as("p2"))
  }

  // -------------------------------------------------------------------
  // DuckDB mirror: the identical computation as CTEs. Lambda variables
  // are k/x/y only (never i/j — the dsir_select shadowing lesson).
  // -------------------------------------------------------------------

  /** `(list_reduce(list_transform(generate_series(1, dim), k -> <prod>),
    * (x, y) -> x + y) + 0e0)` — the fold text. */
  private def foldSql(prod: String): String =
    s"(list_reduce(list_transform(generate_series(1, $dim), k -> $prod), (x, y) -> x + y) + 0e0)"

  /** One power-iteration round: matvec over the cov rows, re-list in
    * dim order, normalize with the zero guard. Every CTE MATERIALIZED —
    * the labelPropDuck lesson: each round references its predecessor
    * more than once, so inlining re-evaluates the whole prefix
    * exponentially. */
  private def roundSql(k: Int, prev: String, crow: String): String =
    s"m$k as materialized (select i, ${foldSql("carr[k] * v[k]")} as y from $crow, ${prev}), " +
      s"u$k as materialized (select list(y order by i) as v from m$k), " +
      s"r$k as materialized (select case when nrm = 0e0 then v else list_transform(v, x -> x / nrm) end as v " +
      s"from (select v, sqrt(${foldSql("v[k] * v[k]")}) as nrm from u$k))"

  /** @param prefix extra CTE definitions (each ending with ", ") spliced
    *        after WITH — lets a composed pipeline feed a survivor CTE in
    *        as `table`. */
  def projectSql(table: String = "embeddings", prefix: String = ""): String = {
    val sb = new StringBuilder
    sb ++= s"with $prefix"
    sb ++= s"li as materialized (select vec_id, embedding, cast(ui as bigint) as i, " +
      s"cast(embedding[ui] as double) as xi from $table, generate_series(1, $dim) t(ui)), "
    sb ++= s"mu as materialized (select i, ${Parity.fpSum("xi")} / cast(count(*) as double) as mu " +
      "from li group by i), "
    sb ++= s"mom as materialized (select i, cast(uj as bigint) as j, " +
      s"${Parity.fpSum("xi * cast(embedding[uj] as double)")} / cast(count(*) as double) as exx " +
      s"from li, generate_series(1, $dim) t2(uj) group by 1, 2), "
    sb ++= "cmat as materialized (select mom.i as i, mom.j as j, exx - (a.mu * b.mu) as c " +
      "from mom join mu a on mom.i = a.i join mu b on mom.j = b.i), "
    sb ++= "crow as materialized (select i, list(c order by j) as carr from cmat group by i), "
    sb ++= s"r0 as materialized (select list_transform(generate_series(1, $dim), " +
      "k -> 1e0) as v)"
    (1 to rounds).foreach(k => sb ++= ", " + roundSql(k, s"r${k - 1}", "crow"))
    // Rayleigh λ of v1, deflated matrix, second iteration from e2
    sb ++= s", ml as materialized (select i, ${foldSql("carr[k] * v[k]")} as y from crow, r$rounds)"
    sb ++= ", yl as materialized (select list(y order by i) as y from ml)"
    sb ++= s", lm as materialized (select ${foldSql("y[k] * v[k]")} as lam from yl, r$rounds)"
    sb ++= s", cmat2 as materialized (select cmat.i as i, cmat.j as j, c - lam * (v[cmat.i] * v[cmat.j]) as c " +
      s"from cmat, r$rounds, lm)"
    sb ++= ", crow2 as materialized (select i, list(c order by j) as carr from cmat2 group by i)"
    sb ++= s", s0 as materialized (select list_transform(generate_series(1, $dim), " +
      "k -> case when k % 2 = 1 then 1e0 else -1e0 end) as v)"
    (1 to rounds).foreach { k =>
      sb ++= ", " + roundSql(100 + k, if (k == 1) "s0" else s"r${100 + k - 1}", "crow2")
    }
    sb ++= s" select vec_id, ${foldSql("cast(embedding[k] as double) * a.v[k]")} as p1, " +
      s"${foldSql("cast(embedding[k] as double) * b.v[k]")} as p2 " +
      s"from $table, r$rounds a, r${100 + rounds} b"
    sb.toString
  }
}
