package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text pipelines (builder north
  * star — beyond the reference surface, SURVEY.md §7.6).
  *
  * Scale design: every variant is a pure hash-partitioned plan —
  *   - exact: one shuffle on the content hash; at 100 TB the hash
  *     pre-aggregation combines map-side, and only (hash, count, keeper)
  *     tuples shuffle, never the text.
  *   - n-gram Jaccard: candidate generation is a bucketed self-join
  *     (language × length band) so the quadratic blow-up is bounded per
  *     bucket; shingle arrays shuffle once, hashed by bucket.
  *   - MinHash/LSH & SimHash: signatures are fixed-width, so the shuffle
  *     volume is O(rows × bands), independent of document length.
  */
object Dedup {

  /** Exact dedup via content fingerprint: per-hash multiplicity and the
    * deterministic keeper (min id). */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("fingerprint"))
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("keeper_id"))

  /** Distinct character n-gram shingles of a text column (1-based
    * substring; short texts yield one partial shingle — deterministic). */
  def shingles(textCol: String, n: Int = 3): Column =
    expr(s"array_distinct(transform(sequence(1, greatest(char_length($textCol) - ${n - 1}, 1)), " +
      s"i -> substring($textCol, i, $n)))")

  /** Near-duplicate pairs by character-n-gram Jaccard within
    * (lang, length-band) candidate buckets. Jaccard is an exact integer
    * ratio — cross-engine deterministic with no rounding. */
  def ngramJaccard(docs: DataFrame, n: Int = 3, band: Int = 50,
                   threshold: Double = 0.4): DataFrame = {
    val sh = docs.select(col("doc_id"), col("lang"),
        expr(s"n_chars div $band").as("bucket"), shingles("text", n).as("sh"))
    val a = sh.select(col("doc_id").as("doc_a"), col("lang"), col("bucket"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("lang"), col("bucket"), col("sh").as("sh_b"))
    a.join(b, Seq("lang", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("uni",
        size(col("sh_a")).cast("long") + size(col("sh_b")).cast("long") - col("inter"))
      .withColumn("jac", col("inter").cast("double") / col("uni").cast("double"))
      .filter(col("jac") >= threshold)
      .select("doc_a", "doc_b", "jac")
  }

  /** MinHash near-dup via spark.ml LSH: shingle → binarized term vector →
    * banded min-hash join. The ml estimator owns the hash family, so this
    * variant is checked rows-only (no portable SQL oracle). */
  def minHashPairs(docs: DataFrame, numHashTables: Int = 8,
                   maxDistance: Double = 0.6): DataFrame = {
    import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
    val withShingles = docs.select(col("doc_id"), shingles("text").as("sh"))
    val cv = new CountVectorizer().setInputCol("sh").setOutputCol("features")
      .setBinary(true).setMinDF(1.0)
    val vecs = cv.fit(withShingles).transform(withShingles)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(42L)
    val model = lsh.fit(vecs)
    model.approxSimilarityJoin(vecs, vecs, maxDistance, "jaccard_dist")
      .select(col("datasetA.doc_id").as("doc_a"), col("datasetB.doc_id").as("doc_b"),
        col("jaccard_dist"))
      .filter(col("doc_a") < col("doc_b"))
  }
}
