package graft

import graft.operators.SparseIndex
import org.apache.spark.sql.DataFrame

/** Sparse posting-index lifecycle specs — the invariant under test is the
  * same one the ANN index proved: every physical history (append segments,
  * tombstones, compaction) serves bit-identically to a from-scratch build
  * of the logical corpus, because the stored halves are exact mergeable
  * moments, never derived scores. (Cross-engine exactness is the oracle
  * gate's job — sparse_append / sparse_delete / sparse_lifecycle share
  * sparse_retrieval's DuckDB mirror.) */
class SparseIndexSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  /** ~60 synthetic docs over a shared phrase pool so 3-gram postings
    * overlap across docs (retrieval returns non-trivial neighbors). */
  private def mkDocs(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    val pool = Vector(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "how vexingly quick daft zebras jump",
      "sphinx of black quartz judge my vow",
      "the five boxing wizards jump quickly")
    ids.map { i =>
      val a = pool((i % 5).toInt); val b = pool(((i / 5) % 5).toInt)
      (i, s"$a $b tail${i % 7}")
    }.toDF("doc_id", "text")
  }

  private def serve(dir: String) =
    SparseIndex.sparseRetrievalStored(spark, dir, queryEvery = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

  /** The df MOMENTS of a stored index: delta segments fold with a sum
    * (the reader discipline) — tokens netting to 0 have left. */
  private def dfstats(dir: String) =
    spark.read.parquet(s"$dir/dfstats").groupBy("token")
      .agg(sum("dfq").as("dfq")).filter(col("dfq") > 0).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private def postingFiles(dir: String): Int =
    new java.io.File(s"$dir/postings").listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))

  test("sparse append: shard ingest == full rebuild (df moments, nn, serving), incl. brand-new tokens") {
    val all = mkDocs(0L until 60L)
    val base = all.filter(col("doc_id") % 3 =!= 0)
    val shard = all.filter(col("doc_id") % 3 === 0)
    val inc = graft.Scratch.dir("sidx_spec_inc_")
    SparseIndex.writeSparseIndex(base, inc)
    SparseIndex.appendSparseIndex(shard, inc)
    val full = graft.Scratch.dir("sidx_spec_full_")
    SparseIndex.writeSparseIndex(all, full)
    assert(dfstats(inc) == dfstats(full), "merged df moments diverge from rebuild")
    // the shard carries tokens the base never saw (tail-word trigrams of
    // shard-only docs) — they must materialize through the moment merge
    val baseTokens = {
      val d = graft.Scratch.dir("sidx_spec_base_")
      SparseIndex.writeSparseIndex(base, d); dfstats(d).keySet
    }
    assert((dfstats(inc).keySet -- baseTokens).nonEmpty, "no shard-new token exercised")
    def nn(d: String) = spark.read.parquet(s"$d/meta").collect().head.getLong(0)
    assert(nn(inc) == 60L && nn(full) == 60L)
    val s1 = serve(inc)
    assert(s1.nonEmpty && s1 == serve(full),
      "appended index serves differently from the full rebuild")
  }

  test("sparse delete + compact: tombstoned == survivors rebuild; double-delete no-op; re-insert gated until compact; 1 file/bucket after") {
    val all = mkDocs(0L until 60L)
    val doomed = all.filter(col("doc_id") % 4 === 1)
    val survivors = all.filter(col("doc_id") % 4 =!= 1)
    val idx = graft.Scratch.dir("sidx_spec_del_")
    SparseIndex.writeSparseIndex(all.filter(col("doc_id") < 40), idx)
    SparseIndex.appendSparseIndex(all.filter(col("doc_id") >= 40), idx)
    SparseIndex.deleteFromSparseIndex(doomed, idx)
    val surv = graft.Scratch.dir("sidx_spec_surv_")
    SparseIndex.writeSparseIndex(survivors, surv)
    assert(dfstats(idx) == dfstats(surv), "downdated df moments diverge from survivors rebuild")
    val served = serve(idx)
    assert(served.nonEmpty && served == serve(surv),
      "tombstoned index serves differently from the survivors rebuild")
    // re-delivered delete must be a no-op (else df subtracts twice)
    SparseIndex.deleteFromSparseIndex(doomed, idx)
    assert(dfstats(idx) == dfstats(surv), "re-delivered delete corrupted df moments")
    assert(serve(idx) == served, "re-delivered delete changed serving")
    // re-insert of a tombstoned doc is gated until compaction: the
    // tombstone would shadow the new rows while df/nn re-enter
    val ex = intercept[IllegalArgumentException] {
      SparseIndex.appendSparseIndex(all.filter(col("doc_id") === 1L), idx)
    }
    assert(ex.getMessage.contains("compactSparseIndex"))
    // compact: serving unchanged, tombstones cleared, segments fold to
    // at most one file per bucket (write + append left multiple)
    val before = postingFiles(idx)
    SparseIndex.compactSparseIndex(spark, idx)
    assert(!new java.io.File(s"$idx/tombstones").exists(), "tombstones survived compaction")
    val after = postingFiles(idx)
    assert(after <= 8 && after < before, s"compaction files: $before -> $after")
    assert(serve(idx) == served, "compaction changed serving")
    // post-compact, the gated re-insert proceeds and equals a rebuild
    // of (survivors + doc 1)
    SparseIndex.appendSparseIndex(all.filter(col("doc_id") === 1L), idx)
    val target = graft.Scratch.dir("sidx_spec_reins_")
    SparseIndex.writeSparseIndex(
      all.filter(col("doc_id") % 4 =!= 1 || col("doc_id") === 1L), target)
    assert(dfstats(idx) == dfstats(target), "post-compact re-insert diverges from rebuild")
    assert(serve(idx) == serve(target), "post-compact re-insert serves differently")
  }

  test("lifecycle through a file:-prefixed URI: tombstones still apply (Hadoop-FS sidecar ops, verdict r9 #1)") {
    // `new java.io.File("file:/x").exists()` is ALWAYS false, so the old
    // local-FS checks would silently skip the tombstone anti-join here
    // and resurrect the deleted docs — exactly the HDFS/S3 failure mode.
    // Every sidecar op must resolve the filesystem from the path scheme.
    val all = mkDocs(0L until 60L)
    val doomed = all.filter(col("doc_id") % 4 === 1)
    val survivors = all.filter(col("doc_id") % 4 =!= 1)
    val local = graft.Scratch.dir("sidx_spec_uri_")
    val idx = s"file:$local"
    SparseIndex.writeSparseIndex(all, idx)
    SparseIndex.deleteFromSparseIndex(doomed, idx)
    val surv = graft.Scratch.dir("sidx_spec_uris_")
    SparseIndex.writeSparseIndex(survivors, surv)
    assert(dfstats(local) == dfstats(surv),
      "df downdate diverged through the file: URI")
    val served = serve(idx)
    assert(served.nonEmpty && served == serve(surv),
      "tombstones did not apply through the file: URI — deleted docs resurfaced")
    // the re-insert guard must also see the tombstones through the URI
    val ex = intercept[IllegalArgumentException] {
      SparseIndex.appendSparseIndex(all.filter(col("doc_id") === 1L), idx)
    }
    assert(ex.getMessage.contains("compactSparseIndex"))
    // compaction clears the sidecar through the URI too
    SparseIndex.compactSparseIndex(spark, idx)
    assert(!new java.io.File(s"$local/tombstones").exists(),
      "compaction failed to clear tombstones through the file: URI")
    assert(serve(idx) == served, "compaction changed serving through the file: URI")
  }

  test("foreign delete (doc_id never indexed) fails loud instead of corrupting the sidecars") {
    val all = mkDocs(0L until 30L)
    val idx = graft.Scratch.dir("sidx_spec_foreign_")
    SparseIndex.writeSparseIndex(all, idx)
    val before = dfstats(idx)
    val ex = intercept[IllegalArgumentException] {
      SparseIndex.deleteFromSparseIndex(mkDocs(Seq(999L)), idx)
    }
    assert(ex.getMessage.contains("never indexed"))
    assert(dfstats(idx) == before, "failed foreign delete still mutated df moments")
    // a mixed feed fails whole (no partial subtract), sidecars untouched
    intercept[IllegalArgumentException] {
      SparseIndex.deleteFromSparseIndex(mkDocs(Seq(3L, 999L)), idx)
    }
    assert(dfstats(idx) == before, "mixed foreign delete partially applied")
  }

  test("non-default bucket count: verbs read the build's count from the catalog; serving equals rebuild") {
    val all = mkDocs(0L until 60L)
    val idx = graft.Scratch.dir("sidx_spec_b4_")
    SparseIndex.writeSparseIndex(all.filter(col("doc_id") < 40), idx, nBuckets = 4)
    SparseIndex.appendSparseIndex(all.filter(col("doc_id") >= 40), idx)
    SparseIndex.deleteFromSparseIndex(all.filter(col("doc_id") % 4 === 1), idx)
    SparseIndex.compactSparseIndex(spark, idx)
    assert(postingFiles(idx) <= 4,
      "compaction must fold to at most one file per bucket at the BUILD's count")
    val surv = graft.Scratch.dir("sidx_spec_b4s_")
    SparseIndex.writeSparseIndex(all.filter(col("doc_id") % 4 =!= 1), surv)
    assert(serve(idx) == serve(surv),
      "4-bucket lifecycle serves differently from the 8-bucket rebuild")
  }

  test("cross-session serve: writes from ANOTHER session are visible — the r11 stream_sparse_crud regression shape") {
    // Round 11's wrong answer: the outer session seeded an EMPTY index
    // (priming its table-relation cache with an empty file listing),
    // streaming foreachBatch appended from a CLONED session (which
    // refreshes only its own cache), and the outer session's serve
    // answered 0 rows from the stale listing. This spec is that exact
    // experiment: seed empty HERE, mutate from spark.newSession(),
    // serve HERE — correct serving must equal the survivors rebuild.
    val all = mkDocs(0L until 60L)
    val idx = graft.Scratch.dir("sidx_spec_xsess_")
    SparseIndex.writeSparseIndex(all.limit(0), idx)
    // prime the outer session's relation cache with the empty seed the
    // way the r11 bug did (a serve plans against the posting relation)
    assert(SparseIndex.sparseRetrievalStored(spark, idx, queryEvery = 7)
      .collect().isEmpty)
    val other = spark.newSession()
    val allOther = other.createDataFrame(
      spark.sparkContext.parallelize(all.collect().toIndexedSeq), all.schema)
    SparseIndex.appendSparseIndex(
      allOther.filter(col("doc_id") % 3 =!= 0), idx)
    SparseIndex.appendSparseIndex(
      allOther.filter(col("doc_id") % 3 === 0), idx)
    SparseIndex.deleteFromSparseIndex(
      allOther.filter(col("doc_id") % 4 === 1), idx)
    // the OUTER session serves — with the stale cache this returns the
    // empty seed; correct serving refreshes and sees the other
    // session's segments
    val surv = graft.Scratch.dir("sidx_spec_xsess_surv_")
    SparseIndex.writeSparseIndex(all.filter(col("doc_id") % 4 =!= 1), surv)
    val served = serve(idx)
    assert(served.nonEmpty, "outer session served the stale empty seed")
    assert(served == serve(surv),
      "cross-session serve diverges from the survivors rebuild")
    // and the BM25 serve reads through the same refresh discipline
    def bm25(d: String) = SparseIndex.bm25RetrievalStored(spark, d, queryEvery = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(bm25(idx).nonEmpty && bm25(idx) == bm25(surv),
      "cross-session BM25 serve diverges from the survivors rebuild")
  }

  test("meta tot algebra: append/delete-merged (nn, tot) equal the rebuild's exactly (BM25's avglen inputs)") {
    val all = mkDocs(0L until 60L)
    val idx = graft.Scratch.dir("sidx_spec_tot_")
    SparseIndex.writeSparseIndex(all.filter(col("doc_id") < 40), idx)
    SparseIndex.appendSparseIndex(all.filter(col("doc_id") >= 40), idx)
    SparseIndex.deleteFromSparseIndex(all.filter(col("doc_id") % 4 === 1), idx)
    val surv = graft.Scratch.dir("sidx_spec_tot_surv_")
    SparseIndex.writeSparseIndex(all.filter(col("doc_id") % 4 =!= 1), surv)
    def meta(d: String) = spark.read.parquet(s"$d/meta").collect().head
    val (mi, ms) = (meta(idx), meta(surv))
    assert(mi.getLong(mi.fieldIndex("nn")) == ms.getLong(ms.fieldIndex("nn")),
      "merged nn diverges from rebuild")
    assert(mi.getLong(mi.fieldIndex("tot")) == ms.getLong(ms.fieldIndex("tot")),
      "merged tot diverges from rebuild — BM25 avglen would drift")
  }

  test("pre-r11 meta (nn only, no tot): verbs backfill instead of failing; serving equals rebuild") {
    // An index written before the meta sidecar carried `tot` must not
    // fail its first append/serve with an unresolved column (advice
    // r11) — readMeta backfills tot from the LIVE postings, exactly
    // what the rebuild algebra would have carried.
    val all = mkDocs(0L until 60L)
    val idx = graft.Scratch.dir("sidx_spec_oldmeta_")
    SparseIndex.writeSparseIndex(all.filter(col("doc_id") < 40), idx)
    // rewrite meta the pre-r11 way: nn only
    val nnOnly = spark.read.parquet(s"$idx/meta").select("nn").collect().head.getLong(0)
    import spark.implicits._
    Seq(nnOnly).toDF("nn").write.mode("overwrite").parquet(s"$idx/meta")
    // serve from the legacy meta (BM25 needs tot — must backfill)
    val legacyServe = SparseIndex.bm25RetrievalStored(spark, idx, queryEvery = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val base = graft.Scratch.dir("sidx_spec_oldmeta_base_")
    SparseIndex.writeSparseIndex(all.filter(col("doc_id") < 40), base)
    def bm25(d: String) = SparseIndex.bm25RetrievalStored(spark, d, queryEvery = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(legacyServe.nonEmpty && legacyServe == bm25(base),
      "legacy-meta serve diverges from a fresh build")
    // an append on the legacy meta upgrades it (backfill + merge)
    SparseIndex.appendSparseIndex(all.filter(col("doc_id") >= 40), idx)
    val full = graft.Scratch.dir("sidx_spec_oldmeta_full_")
    SparseIndex.writeSparseIndex(all, full)
    def meta(d: String) = {
      val r = spark.read.parquet(s"$d/meta").collect().head
      (r.getLong(r.fieldIndex("nn")), r.getLong(r.fieldIndex("tot")))
    }
    assert(meta(idx) == meta(full),
      "append over legacy meta diverges from the rebuild's (nn, tot)")
    assert(bm25(idx) == bm25(full),
      "post-upgrade BM25 serve diverges from the full rebuild")
  }
}
