package graft

import graft.operators.NearDupIndex
import org.apache.spark.sql.DataFrame

/** Standing near-dup index lifecycle specs. The cross-engine
  * build+append+delete+compact algebra is proven declaratively by the
  * `neardup_index_stored` / `neardup_lifecycle_serve` DuckDB oracles
  * (one SQL relation describes the mutated history, including the
  * frozen build-time stop cut); what the unit suite pins is the
  * behavioral contract — verdict flips under each verb, compaction
  * invisibility, the frozen stop artifact, and serving correctness
  * from a session that did NOT write (the r11 `stream_sparse_crud`
  * regression class). */
class NearDupIndexSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private val base = "abcdefghijklmnopqrstuvwxyz0123456789" * 6
  private val base2 = "zyxwvutsrqponmlkjihgfedcba9876543210" * 6
  private def shifted(s: String, at: Int, c: String) =
    s.substring(0, at) + c + s.substring(at)

  /** Unique-text history docs (template grams are boilerplate in EVERY
    * slice, tail grams unique) + the planted originals. */
  private def histDocs: DataFrame = {
    import spark.implicits._
    val filler = (0 until 30).map(i =>
      (100L + i, s"unrelated filler number $i carrying tokens ${i * 7} and ${i * 31}"))
    (Seq((1L, base)) ++ filler).toDF("doc_id", "text")
  }

  /** Shard: a near-copy of history doc 1, a fresh original + its
    * within-shard near-copy, and a unique doc. */
  private def shardDocs: DataFrame = {
    import spark.implicits._
    Seq(
      (201L, shifted(base, 50, "X")),  // near-copy of history 1
      (202L, base2),                   // shard original
      (203L, shifted(base2, 70, "Q")), // near-copy of 202 -> dup_batch
      (204L, "a genuinely unique incoming document with its own words entirely")
    ).toDF("doc_id", "text")
  }

  private def statuses(dir: String, shard: DataFrame): Map[Long, String] =
    NearDupIndex.serveNearDup(spark, dir, shard).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap

  test("serve verdicts: planted history dup, batch dup, unique kept") {
    val idx = graft.Scratch.dir("ndidx_spec_base_")
    NearDupIndex.writeNearDupIndex(histDocs, idx)
    val got = statuses(idx, shardDocs)
    assert(got.get(201L).contains("dup_history"), s"shifted copy of indexed doc: $got")
    assert(got.get(202L).contains("kept"), s"shard original must survive: $got")
    assert(got.get(203L).contains("dup_batch"), s"within-shard near-copy: $got")
    got.get(204L).foreach(s => assert(s == "kept", s"unique doc flagged: $got"))
  }

  test("append flips a verdict; the stop artifact is FROZEN across append and compact") {
    import spark.implicits._
    val idx = graft.Scratch.dir("ndidx_spec_app_")
    NearDupIndex.writeNearDupIndex(histDocs, idx)
    def stop = spark.read.parquet(s"$idx/stopfps").collect()
      .map(_.getLong(0)).toSet
    val stop0 = stop
    // before: 202 has no indexed match
    assert(statuses(idx, shardDocs).get(202L).contains("kept"))
    // append a near-copy of 202's text into HISTORY -> dup_history
    NearDupIndex.appendNearDupIndex(
      Seq((150L, shifted(base2, 30, "Z"))).toDF("doc_id", "text"), idx)
    val got = statuses(idx, shardDocs)
    assert(got.get(202L).contains("dup_history"),
      s"appended history copy not visible: $got")
    // 203 now ALSO matches history (the appended doc) — history outranks
    // batch in the verdict case
    assert(got.get(203L).contains("dup_history"), s"verdict precedence: $got")
    assert(stop == stop0, "append moved the frozen stop set")
    NearDupIndex.compactNearDupIndex(spark, idx)
    assert(stop == stop0, "compaction moved the frozen stop set")
    assert(statuses(idx, shardDocs) == got, "compaction changed serving")
  }

  test("delete flips dup_history back to kept; re-insert gated until compact; compaction invisible") {
    import spark.implicits._
    val idx = graft.Scratch.dir("ndidx_spec_del_")
    NearDupIndex.writeNearDupIndex(histDocs, idx)
    assert(statuses(idx, shardDocs).get(201L).contains("dup_history"))
    NearDupIndex.deleteFromNearDupIndex(Seq(1L).toDF("doc_id"), idx)
    val afterDel = statuses(idx, shardDocs)
    assert(afterDel.get(201L).contains("kept"),
      s"tombstoned doc still answers: $afterDel")
    // double-delete is a no-op; deleting a never-indexed id is loud
    NearDupIndex.deleteFromNearDupIndex(Seq(1L).toDF("doc_id"), idx)
    assert(statuses(idx, shardDocs) == afterDel)
    val ex = intercept[IllegalArgumentException] {
      NearDupIndex.deleteFromNearDupIndex(Seq(999L).toDF("doc_id"), idx)
    }
    assert(ex.getMessage.contains("never indexed"))
    // re-insert of a tombstoned id is gated until compaction
    val ex2 = intercept[IllegalArgumentException] {
      NearDupIndex.appendNearDupIndex(Seq((1L, base)).toDF("doc_id", "text"), idx)
    }
    assert(ex2.getMessage.contains("compactNearDupIndex"))
    NearDupIndex.compactNearDupIndex(spark, idx)
    assert(statuses(idx, shardDocs) == afterDel, "compaction changed serving")
    assert(!new java.io.File(s"$idx/tombstones").exists(),
      "tombstones survived compaction")
    // after compacting, the id may re-enter
    NearDupIndex.appendNearDupIndex(Seq((1L, base)).toDF("doc_id", "text"), idx)
    assert(statuses(idx, shardDocs).get(201L).contains("dup_history"))
  }

  test("append of a LIVE id is loud (update-shaped re-append would answer from both versions)") {
    import spark.implicits._
    val idx = graft.Scratch.dir("ndidx_spec_liveapp_")
    NearDupIndex.writeNearDupIndex(histDocs, idx)
    val ex = intercept[IllegalArgumentException] {
      NearDupIndex.appendNearDupIndex(
        Seq((1L, "replacement text for an already indexed id"))
          .toDF("doc_id", "text"), idx)
    }
    assert(ex.getMessage.contains("already live"))
    // the guarded append must not have half-written either segment
    assert(statuses(idx, shardDocs).get(201L).contains("dup_history"))
  }

  test("isIndexed requires EVERY data path: a reaped bands dir reads as absent") {
    val idx = graft.Scratch.dir("ndidx_spec_reap_")
    NearDupIndex.writeNearDupIndex(histDocs, idx)
    assert(NearDupIndex.isIndexed(spark, idx))
    graft.operators.IndexFs.deleteRecursive(spark, s"$idx/bands")
    assert(!NearDupIndex.isIndexed(spark, idx),
      "a reaped bands dir under a live catalog entry must read as absent " +
        "(it would silently serve every shard doc as kept)")
  }

  test("stop-cut drift: a composition-shifted append raises newBoilerplateFrac; a natural one does not; serve stays exact") {
    import spark.implicits._
    val idx = graft.Scratch.dir("ndidx_spec_drift_")
    NearDupIndex.writeNearDupIndex(histDocs, idx)
    // natural shard: per-doc seeded-random letter streams — winnow
    // fingerprints CHARACTER k-grams, so even templated words share
    // grams; truly disjoint docs need disjoint character streams (the
    // first fixture attempts used English templates and the metric
    // CORRECTLY measured their shared grams as boilerplate)
    val natural = (0 until 20).map { i =>
      val rnd = new scala.util.Random(7919L * (i + 1))
      (300L + i, (0 until 90).map(_ => ('a' + rnd.nextInt(26)).toChar)
        .mkString.grouped(9).mkString(" "))
    }.toDF("doc_id", "text")
    val d1 = NearDupIndex.appendNearDupIndex(natural, idx)
    assert(d1.newBoilerplateFrac < 0.05,
      s"natural shard flagged as drifted: $d1")
    // composition-shifted shard: every doc carries the SAME long
    // boilerplate block the build corpus never saw — its fps are hot in
    // the shard (df > 10%) but absent from the frozen cut
    val boiler = "subscribe to our newsletter terms conditions apply " * 8
    val shifted = (0 until 20).map(i =>
      (400L + i, boiler + s" unique tail $i with words ${i * 7} ${i * 11}"))
      .toDF("doc_id", "text")
    val d2 = NearDupIndex.appendNearDupIndex(shifted, idx)
    assert(d2.newBoilerplateFrac > 0.2,
      s"shared-boilerplate shard must raise the drift metric: $d2")
    assert(d2.newBoilerplateFrac > d1.newBoilerplateFrac * 2)
    // both observations landed in the driftlog sidecar
    val log = spark.read.parquet(s"$idx/driftlog")
    assert(log.count() == 2)
    // ... and the metric is OBSERVABILITY only: serving stays exact
    // (signatures froze at append; verdicts unchanged for the base shard)
    val got = statuses(idx, shardDocs)
    assert(got.get(201L).contains("dup_history") &&
      got.get(203L).contains("dup_batch"), s"drifted appends broke serving: $got")
  }

  test("serve size gate: a fallback (no-shard-broadcast) serve answers identically to the broadcast serve") {
    val idx = graft.Scratch.dir("ndidx_spec_szgate_")
    NearDupIndex.writeNearDupIndex(histDocs, idx)
    val bc = NearDupIndex.serveNearDup(spark, idx, shardDocs,
      broadcastShard = Some(true)).collect().map(r => (r.getLong(0), r.getString(2))).toSet
    val sm = NearDupIndex.serveNearDup(spark, idx, shardDocs,
      broadcastShard = Some(false)).collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(bc == sm, s"fallback serve diverged: broadcast=$bc fallback=$sm")
  }

  test("hot-bucket cap: a >BvCutAbs band bucket is frozen out; genuine near-copies of ordinary docs still match") {
    import spark.implicits._
    val idx = graft.Scratch.dir("ndidx_spec_cap_")
    // 600 docs dominated by ONE shared block (their band argmins all
    // land in the block's fps -> buckets of ~600 > BvCutAbs) + 5900
    // unique-random docs keeping the block's df under the 10% fp cut
    val block = "sharedboilerplateblock" * 10
    val hot = (0 until 600).map(i => (10000L + i, block + s" t$i"))
    val filler = (0 until 5900).map { i =>
      val rnd = new scala.util.Random(104729L * (i + 1))
      (20000L + i, (0 until 80).map(_ => ('a' + rnd.nextInt(26)).toChar)
        .mkString.grouped(8).mkString(" "))
    }
    NearDupIndex.writeNearDupIndex((hot ++ filler).toDF("doc_id", "text"), idx)
    val stopBv = spark.read.parquet(s"$idx/stopbvs").count()
    assert(stopBv > 0, "the 600-doc buckets must be frozen out at build")
    // a shifted copy of an ORDINARY doc still answers dup_history: its
    // candidate buckets are its own unique argmins, untouched by the cap
    val fillerText = filler(7)._2
    val got = NearDupIndex.serveNearDup(spark, idx, Seq(
        (90001L, shifted(fillerText, 20, "X")),
        (90002L, "a wholly unrelated probe document with its own words"))
      .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got.get(90001L).contains("dup_history"),
      s"cap must not affect ordinary-doc matches: $got")
    got.get(90002L).foreach(s => assert(s == "kept", s"$got"))
  }

  test("cap-growth drift: a growth-heavy append raises capGrownBuckets; a rebuild resets it") {
    import spark.implicits._
    val idx = graft.Scratch.dir("ndidx_spec_capgrow_")
    // small build: no bucket near the cap, frozen stopbvs empty-ish
    val seed = (0 until 50).map { i =>
      val rnd = new scala.util.Random(15485863L * (i + 1))
      (500L + i, (0 until 80).map(_ => ('a' + rnd.nextInt(26)).toChar)
        .mkString.grouped(8).mkString(" "))
    }
    NearDupIndex.writeNearDupIndex(seed.toDF("doc_id", "text"), idx)
    // growth-heavy append: 600 docs dominated by ONE shared block the
    // 50-doc build never saw — their band argmins crowd buckets to
    // ~600 > BvCutAbs, but the cap froze at build so serve still pays
    // them; the new metric must SEE that
    val block = "sharedgrowthblockcontent" * 10
    val grown = (0 until 600).map(i => (1000L + i, block + s" tail$i"))
    val d = NearDupIndex.appendNearDupIndex(grown.toDF("doc_id", "text"), idx)
    assert(d.capGrownBuckets > 0,
      s"post-build crowded buckets invisible to the growth metric: $d")
    // the observation landed in the driftlog with the new column
    val logged = spark.read.parquet(s"$idx/driftlog")
      .select("cap_grown_buckets").collect().map(_.getLong(0)).max
    assert(logged == d.capGrownBuckets)
    // rebuild over the LIVE corpus refreshes both frozen cuts (here the
    // block's fps cross the 10% df cut — 600/650 docs — so the crowded
    // buckets leave the kept universe entirely; in either regime the
    // growth count must read ~0 after rebuild)
    NearDupIndex.writeNearDupIndex(
      (seed ++ grown).toDF("doc_id", "text"), idx)
    val fresh = (0 until 10).map { i =>
      val rnd = new scala.util.Random(32452843L * (i + 1))
      (5000L + i, (0 until 80).map(_ => ('a' + rnd.nextInt(26)).toChar)
        .mkString.grouped(8).mkString(" "))
    }
    val d2 = NearDupIndex.appendNearDupIndex(fresh.toDF("doc_id", "text"), idx)
    assert(d2.capGrownBuckets == 0L,
      s"rebuild must reset the growth metric: $d2")
  }

  test("an interrupted (empty) geometry stamp reads as absent, not a crash") {
    val idx = graft.Scratch.dir("ndidx_spec_emptystamp_")
    NearDupIndex.writeNearDupIndex(histDocs, idx)
    assert(NearDupIndex.isIndexed(spark, idx))
    // simulate a crash mid stamp-write: ndconf dir exists, no rows
    graft.operators.IndexFs.deleteRecursive(spark, s"$idx/ndconf")
    new java.io.File(s"$idx/ndconf").mkdirs()
    assert(!NearDupIndex.isIndexed(spark, idx),
      "an empty stamp must read as ABSENT so cache-or-compute rebuilds")
    val ex = intercept[RuntimeException] {
      NearDupIndex.serveNearDup(spark, idx, shardDocs)
    }
    assert(ex.getMessage.contains("rebuild"))
  }

  test("rebuildIfDrifted: the growth sequence trips the default trigger; a healthy log holds; post-rebuild the card and growth metric reset") {
    import spark.implicits._
    val idx = graft.Scratch.dir("ndidx_spec_rebuild_")
    val seed = (0 until 50).map { i =>
      val rnd = new scala.util.Random(15485863L * (i + 1))
      (500L + i, (0 until 80).map(_ => ('a' + rnd.nextInt(26)).toChar)
        .mkString.grouped(8).mkString(" "))
    }
    NearDupIndex.writeNearDupIndex(seed.toDF("doc_id", "text"), idx)
    // the seed-grown regime in miniature: a growth-heavy append crowds
    // buckets past BvCutAbs that the build-frozen cut cannot see
    val block = "sharedgrowthblockcontent" * 10
    val grown = (0 until 600).map(i => (1000L + i, block + s" tail$i"))
    NearDupIndex.appendNearDupIndex(grown.toDF("doc_id", "text"), idx)
    val live = (seed ++ grown).toDF("doc_id", "text")
    // hold: thresholds above every observation -> no-op, driftlog intact
    val hold = NearDupIndex.rebuildNearDupIndexIfDrifted(live, idx,
      maxNewBoilerplate = 1.0, maxStaleStop = 1.0, maxCapGrown = Long.MaxValue)
    assert(!hold.rebuilt, s"healthy thresholds must not rebuild: $hold")
    assert(hold.nAppends == 1L && hold.capGrownBucketsMax > 0L, s"$hold")
    assert(graft.operators.Curation.indexHealthCard(spark, idx)
      .head.getLong(0) == 1L, "hold arm must leave the driftlog")
    // trip: the DEFAULT trigger (any cap-grown bucket) fires on the
    // growth observation -> rebuild re-freezes both cuts at today's
    // corpus and resets the driftlog
    val trip = NearDupIndex.rebuildNearDupIndexIfDrifted(live, idx)
    assert(trip.rebuilt, s"default trigger must trip on growth: $trip")
    assert(trip.capGrownBucketsMax == hold.capGrownBucketsMax, s"$trip")
    val post = graft.operators.Curation.indexHealthCard(spark, idx).head
    assert(post.getLong(0) == 0L && post.getLong(5) == 0L,
      s"post-rebuild card must read all-zeros (fresh driftlog): $post")
    // the growth signal itself is reset: a fresh append observes 0
    // cap-grown buckets (the crowded buckets are in the NEW frozen cut
    // or out of the kept universe entirely)
    val probe = (0 until 5).map { i =>
      val rnd = new scala.util.Random(86028121L * (i + 1))
      (9000L + i, (0 until 80).map(_ => ('a' + rnd.nextInt(26)).toChar)
        .mkString.grouped(8).mkString(" "))
    }
    val d2 = NearDupIndex.appendNearDupIndex(probe.toDF("doc_id", "text"), idx)
    assert(d2.capGrownBuckets == 0L,
      s"rebuild must fold grown buckets into the frozen cut: $d2")
  }

  test("health card on a never-appended index reads all-zeros, not PATH_NOT_FOUND") {
    val idx = graft.Scratch.dir("ndidx_spec_noappend_")
    NearDupIndex.writeNearDupIndex(histDocs, idx)
    val card = graft.operators.Curation.indexHealthCard(spark, idx).head
    assert(card.getLong(0) == 0L && card.getLong(1) == 0L &&
      card.getDouble(3) == 0.0 && card.getLong(5) == 0L,
      s"absent driftlog must be the healthy all-zeros card: $card")
  }

  test("capGrownMetric=false logs the -1 sentinel; the card max ignores it next to a computed observation") {
    import spark.implicits._
    val idx = graft.Scratch.dir("ndidx_spec_capskip_")
    NearDupIndex.writeNearDupIndex(histDocs, idx)
    val dSkip = NearDupIndex.appendNearDupIndex(
      Seq((300L, shifted(base2, 10, "K"))).toDF("doc_id", "text"), idx,
      capGrownMetric = false)
    assert(dSkip.capGrownBuckets == -1L, s"skip sentinel: $dSkip")
    NearDupIndex.appendNearDupIndex(
      Seq((301L, "another small probe shard with fresh words only here"))
        .toDF("doc_id", "text"), idx)
    val card = graft.operators.Curation.indexHealthCard(spark, idx).head
    assert(card.getLong(0) == 2L && card.getLong(5) >= 0L,
      s"a computed observation must dominate the -1 sentinel: $card")
  }

  test("an uncommitted geometry stamp (_SUCCESS missing) reads as absent; transient read errors are NOT swallowed") {
    val idx = graft.Scratch.dir("ndidx_spec_nosuccess_")
    NearDupIndex.writeNearDupIndex(histDocs, idx)
    assert(NearDupIndex.isIndexed(spark, idx))
    // simulate a crash mid stamp-write: files present, commit marker not
    assert(new java.io.File(s"$idx/ndconf/_SUCCESS").delete())
    assert(!NearDupIndex.isIndexed(spark, idx),
      "an uncommitted stamp must read as ABSENT so cache-or-compute rebuilds")
  }

  test("banded escape hatch: bvCutAbs=Int.MaxValue recovers the uncapped mega-bucket pairs") {
    import spark.implicits._
    import graft.operators.Dedup
    // a 6-doc near-identical cluster inside a 90-doc unique corpus
    // (<10% so the df cut keeps the cluster's fps): one history member
    // (id%5<4), five incoming (%5==4). The cluster crowds its band
    // buckets to occupancy 6.
    val filler = (0 until 90).map { i =>
      val rnd = new scala.util.Random(479001599L * (i + 1))
      val id = 10L + i * 5 // ids = 10,15,20,... -> all %5==0 history
      (id, (0 until 80).map(_ => ('a' + rnd.nextInt(26)).toChar)
        .mkString.grouped(8).mkString(" "))
    }
    // identical texts -> identical fp sets -> all 16 band buckets hold
    // exactly the 6 cluster docs, so the cap verdict is deterministic
    val cluster = Seq(1L, 4L, 9L, 14L, 19L, 24L).map(id =>
      (id, shifted(base, 30, "Q")))
    val docs = (filler ++ cluster).toDF("doc_id", "text")
    def statusOf(bvCut: Int): Map[Long, String] =
      Dedup.incrementalWinnowBanded(docs, bvCutAbs = bvCut).collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
    // tiny cap: every cluster bucket (occupancy 6 > 3) is cut, the
    // cluster's pairs agree ONLY there -> incoming members missed
    val capped = statusOf(3)
    assert(Seq(4L, 9L, 14L, 19L, 24L).forall(capped(_) == "kept"),
      s"cap must eat the mega-bucket-only pairs (the documented price): $capped")
    // escape hatch: no bucket capped -> the uncapped verdicts return
    val uncapped = statusOf(Int.MaxValue)
    assert(Seq(4L, 9L, 14L, 19L, 24L).forall(uncapped(_) != "kept"),
      s"bvCutAbs=Int.MaxValue must recover 1.0 recall here: $uncapped")
  }

  test("cross-session serve: segments appended by ANOTHER session are visible — the r11 regression shape") {
    import spark.implicits._
    val idx = graft.Scratch.dir("ndidx_spec_xsess_")
    // seed EMPTY here, priming this session's relation caches
    NearDupIndex.writeNearDupIndex(histDocs.limit(0), idx)
    assert(statuses(idx, shardDocs).get(201L).contains("kept"))
    // another session appends the real history
    val other = spark.newSession()
    val histOther = other.createDataFrame(
      spark.sparkContext.parallelize(histDocs.collect().toIndexedSeq),
      histDocs.schema)
    NearDupIndex.appendNearDupIndex(histOther, idx)
    // the OUTER session serves — a stale relation cache would answer
    // kept from the empty seed
    val got = statuses(idx, shardDocs)
    assert(got.get(201L).contains("dup_history"),
      s"outer session served the stale empty seed: $got")
  }
}
