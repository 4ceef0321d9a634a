package graft

import graft.operators.Pq

/** Product-quantization specs: code mechanics, ADC quality lift over
  * chance, and partition invariance. (Exactness vs DuckDB is the oracle
  * gate's job — emb_pq_codes / ann_pq hash-match.) */
class PqSpec extends SparkSpec {

  private def emb = graft.sources.Tables.read(spark, sf("sf0.001"), "embeddings")

  test("pq codes: every assignment lands in [0, ksub)") {
    val rows = Pq.codes(emb).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      (1 to 8).foreach { i =>
        val c = r.getLong(i)
        assert(c >= 0 && c < Pq.ksub, s"code $c out of range")
      }
    }
  }

  test("pq adc: top-10 recall vs exact L2 beats chance by >= 5x") {
    import spark.implicits._
    val vecs = emb.select($"vec_id".cast("long"), $"embedding".cast("array<float>"))
      .as[(Long, Array[Float])].collect()
    val queries = vecs.filter(_._1 % 50 == 0)
    val exact = queries.flatMap { case (qid, qv) =>
      vecs.filter(_._1 != qid)
        .map { case (nid, nv) =>
          var s = 0.0
          var i = 0
          while (i < qv.length) { val t = qv(i) - nv(i); s += t * t; i += 1 }
          (qid, nid, s)
        }
        .sortBy { case (_, nid, d) => (d, nid) }
        .take(10)
        .map { case (q, n, _) => (q, n) }
    }.toSet
    val got = Pq.adcTopK(emb).select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    // chance = 10/499 ≈ 0.02; the fixed ±2σ grid achieves ~0.2. A trained
    // codebook (library-internal, the ann_ivf pattern) would do better —
    // this pins that the ADC ordering genuinely tracks geometry.
    assert(recall >= 0.10, s"recall $recall")
  }

  test("trained codebook: recall vs exact L2 at least matches the fixed grid") {
    def recallOf(cb: Pq.Codebook): Double = {
      val exact = Pq.exactL2TopK(emb).select("q_id", "n_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = Pq.adcTopK(emb, cb = cb).select("q_id", "n_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val fixed = recallOf(Pq.codebook)
    val trained = recallOf(Pq.trainCodebook(emb))
    info(s"recall@10 fixed=$fixed trained=$trained")
    assert(trained >= fixed, s"trained $trained < fixed $fixed")
    assert(trained >= 0.3, s"trained codebook recall $trained implausibly low")
    // and the gate query passes everywhere
    val gate = Pq.trainedRecall(emb).collect()
    assert(gate.nonEmpty && gate.forall(_.getBoolean(1)))
  }

  test("trained codebook sidecar: round-trips bit-exactly; append encodes through the read-back; appended serve == whole trained build") {
    // the production shape (verdict r11 #5): train once, store the
    // model WITH the index, every later verb derives from the artifact.
    val cb = Pq.trainCodebook(emb)
    assert(cb ne Pq.codebook, "sf0.001 corpus should be trainable (not the grid fallback)")
    val whole = graft.Scratch.dir("pq_spec_trw_")
    Pq.writeIvfPqIndex(emb, whole, cb)
    // (a) the sidecar round-trips the trained doubles bit-exactly
    val back = Pq.readCodebook(spark, whole)
    for (j <- 0 until Pq.m; c <- 0 until Pq.ksub)
      assert(java.util.Arrays.equals(back(j)(c), cb(j)(c)),
        s"stored codebook differs at ($j, $c)")
    // (b) an append (which must encode through the READ-BACK codebook,
    // not the default grid) serves bit-identically to the whole build
    import org.apache.spark.sql.functions.col
    val inc = graft.Scratch.dir("pq_spec_tri_")
    Pq.writeIvfPqIndex(emb.filter(col("vec_id") % 3 =!= 0), inc, cb)
    Pq.appendIvfPqIndex(emb.filter(col("vec_id") % 3 === 0), inc)
    def serve(d: String) = Pq.ivfAdcTopKStored(emb, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val w = serve(whole)
    assert(w.nonEmpty && w == serve(inc),
      "trained-codebook append diverges from the whole trained build")
    // (c) and the trained serve is NOT the grid serve (the codebook
    // actually flowed — a silent grid fallback would pass (b) trivially)
    val grid = graft.Scratch.dir("pq_spec_trg_")
    Pq.writeIvfPqIndex(emb, grid)
    assert(w != serve(grid), "trained serve should differ from the grid serve")
  }

  test("two-stage rerank: exact re-rank of the ADC shortlist beats flat ADC recall") {
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = asSet(Pq.exactL2TopK(emb))
    val flat = asSet(Pq.adcTopK(emb))
    val rr = asSet(Pq.adcRerank(emb))
    val flatR = (exact & flat).size.toDouble / exact.size
    val rrR = (exact & rr).size.toDouble / exact.size
    info(s"recall@10 flat=$flatR rerank=$rrR")
    assert(rrR >= flatR, s"rerank $rrR < flat $flatR")
    assert(rrR >= 2 * flatR, s"shortlist-50 re-rank should at least double flat ADC recall")
  }

  test("ivf-routed rerank: recall vs exact L2 within the IVF contract, shortlist ⊆ probed cells") {
    import org.apache.spark.sql.functions._
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = graft.Scratch.dir("graft_pqspec_rr_")
    Pq.writeIvfPqIndex(emb, idx)
    val exact = asSet(Pq.exactL2TopK(emb))
    val ivfFlat = asSet(Pq.ivfAdcTopK(emb))
    val rr = asSet(Pq.ivfAdcRerankStored(emb, idx))
    val probed = graft.operators.Similarity.labelProbes(
        emb.filter(size(col("embedding")) === Pq.dim), 50, 3)
      .select("q_id", "cl").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cells = emb.select(col("vec_id").cast("long"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the recall CEILING of any probed-cell method: the fraction of
    // exact neighbors that live inside their query's probed cells —
    // exact re-rank fixes ADC quantization misses, never probe misses
    val ceiling = exact.count { case (q, n) => probed((q, cells(n))) }
      .toDouble / exact.size
    val ivfR = (exact & ivfFlat).size.toDouble / exact.size
    val rrR = (exact & rr).size.toDouble / exact.size
    info(s"recall@10 ivf-flat=$ivfR ivf-rerank=$rrR probe-ceiling=$ceiling")
    assert(rrR >= ivfR, s"ivf rerank $rrR < ivf flat $ivfR")
    // shortlist truncation is the only slack below the ceiling: with a
    // shortlist as large as any probed-cell population, the re-rank IS
    // exact L2 over the probed cells, so recall must EQUAL the ceiling
    val rrWide = asSet(Pq.ivfAdcRerankStored(emb, idx, shortlist = 500))
    val wideR = (exact & rrWide).size.toDouble / exact.size
    info(s"recall@10 ivf-rerank-wide=$wideR (must equal ceiling)")
    assert(math.abs(wideR - ceiling) < 1e-12,
      s"untruncated ivf rerank recall $wideR != probe ceiling $ceiling")
    // every served neighbor must come from the query's probed cells
    // (the shortlist is index-bounded, never a full-code scan)
    val escapees = rr.filterNot { case (q, n) => probed((q, cells(n))) }
    assert(escapees.isEmpty, s"neighbors outside probed cells: $escapees")
  }

  test("trained codebook: degenerate corpus falls back to the fixed grid") {
    val tiny = emb.limit(10)
    assert(Pq.trainCodebook(tiny) eq Pq.codebook)
  }

  test("ivf-pq: results stay inside probed cells and agree with flat ADC distances") {
    val probed = graft.operators.Similarity.labelProbes(emb)
      .select("q_id", "cl").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val labels = emb.select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong)).toMap
    val ivfpq = Pq.ivfAdcTopK(emb).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(ivfpq.nonEmpty)
    // every hit comes from a cell its query probed
    ivfpq.foreach { case ((q, n), _) =>
      assert(probed.contains((q, labels(n))), s"($q,$n) outside probed cells") }
    // the ADC distance is the same number flat PQ computes for that pair
    val flat = Pq.adcTopK(emb, k = 500).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    ivfpq.foreach { case (key, d) =>
      flat.get(key).foreach(fd => assert(fd == d, s"$key dist mismatch")) }
  }

  test("ivf-pq append: incremental ingest serves bit-identically to a full rebuild, incl. a brand-new cell") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // base = two existing cells; shard adds rows to one of them AND a
    // cell the stored index has never seen (new hive partition + new
    // centroid row must both materialize through the stats merge)
    def vec(seed: Long) = (1 to Pq.dim).map(i =>
      (((seed * 31 + i * 17) % 19) - 9).toFloat / 4.0f).toArray
    val base = (0 until 40).map(i =>
      (i.toLong, vec(i), (i % 2).toLong)).toDF("vec_id", "embedding", "label")
    val shard = (40 until 60).map(i =>
      (i.toLong, vec(i), if (i % 3 == 0) 7L else (i % 2).toLong))
      .toDF("vec_id", "embedding", "label")
    val all = base.unionByName(shard)
    val incDir = graft.Scratch.dir("pq_append_inc_")
    Pq.writeIvfPqIndex(base, incDir)
    Pq.appendIvfPqIndex(shard, incDir)
    val fullDir = graft.Scratch.dir("pq_append_full_")
    Pq.writeIvfPqIndex(all, fullDir)
    // sidecars identical: centroids (exact doubles) and merged stats
    def cents(d: String) = spark.read.parquet(s"$d/centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toList, r.getDouble(2))).toSet
    assert(cents(incDir) == cents(fullDir), "merged centroids diverge from rebuild")
    assert(cents(incDir).exists(_._1 == 7L), "the shard-only cell never materialized")
    def stats(d: String) = spark.read.parquet(s"$d/cellstats").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(stats(incDir) == stats(fullDir), "merged stats diverge from rebuild")
    // serving identical on every row (queryEvery=7 exercises several queries)
    def serve(d: String) = Pq.ivfAdcTopKStored(all, d, queryEvery = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val inc = serve(incDir)
    assert(inc.nonEmpty && inc == serve(fullDir),
      "appended index serves differently from the full rebuild")
  }

  test("ivf-pq delete + compact: tombstoned serving == survivors rebuild; compaction = 1 file/cell, clears tombstones") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def vec(seed: Long) = (1 to Pq.dim).map(i =>
      (((seed * 31 + i * 17) % 19) - 9).toFloat / 4.0f).toArray
    // three cells; cell 9 exists ONLY in rows that will all be deleted —
    // its centroid must leave the model entirely
    val rows = (0 until 60).map { i =>
      val lbl = if (i >= 54) 9L else (i % 2).toLong
      (i.toLong, vec(i), lbl)
    }
    val all = rows.toDF("vec_id", "embedding", "label")
    val doomed = all.filter(col("vec_id") % 4 === 1 || col("label") === 9L)
    val survivors = all.filter(!(col("vec_id") % 4 === 1 || col("label") === 9L))
    val delDir = graft.Scratch.dir("pq_del_")
    Pq.writeIvfPqIndex(all, delDir)
    Pq.appendIvfPqIndex(all.limit(0), delDir) // no-op append: files accrue
    Pq.deleteFromIvfPqIndex(doomed, delDir)
    val survDir = graft.Scratch.dir("pq_surv_")
    Pq.writeIvfPqIndex(survivors, survDir)
    def cents(d: String) = spark.read.parquet(s"$d/centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toList, r.getDouble(2))).toSet
    assert(cents(delDir) == cents(survDir), "downdated centroids diverge from survivors rebuild")
    assert(!cents(delDir).exists(_._1 == 9L), "fully-deleted cell still has a centroid")
    def serve(d: String) = Pq.ivfAdcTopKStored(survivors, d, queryEvery = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val tombServed = serve(delDir)
    assert(tombServed.nonEmpty && tombServed == serve(survDir),
      "tombstoned index serves differently from the survivors rebuild")
    // DOUBLE delete (re-delivered feed) must be a no-op: the stats
    // algebra would otherwise subtract twice and corrupt the centroids
    Pq.deleteFromIvfPqIndex(doomed, delDir)
    assert(cents(delDir) == cents(survDir),
      "re-delivered delete corrupted the centroids (stats subtracted twice)")
    assert(serve(delDir) == tombServed, "re-delivered delete changed serving")
    // re-insert of a tombstoned id is GATED (advice r8): clearing the
    // tombstone would resurface the stale physical code row, keeping it
    // would shadow the new one — either way stats/centroids and serving
    // diverge from a rebuild. The constraint is loud: compact first.
    val reinsert = all.filter(col("vec_id") === 1L)
    val gateErr = intercept[IllegalArgumentException] {
      Pq.appendIvfPqIndex(reinsert, delDir)
    }
    assert(gateErr.getMessage.contains("compactIvfPqIndex"))
    assert(cents(delDir) == cents(survDir), "rejected re-insert mutated the index")
    assert(serve(delDir) == tombServed, "rejected re-insert changed serving")
    // compact: physical apply — identical serving, 1 data file per cell,
    // tombstone sidecar gone
    Pq.compactIvfPqIndex(spark, delDir)
    assert(!new java.io.File(s"$delDir/tombstones").exists(), "compaction left tombstones")
    assert(serve(delDir) == tombServed, "compaction changed the served answer")
    val cellDirs = new java.io.File(s"$delDir/codes").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cl="))
    assert(cellDirs.nonEmpty)
    cellDirs.foreach { cd =>
      val files = cd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"cell ${cd.getName} has ${files.length} files after compaction")
    }
    // the deleted cell's partition may remain as an empty directory but
    // must hold no rows
    val live = spark.read.parquet(s"$delDir/codes")
    assert(live.filter(col("cl") === 9L).count() == 0L, "deleted cell still has codes")
    // compaction cleared the sidecar → the same id now appends cleanly,
    // and the re-inserted index equals a survivors+row rebuild
    Pq.appendIvfPqIndex(reinsert, delDir)
    val plusDir = graft.Scratch.dir("pq_plus_")
    Pq.writeIvfPqIndex(survivors.unionByName(reinsert), plusDir)
    assert(cents(delDir) == cents(plusDir),
      "post-compact re-insert diverges from survivors+row rebuild")
    assert(serve(delDir) == serve(plusDir),
      "post-compact re-insert serves differently from rebuild")
  }

  test("ivf-pq lifecycle through a file:-prefixed URI: tombstones still apply (Hadoop-FS sidecar ops, verdict r9 #1)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // `new java.io.File("file:/x").exists()` is ALWAYS false — the old
    // local-FS sidecar checks would skip the tombstone anti-join through
    // any scheme-prefixed URI (the HDFS/S3 deployment shape) and serve
    // deleted vectors. All four verbs must resolve the FS from the path.
    def vec(seed: Long) = (1 to Pq.dim).map(i =>
      (((seed * 31 + i * 17) % 19) - 9).toFloat / 4.0f).toArray
    val all = (0 until 60).map(i => (i.toLong, vec(i.toLong), (i % 2).toLong))
      .toDF("vec_id", "embedding", "label")
    val doomed = all.filter(col("vec_id") % 4 === 1)
    val survivors = all.filter(col("vec_id") % 4 =!= 1)
    val local = graft.Scratch.dir("pq_uri_")
    val idx = s"file:$local"
    Pq.writeIvfPqIndex(all, idx)
    Pq.deleteFromIvfPqIndex(doomed, idx)
    val survDir = graft.Scratch.dir("pq_uris_")
    Pq.writeIvfPqIndex(survivors, survDir)
    def serve(d: String) = Pq.ivfAdcTopKStored(survivors, d, queryEvery = 7)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val served = serve(idx)
    assert(served.nonEmpty && served == serve(survDir),
      "tombstones did not apply through the file: URI — deleted vectors resurfaced")
    val gateErr = intercept[IllegalArgumentException] {
      Pq.appendIvfPqIndex(all.filter(col("vec_id") === 1L), idx)
    }
    assert(gateErr.getMessage.contains("compactIvfPqIndex"))
    Pq.compactIvfPqIndex(spark, idx)
    assert(!new java.io.File(s"$local/tombstones").exists(),
      "compaction failed to clear tombstones through the file: URI")
    assert(serve(idx) == served, "compaction changed serving through the file: URI")
  }

  test("pq: malformed (short) embeddings are excluded, never crash the kernels") {
    import org.apache.spark.sql.functions._
    // a 32-element non-zero vector: its SELF-dot has equal lengths, so a
    // norm>0 filter alone would pass it into the kernel (the bug class
    // the dim guard closes)
    val short = spark.range(1).select(
      lit(999999L).cast("int").as("vec_id"),
      expr("transform(sequence(1, 32), i -> cast(1e0 as float))").as("embedding"),
      lit(0).as("label"))
    val poisoned = emb.union(short)
    val codes = Pq.codes(poisoned)
    assert(codes.filter(codes("vec_id") === 999999L).count() == 0)
    val hits = Pq.ivfAdcTopK(poisoned).collect()
    assert(hits.nonEmpty && !hits.exists(_.getLong(1) == 999999L))
  }

  test("pq codes + adc are partition-invariant (1 vs 13)") {
    for (q <- Seq("emb_pq_codes", "ann_pq", "ann_ivfpq")) {
      def run(): Seq[String] = SparkEntry.queries(q)(spark, sf("sf0.001"))
        .collect().map(_.toString).sorted.toSeq
      val results = Seq("1", "13").map { p =>
        spark.conf.set("spark.sql.shuffle.partitions", p)
        try run() finally spark.conf.set("spark.sql.shuffle.partitions", "4")
      }
      assert(results(0).nonEmpty, q)
      assert(results(0) == results(1), s"$q diverged across partitionings")
    }
  }
}
