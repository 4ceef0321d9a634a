package graft

import graft.operators.{Bpe, Dedup, Sampling}

/** Specs for the tokenizer-training / curation ops added this round:
  * BPE merge learning, intra-document line dedup, the data-mix planner,
  * and the EWMA feature — hand fixtures plus partition invariance. */
class BpeMixSpec extends SparkSpec {
  import spark.implicits._

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("bpe: exact merge sequence on the classic toy corpus") {
    // words: abab ×2, cd ×1. Round 1: (a,b) freq 4 (2 per word × cnt 2);
    // round 2: (ab,ab) freq 2; round 3: (c,d) freq 1; round 4: pair
    // universe empty → no row (both engines agree).
    val docs = Seq((1L, "abab abab cd")).toDF("doc_id", "text")
    val got = Bpe.train(docs, rounds = 4)
      .orderBy("round")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq == Seq(
      (1L, "a", "b", 4L, "ab"),
      (2L, "ab", "ab", 2L, "abab"),
      (3L, "c", "d", 1L, "cd")))
  }

  test("bpe: same-symbol runs >5 merge exactly leftmost-first (reference apply)") {
    // reference BPE applies a merge rule left-to-right non-overlapping
    // (Sennrich learn_bpe's regex sub): a^7 --(a,a)--> "aa aa aa a" —
    // NOT the staggered "aa a aa aa" a shared-delimiter replace yields.
    val docs = Seq((1L, "aaaaaaa")).toDF("doc_id", "text")
    val v1 = Bpe.vocab(docs, rounds = 1).select("repr").as[String].collect().head
    assert(v1 == " aa aa aa a ", s"got '$v1'")
    // and the trained sequence follows: round 2 merges the doubled pair
    // (aa,aa) freq 2 over [aa,aa,aa,a]; round 3 the count-1 tie between
    // (aaaa,aa) and (aa,a) breaks to the lexicographically-least lhs
    val got = Bpe.train(docs, rounds = 3).orderBy("round")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "a", "a", 6L), (2L, "aa", "aa", 2L), (3L, "aa", "a", 1L)))
  }

  test("bpe: applyTokens emits the ordered subword stream of the trained tokenizer") {
    // after 2 rounds the merges are (a,b) then (ab,ab): "abab" is ONE
    // symbol, "cd" stays two chars → per-word streams in order
    val docs = Seq((1L, "abab abab cd")).toDF("doc_id", "text")
    val got = Bpe.applyTokens(docs, rounds = 2)
      .orderBy("word_idx", "sym_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (0L, 0L, "abab"), (1L, 0L, "abab"), (2L, 0L, "c"), (2L, 1L, "d")))
  }

  test("bpe: encode counts post-merge symbols with the trained vocab") {
    // after 2 rounds the merges are (a,b) then (ab,ab): "abab" is ONE
    // symbol, "cd" still two → 3 words, 1+1+2 = 4 tokens
    val docs = Seq((1L, "abab abab cd")).toDF("doc_id", "text")
    val got = Bpe.encode(docs, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 3L, 4L)))
  }

  test("bpe: merge freqs are non-increasing across rounds on real data") {
    // merging can only reveal pairs whose count is bounded by the merged
    // pair's count, and old pair counts only shrink — so the trained
    // sequence is monotone. (The cross-engine gate checks exactness; this
    // pins the invariant that makes the training order meaningful.)
    val docs = graft.sources.Tables.read(spark, sf("sf0.001"), "documents")
    val freqs = Bpe.train(docs, rounds = 6).orderBy("round")
      .select("freq").as[Long].collect()
    assert(freqs.length == 6)
    assert(freqs.sliding(2).forall(w => w(0) >= w(1)), freqs.toSeq)
  }

  test("within-doc dedup removes later repeats, keeps first occurrence") {
    val block = (1 to 10).map(i => s"w$i").mkString(" ")   // one 10-token line
    val tail = "t1 t2 t3"
    val docs = Seq(
      (1L, s"$block $block $tail"), // line 1 repeats line 0 → removed
      (2L, tail)                    // single short line, nothing removed
    ).toDF("doc_id", "text")
    val got = Dedup.withinDocDedup(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 1L, md5(s"$block $tail")),
      (2L, 1L, 0L, md5(tail))))
  }

  test("mix plan: thresholds realize the budget arithmetic, sample within totals") {
    val plan = Sampling.mixPlan(
      graft.sources.Tables.read(spark, sf("sf0.001"), "documents"),
      budgetTokens = 10000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(plan.nonEmpty)
    val partsOf = Sampling.mixParts.toMap
    plan.foreach { case (lang, nDocs, tokTotal, parts, tFp, nSampled, tokSampled) =>
      assert(parts == partsOf.getOrElse(lang, 0).toLong, lang)
      val expected = math.min(1048576L, 10000L * parts * 1048576L / (1024L * tokTotal))
      assert(tFp == expected, s"$lang threshold")
      assert(nSampled <= nDocs && tokSampled <= tokTotal, lang)
      // a language with a full-keep threshold samples everything
      if (tFp == 1048576L) assert(nSampled == nDocs && tokSampled == tokTotal, lang)
    }
  }

  test("lr training separates a separable toy corpus (signed weights, falling loss)") {
    import graft.operators.{Classifier, TextOps}
    val docs = ((1 to 10).map(i => (i.toLong, "foo foo foo", "en")) ++
      (11 to 20).map(i => (i.toLong, "bar bar bar", "de")))
      .toDF("doc_id", "text", "lang")
    val buckets = TextOps.hashFeatures(docs).select("doc_id", "bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val (bFoo, bBar) = (buckets(1L), buckets(11L))
    assert(bFoo != bBar, "toy tokens collided; pick different tokens")
    val w = Classifier.lrTrain(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 'en' docs contain only foo → its weight rises; 'de' only bar → falls
    assert(w(bFoo) > 0.0 && w(bBar) < 0.0, w.toString)
    // one more iteration strictly improves the fit on separable data
    val w5 = Classifier.lrTrain(docs, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w5(bFoo) > w(bFoo) && w5(bBar) < w(bBar), (w, w5).toString)
  }

  test("bpe / mix plan / within-doc dedup / ewma / lr are partition-invariant (1 vs 13)") {
    for (q <- Seq("bpe_train", "mix_plan", "dedup_within", "q_ewma", "lr_train",
      "text_entropy", "dedup_incremental", "graph_triangles", "q_last_touch",
      "lr_score", "bpe_encode", "pipeline_curate", "bpe_apply")) {
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

  test("pipeline_curate: composition is consistent with its stage queries") {
    val dir = sf("sf0.001")
    // (doc_id, lang, n_tokens, h, shard, pos, bin)
    val out = SparkEntry.queries("pipeline_curate")(spark, dir).collect()
    assert(out.nonEmpty)
    // survivors pass the standalone curate filter, and eval ids are out
    val keeps = SparkEntry.queries("curate_filter")(spark, dir)
      .filter("keep").select("doc_id").as[Long].collect().toSet
    val ids = out.map(_.getLong(0)).toSet
    assert(ids.subsetOf(keeps), (ids -- keeps).toSeq.sorted.take(5).toString)
    assert(!ids.exists(_ % 97 == 0))
    // post-line-dedup token budget never exceeds the raw token count
    val raw = graft.sources.Tables.read(spark, dir, "documents")
      .selectExpr("doc_id", "cast(size(split(trim(text), ' ')) as bigint) as n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach(r => assert(r.getLong(2) <= raw(r.getLong(0)), r.toString))
    // shard positions are a dense 1..n ranking per shard
    out.groupBy(_.getLong(4)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(5)).sorted.toSeq == (1L to rows.length).toSeq) }
    // bins fill contiguously per lang in training (h, doc_id) order
    out.groupBy(_.getString(1)).foreach { case (_, rows) =>
      val bins = rows.sortBy(r => (r.getLong(3), r.getLong(0))).map(_.getLong(6)).toSeq
      assert(bins.head == 0L, bins.toString)
      assert(bins.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)), bins.toString) }
  }

  test("streaming latest-row view equals the batch WindowGroupLimit compaction") {
    val stream = graft.streaming.EventStream.runLatestOnce(spark, sf("sf0.001"))
      .collect().map(_.toString).sorted.toSeq
    val batch = SparkEntry.queries("q_latest")(spark, sf("sf0.001"))
      .collect().map(_.toString).sorted.toSeq
    assert(stream.nonEmpty && stream == batch)
  }
}
