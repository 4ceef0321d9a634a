package graft

import graft.operators.IndexFs

/** Cache-key discipline for standing artifacts ([[IndexFs]]): the
  * composite dataKey must (a) roll when a data dir's CONTENT is
  * regenerated under the same path — a dirKey-only cache would silently
  * serve a stale index (advice r10) — and (b) be a function of content
  * layout, not of URI spelling, so the same dir reached via a bare path
  * and a qualified `file:` URI shares one cache entry (advice r11: the
  * old relative-strip rarely matched because FileStatus paths come back
  * fully qualified). */
class IndexFsSpec extends SparkSpec {

  private def writeDir(tag: String, rows: Seq[Long]): String = {
    import spark.implicits._
    val d = graft.Scratch.dir(tag)
    rows.toDF("x").repartition(1).write.mode("overwrite").parquet(d)
    d
  }

  test("snapshotKey: regenerating a dir's content rolls the key; identical content+metadata keys stably") {
    val d = writeDir("ixfs_snap_", 0L until 100L)
    val k1 = IndexFs.snapshotKey(spark, d)
    assert(k1 == IndexFs.snapshotKey(spark, d), "same listing must key stably")
    // regenerate under the SAME path with different content (different
    // row count => different file length, mtime aside)
    import spark.implicits._
    (0L until 250L).toDF("x").repartition(1).write.mode("overwrite").parquet(d)
    val k2 = IndexFs.snapshotKey(spark, d)
    assert(k1 != k2, "regenerated content under the same path must roll the key")
    // a missing dir keys deterministically too (empty fingerprint)
    val kAbsent = IndexFs.snapshotKey(spark, d + "_nope")
    assert(kAbsent == IndexFs.snapshotKey(spark, d + "_nope"))
    assert(kAbsent != k2)
  }

  test("snapshotKey: bare path and file:-qualified URI of the same dir key identically (relative entries)") {
    val d = writeDir("ixfs_uri_", 0L until 50L)
    assert(IndexFs.snapshotKey(spark, d) == IndexFs.snapshotKey(spark, s"file:$d"),
      "URI spelling must not change the content fingerprint")
  }

  test("dataKey: distinct dirs never alias; same dir + regenerated content rolls") {
    val a = writeDir("ixfs_dk_a_", 0L until 10L)
    val b = writeDir("ixfs_dk_b_", 0L until 10L)
    assert(IndexFs.dataKey(spark, a) != IndexFs.dataKey(spark, b),
      "two dirs with identical content must still key apart (dirKey half)")
    val k1 = IndexFs.dataKey(spark, a)
    import spark.implicits._
    (0L until 11L).toDF("x").repartition(1).write.mode("overwrite").parquet(a)
    assert(IndexFs.dataKey(spark, a) != k1,
      "regeneration must roll the composite key (snapshot half)")
  }
}
