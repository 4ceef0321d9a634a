package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder north star, SURVEY.md §7.6).
  *
  * Media assets are opaque `binary` columns + typed metadata. The Spark-
  * side machinery is real — schema, partition-preserving mapPartitions
  * over a typed Dataset, batch-shaped iteration — while the actual codec
  * is a STUB (this container has no image/audio libraries): `fakeDecode`
  * derives deterministic pseudo-metadata from the raw bytes, standing in
  * for a JNI/FFmpeg/ImageIO call. Swap `decodeFn` for a real decoder to
  * productionize; the plan shape does not change.
  */
object Multimodal {

  case class Asset(doc_id: Long, blob: Array[Byte])
  case class AssetMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long,
                       channels: Long, format: String)

  /** STUB decoder — deterministic metadata from byte length (a real
    * implementation would parse the container header here). */
  def fakeDecode(a: Asset): AssetMeta = {
    val n = a.blob.length.toLong
    AssetMeta(a.doc_id, n, 64L + n % 193L, 64L + (n * 7L) % 193L, 3L, "fake")
  }

  /** Binary ingestion: any (id, bytes) frame → typed asset Dataset. Here
    * documents.text doubles as the blob payload (UTF-8 bytes) since the
    * testdata ships no real media. */
  def assetsFromDocs(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("blob")).as[Asset]
  }

  /** Partition-parallel decode: mapPartitions keeps the iterator lazy so a
    * real codec can batch / reuse native contexts per partition — the
    * Scala analogue of a pandas-batched UDF. No shuffle. */
  def decodeMeta(spark: SparkSession, assets: Dataset[Asset],
                 decodeFn: Asset => AssetMeta = fakeDecode): DataFrame = {
    import spark.implicits._
    assets.mapPartitions(_.map(decodeFn)).toDF()
  }

  case class ResizedAsset(doc_id: Long, width: Long, height: Long, blob: Array[Byte])
  case class Frame(doc_id: Long, frame_idx: Long, offset: Long, blob: Array[Byte])
  case class Feature(doc_id: Long, embedding: Array[Float])

  /** STUB resize to a bounding box preserving the fake aspect ratio —
    * a real implementation calls the codec here; the partitioning, typed
    * schema, and byte-payload flow are the real thing. */
  def resize(spark: SparkSession, assets: Dataset[Asset], maxSide: Long = 64L,
             decodeFn: Asset => AssetMeta = fakeDecode): Dataset[ResizedAsset] = {
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val m = decodeFn(a)
      val scale = maxSide.toDouble / math.max(m.width, m.height)
      val (w, h) = if (scale >= 1.0) (m.width, m.height)
        else (math.max(1L, (m.width * scale).toLong), math.max(1L, (m.height * scale).toLong))
      ResizedAsset(a.doc_id, w, h, a.blob)
    })
  }

  /** STUB frame sampling for video-like blobs: one row per sampled frame
    * (every `stride` bytes stands in for every Nth frame) — the generator
    * shape (`flatMap` → row explosion) is what a real frame extractor
    * uses; payload is the byte window. */
  def frameSample(spark: SparkSession, assets: Dataset[Asset],
                  stride: Int = 256, maxFrames: Int = 8): Dataset[Frame] = {
    import spark.implicits._
    assets.flatMap { a =>
      val n = a.blob.length
      (0 until math.min(maxFrames, math.max(1, n / stride))).map { i =>
        val off = i * stride
        Frame(a.doc_id, i.toLong, off.toLong,
          a.blob.slice(off, math.min(n, off + stride)))
      }
    }
  }

  /** STUB feature extraction: deterministic pseudo-embedding from byte
    * histogram moments (a real implementation runs the vision/audio model
    * per partition batch). Output schema matches the `embeddings` table. */
  def extractFeatures(spark: SparkSession, assets: Dataset[Asset],
                      dim: Int = 64): Dataset[Feature] = {
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val v = new Array[Float](dim)
      var i = 0
      while (i < a.blob.length) {
        v(((a.blob(i) & 0xff) * dim / 256) % dim) += 1.0f
        i += 1
      }
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      Feature(a.doc_id, if (norm > 0) v.map(x => (x / norm).toFloat) else v)
    })
  }
}
