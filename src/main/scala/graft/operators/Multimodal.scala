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
}
