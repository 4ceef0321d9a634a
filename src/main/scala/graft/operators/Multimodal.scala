package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder north star, SURVEY.md §7.6).
  *
  * Media assets are opaque `binary` columns + typed metadata. The IMAGE
  * path is real end-to-end with zero external deps: the JDK ships a PNG/
  * JPEG/GIF/BMP codec in `javax.imageio`, so [[imageDecode]] parses
  * actual image bytes (real container header, real pixel raster) and
  * [[imageResize]] runs a real Graphics2D rescale + PNG re-encode. The
  * driver-gate queries feed it [[pngAssets]] — genuine PNG bytes encoded
  * in-flight with doc_id-derived dimensions — so the DuckDB oracle
  * predicts the decoded width/height arithmetically while the values
  * themselves come out of a real codec round trip.
  *
  * Frame sampling is real too: [[gifFrameSample]] enumerates and
  * selectively decodes the frames of in-flight-encoded animated GIFs
  * ([[gifAssets]]) — a genuine multi-frame container walked with
  * `getNumImages`/`read(i)`. Only model inference ([[extractFeatures]])
  * and true video codecs stay stubbed ([[frameSample]]'s byte windows
  * remain the fallback for containers the JDK cannot read), with the
  * real distributed plumbing (typed Dataset, partition-preserving
  * mapPartitions, generator explode) around them. [[fakeDecode]] remains
  * the fallback for non-image payloads.
  */
object Multimodal {

  // BufferedImage/Graphics2D work headless, but only if AWT never tries
  // to connect a display — force it before any ImageIO touch
  System.setProperty("java.awt.headless", "true")

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

  /** Deterministic doc_id-derived image dimensions, shared by the PNG
    * encoder below and the DuckDB oracle text (`1 + doc_id % 13`,
    * `1 + (doc_id * 3) % 11`). */
  private def pngDims(id: Long): (Int, Int) =
    ((1 + id % 13).toInt, (1 + (id * 3) % 11).toInt)

  /** REAL tiny PNG bytes for a doc id: a BufferedImage with doc_id-
    * derived dimensions and deterministic pixel content, run through the
    * JDK's actual PNG encoder. What comes back only decodes because it
    * is a genuine PNG container. */
  private[graft] def pngBytes(id: Long): Array[Byte] = {
    val (w, h) = pngDims(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((id + x * 31L + y * 17L) % 0xffffffL).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real-media asset source for the driver gate: one genuine PNG per
    * document, encoded in-flight on the executors (the testdata ships no
    * media files, and fixture dirs outside the repo are read-only — the
    * encode IS part of the pipeline, like any ingest job that renders
    * thumbnails). Byte payloads are NOT oracle-predictable (PNG
    * compression may differ across JDK versions) but the decoded
    * metadata is, which is exactly what the gate checks. */
  def pngAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map(id => Asset(id, pngBytes(id))))
  }

  /** REAL decode via `javax.imageio` (PNG/JPEG/GIF/BMP ship with the
    * JDK): container sniffing picks the reader, the raster gives
    * width/height/bands. Payloads no JDK reader claims (plain text,
    * audio, video) fall back to [[fakeDecode]] — the stub survives only
    * where the JDK genuinely has no codec. */
  def imageDecode(a: Asset): AssetMeta = {
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(a.blob))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (readers.hasNext) {
          val r = readers.next()
          try {
            r.setInput(iis)
            val img = r.read(0)
            AssetMeta(a.doc_id, a.blob.length.toLong, img.getWidth.toLong,
              img.getHeight.toLong, img.getRaster.getNumBands.toLong,
              r.getFormatName.toLowerCase)
          } finally r.dispose()
        } else fakeDecode(a)
      } finally iis.close()
    } catch { case _: Exception => fakeDecode(a) }
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

  /** REAL image resize: decode the blob with the JDK codec, scale into
    * the `maxSide` bounding box with Graphics2D bilinear interpolation,
    * and re-encode to PNG — a genuine decode→transform→encode pipeline
    * stage, partition-parallel, no shuffle. Target dimensions use the
    * same truncating floor as the stub [[resize]] so the oracle
    * arithmetic carries over. Non-image blobs pass through unscaled via
    * the [[fakeDecode]] fallback dims. */
  def imageResize(spark: SparkSession, assets: Dataset[Asset],
                  maxSide: Long = 8L): Dataset[ResizedAsset] = {
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.blob))
        catch { case _: Exception => null }
      if (img == null) {
        val m = fakeDecode(a)
        ResizedAsset(a.doc_id, m.width, m.height, a.blob)
      } else {
        val (w0, h0) = (img.getWidth, img.getHeight)
        val scale = maxSide.toDouble / math.max(w0, h0)
        val (w, h) =
          if (scale >= 1.0) (w0, h0)
          else (math.max(1L, (w0 * scale).toLong).toInt,
            math.max(1L, (h0 * scale).toLong).toInt)
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        ResizedAsset(a.doc_id, w.toLong, h.toLong, bos.toByteArray)
      }
    })
  }

  /** STUB frame sampling for video-like blobs: one row per sampled frame
    * (every `stride` bytes stands in for every Nth frame) — the generator
    * shape (`flatMap` → row explosion) is what a real frame extractor
    * uses; payload is the byte window. Kept as the fallback for
    * containers the JDK has no codec for; [[gifFrameSample]] (animated
    * GIF) and [[videoFrameSample]] (MJPEG demux + per-frame JPEG decode)
    * are the REAL multi-frame paths. */
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

  /** Deterministic doc_id-derived animated-GIF frame count, shared with
    * the DuckDB oracle text (`1 + doc_id % 8`). */
  private def gifFrameCount(id: Long): Int = (1 + id % 8).toInt

  /** REAL multi-frame animated GIF for a doc id: [[gifFrameCount]]
    * frames of [[pngDims]] size, written through the JDK GIF writer's
    * sequence API — a genuine multi-frame container, the closest thing
    * to a video file the JDK can both write and read. */
  private[graft] def gifBytes(id: Long): Array[Byte] = {
    val (w, h) = pngDims(id)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < gifFrameCount(id)) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, ((id + f * 101L + x * 31L + y * 17L) % 0xffffffL).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Multi-frame asset source for the driver gate: one genuine animated
    * GIF per document, encoded in-flight on the executors (same rationale
    * as [[pngAssets]]: the metadata is oracle-predictable, the bytes are
    * a real container). */
  def gifAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map(id => Asset(id, gifBytes(id))))
  }

  case class FrameMeta(doc_id: Long, frame_idx: Long, n_frames: Long,
                       width: Long, height: Long)

  /** REAL frame sampling through the codec: the reader enumerates the
    * container's frames (`getNumImages(true)` walks the stream), every
    * `stride`-th frame is actually DECODED (`reader.read(i)` — skipped
    * frames are never rasterized, which is the point of sampling), and
    * each sampled frame reports its decoded dimensions. Payloads no JDK
    * reader claims fall back to the byte-window stub's arithmetic
    * ([[fakeDecode]] dims, one pseudo-frame per `256` bytes) — the stub
    * survives only where the JDK genuinely has no codec. */
  def gifFrameSample(spark: SparkSession, assets: Dataset[Asset],
                     stride: Int = 2, maxFallbackFrames: Int = 8): Dataset[FrameMeta] = {
    import spark.implicits._
    assets.flatMap { a =>
      val decoded: Option[Seq[FrameMeta]] = try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(a.blob))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              val n = r.getNumImages(true)
              Some((0 until n by stride).map { i =>
                val img = r.read(i)
                FrameMeta(a.doc_id, i.toLong, n.toLong,
                  img.getWidth.toLong, img.getHeight.toLong)
              })
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => None }
      decoded.getOrElse {
        // byte-window stub arithmetic, with frameSample's cap: an
        // unreadable multi-GB payload must not explode into hundreds of
        // thousands of pseudo-frames
        val m = fakeDecode(a)
        val n = math.min(maxFallbackFrames, math.max(1, a.blob.length / 256))
        (0 until n by stride).map(i =>
          FrameMeta(a.doc_id, i.toLong, n.toLong, m.width, m.height))
      }
    }
  }

  /** Deterministic doc_id-derived MJPEG frame count, shared with the
    * DuckDB oracle text (`2 + doc_id % 7`). */
  private def vidFrameCount(id: Long): Int = (2 + id % 7).toInt

  /** REAL video container for a doc id: an MJPEG stream — [[vidFrameCount]]
    * complete JFIF/JPEG frames back-to-back, each encoded through the
    * JDK's actual JPEG codec at [[pngDims]] size. Motion-JPEG is exactly
    * this container (frames are independent JPEG images concatenated in
    * stream order; AVI/MOV MJPEG tracks wrap the same payloads), so the
    * demux + per-frame decode below is a genuine video decode path, not
    * a byte-window simulation. */
  private[graft] def mjpegBytes(id: Long): Array[Byte] = {
    val (w, h) = pngDims(id)
    val bos = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < vidFrameCount(id)) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, ((id + f * 131L + x * 29L + y * 13L) % 0xffffffL).toInt)
          x += 1
        }
        y += 1
      }
      javax.imageio.ImageIO.write(img, "jpg", bos)
      f += 1
    }
    bos.toByteArray
  }

  /** Video asset source for the driver gate: one genuine MJPEG stream per
    * document, encoded in-flight on the executors (same rationale as
    * [[pngAssets]]: the decoded metadata is oracle-predictable, the bytes
    * are a real container only a real demux + codec can read). */
  def mjpegAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map(id => Asset(id, mjpegBytes(id))))
  }

  /** REAL multi-frame VIDEO decode: demux the MJPEG stream at the JPEG
    * marker level — SOI (FFD8) opens a frame, EOI (FFD9) closes it, and
    * neither can occur inside a frame's entropy-coded payload because
    * JPEG byte-stuffs every 0xFF there (FF00 or RST markers only) — then
    * every `stride`-th demuxed frame is actually DECODED through the JDK
    * JPEG codec (skipped frames are never rasterized, which is the point
    * of sampling), reporting the raster's dimensions. A mis-split or a
    * non-MJPEG payload fails real decode and falls back to the
    * byte-window stub arithmetic ([[fakeDecode]] dims, one pseudo-frame
    * per 256 bytes, capped) — the stub survives ONLY where no genuine
    * codec path exists, and the spec pins that boundary. */
  def videoFrameSample(spark: SparkSession, assets: Dataset[Asset],
                       stride: Int = 2, maxFallbackFrames: Int = 8): Dataset[FrameMeta] = {
    import spark.implicits._
    assets.flatMap { a =>
      val blob = a.blob
      // marker-level demux: [start, end) byte ranges of complete frames
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var start = -1
      var i = 0
      while (i + 1 < blob.length) {
        if ((blob(i) & 0xff) == 0xff) {
          val m = blob(i + 1) & 0xff
          if (m == 0xd8 && start < 0) start = i
          else if (m == 0xd9 && start >= 0) { bounds += ((start, i + 2)); start = -1 }
        }
        i += 1
      }
      val decoded: Option[Seq[FrameMeta]] =
        if (bounds.isEmpty) None
        else try {
          val n = bounds.length
          Some((0 until n by stride).map { fi =>
            val (s, e) = bounds(fi)
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(java.util.Arrays.copyOfRange(blob, s, e)))
            // a demuxed range that is not a decodable JPEG frame is a
            // mis-split: reject the whole asset to the fallback rather
            // than emit half-real metadata
            if (img == null) throw new java.io.IOException("undecodable frame")
            FrameMeta(a.doc_id, fi.toLong, n.toLong,
              img.getWidth.toLong, img.getHeight.toLong)
          })
        } catch { case _: Exception => None }
      decoded.getOrElse {
        val m = fakeDecode(a)
        val n = math.min(maxFallbackFrames, math.max(1, blob.length / 256))
        (0 until n by stride).map(fi =>
          FrameMeta(a.doc_id, fi.toLong, n.toLong, m.width, m.height))
      }
    }
  }

  // -------------------------------------------------------------------
  // RIFF/AVI container with uncompressed BGR frames (verdict r7 #8):
  // the second real video family. Unlike MJPEG (frames independently
  // JPEG-compressed, pixel bytes unpredictable), a BI_RGB DIB track is
  // pure-JVM decodable END-TO-END — so this gate checks the DECODED
  // PIXELS, not just raster dims: per-frame top-left byte and the full
  // pixel-byte sum are arithmetic in (doc_id, frame, x, y) and the
  // DuckDB oracle reproduces both. The fallback boundary becomes
  // "containers with compressed non-JPEG codecs", pinned by the spec
  // with an 'MJPG'-fourcc sibling of the same container.
  // -------------------------------------------------------------------

  case class AviFrame(doc_id: Long, frame_idx: Long, n_frames: Long,
                      width: Long, height: Long, corner_b: Long, px_sum: Long)

  /** Deterministic doc_id-derived AVI frame count, shared with the
    * DuckDB oracle text (`2 + doc_id % 6`). */
  private def aviFrameCount(id: Long): Int = (2 + id % 6).toInt

  /** BMP row stride: rows pad to 4-byte boundaries. */
  private def bmpStride(w: Int): Int = ((w * 3 + 3) / 4) * 4

  private def leChunk(id: String, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + data.length + (data.length & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(id.getBytes("US-ASCII")).putInt(data.length).put(data)
    bb.array() // odd-sized chunks carry the RIFF pad byte (zeroed above)
  }

  private def leList(listType: String, parts: Array[Byte]*): Array[Byte] =
    leChunk("LIST", listType.getBytes("US-ASCII") ++ parts.flatten)

  /** REAL RIFF/AVI bytes for a doc id: a single 'vids' stream of
    * [[aviFrameCount]] uncompressed bottom-up 24-bit BGR DIB frames at
    * [[pngDims]] size — complete hdrl (avih + strh + strf
    * BITMAPINFOHEADER) / movi / idx1 structure, row padding filled with
    * a 0xAB sentinel so a decoder that sums raw chunk bytes instead of
    * walking rows is caught by the oracle. `compression` non-zero
    * (e.g. 'MJPG') writes the same container with a compressed-codec
    * fourcc — the documented fallback boundary. */
  private[graft] def aviBytes(id: Long, compression: Int = 0): Array[Byte] = {
    val (w, h) = pngDims(id)
    val n = aviFrameCount(id)
    val stride = bmpStride(w)
    val frameBytes = stride * h
    def u8(v: Long): Byte = (v % 256L).toByte
    val frames = (0 until n).map { f =>
      val data = new Array[Byte](frameBytes)
      java.util.Arrays.fill(data, 0xAB.toByte)
      var y = 0
      while (y < h) {
        val rowOff = (h - 1 - y) * stride // bottom-up storage
        var x = 0
        while (x < w) {
          val b = (id + f * 131L + x * 29L + y * 13L) % 256L
          data(rowOff + x * 3) = u8(b)
          data(rowOff + x * 3 + 1) = u8(b + 85L)
          data(rowOff + x * 3 + 2) = u8(b + 170L)
          x += 1
        }
        y += 1
      }
      leChunk("00db", data)
    }
    val avih = {
      val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40000).putInt(0).putInt(0).putInt(0x10) // µs/frame, maxbps, pad, AVIF_HASINDEX
        .putInt(n).putInt(0).putInt(1).putInt(frameBytes) // totalFrames, initial, streams, sugBuf
        .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
      bb.array()
    }
    val strh = {
      val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("vids".getBytes("US-ASCII"))
      bb.put((if (compression == 0) "DIB " else "MJPG").getBytes("US-ASCII"))
      bb.putInt(0).putShort(0).putShort(0).putInt(0) // flags, prio, lang, initialFrames
        .putInt(1).putInt(25).putInt(0).putInt(n)    // scale, rate, start, length
        .putInt(frameBytes).putInt(-1).putInt(0)     // sugBuf, quality, sampleSize
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
      bb.array()
    }
    val strf = {
      val bb = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(w).putInt(h) // biSize, biWidth, biHeight (+ve = bottom-up)
        .putShort(1).putShort(24)       // biPlanes, biBitCount
        .putInt(compression).putInt(frameBytes) // biCompression (0 = BI_RGB), biSizeImage
        .putInt(0).putInt(0).putInt(0).putInt(0)
      bb.array()
    }
    val hdrl = leList("hdrl", leChunk("avih", avih), leList("strl", leChunk("strh", strh), leChunk("strf", strf)))
    val movi = leList("movi", frames: _*)
    val idx1 = {
      val bb = java.nio.ByteBuffer.allocate(16 * n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var off = 4 // offsets conventionally relative to the 'movi' fourcc
      frames.foreach { fr =>
        bb.put("00db".getBytes("US-ASCII")).putInt(0x10).putInt(off).putInt(frameBytes)
        off += fr.length
      }
      leChunk("idx1", bb.array())
    }
    leChunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi ++ idx1)
  }

  /** AVI asset source for the driver gate (the [[mjpegAssets]] shape). */
  def aviAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map(id => Asset(id, aviBytes(id))))
  }

  /** Palette color for an 8-bit index, shared with the oracle text:
    * B = i, G = 7i mod 256, R = 13i mod 256. */
  private def rlePal(i: Int): (Int, Int, Int) = (i, (i * 7) % 256, (i * 13) % 256)

  /** RLE8 pixel INDEX at (x, y) of frame f — constant over 4-wide x
    * blocks so the encoder emits genuine multi-pixel runs. */
  private def rleIdx(id: Long, f: Int, x: Int, y: Int): Int =
    ((id + f * 131L + (x / 4) * 29L + y * 13L) % 256L).toInt

  /** REAL RIFF/AVI with BI_RLE8 frames — a genuinely COMPRESSED codec
    * the JVM can still decode end-to-end: 8-bit palette indices
    * run-length encoded per the BMP RLE8 wire format (run packets
    * `(count, index)`, escape `00 00` end-of-line, `00 01` end-of-
    * bitmap), palette = 256 RGBQUADs appended to the strf
    * BITMAPINFOHEADER. Pixel indices are constant over 4-wide blocks so
    * the stream contains real multi-pixel runs, not a degenerate
    * 1-run-per-pixel spelling. */
  private[graft] def aviRle8Bytes(id: Long): Array[Byte] = {
    val (w, h) = pngDims(id)
    val n = aviFrameCount(id)
    val frames = (0 until n).map { f =>
      val out = new java.io.ByteArrayOutputStream()
      var y = h - 1 // rows stored bottom-up
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val idx = rleIdx(id, f, x, y)
          var run = 1
          while (x + run < w && rleIdx(id, f, x + run, y) == idx && run < 255) run += 1
          out.write(run); out.write(idx)
          x += run
        }
        if (y > 0) { out.write(0); out.write(0) } // EOL between rows
        y -= 1
      }
      out.write(0); out.write(1) // EOB
      leChunk("00dc", out.toByteArray) // compressed-frame chunk id
    }
    val avih = {
      val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40000).putInt(0).putInt(0).putInt(0x10)
        .putInt(n).putInt(0).putInt(1).putInt(frames.map(_.length).max)
        .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
      bb.array()
    }
    val strh = {
      val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("vids".getBytes("US-ASCII")).put("MRLE".getBytes("US-ASCII"))
      bb.putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(1).putInt(25).putInt(0).putInt(n)
        .putInt(frames.map(_.length).max).putInt(-1).putInt(0)
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      bb.array()
    }
    val strf = {
      val bb = java.nio.ByteBuffer.allocate(40 + 256 * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(w).putInt(h)
        .putShort(1).putShort(8)        // biPlanes, biBitCount = 8
        .putInt(1).putInt(0)            // biCompression = 1 (BI_RLE8), biSizeImage
        .putInt(0).putInt(0).putInt(256).putInt(0) // biClrUsed = 256
      var i = 0
      while (i < 256) { // RGBQUAD order: B, G, R, reserved
        val (b, g, r) = rlePal(i)
        bb.put(b.toByte).put(g.toByte).put(r.toByte).put(0.toByte)
        i += 1
      }
      bb.array()
    }
    val hdrl = leList("hdrl", leChunk("avih", avih),
      leList("strl", leChunk("strh", strh), leChunk("strf", strf)))
    val movi = leList("movi", frames: _*)
    leChunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  /** RLE8 asset source for the driver gate. */
  def aviRle8Assets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => Asset(id, aviRle8Bytes(id))))
  }

  /** Strict RLE8 decompressor: run packets, absolute-mode packets
    * (`00 n` + n literal indices, word-padded), `00 00` EOL, `00 01`
    * EOB. Returns the w×h index raster (row 0 = BOTTOM row, as stored)
    * or null on ANY structural violation (overrun, short row, EOB
    * before the last row, trailing garbage) — the mis-split-rejects-
    * whole-asset discipline of the other codec paths. Delta escapes
    * (`00 02`) are rejected: they encode skipped (undefined) pixels,
    * which have no deterministic decode. */
  private def rle8Decode(blob: Array[Byte], off: Int, size: Int,
                         w: Int, h: Int): Array[Array[Int]] = {
    val rows = Array.ofDim[Int](h, w)
    var x = 0
    var row = 0
    var i = off
    val end = off + size
    var done = false
    while (!done) {
      if (i + 2 > end || row >= h) return null
      val b0 = blob(i) & 0xff
      val b1 = blob(i + 1) & 0xff
      i += 2
      if (b0 > 0) {
        if (x + b0 > w) return null
        var k = 0
        while (k < b0) { rows(row)(x + k) = b1; k += 1 }
        x += b0
      } else b1 match {
        case 0 => // EOL: our rows are fully painted
          if (x != w) return null
          x = 0; row += 1
        case 1 => // EOB: only legal at the end of the last row, and the
          // chunk must be fully consumed — bytes after `00 01` are the
          // trailing garbage the docstring promises to reject (advice
          // r8); one slack byte allowed for encoders that count the RIFF
          // word-pad inside the chunk size
          if (!(row == h - 1 && x == w)) return null
          if (end - i > 1) return null
          done = true
        case 2 => return null // delta = undefined pixels
        case abs => // absolute mode: abs >= 3 literal indices + pad
          if (i + abs + (abs & 1) > end || x + abs > w) return null
          var k = 0
          while (k < abs) { rows(row)(x + k) = blob(i + k) & 0xff; k += 1 }
          x += abs
          i += abs + (abs & 1)
      }
    }
    rows
  }

  /** REAL AVI demux + uncompressed-DIB frame decode: a strict RIFF
    * walker (fourcc + LE32 size + word alignment, list recursion with
    * bounds checks) finds the stream format (strf BITMAPINFOHEADER) and
    * the movi frame chunks; the container must be internally consistent
    * (avih dwTotalFrames == demuxed chunk count, every chunk exactly
    * stride×height bytes) or the whole asset rejects to the byte-window
    * fallback — same discipline as [[videoFrameSample]]'s mis-split
    * rule. Every `stride`-th frame is then actually DECODED: bottom-up
    * row order flipped, 4-byte row padding skipped, per-pixel BGR bytes
    * read — reporting the top-left blue byte and the full pixel-byte
    * sum, which only a correct raster walk can produce (the 0xAB pad
    * sentinel breaks any raw-chunk shortcut). Two codec families
    * decode: biCompression=0 24bpp DIB (raw), and biCompression=1
    * 8-bit BI_RLE8 (a genuinely COMPRESSED codec — run/absolute
    * packets decompressed by [[rle8Decode]], indices resolved through
    * the strf palette; any structural violation rejects the whole
    * asset). Everything else (MJPG/H.264 fourccs) is the documented
    * fallback boundary (corner_b/px_sum = −1: the JDK has no such
    * codec, and half-real metadata is worse than an honest stub). */
  def aviFrameSample(spark: SparkSession, assets: Dataset[Asset],
                     stride: Int = 2, maxFallbackFrames: Int = 8): Dataset[AviFrame] = {
    import spark.implicits._
    assets.flatMap { a =>
      val blob = a.blob
      def fourcc(o: Int): String =
        new String(blob, o, 4, "US-ASCII")
      def le32(o: Int): Int =
        (blob(o) & 0xff) | ((blob(o + 1) & 0xff) << 8) |
          ((blob(o + 2) & 0xff) << 16) | ((blob(o + 3) & 0xff) << 24)
      def le16(o: Int): Int = (blob(o) & 0xff) | ((blob(o + 1) & 0xff) << 8)
      val decoded: Option[Seq[AviFrame]] = try {
        if (blob.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") None
        else {
          var bmpW, bmpH, bitCount, comp = -1
          var totalFrames = -1
          var isVids = false
          var palette: Array[Int] = null // packed (b<<16 | g<<8 | r)
          val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
          def walk(start: Int, end: Int): Unit = {
            var o = start
            while (o + 8 <= end) {
              val id = fourcc(o)
              val size = le32(o + 4)
              if (size < 0 || o + 8 + size > end)
                throw new java.io.IOException("chunk overruns container")
              if (id == "LIST") {
                // list payload = type fourcc + subchunks
                if (size >= 4) walk(o + 12, o + 8 + size)
              } else if (id == "avih") {
                if (size >= 56) totalFrames = le32(o + 8 + 16)
              } else if (id == "strh") {
                if (size >= 4 && fourcc(o + 8) == "vids") isVids = true
              } else if (id == "strf" && isVids && bmpW < 0) {
                if (size >= 40) {
                  bmpW = le32(o + 8 + 4); bmpH = le32(o + 8 + 8)
                  bitCount = le16(o + 8 + 14); comp = le32(o + 8 + 16)
                  if (bitCount == 8) {
                    val declared = le32(o + 8 + 32) // biClrUsed; 0 = full
                    val nPal = if (declared == 0) 256 else declared
                    if (size >= 40 + nPal * 4) {
                      palette = Array.tabulate(nPal) { pi =>
                        val p = o + 8 + 40 + pi * 4 // RGBQUAD: B, G, R, _
                        ((blob(p) & 0xff) << 16) | ((blob(p + 1) & 0xff) << 8) |
                          (blob(p + 2) & 0xff)
                      }
                    }
                  }
                }
              } else if (id.length == 4 && id(0).isDigit && id(1).isDigit
                && (id.endsWith("db") || id.endsWith("dd") || id.endsWith("dc"))) {
                frames += ((o + 8, size))
              }
              o += 8 + size + (size & 1) // RIFF chunks are word-aligned
            }
          }
          walk(12, blob.length)
          val rowStride = bmpStride(bmpW)
          val isDib = bitCount == 24 && comp == 0
          val isRle = bitCount == 8 && comp == 1 && palette != null
          if (bmpW <= 0 || bmpH <= 0 || !(isDib || isRle) ||
            frames.isEmpty || frames.length != totalFrames ||
            (isDib && frames.exists(_._2 != rowStride * bmpH))) None
          else {
            val n = frames.length
            // per-frame decode; any RLE structural violation rejects the
            // WHOLE asset (same rule as a demux mis-split)
            val metas = (0 until n by stride).map { fi =>
              val (off, size) = frames(fi)
              var cornerB = -1L
              var pxSum = 0L
              if (isDib) {
                var y = 0
                while (y < bmpH) {
                  val rowOff = off + (bmpH - 1 - y) * rowStride // flip bottom-up
                  var x = 0
                  while (x < bmpW) {
                    val b = blob(rowOff + x * 3) & 0xff
                    val g = blob(rowOff + x * 3 + 1) & 0xff
                    val r = blob(rowOff + x * 3 + 2) & 0xff
                    if (x == 0 && y == 0) cornerB = b.toLong
                    pxSum += b + g + r
                    x += 1
                  }
                  y += 1
                }
              } else {
                val rows = rle8Decode(blob, off, size, bmpW, bmpH)
                if (rows == null)
                  throw new java.io.IOException("malformed RLE8 frame")
                var y = 0
                while (y < bmpH) {
                  val stored = rows(bmpH - 1 - y) // flip bottom-up
                  var x = 0
                  while (x < bmpW) {
                    val idx = stored(x)
                    if (idx >= palette.length)
                      throw new java.io.IOException("palette index out of range")
                    val c = palette(idx)
                    val b = (c >> 16) & 0xff
                    if (x == 0 && y == 0) cornerB = b.toLong
                    pxSum += b + ((c >> 8) & 0xff) + (c & 0xff)
                    x += 1
                  }
                  y += 1
                }
              }
              AviFrame(a.doc_id, fi.toLong, n.toLong, bmpW.toLong, bmpH.toLong,
                cornerB, pxSum)
            }
            Some(metas)
          }
        }
      } catch { case _: Exception => None }
      decoded.getOrElse {
        val m = fakeDecode(a)
        val n = math.min(maxFallbackFrames, math.max(1, blob.length / 256))
        (0 until n by stride).map(fi =>
          AviFrame(a.doc_id, fi.toLong, n.toLong, m.width, m.height, -1L, -1L))
      }
    }
  }

  /** REAL feature extraction from DECODED pixels: per-channel 8-bin
    * color histograms over the actual raster the JDK codec returns — a
    * classic CV feature, no model required, so unlike [[extractFeatures]]
    * (which stands in for model inference) nothing here is stubbed. The
    * [[pngAssets]] pixel content is arithmetic in (doc_id, x, y), so the
    * DuckDB oracle reproduces the decoded histogram exactly — the gate
    * proves encode → decode → featurize end-to-end. Long format with
    * exact integer counts (no float surface at all); non-image payloads
    * are dropped (no raster → no histogram). Partition-parallel, no
    * shuffle before the per-doc aggregate-sized output. */
  def imageHistogram(spark: SparkSession, assets: Dataset[Asset],
                     bins: Int = 8): DataFrame = {
    import spark.implicits._
    assets.flatMap { a =>
      val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.blob))
        catch { case _: Exception => null }
      if (img == null) Iterator.empty
      else {
        val width = 256 / bins
        val cnt = Array.ofDim[Long](3, bins)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val v = img.getRGB(x, y)
            cnt(0)(((v >> 16) & 255) / width) += 1L
            cnt(1)(((v >> 8) & 255) / width) += 1L
            cnt(2)((v & 255) / width) += 1L
            x += 1
          }
          y += 1
        }
        for {
          c <- (0 until 3).iterator
          b <- 0 until bins
          if cnt(c)(b) > 0L
        } yield (a.doc_id, c.toLong, b.toLong, cnt(c)(b))
      }
    }.toDF("doc_id", "channel", "bin", "cnt")
  }

  /** Deterministic PCM payload for a doc id: little-endian int16 mono,
    * `256 + id % 257` samples, s_i = ((id·31 + i·17) mod 2003) − 1001 —
    * arithmetic in (doc_id, i) so the DuckDB oracle reproduces every
    * sample, the [[pngBytes]] contract for the audio modality. */
  private[graft] def pcmSamples(id: Long): Int = (256 + id % 257).toInt

  private[graft] def pcmBytes(id: Long): Array[Byte] = {
    val n = pcmSamples(id)
    val bb = java.nio.ByteBuffer.allocate(n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) {
      bb.putShort((((id * 31L + i * 17L) % 2003L) - 1001L).toShort)
      i += 1
    }
    bb.array()
  }

  def audioAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => Asset(id, pcmBytes(id))))
  }

  /** REAL audio feature extraction from raw PCM bytes — the signal
    * front-end of an audio-curation pipeline (energy gates out silence,
    * zero-crossing rate separates voiced/unvoiced/noise — both run
    * before any model): parse the little-endian int16 stream off the
    * binary column (a genuine byte-level decode on the executors — the
    * audio sibling of the PNG raster walk) and emit exact integer sums:
    * n_samples, energy Σs², zero crossings (strict sign products). No
    * float surface; partition-parallel; aggregate-sized output. The
    * sample content is arithmetic in (doc_id, i), so the oracle
    * re-derives the features without parsing bytes — hash equality
    * proves encode → byte-decode → featurize end-to-end. */
  def audioFeatures(spark: SparkSession, assets: Dataset[Asset]): DataFrame = {
    import spark.implicits._
    assets.map { a =>
      val bb = java.nio.ByteBuffer.wrap(a.blob)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = a.blob.length / 2
      var energy = 0L
      var zc = 0L
      var prev = 0L
      var i = 0
      while (i < n) {
        val s = bb.getShort(i * 2).toLong
        energy += s * s
        if (i > 0 && prev * s < 0L) zc += 1
        prev = s
        i += 1
      }
      (a.doc_id, n.toLong, energy, zc)
    }.toDF("doc_id", "n_samples", "energy", "zero_cross")
  }

  /** REAL image-quality screen from DECODED pixels: integer grayscale
    * sum and horizontal gradient (edge) energy per image — the classic
    * blur / flat-image filters of an image-curation pipeline (a
    * near-constant raster has ~zero gradient energy, heavy blur
    * collapses it; pipelines threshold edge_sum/n_px before paying for
    * model inference). Same proof shape as [[imageHistogram]]: the
    * raster comes out of the genuine JDK decode, the pixel content is
    * arithmetic in (doc_id, x, y), so the DuckDB oracle reproduces the
    * decoded sums bit-exactly as BIGINTs — encode → decode → featurize,
    * no float surface. Partition-parallel; output is one row per image. */
  def imageQuality(spark: SparkSession, assets: Dataset[Asset]): DataFrame = {
    import spark.implicits._
    assets.flatMap { a =>
      val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.blob))
        catch { case _: Exception => null }
      if (img == null) Iterator.empty
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var gs = 0L
        var es = 0L
        var y = 0
        while (y < h) {
          var x = 0
          var prev = -1L
          while (x < w) {
            val v = img.getRGB(x, y)
            val g = (((v >> 16) & 255) + ((v >> 8) & 255) + (v & 255)).toLong / 3L
            gs += g
            if (prev >= 0L) es += math.abs(g - prev)
            prev = g
            x += 1
          }
          y += 1
        }
        Iterator((a.doc_id, w.toLong * h, gs, es))
      }
    }.toDF("doc_id", "n_px", "gray_sum", "edge_sum")
  }

  /** The model-inference plumbing CONTRACT — the one multimodal
    * component that cannot be real without a model runtime in the
    * container, so the INTERFACE is the deliverable: an expensive
    * [[open]] that runs ONCE per partition (weights load, native/GPU
    * context) returning a [[BatchModel.Session]] whose [[BatchModel
    * .Session.embed]] scores micro-batches (the batch dimension is where
    * a real encoder amortizes — GPU dispatch, vectorized ops). Swapping
    * in a real vision/text encoder is one class implementing this trait;
    * [[StandInModel]] is the deterministic reference implementation and
    * the spec proves the amortization schedule (opens = partitions,
    * batches = Σ⌈rows/batchSize⌉) via its accumulator hooks. */
  trait BatchModel extends Serializable {
    def open(): BatchModel.Session
  }
  object BatchModel {
    trait Session {
      def embed(batch: Array[Array[Byte]]): Array[Array[Float]]
      def close(): Unit
    }
  }

  /** Deterministic stand-in "model": L2-normalized byte-histogram
    * direction per blob. The optional accumulators let specs audit the
    * open/batch schedule without changing the scoring path. */
  final class StandInModel(dim: Int = 64,
      opens: Option[org.apache.spark.util.LongAccumulator] = None,
      batches: Option[org.apache.spark.util.LongAccumulator] = None)
    extends BatchModel {
    def open(): BatchModel.Session = {
      opens.foreach(_.add(1L))
      new BatchModel.Session {
        def embed(batch: Array[Array[Byte]]): Array[Array[Float]] = {
          batches.foreach(_.add(1L))
          batch.map { blob =>
            val v = new Array[Float](dim)
            var i = 0
            while (i < blob.length) {
              v(((blob(i) & 0xff) * dim / 256) % dim) += 1.0f
              i += 1
            }
            val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
            if (norm > 0) v.map(x => (x / norm).toFloat) else v
          }
        }
        def close(): Unit = ()
      }
    }
  }

  /** REAL learned weights through the [[BatchModel]] contract: the
    * logistic-regression vector trained by [[Classifier.lrTrain]]
    * scores raw UTF-8 text blobs inside the partition-batched
    * inference runner — the proof that `inferFeatures`' plumbing
    * carries an actual trained model, not just the stand-in. The
    * session mirrors [[TextOps.hashFeatures]]' featurization exactly:
    * Spark SQL `trim` strips ASCII spaces ONLY (Java's `String.trim`
    * would also eat tabs/newlines and diverge), `split(_, ' ')` keeps
    * empty tokens, bucket = cwMix(52, rolling_hash(tok)) % buckets
    * via the same [[graft.functions.RollingHash.hash]] the codegen
    * expression runs, and the margin accumulates the identical
    * [[graft.oracle.Parity.fpSum]] fixed-point BIGINT terms (order-free
    * exact), so the emitted score is bit-equal to the relational
    * spelling — which is what the `mm_lr_infer` oracle (unrolled
    * training CTEs + one scoring pass) hash-checks end to end. The
    * weight array is `buckets`-sized (the [[Pq]] bounded-collect
    * precedent); a real encoder would load it in [[open]] — here it
    * ships deserialized in the closure, but the call schedule is the
    * one that amortizes. */
  final class LrTextModel(weights: Array[Double]) extends BatchModel {
    def open(): BatchModel.Session = new BatchModel.Session {
      private val (a52, b52) = graft.oracle.Parity.cwParams(52)
      def embed(batch: Array[Array[Byte]]): Array[Array[Float]] = batch.map { blob =>
        val s = new String(blob, java.nio.charset.StandardCharsets.UTF_8)
        var from = 0
        var to = s.length
        while (from < to && s.charAt(from) == ' ') from += 1
        while (to > from && s.charAt(to - 1) == ' ') to -= 1
        val toks = s.substring(from, to).split(" ", -1)
        val cnt = new Array[Long](weights.length)
        toks.foreach { t =>
          val h = graft.functions.RollingHash.hash(
            org.apache.spark.unsafe.types.UTF8String.fromString(t))
          cnt((((h * a52 + b52) % graft.oracle.Parity.CwMod) % weights.length).toInt) += 1L
        }
        var acc = 0L
        var b = 0
        while (b < weights.length) {
          if (cnt(b) != 0L)
            acc += math.floor(weights(b) * cnt(b).toDouble * 1048576.0 + 0.5).toLong
          b += 1
        }
        Array((acc.toDouble / 1048576.0).toFloat)
      }
      def close(): Unit = ()
    }
  }

  /** REAL learned NON-LINEAR model behind the [[BatchModel]] contract: a
    * one-hidden-layer ReLU MLP trained distributed by [[Mlp.mlpTrain]]
    * (full-batch GD in pure dataflow). The imperative forward pass here
    * replays the dataflow spelling term for term — tokenize via the same
    * [[graft.functions.RollingHash.hash]], layer-1 pre-activations as
    * per-term [[graft.oracle.Parity.fpSum]] fixed-point BIGINT sums,
    * exact ReLU, the layer-2 margin as another fixed-point sum — so the
    * emitted score is bit-equal to the relational spelling, which is
    * what the `mm_mlp_infer` oracle (unrolled training CTEs + a scoring
    * pass) hash-checks end to end. Weights are (buckets × hidden +
    * hidden) doubles — the [[Pq]] bounded-collect precedent. */
  final class MlpTextModel(w1: Array[Array[Double]], w2: Array[Double])
      extends BatchModel {
    def open(): BatchModel.Session = new BatchModel.Session {
      private val (a52, b52) = graft.oracle.Parity.cwParams(52)
      private val hiddenN = w2.length
      def embed(batch: Array[Array[Byte]]): Array[Array[Float]] = batch.map { blob =>
        val s = new String(blob, java.nio.charset.StandardCharsets.UTF_8)
        var from = 0
        var to = s.length
        while (from < to && s.charAt(from) == ' ') from += 1
        while (to > from && s.charAt(to - 1) == ' ') to -= 1
        val toks = s.substring(from, to).split(" ", -1)
        val cnt = new Array[Long](w1.length)
        toks.foreach { t =>
          val h = graft.functions.RollingHash.hash(
            org.apache.spark.unsafe.types.UTF8String.fromString(t))
          cnt((((h * a52 + b52) % graft.oracle.Parity.CwMod) % w1.length).toInt) += 1L
        }
        var macc = 0L
        var j = 0
        while (j < hiddenN) {
          var zacc = 0L
          var b = 0
          while (b < w1.length) {
            if (cnt(b) != 0L)
              zacc += math.floor(w1(b)(j) * cnt(b).toDouble * 1048576.0 + 0.5).toLong
            b += 1
          }
          val hj = math.max(zacc.toDouble / 1048576.0, 0.0)
          macc += math.floor(w2(j) * hj * 1048576.0 + 0.5).toLong
          j += 1
        }
        Array((macc.toDouble / 1048576.0).toFloat)
      }
      def close(): Unit = ()
    }
  }

  /** Weight-source-AGNOSTIC L-layer serving model: the [[MlpTextModel]]
    * forward pass generalized to an arbitrary ReLU stack loaded from a
    * parquet weight artifact ([[Mlp.loadWeights]]) — layer 1 consumes
    * the sparse hashed-token counts, every hidden layer applies the
    * fixed-point matvec + exact ReLU, the FINAL layer emits raw
    * pre-activations (the margin vector; no ReLU — a classifier head
    * squashes downstream, exactly like [[MlpTextModel]]'s single-unit
    * output). Every accumulation is the same floor(w·x·2^20 + ½) BIGINT
    * fixed-point term the dataflow trainer and the oracle use, so for
    * the 2-layer artifact this is BIT-EQUAL to [[MlpTextModel]] over
    * the in-memory-trained arrays — which is what the `mm_mlp_stored`
    * gate proves by sharing `mm_mlp_infer`'s oracle. */
  final class MlpStackModel(layers: Array[Array[Array[Double]]])
      extends BatchModel {
    require(layers.nonEmpty && layers.forall(m => m.nonEmpty && m(0).nonEmpty))
    def open(): BatchModel.Session = new BatchModel.Session {
      private val (a52, b52) = graft.oracle.Parity.cwParams(52)
      def embed(batch: Array[Array[Byte]]): Array[Array[Float]] = batch.map { blob =>
        val s = new String(blob, java.nio.charset.StandardCharsets.UTF_8)
        var from = 0
        var to = s.length
        while (from < to && s.charAt(from) == ' ') from += 1
        while (to > from && s.charAt(to - 1) == ' ') to -= 1
        val toks = s.substring(from, to).split(" ", -1)
        val w1 = layers(0)
        val cnt = new Array[Long](w1.length)
        toks.foreach { t =>
          val h = graft.functions.RollingHash.hash(
            org.apache.spark.unsafe.types.UTF8String.fromString(t))
          cnt((((h * a52 + b52) % graft.oracle.Parity.CwMod) % w1.length).toInt) += 1L
        }
        // layer 1: sparse counts → fixed-point pre-activations
        var h: Array[Double] = Array.tabulate(w1(0).length) { j =>
          var zacc = 0L
          var b = 0
          while (b < w1.length) {
            if (cnt(b) != 0L)
              zacc += math.floor(w1(b)(j) * cnt(b).toDouble * 1048576.0 + 0.5).toLong
            b += 1
          }
          val z = zacc.toDouble / 1048576.0
          if (layers.length == 1) z else math.max(z, 0.0)
        }
        // layers 2..L: dense fixed-point matvec; ReLU except on the head
        var l = 1
        while (l < layers.length) {
          val w = layers(l)
          val last = l == layers.length - 1
          h = Array.tabulate(w(0).length) { j =>
            var acc = 0L
            var i = 0
            while (i < w.length) {
              acc += math.floor(w(i)(j) * h(i) * 1048576.0 + 0.5).toLong
              i += 1
            }
            val z = acc.toDouble / 1048576.0
            if (last) z else math.max(z, 0.0)
          }
          l += 1
        }
        h.map(_.toFloat)
      }
      def close(): Unit = ()
    }
  }

  /** Partition-batched inference runner: one [[BatchModel.open]] per
    * non-empty partition, rows scored in `batchSize` micro-batches
    * through the lazy iterator (no partition-wide materialization), the
    * session closed on task completion. This is the `mapInPandas` shape
    * rendered in Scala — the plumbing a real encoder plugs into
    * unchanged. Embarrassingly parallel, no shuffle. */
  def inferFeatures(spark: SparkSession, assets: Dataset[Asset],
                    model: BatchModel, batchSize: Int = 64): Dataset[Feature] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val sess = model.open()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => sess.close()))
        it.grouped(batchSize).flatMap { batch =>
          val arr = batch.toArray
          arr.iterator.zip(sess.embed(arr.map(_.blob)).iterator)
            .map { case (a, v) => Feature(a.doc_id, v) }
        }
      }
    }
  }

  /** STUB feature extraction: the [[StandInModel]] pseudo-embedding run
    * through the real [[inferFeatures]] plumbing ([[imageHistogram]] is
    * the REAL no-model sibling). Output schema matches the `embeddings`
    * table. */
  def extractFeatures(spark: SparkSession, assets: Dataset[Asset],
                      dim: Int = 64): Dataset[Feature] =
    inferFeatures(spark, assets, new StandInModel(dim))
}
