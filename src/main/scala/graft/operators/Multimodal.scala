package graft.operators

import graft.Ckpt._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column plumbing (SURVEY §2): media as opaque `binary`
  * columns with typed metadata alongside. All three decodes are
  * REAL pure-JVM codecs hash-verified against arithmetic oracles —
  * ImageIO over PNG/BMP containers (m02, still images), javax.sound
  * over WAV containers (m07, audio), and ImageIO's GIF codec over
  * animated-GIF containers (m03, the multi-frame/video-style
  * modality) — because the planted pixel/PCM content is a function
  * of doc_id and all four formats are lossless. No stubs remain.
  *
  * At 100 TB the invariants that matter: binary payloads are never
  * parsed by Catalyst (opaque pass-through), per-partition memory is
  * bounded by the decode batch size (not the partition size), and
  * metadata predicates (mime, byte_len) prune before any decode.
  */
object Multimodal {

  private val MagicPng: Array[Byte] = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
  private val MagicJpeg: Array[Byte] = Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)
  private val MagicRiff: Array[Byte] = Array('R'.toByte, 'I'.toByte, 'F'.toByte, 'F'.toByte)

  /** Synthesize a deterministic binary media column from the documents
    * table: 4 magic bytes (cycled by doc_id) + the UTF-8 payload. In a
    * real pipeline this column arrives from the source parquet.
    */
  private[operators] def withBlob(docs: DataFrame): DataFrame =
    docs.withColumn("blob",
      concat(
        element_at(array(lit(MagicPng), lit(MagicJpeg), lit(MagicRiff)),
          (col("doc_id") % 3 + 1).cast("int")),
        col("text").cast("binary")))

  /** m01: magic-number sniffing over the binary column → typed
    * metadata (mime, byte length, payload hash). Pure codegen'd
    * builtins; the blob is never deserialized into the row format
    * more than once. The content hash is over the payload (the bytes
    * after the magic header) so the oracle can recompute it from the
    * source table.
    */
  def m01BinaryMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val head4 = substring(col("blob"), 1, 4)
    withBlob(Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))
      .select(
        col("doc_id"),
        when(head4 === lit(MagicPng), "image/png")
          .when(head4 === lit(MagicJpeg), "image/jpeg")
          .when(head4 === lit(MagicRiff), "audio/wav")
          .otherwise("application/octet-stream").as("mime"),
        length(col("blob")).cast("long").as("byte_len"),
        md5(substring(col("blob"), 5, Int.MaxValue)).as("content_hash"))
      .orderBy(col("doc_id"))
  }

  private val BatchSize = 32

  /** Planted image-modality content — dims and per-channel pixel
    * values are an ARITHMETIC function of doc_id, so the DuckDB
    * oracle recomputes the DECODED statistics without a codec while
    * the engine path runs a real encode → container bytes → real
    * ImageIO decode (PNG and BMP are lossless, so decoded pixels ARE
    * the planted ones and m02 is hash-verified end to end).
    * Modalities: doc_id % 3 == 0 → PNG (RGBA when doc_id % 2 == 0,
    * RGB otherwise — so n_channels is a real decode output, not a
    * constant), doc_id % 3 == 1 → 24-bit BMP; % 3 == 2 rows are the
    * audio ([[m07AudioFeatures]]) and multi-frame
    * ([[m03FrameSample]]) modalities.
    */
  private[graft] def imgWidth(id: Long): Int = (8 + id % 9).toInt
  private[graft] def imgHeight(id: Long): Int = (8 + id % 7).toInt
  private[graft] def imgR(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt
  private[graft] def imgG(id: Long, x: Int, y: Int): Int =
    ((id * 17 + x * 11 + y * 5) % 256).toInt
  private[graft] def imgB(id: Long, x: Int, y: Int): Int =
    ((id * 13 + x * 3 + y * 19) % 256).toInt

  /** Encode doc_id's planted image to real container bytes with the
    * pure-JVM ImageIO writers (reference anchor for the schema:
    * /root/reference/mllib/src/main/scala/org/apache/spark/ml/image/
    * ImageSchema.scala:1, which decodes to (height, width, nChannels,
    * data)). In a production pipeline these bytes arrive in the
    * source parquet; the synthesis stands in for ingestion, the
    * decode below is the operator.
    */
  private[graft] def encodeImage(id: Long): Array[Byte] = {
    import java.awt.image.BufferedImage
    val w = imgWidth(id); val h = imgHeight(id)
    val rgba = id % 3 == 0 && id % 2 == 0
    val img = new BufferedImage(w, h,
      if (rgba) BufferedImage.TYPE_INT_ARGB else BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (0xFF << 24) | (imgR(id, x, y) << 16) |
          (imgG(id, x, y) << 8) | imgB(id, x, y))
        x += 1
      }
      y += 1
    }
    val fmt = if (id % 3 == 0) "png" else "bmp"
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    require(javax.imageio.ImageIO.write(img, fmt, bos),
      s"encodeImage: no JVM writer for $fmt")
    bos.toByteArray
  }

  /** The image-modality blob source: one (doc_id, blob) row per
    * image-modality document, blob a REAL PNG/BMP container.
    */
  private[operators] def withImageBlob(docs: DataFrame): DataFrame = {
    val src = docs.select(col("doc_id")).filter(col("doc_id") % 3 < 2)
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("blob", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    src.mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), encodeImage(r.getLong(0))))
    }(encoder)
  }

  /** Decode real container bytes with pure-JVM ImageIO: sniffed mime
    * (PNG/BMP magic), dimensions, raster band count, and exact
    * per-channel pixel sums — the decode kernel [[m02ImageFeatures]]
    * batches over. Package-private so the spec can pin exact dims and
    * means on hand-planted images.
    */
  private[graft] def decodeImageStats(
      blob: Array[Byte]): (String, Int, Int, Int, Long, Long, Long) = {
    val mime =
      if (blob.length >= 4 && (blob(0) & 0xFF) == 0x89 && blob(1) == 'P'.toByte)
        "image/png"
      else if (blob.length >= 2 && blob(0) == 'B'.toByte && blob(1) == 'M'.toByte)
        "image/bmp"
      else "application/octet-stream"
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    require(img != null, s"decodeImageStats: undecodable payload ($mime)")
    val w = img.getWidth; val h = img.getHeight
    val bands = img.getRaster.getNumBands
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
        x += 1
      }
      y += 1
    }
    (mime, w, h, bands, sr, sg, sb)
  }

  /** m02 core: REAL image decode over the binary column — container
    * bytes in, (mime, width, height, n_channels, channel-mean ticks)
    * out, via pure-JVM ImageIO inside bounded per-partition batches
    * (`grouped(BatchSize)`, the way a codec/model call is batched —
    * memory bounded by batch, not partition). Channel means are exact
    * integer 2¹² ticks ((Σ channel) · 4096 div (w·h), all positive so
    * truncation is floor in both engines). `batch_n` proves the batch
    * shape to the spec and stays spec-only (physical partition
    * boundaries are not oracle-reproducible).
    *
    * Scale shape: metadata-only upstream (the blob is built/read
    * inside the same partition scan, never shuffled); the decode is
    * embarrassingly parallel per partition; output is a narrow typed
    * row per image. At 100 TB the payload column stays opaque to
    * Catalyst and the only data movement is the final orderBy for the
    * gate — a production consumer drops it.
    */
  def m02ImageFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val src = withImageBlob(
      Tables.documents(spark, sfDir).select(col("doc_id")))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("mime", StringType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("n_channels", LongType, nullable = false),
      StructField("mean_r_ticks", LongType, nullable = false),
      StructField("mean_g_ticks", LongType, nullable = false),
      StructField("mean_b_ticks", LongType, nullable = false),
      StructField("batch_n", IntegerType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    src.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val (mime, w, h, bands, sr, sg, sb) =
            decodeImageStats(r.getAs[Array[Byte]](1))
          val n = w.toLong * h
          Row(id, mime, w.toLong, h.toLong, bands.toLong,
            sr * 4096L / n, sg * 4096L / n, sb * 4096L / n, batch.size)
        }
      }
    }(encoder)
      .orderBy(col("doc_id"))
  }

  /** m02 driver-facing output — [[m02ImageFeatures]] minus the
    * spec-only batch column.
    */
  def m02ImageDecode(spark: SparkSession, sfDir: String): DataFrame =
    m02ImageFeatures(spark, sfDir).drop("batch_n")

  /** Planted audio-modality content for [[m07AudioDecode]] — the m02
    * recipe applied to the third modality (doc_id % 3 == 2): sample
    * rate, channel count, frame count, and every 16-bit PCM sample
    * are an arithmetic function of doc_id, encoded into a REAL WAV
    * container with pure-JVM javax.sound.sampled and decoded back
    * with the same — WAV PCM is lossless, so the decode is
    * hash-verified end to end against an arithmetic oracle.
    */
  private[graft] def wavRate(id: Long): Int =
    // audio ids are ≡ 2 (mod 3), so (id % 9) / 3 cycles 0,1,2 across them
    Array(8000, 11025, 16000)(((id % 9) / 3).toInt)
  private[graft] def wavChannels(id: Long): Int = (1 + id % 2).toInt
  private[graft] def wavFrames(id: Long): Int = (64 + id % 65).toInt
  private[graft] def wavSample(id: Long, c: Int, i: Int): Int =
    (((id * 7919 + c * 104729 + i.toLong * 31) % 65536) - 32768).toInt

  /** Encode doc_id's planted PCM signal to real WAV container bytes
    * (16-bit signed little-endian, [[wavChannels]] interleaved).
    */
  private[graft] def encodeWav(id: Long): Array[Byte] = {
    import javax.sound.sampled._
    val ch = wavChannels(id); val n = wavFrames(id); val rate = wavRate(id)
    val pcm = new Array[Byte](n * ch * 2)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < ch) {
        val s = wavSample(id, c, i)
        val off = (i * ch + c) * 2
        pcm(off) = (s & 0xFF).toByte
        pcm(off + 1) = ((s >> 8) & 0xFF).toByte
        c += 1
      }
      i += 1
    }
    val fmt = new AudioFormat(rate.toFloat, 16, ch, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode real WAV container bytes with pure-JVM javax.sound:
    * sniffed mime (RIFF/WAVE magic), format header (rate, channels),
    * frame count, and exact per-channel 16-bit sample sums (first
    * two channels; channel 1 reads 0 for mono). No division anywhere
    * — sums are the report, so sign-sensitive div semantics never
    * enter the cross-engine contract.
    */
  private[graft] def decodeWavStats(
      blob: Array[Byte]): (String, Long, Long, Long, Long, Long) = {
    import javax.sound.sampled.AudioSystem
    val mime =
      if (blob.length >= 12 && blob(0) == 'R'.toByte && blob(1) == 'I'.toByte &&
        blob(8) == 'W'.toByte && blob(9) == 'A'.toByte) "audio/wav"
      else "application/octet-stream"
    val ais = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(blob))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
      s"decodeWavStats: unexpected PCM layout $fmt")
    val ch = fmt.getChannels
    val bytes = ais.readAllBytes()
    val n = bytes.length / (ch * 2)
    var s0 = 0L; var s1 = 0L
    var i = 0
    while (i < n) {
      var c = 0
      while (c < ch) {
        val off = (i * ch + c) * 2
        val v = ((bytes(off) & 0xFF) | (bytes(off + 1) << 8)).toShort.toLong
        if (c == 0) s0 += v else if (c == 1) s1 += v
        c += 1
      }
      i += 1
    }
    (mime, fmt.getSampleRate.toLong, ch.toLong, n.toLong, s0, s1)
  }

  /** m07: REAL audio decode over the binary column — WAV container
    * bytes in, (mime, sample_rate, channels, n_frames, exact
    * per-channel sample sums) out, via pure-JVM javax.sound inside
    * the same bounded per-partition batches as [[m02ImageFeatures]].
    * Completes the modality set: m02 decodes the image rows, m07 the
    * audio rows, m03's video-style frame sampler remains the one
    * declared stub (no video codec exists in any pure JVM).
    *
    * Scale shape: identical to m02 — blob built/read inside the
    * partition scan, embarrassingly parallel decode, narrow typed
    * output row, orderBy only for the gate.
    */
  def m07AudioFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.documents(spark, sfDir).select(col("doc_id"))
      .filter(col("doc_id") % 3 === 2)
    val blobSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("blob", BinaryType, nullable = false)))
    val blobEnc = org.apache.spark.sql.Encoders.row(blobSchema)
    val blobs = src.mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), encodeWav(r.getLong(0))))
    }(blobEnc)
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("mime", StringType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("channels", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("sum_ch0", LongType, nullable = false),
      StructField("sum_ch1", LongType, nullable = false),
      StructField("batch_n", IntegerType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    blobs.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val (mime, rate, ch, n, s0, s1) =
            decodeWavStats(r.getAs[Array[Byte]](1))
          Row(id, mime, rate, ch, n, s0, s1, batch.size)
        }
      }
    }(encoder)
      .orderBy(col("doc_id"))
  }

  /** m07 driver-facing output — [[m07AudioFeatures]] minus the
    * spec-only batch column.
    */
  def m07AudioDecode(spark: SparkSession, sfDir: String): DataFrame =
    m07AudioFeatures(spark, sfDir).drop("batch_n")

  private val FrameStride = 16

  /** m06's fingerprint generator: one input blob row fans out to one
    * digest row per fixed [[FrameStride]]-byte payload window — the
    * chunk-hash fingerprint content-ID systems use when frames are
    * unavailable or decode is too expensive. Fan-out happens inside
    * `mapPartitions` with memory bounded per input row (windows
    * stream out of an iterator, never a per-partition buffer), and
    * payload size prunes BEFORE the fan-out. Digest is md5 over the
    * UPPERCASE-hex rendering of the window bytes so a SQL oracle
    * (which cannot md5 raw blobs) reproduces it via
    * md5(substr(hex(payload), 32f+1, 32)). (Until round 14 this was
    * also m03's output; m03 is now a real multi-frame decode —
    * [[m03FrameSample]].)
    */
  private[graft] def byteWindowFingerprints(
      spark: SparkSession, sfDir: String): DataFrame = {
    val src = withBlob(Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("blob"))
      .filter((col("doc_id") % 3) === 2 && length(col("blob")) > lit(4 + FrameStride))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_offset", LongType, nullable = false),
      StructField("frame_digest", StringType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    src.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val id = r.getLong(0)
        val blob = r.getAs[Array[Byte]](1)
        val payloadLen = blob.length - 4
        Iterator.range(0, payloadLen / FrameStride).map { f =>
          val off = 4 + f * FrameStride
          val hexFrame = blob.slice(off, off + FrameStride).map("%02X".format(_)).mkString
          md.reset()
          val digest = md.digest(hexFrame.getBytes("UTF-8")).map("%02x".format(_)).mkString
          Row(id, f, off.toLong, digest)
        }
      }
    }(encoder)
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Planted video-style content for [[m03FrameSample]] — the m02/m07
    * recipe applied to the multi-frame modality (doc_id % 3 == 2):
    * frame count, dims, and every grayscale pixel of every frame are
    * an arithmetic function of doc_id, encoded into a REAL animated
    * GIF container with pure-JVM javax.imageio and decoded back with
    * the same. GIF with an explicit 256-entry grayscale palette is
    * lossless (each 8-bit sample IS its palette index), so the decode
    * is hash-verified end to end against an arithmetic oracle —
    * retiring the suite's last declared stub.
    */
  private[graft] def gifFrames(id: Long): Int = (3 + id % 5).toInt
  private[graft] def gifWidth(id: Long): Int = (8 + id % 6).toInt
  private[graft] def gifHeight(id: Long): Int = (6 + id % 5).toInt
  private[graft] def gifPix(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31 + f * 97L + x * 7L + y * 13L) % 256).toInt

  /** Every [[GifFrameStride]]-th frame is a sampled "keyframe". */
  private[graft] val GifFrameStride = 2

  /** Encode doc_id's planted frames to real animated-GIF container
    * bytes (one writeToSequence image per frame, indexed on an
    * explicit 256-gray palette so encoding is exact).
    */
  private[graft] def encodeGif(id: Long): Array[Byte] = {
    import java.awt.image.{BufferedImage, IndexColorModel}
    import javax.imageio.{IIOImage, ImageIO}
    val grays = Array.tabulate(256)(_.toByte)
    val icm = new IndexColorModel(8, 256, grays, grays, grays)
    val w = gifWidth(id); val h = gifHeight(id); val nf = gifFrames(id)
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.setUseCache(false)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nf) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.getRaster.setSample(x, y, 0, gifPix(id, f, x, y))
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Decode real animated-GIF container bytes with pure-JVM ImageIO
    * and stride-sample the frames: sniffed mime (GIF8 magic), total
    * frame count, dims, and for every [[GifFrameStride]]-th frame the
    * exact grayscale pixel sum. Only sampled frames are rasterized —
    * the keyframe-extraction economics this operator models (skipped
    * frames cost a header seek, not a decode).
    */
  private[graft] def decodeGifFrames(
      blob: Array[Byte]): (String, Int, Int, Int, Seq[(Int, Long)]) = {
    import javax.imageio.ImageIO
    val mime =
      if (blob.length >= 4 && blob(0) == 'G'.toByte && blob(1) == 'I'.toByte &&
        blob(2) == 'F'.toByte && blob(3) == '8'.toByte) "image/gif"
      else "application/octet-stream"
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(blob))
    try {
      reader.setInput(iis)
      val nf = reader.getNumImages(true)
      require(nf > 0, s"decodeGifFrames: no frames ($mime)")
      var out = List.newBuilder[(Int, Long)]
      var w = 0; var h = 0
      var f = 0
      while (f < nf) {
        val img = reader.read(f)
        w = img.getWidth; h = img.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += (img.getRGB(x, y) & 0xFF); x += 1 }
          y += 1
        }
        out += ((f, sum))
        f += GifFrameStride
      }
      (mime, nf, w, h, out.result())
    } finally { reader.dispose(); iis.close() }
  }

  /** m03: REAL multi-frame decode + keyframe sampling over the binary
    * column — animated-GIF container bytes in, one row per SAMPLED
    * frame out (mime, frame_idx, n_frames, dims, exact grayscale
    * pixel sum), via pure-JVM ImageIO inside the same bounded
    * per-partition batches as [[m02ImageFeatures]]. Completes the
    * modality set for real: m02 decodes still images, m07 audio, m03
    * the multi-frame (video-style) rows — no stubs remain. Sums, not
    * means — no division enters the cross-engine contract (the m07
    * posture).
    *
    * Scale shape: blob built/read inside the partition scan (never
    * shuffled), modality predicate prunes before any encode/decode,
    * fan-out streams one sampled frame row at a time (memory bounded
    * by ONE decoded frame, not the container), skipped frames are
    * never rasterized, orderBy only for the gate.
    */
  def m03FrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.documents(spark, sfDir).select(col("doc_id"))
      .filter(col("doc_id") % 3 === 2)
    val blobSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("blob", BinaryType, nullable = false)))
    val blobEnc = org.apache.spark.sql.Encoders.row(blobSchema)
    val blobs = src.mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), encodeGif(r.getLong(0))))
    }(blobEnc)
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("mime", StringType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("pixel_sum", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    blobs.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val id = r.getLong(0)
          val (mime, nf, w, h, frames) = decodeGifFrames(r.getAs[Array[Byte]](1))
          frames.iterator.map { case (f, sum) =>
            Row(id, mime, f, nf.toLong, w.toLong, h.toLong, sum)
          }
        }
      }
    }(encoder)
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** m04: multimodal training-sample assembly — the step that turns
    * per-modality tables into ONE row per trainable sample: media
    * metadata (m01's sniffed mime + payload size), the paired text
    * (token count), the paired embedding's label, and a deterministic
    * split assignment (p01's md5 rule), restricted to the image
    * modality. A sample exists only when EVERY modality is present
    * (inner joins) — half-assembled samples are a training-loader
    * crash, not a row.
    *
    * Scale shape: the modality filter (mime) prunes on metadata
    * BEFORE any join touches payloads; the joins are equi-joins on
    * doc_id — at 100 TB both sides are large, so this is the
    * canonical co-shuffle (or zero-exchange if the modality tables
    * are bucketed by doc_id — `Sources.writeBucketedTable`); the
    * split column is a pure per-row hash, no extra pass. Binary
    * payloads are NOT carried through the assembly — the sample row
    * references content by hash; the loader fetches payloads by key.
    */
  def m04SampleAssembly(spark: SparkSession, sfDir: String): DataFrame = {
    val meta = m01BinaryMeta(spark, sfDir)
      .filter(col("mime").startsWith("image/"))
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tokens"))
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("doc_id"), col("label").as("embed_label"))
    meta.join(docs, "doc_id").join(emb, "doc_id")
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 100)
      .withColumn("split",
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("mime"), col("byte_len"), col("content_hash"),
        col("n_tokens"), col("source"), col("embed_label"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** m05: blob-integrity quarantine — the validation gate every media
    * pipeline runs BEFORE the expensive decode stage: sniff the real
    * magic bytes, reconcile them and the actual byte length against
    * the DECLARED metadata that arrived with the upload, and label
    * each row ok / mime_mismatch / len_mismatch / mime+len.
    * Downstream decode (m02) reads `status = 'ok'` only, so a
    * mislabeled or truncated blob costs 4 sniffed bytes plus one
    * length compare — never a codec call, the whole point at 100 TB.
    *
    * Declared metadata is synthesized deterministically from doc_id
    * (% 7 == 3 mislabels the mime as png — a mismatch whenever the
    * true modality isn't png; % 11 == 5 over-declares the length by
    * 17 — a truncated upload), and INDEPENDENTLY of the blob checks:
    * declared_len derives from the text column, actual_len from the
    * blob bytes; declared_mime from doc_id arithmetic, sniffed_mime
    * from the real head bytes. The oracle recomputes the expected
    * verdicts arithmetically, so a broken sniffer or length check
    * hash-fails the gate.
    */
  /** Per-digest fan-out cap for [[m06MediaNearDup]]: a frame digest
    * held by more than this many media files is dropped before
    * pairing (the [[Dedup.bucketPairs]] tier-2 recall trade — at
    * 100 TB a constant black-frame or silence digest would otherwise
    * emit C(n,2) pairs from one key). Must NOT bind at test SFs
    * (spec'd; observed max is 3 docs per digest at sf0.01).
    */
  private[graft] val MediaBucketCap = 1024

  /** m06 near-dup threshold as an integer predicate:
    * 10·|shared| ≥ 3·|union| (frame-set Jaccard ≥ 0.3) — the cut
    * compares exact longs, so cross-engine double rounding can never
    * move a borderline pair; the rounded jaccard column is display
    * only. 0.3 sits an order of magnitude above the chance
    * single-window collision level (~0.03–0.08 observed) and well
    * below true re-encodes (≥ 0.97 observed).
    */
  private[graft] val NearDupNum = 3
  private[graft] val NearDupDen = 10

  /** m06: media near-duplicate detection by shared fingerprints —
    * the video/audio dedup step of a multimodal training pipeline
    * (two files are near-dups when their fingerprint SETS overlap,
    * the standard content-ID shape; the fingerprints are
    * [[byteWindowFingerprints]]'s payload chunk hashes — the
    * decode-free variant content-ID systems run at ingest, where
    * decoding every candidate is unaffordable). Distinct (doc,
    * digest) first —
    * a digest repeated WITHIN one file counts once, so repetitive
    * content can't inflate its own similarity. Output one row per
    * qualifying pair: (doc_a, doc_b, frames_a, frames_b,
    * shared_frames, jaccard), Jaccard over digest sets ≥ 0.3 via the
    * integer predicate [[NearDupNum]]/[[NearDupDen]].
    *
    * Scale shape: the candidate generator is an equi-join on
    * frame_digest (never all-pairs) — digests group map-side, buckets
    * over [[MediaBucketCap]] are dropped before any pair explodes,
    * and each surviving bucket emits its pairs from ONE sorted
    * collect_set row (the bucketPairs small-bucket shape). Per-file
    * frame counts come from the same distinct frame frame — one extra
    * partial-agg'd pass, no second fan-out.
    */
  def m06MediaNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val frames = byteWindowFingerprints(spark, sfDir)
      .select(col("doc_id"), col("frame_digest")).distinct()
      .ckpt(true)
    val nf = frames.groupBy(col("doc_id")).agg(count(lit(1)).as("nf"))
    val pairs = frames.groupBy(col("frame_digest"))
      .agg(array_sort(collect_set(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) >= 2 && size(col("docs")) <= MediaBucketCap)
      .select(explode(flatten(transform(col("docs"), (x, i) =>
        transform(slice(col("docs"), i + lit(2), size(col("docs"))), y =>
          struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .agg(count(lit(1)).as("shared_frames"))
    pairs
      .join(nf.select(col("doc_id").as("doc_a"), col("nf").as("frames_a")), "doc_a")
      .join(nf.select(col("doc_id").as("doc_b"), col("nf").as("frames_b")), "doc_b")
      .filter(lit(NearDupDen) * col("shared_frames") >=
        lit(NearDupNum) * (col("frames_a") + col("frames_b") - col("shared_frames")))
      .select(col("doc_a"), col("doc_b"), col("frames_a"), col("frames_b"),
        col("shared_frames"),
        round(col("shared_frames").cast("double") /
          (col("frames_a") + col("frames_b") - col("shared_frames")), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def m05Integrity(spark: SparkSession, sfDir: String): DataFrame = {
    val head4 = substring(col("blob"), 1, 4)
    val sniffed = when(head4 === lit(MagicPng), "image/png")
      .when(head4 === lit(MagicJpeg), "image/jpeg")
      .when(head4 === lit(MagicRiff), "audio/wav")
      .otherwise("application/octet-stream")
    val trueMime = element_at(
      array(lit("image/png"), lit("image/jpeg"), lit("audio/wav")),
      (col("doc_id") % 3 + 1).cast("int"))
    withBlob(Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))
      .withColumn("sniffed_mime", sniffed)
      .withColumn("declared_mime",
        when(col("doc_id") % 7 === 3, lit("image/png")).otherwise(trueMime))
      .withColumn("actual_len", length(col("blob")).cast("long"))
      .withColumn("declared_len",
        (octet_length(col("text")) + 4).cast("long") +
          when(col("doc_id") % 11 === 5, 17L).otherwise(0L))
      .withColumn("status",
        when(col("sniffed_mime") === col("declared_mime") &&
          col("actual_len") === col("declared_len"), "ok")
          .when(col("sniffed_mime") =!= col("declared_mime") &&
            col("actual_len") =!= col("declared_len"), "mime+len")
          .when(col("sniffed_mime") =!= col("declared_mime"), "mime_mismatch")
          .otherwise("len_mismatch"))
      .select(col("doc_id"), col("declared_mime"), col("sniffed_mime"),
        col("declared_len"), col("actual_len"), col("status"))
      .orderBy(col("doc_id"))
  }
}
