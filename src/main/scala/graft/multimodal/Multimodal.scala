package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder north-star scope; no counterpart in
  * the reference).
  *
  * Media ride as opaque `binary` columns with typed metadata; decode /
  * feature-extract run per-partition in batches (the Scala analog of
  * `mapInPandas`). The decode kernels are STUBS — the real image/audio
  * libraries are not in this container — but the Spark-side contract
  * (schema, batching, partition sizing, deterministic output shape) is
  * real and tested, so swapping a JNI/FFI decoder in changes one function.
  */
object Multimodal {

  /** Canonical media-table schema: content-addressed binary + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("sha256", StringType, nullable = false)
  ))

  /** Derive a media table from any (id, text) source — the test fixture
    * path: bytes are real, only their interpretation is fake.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String,
               mime: String = "application/octet-stream"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mime).as("mime"),
      col(textCol).cast("binary").as("content"))
      .withColumn("n_bytes", octet_length(col("content")).cast("long"))
      .withColumn("sha256", sha2(col("content"), 256))

  final case class MediaFeatures(
      media_id: Long, width: Int, height: Int, n_frames: Int,
      features: Array[Float])

  /** Real image decode via the JDK's built-in codecs (PNG/JPEG/GIF/BMP,
    * `javax.imageio` — no external library): true width/height from the
    * stream header and a deterministic luminance-grid feature vector from
    * the decoded pixels (dim strips, subsampled ≤64 rows/cols per strip so
    * cost is bounded regardless of resolution). Returns None for bytes no
    * JDK reader accepts — the caller falls back to the stub, keeping the
    * pipeline total over mixed/unknown media.
    */
  private[multimodal] def realImageFeatures(
      id: Long, bytes: Array[Byte], dim: Int): Option[MediaFeatures] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val features = Array.tabulate(dim) { i =>
          val x0 = (i.toLong * w / dim).toInt
          val x1 = math.max(((i + 1).toLong * w / dim).toInt, x0 + 1).min(w)
          val sx = math.max((x1 - x0) / 64, 1); val sy = math.max(h / 64, 1)
          var sum = 0.0; var n = 0
          var x = x0
          while (x < x1) {
            var y = 0
            while (y < h) {
              val rgb = img.getRGB(x, y)
              sum += (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0
              n += 1; y += sy
            }
            x += sx
          }
          (sum / math.max(n, 1) / 255.0).toFloat
        }
        Some(MediaFeatures(id, w, h, 1, features))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decode kernel: real JDK image decode when the bytes are a supported
    * format, deterministic stub otherwise (audio/video libs are not in
    * this container; swapping a JNI/FFI decoder in changes this one
    * dispatch).
    */
  private[multimodal] def decode(id: Long, bytes: Array[Byte], dim: Int): MediaFeatures =
    realImageFeatures(id, bytes, dim).getOrElse(decodeStub(id, bytes, dim))

  /** STUB decode kernel — deterministic fake: derives dimensions and a
    * feature vector from the content bytes. Replace with a real decoder
    * (JNI/FFI) without touching the Spark plumbing around it.
    */
  private[multimodal] def decodeStub(id: Long, bytes: Array[Byte], dim: Int): MediaFeatures = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 64 + math.abs(h % 512)
    val height = 64 + math.abs((h >> 9) % 512)
    val nFrames = 1 + math.abs((h >> 18) % 16)
    val features =
      if (bytes.isEmpty) Array.fill(dim)(0.0f)
      else Array.tabulate(dim) { i =>
        // floorMod, not abs%: abs(Int.MinValue) is negative
        val v = bytes(java.lang.Math.floorMod((h + i * 2654435761L).toInt, bytes.length))
        (v.toInt & 0xFF) / 255.0f
      }
    MediaFeatures(id, width, height, nFrames, features)
  }

  /** Batched per-partition decode + feature extraction — the `mapInPandas`
    * shape: one pass per partition, batch-local buffers, fixed-size output
    * vectors. Partition count (not row count) bounds peak memory, so
    * repartition by `n_bytes` budget upstream for huge blobs.
    */
  def extractFeatures(df: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch => // batch shape ≅ pandas record batches
          batch.iterator.map { case (id, bytes) =>
            decode(id, Option(bytes).getOrElse(Array.emptyByteArray), dim)
          }
        }
      }
  }

  /** Minimal RIFF/WAVE container around raw PCM bytes — a spec-conformant
    * WAV file the JDK's `javax.sound` parses back. Used to exercise the
    * REAL audio decode path below without external media libraries: the
    * waveform may be synthetic, the container and decode are not.
    */
  def wavFromPcm(pcm: Array[Byte], sampleRate: Int = 8000,
                 channels: Int = 1, bitsPerSample: Int = 8): Array[Byte] = {
    val byteRate = sampleRate * channels * bitsPerSample / 8
    val blockAlign = channels * bitsPerSample / 8
    // RIFF chunks are word-aligned: an odd-sized data chunk carries one
    // trailing pad byte (not counted in the chunk's own ckSize, counted
    // in the RIFF size)
    val pad = pcm.length & 1
    val bb = java.nio.ByteBuffer.allocate(44 + pcm.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length + pad)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(sampleRate).putInt(byteRate)
      .putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(pcm.length).put(pcm)
    if (pad == 1) bb.put(0.toByte)
    bb.array()
  }

  final case class AudioMeta(media_id: Long, encoding: String,
                             sample_rate: Int, channels: Int,
                             n_frames: Long, duration_s: Double)

  /** Real audio decode via the JDK's `javax.sound` (WAV/AIFF/AU — no
    * external library, header parse only so cost is O(1) per blob):
    * container → encoding, sample rate, channels, frame count, duration.
    * Per-partition like [[extractFeatures]]; emits no row for bytes no
    * installed reader accepts, keeping the pipeline total on mixed media.
    */
  def audioMeta(df: DataFrame): Dataset[AudioMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          try {
            val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = aff.getFormat
            // some containers (AU, streamed input) report NOT_SPECIFIED
            // (-1) for frame length or rate — skip those rows rather than
            // emit a negative duration, matching the "no row for bytes no
            // installed reader accepts" contract
            val notSpec = javax.sound.sampled.AudioSystem.NOT_SPECIFIED
            if (aff.getFrameLength == notSpec || fmt.getSampleRate <= 0f ||
                fmt.getSampleRate == notSpec.toFloat) None
            else Some(AudioMeta(id, fmt.getEncoding.toString,
              fmt.getSampleRate.toInt,
              fmt.getChannels, aff.getFrameLength.toLong,
              aff.getFrameLength.toDouble / fmt.getSampleRate.toDouble))
          } catch { case scala.util.control.NonFatal(_) => None }
        }
      }
  }

  /** Frame-index selection for video-like media: every `stride`-th frame,
    * capped at `maxFrames` — the sampling arithmetic [[sampleFrames]]
    * drives against a real decoder (and an external oracle can replay:
    * indexes are `stride·s` for `s < maxFrames` while `stride·s < nFrames`).
    */
  def sampleFrameIndexes(nFrames: Int, stride: Int, maxFrames: Int): Seq[Int] =
    (0 until nFrames by math.max(stride, 1)).take(maxFrames)

  final case class FrameSample(media_id: Long, n_frames: Int, frame_idx: Int,
                               width: Int, height: Int,
                               mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL frame extraction for motion media through the JDK's multi-frame
    * ImageIO surface (animated GIF is the dependency-free motion format
    * every JDK decodes): per blob, count frames, sample indexes via
    * [[sampleFrameIndexes]], decode ONLY the sampled frames
    * (`reader.read(i)` — the GIF reader seeks; unsampled frames are
    * skipped, which is the point of sampling), and emit per-frame dims +
    * channel means. Same batched per-partition shape as [[resizeImages]]:
    * partition count bounds decoder memory, and bytes no installed reader
    * accepts contribute no rows (media operators are not total maps).
    */
  def sampleFrames(df: DataFrame, stride: Int, maxFrames: Int): Dataset[FrameSample] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          if (bytes == null || bytes.length < 8) Nil
          else try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) { iis.close(); Nil }
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis, false, true)
                val n = reader.getNumImages(true)
                sampleFrameIndexes(n, stride, maxFrames).flatMap { i =>
                  val img = reader.read(i)
                  imageChannelMeans(img).map { case (r, g, b) =>
                    FrameSample(id, n, i, img.getWidth, img.getHeight, r, g, b)
                  }
                }
              } finally { reader.dispose(); iis.close() }
            }
          } catch { case scala.util.control.NonFatal(_) => Nil }
        }
      }
  }

  /** Deterministic animated-GIF builder (test/oracle fixture, mirroring
    * [[solidPng]]): one solid colour per frame, written through the JDK's
    * GIF sequence writer with an EXPLICIT 2-entry palette per frame — an
    * indexed source image means the encoder preserves the colour exactly
    * instead of quantizing to a web-safe palette, so the decoded per-frame
    * channel means are integer formulas an external oracle can replay.
    */
  def animatedGif(frames: Seq[(Int, Int, Int)], w: Int, h: Int): Array[Byte] = {
    require(frames.nonEmpty, "animatedGif: at least one frame")
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { case (r, g, b) =>
        val icm = new java.awt.image.IndexColorModel(8, 2,
          Array(r.toByte, 0.toByte), Array(g.toByte, 0.toByte),
          Array(b.toByte, 0.toByte))
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        // raster defaults to index 0 == the frame colour; no draw needed
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  // ---- Image resize (real decode → scale → re-encode, JDK-only) ----

  final case class Thumb(media_id: Long, width: Int, height: Int,
                         thumb_w: Int, thumb_h: Int, thumb: Array[Byte])

  /** Aspect-preserving target dims, integer arithmetic only (so an
    * external oracle can replay them): `floor(side * maxDim / longSide)`,
    * floored at 1. A no-op (`longSide <= maxDim`) still re-encodes — one
    * code path, deterministic output either way.
    */
  private[multimodal] def thumbDims(w: Int, h: Int, maxDim: Int): (Int, Int) = {
    val mx = math.max(w, h)
    (math.max(1, w * maxDim / mx), math.max(1, h * maxDim / mx))
  }

  /** One-image kernel: decode via ImageIO, scale with bilinear AWT
    * drawImage into TYPE_INT_RGB, re-encode as PNG. None for bytes no JDK
    * reader accepts (caller drops the row — resize is a media operator,
    * not a total map).
    */
  private[multimodal] def resizeImage(id: Long, bytes: Array[Byte],
                                      maxDim: Int): Option[Thumb] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (tw, th) = thumbDims(img.getWidth, img.getHeight, maxDim)
        val out = new java.awt.image.BufferedImage(
          tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, tw, th, null)
        } finally g.dispose()
        val buf = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", buf)
        Some(Thumb(id, img.getWidth, img.getHeight, tw, th, buf.toByteArray))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Batched per-partition resize over a media table — same `mapInPandas`
    * shape as [[extractFeatures]]: partition count bounds memory, rows
    * whose bytes are not decodable images are dropped.
    */
  def resizeImages(df: DataFrame, maxDim: Int): Dataset[Thumb] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          batch.iterator.flatMap { case (id, bytes) => resizeImage(id, bytes, maxDim) }
        }
      }
  }

  // ---- Perceptual hashing (image near-dup dedup) ----

  /** Difference-hash (dHash) of an image: decode, box-average the
    * luminance onto a 9×8 grid, then one bit per horizontally adjacent
    * cell pair — `bit(x,y) = lum(x,y) > lum(x+1,y)`, bit index
    * `y·8 + x`. Resolution-independent by construction (the grid is a
    * fixed 9×8 regardless of input size), which is what makes
    * resized/re-encoded copies collide — the standard perceptual-dedup
    * property (dHash as popularized by Krawetz, "Kind of Like That").
    *
    * Grid cells are the integer boxes `[x·w/9, (x+1)·w/9) ×
    * [y·h/8, (y+1)·h/8)` and the mean comparison is exact rational
    * arithmetic (`sum₁·n₂ > sum₂·n₁` — no float division), so for
    * fixtures whose cells are solid the bits are integer formulas an
    * external oracle replays verbatim (the q_frame_sample pattern).
    * None for bytes no JDK reader accepts.
    */
  def dHash(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < 9 || img.getHeight < 8) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val sums = Array.ofDim[Long](8, 9)
        val cnts = Array.ofDim[Long](8, 9)
        var y = 0
        while (y < 8) {
          val y0 = y * h / 8; val y1 = (y + 1) * h / 8
          var x = 0
          while (x < 9) {
            val x0 = x * w / 9; val x1 = (x + 1) * w / 9
            var s = 0L; var n = 0L
            var px = x0
            while (px < x1) {
              var py = y0
              while (py < y1) {
                val p = img.getRGB(px, py)
                s += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
                n += 1; py += 1
              }
              px += 1
            }
            sums(y)(x) = s; cnts(y)(x) = n
            x += 1
          }
          y += 1
        }
        var bitsAcc = 0L
        y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            // mean(x) > mean(x+1) as exact cross-multiplication
            if (sums(y)(x) * cnts(y)(x + 1) > sums(y)(x + 1) * cnts(y)(x))
              bitsAcc |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        Some(bitsAcc)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-image dHash over a media table — batched per-partition like
    * [[extractFeatures]]; undecodable/too-small bytes contribute no row.
    */
  def imageDHashes(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            dHash(bytes).map(h => (id, h))
          }
        }
      }
      .toDF("media_id", "dhash")
  }

  /** Image near-dup pairs: dHash + the same banded-Hamming bucketing as
    * text SimHash ([[graft.dedup.Dedup.hammingPairs]]) — resized and
    * losslessly re-encoded copies land at distance 0, light edits within
    * `maxHamming`. Never all-pairs: only band-colliding images compare.
    */
  def imageDupPairs(df: DataFrame, maxHamming: Int = 3): DataFrame =
    graft.dedup.Dedup.hammingPairs(imageDHashes(df), "media_id", "dhash", maxHamming)

  /** Block-pattern PNG fixture: a 9×8 grid of solid grayscale cells,
    * `cell` pixels square, cell value `v(x, y)` from the caller —
    * decoded cell means are EXACT (solid cells), so the dHash bits are
    * the caller's formula compared pairwise, independent of `cell`
    * (resolution) and of the lossless container. The image-dedup
    * counterpart of [[solidPng]]/[[animatedGif]].
    */
  def blockPng(cell: Int, v: (Int, Int) => Int, format: String = "png"): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      9 * cell, 8 * cell, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var gx = 0
    while (gx < 9) {
      var gy = 0
      while (gy < 8) {
        val g = v(gx, gy) & 0xFF
        val rgb = (g << 16) | (g << 8) | g
        var x = gx * cell
        while (x < (gx + 1) * cell) {
          var y = gy * cell
          while (y < (gy + 1) * cell) { img.setRGB(x, y, rgb); y += 1 }
          x += 1
        }
        gy += 1
      }
      gx += 1
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, buf)
    buf.toByteArray
  }

  /** Solid-colour PNG builder (test/oracle fixture: every pixel carries
    * the same RGB, so any resize interpolation preserves channel values
    * exactly and an external oracle can predict the decoded means).
    */
  def solidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) { img.setRGB(x, y, rgb); y += 1 }
      x += 1
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  /** Exact per-channel pixel means of a decoded image (doubles; exact
    * integers for solid fixtures). None for undecodable bytes.
    */
  def channelMeans(bytes: Array[Byte]): Option[(Double, Double, Double)] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      imageChannelMeans(img)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** [[channelMeans]] over an already-decoded image (shared with the frame
    * sampler, which decodes frames individually).
    */
  private def imageChannelMeans(
      img: java.awt.image.BufferedImage): Option[(Double, Double, Double)] = {
    if (img.getWidth == 0 || img.getHeight == 0) return None
    var r = 0.0; var g = 0.0; var b = 0.0
    var x = 0
    while (x < img.getWidth) {
      var y = 0
      while (y < img.getHeight) {
        val p = img.getRGB(x, y)
        r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; b += p & 0xFF
        y += 1
      }
      x += 1
    }
    val n = img.getWidth.toDouble * img.getHeight
    Some((r / n, g / n, b / n))
  }
}
