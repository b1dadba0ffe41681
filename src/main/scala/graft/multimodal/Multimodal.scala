package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder north-star scope; no counterpart in
  * the reference).
  *
  * Media ride as opaque `binary` columns with typed metadata; decode /
  * feature-extract run per-partition in batches (the Scala analog of
  * `mapInPandas`). The decode kernels are REAL where the JVM can decode:
  * JDK ImageIO for images (+ bilinear resize, dHash perceptual dedup),
  * WAV/AIFF header+sample parsing for audio, a from-spec ISO-BMFF box
  * walk for video metadata, animated-GIF and MJPEG-in-MP4 frame sampling.
  * Codec-bearing payloads the JVM cannot decode offline (H.264/HEVC frame
  * pixels) take the documented fallback contract instead: metadata is
  * still parsed, decode emits a loud no-row rather than fake pixels —
  * swapping a JNI/FFI decoder in changes that one function.
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

  // ---- ISO-BMFF (MP4/MOV/M4A) container metadata — from-spec box walk
  // (public ISO/IEC 14496-12 layout; no media library). Header parse
  // only: O(header bytes) per blob regardless of mdat size, the same
  // cost shape as [[audioMeta]]'s javax.sound header probe. ----

  final case class VideoMeta(media_id: Long, major_brand: String,
                             duration_s: Double, n_tracks: Int,
                             video_codec: String, width: Int, height: Int,
                             n_samples: Long, frame_rate: Double)

  /** Parse one ISO-BMFF blob's metadata: `ftyp` major brand, `mvhd`
    * movie duration, per-track `tkhd`/`mdhd`/`hdlr`/`stsd`/`stts` —
    * versions 0 AND 1 (64-bit times) of the timed boxes, 64-bit
    * `largesize` and to-EOF (`size == 0`) boxes included. Returns None
    * when the bytes are not a BMFF container (no `ftyp`/`moov`), keeping
    * [[videoMeta]] total over mixed media.
    */
  private[multimodal] def parseBmff(id: Long, bytes: Array[Byte]): Option[VideoMeta] = {
    if (bytes == null || bytes.length < 16) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
    def fourcc(i: Int): String =
      new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // walk the box sequence in [from, to); invoke f(type, bodyFrom, bodyTo)
    def walk(from: Int, to: Int)(f: (String, Int, Int) => Unit): Unit = {
      var p = from
      while (p + 8 <= to) {
        val size32 = bb.getInt(p).toLong & 0xFFFFFFFFL
        val typ = fourcc(p + 4)
        val (body, end) =
          if (size32 == 1L) {
            val large = bb.getLong(p + 8)
            (p + 16, p + large)
          } else if (size32 == 0L) (p + 8, to.toLong) // box extends to EOF
          else (p + 8, p + size32)
        if (end < body || end > to) return // malformed length: stop loudly-silent
        f(typ, body, end.toInt)
        p = end.toInt
      }
    }
    var brand: String = null
    var movieDur = 0.0
    var nTracks = 0
    var vCodec = ""; var vW = 0; var vH = 0
    var vSamples = 0L; var vRate = 0.0
    def parseTrak(from: Int, to: Int): Unit = {
      nTracks += 1
      var handler = ""
      var w = 0; var h = 0
      var mediaTs = 0L
      var codec = ""; var samples = 0L; var sampleDur = 0L
      def parseStbl(f2: Int, t2: Int): Unit = walk(f2, t2) {
        case ("stsd", b2, _) =>
          if (bb.getInt(b2 + 4) > 0) codec = fourcc(b2 + 12)
        case ("stts", b2, _) =>
          val n = bb.getInt(b2 + 4)
          var i = 0
          while (i < n) {
            val c = bb.getInt(b2 + 8 + i * 8).toLong & 0xFFFFFFFFL
            val d = bb.getInt(b2 + 12 + i * 8).toLong & 0xFFFFFFFFL
            samples += c; sampleDur += c * d
            i += 1
          }
        case _ => ()
      }
      walk(from, to) {
        case ("tkhd", b2, _) =>
          val v = bytes(b2) & 0xFF
          val o = b2 + (if (v == 1) 4 + 8 + 8 + 4 + 4 + 8 else 4 + 4 + 4 + 4 + 4 + 4)
          // reserved(8) layer(2) alt(2) volume(2) reserved(2) matrix(36)
          val wh = o + 8 + 2 + 2 + 2 + 2 + 36
          w = bb.getInt(wh) >>> 16 // 16.16 fixed point
          h = bb.getInt(wh + 4) >>> 16
        case ("mdia", b2, t2) => walk(b2, t2) {
          case ("mdhd", b3, _) =>
            val v = bytes(b3) & 0xFF
            mediaTs =
              if (v == 1) bb.getInt(b3 + 4 + 8 + 8).toLong & 0xFFFFFFFFL
              else bb.getInt(b3 + 4 + 4 + 4).toLong & 0xFFFFFFFFL
          case ("hdlr", b3, _) => handler = fourcc(b3 + 8)
          case ("minf", b3, t3) => walk(b3, t3) {
            case ("stbl", b4, t4) => parseStbl(b4, t4)
            case _ => ()
          }
          case _ => ()
        }
        case _ => ()
      }
      if (handler == "vide" && vCodec.isEmpty) {
        vCodec = codec; vW = w; vH = h; vSamples = samples
        if (sampleDur > 0 && mediaTs > 0)
          vRate = samples.toDouble * mediaTs / sampleDur
      }
    }
    walk(0, bytes.length) {
      case ("ftyp", b2, _) => brand = fourcc(b2)
      case ("moov", b2, t2) => walk(b2, t2) {
        case ("mvhd", b3, _) =>
          val v = bytes(b3) & 0xFF
          val (ts, dur) =
            if (v == 1) (bb.getInt(b3 + 4 + 8 + 8).toLong & 0xFFFFFFFFL,
              bb.getLong(b3 + 4 + 8 + 8 + 4))
            else (bb.getInt(b3 + 4 + 4 + 4).toLong & 0xFFFFFFFFL,
              bb.getInt(b3 + 4 + 4 + 4 + 4).toLong & 0xFFFFFFFFL)
          if (ts > 0) movieDur = dur.toDouble / ts
        case ("trak", b3, t3) => parseTrak(b3, t3)
        case _ => ()
      }
      case _ => ()
    }
    if (brand == null || nTracks == 0) None
    else Some(VideoMeta(id, brand, movieDur, nTracks, vCodec, vW, vH,
      vSamples, vRate))
  }

  /** Distributed BMFF metadata extraction over a (media_id, content)
    * frame — per-partition like [[audioMeta]]; emits no row for non-BMFF
    * bytes.
    */
  def videoMeta(df: DataFrame): Dataset[VideoMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        try parseBmff(id, bytes)
        catch { case scala.util.control.NonFatal(_) => None }
      })
  }

  private def bmffBox(typ: String, body: Array[Byte]*): Array[Byte] = {
    val len = 8 + body.map(_.length).sum
    val bb = java.nio.ByteBuffer.allocate(len).order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(len).put(typ.getBytes("US-ASCII"))
    body.foreach(bb.put)
    bb.array()
  }

  private def be32(vs: Int*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(vs.length * 4)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    vs.foreach(bb.putInt)
    bb.array()
  }

  private def visualSampleEntry(codec: String, width: Int, height: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(86).order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(86).put(codec.getBytes("US-ASCII"))
    bb.put(new Array[Byte](6)).putShort(1) // reserved, data-ref index
    bb.putShort(0).putShort(0).put(new Array[Byte](12)) // pre_defined/reserved
    bb.putShort(width.toShort).putShort(height.toShort)
    bb.putInt(0x00480000).putInt(0x00480000).putInt(0) // 72 dpi, reserved
    bb.putShort(1).put(new Array[Byte](32)) // frame count, compressor name
    bb.putShort(0x18).putShort(-1) // depth, pre_defined
    bb.array()
  }

  /** Minimal spec-conformant MP4: `ftyp` + `mdat` + `moov` with one video
    * track (`mvhd`/`tkhd`/`mdhd`/`hdlr`/`vmhd`/`dref`/full sample table),
    * movie timescale = `fps` so `duration_s = nFrames/fps` is exact IEEE
    * division on any replayer. The [[wavFromPcm]] analog for video: the
    * payload is synthetic (no codec-config child, so not decodable), the
    * CONTAINER and its parse are real. For REAL frame payloads see
    * [[mjpegMp4]].
    */
  def mp4(width: Int, height: Int, nFrames: Int, fps: Int,
          codec: String = "avc1", sampleBytes: Int = 16): Array[Byte] = {
    require(nFrames > 0 && fps > 0 && codec.length == 4)
    val matrix = be32(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    val ftyp = bmffBox("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isommp41".getBytes("US-ASCII"))
    val mdat = bmffBox("mdat", Array.tabulate(nFrames * sampleBytes)(i => (i % 251).toByte))
    val mvhd = bmffBox("mvhd", be32(0, 0, 0, fps, nFrames, 0x10000),
      Array[Byte](1, 0, 0, 0), be32(0, 0), matrix, be32(0, 0, 0, 0, 0, 0), be32(2))
    val tkhd = bmffBox("tkhd", be32(7, 0, 0, 1, 0, nFrames), be32(0, 0),
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 0), matrix,
      be32(width << 16, height << 16))
    val mdhd = bmffBox("mdhd", be32(0, 0, 0, fps, nFrames),
      Array[Byte](0x55, 0xC4.toByte, 0, 0))
    val hdlr = bmffBox("hdlr", be32(0, 0), "vide".getBytes("US-ASCII"),
      be32(0, 0, 0), "VideoHandler".getBytes("US-ASCII"), Array[Byte](0))
    val vmhd = bmffBox("vmhd", be32(1), Array[Byte](0, 0, 0, 0, 0, 0, 0, 0))
    val dref = bmffBox("dinf", bmffBox("dref", be32(0, 1), bmffBox("url ", be32(1))))
    val stbl = bmffBox("stbl",
      bmffBox("stsd", be32(0, 1), visualSampleEntry(codec, width, height)),
      bmffBox("stts", be32(0, 1, nFrames, 1)),
      bmffBox("stsc", be32(0, 1, 1, nFrames, 1)),
      bmffBox("stsz", be32(0, sampleBytes, nFrames)),
      bmffBox("stco", be32(0, 1, ftyp.length + 8)))
    val minf = bmffBox("minf", vmhd, dref, stbl)
    val mdia = bmffBox("mdia", mdhd, hdlr, minf)
    val trak = bmffBox("trak", tkhd, mdia)
    val moov = bmffBox("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }

  /** One solid NEUTRAL-gray JPEG (r = g = b = `gray`, stored as RGB) at
    * encoder quality 1.0. Exactness argument, verified for all 256
    * values in MultimodalSpec: with r = g = b the YCbCr transform is
    * exactly neutral (Y = v, Cb = Cr = 128 — the chroma differences
    * vanish, so their rounding does too), constant planes survive
    * subsampling, quality 1.0 collapses the quantization tables to
    * all-ones so the DC-only blocks round-trip the DCT, and the inverse
    * transform adds only zero chroma terms — decoded channel means stay
    * integer formulas an external oracle can replay, like
    * [[solidPng]]/[[animatedGif]]. (A TYPE_BYTE_GRAY source would NOT
    * work: AWT's gray↔sRGB conversions are asymmetric, shifting solid
    * values.)
    */
  def jpegGray(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    try {
      g2.setColor(new java.awt.Color(gray, gray, gray))
      g2.fillRect(0, 0, w, h)
    } finally g2.dispose()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(1.0f)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Motion-JPEG in MP4: real JPEG images as the track samples (fourcc
    * `jpeg`, the registered Motion-JPEG VisualSampleEntry), variable
    * per-sample sizes in the `stsz` table, one chunk. THIS one decodes
    * offline — JPEG is the one video sample format a from-scratch JVM
    * engine can honestly decode (ImageIO), which is why
    * [[sampleMp4Frames]] supports exactly it and leaves H.264/H.265
    * bitstreams as a loud no-row outcome.
    */
  def mjpegMp4(width: Int, height: Int, fps: Int,
               frameGrays: Seq[Int]): Array[Byte] = {
    require(frameGrays.nonEmpty && fps > 0)
    val nFrames = frameGrays.length
    val frames = frameGrays.map(g => jpegGray(width, height, g))
    val matrix = be32(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    val ftyp = bmffBox("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isommp41".getBytes("US-ASCII"))
    val mdat = bmffBox("mdat", frames: _*)
    val mvhd = bmffBox("mvhd", be32(0, 0, 0, fps, nFrames, 0x10000),
      Array[Byte](1, 0, 0, 0), be32(0, 0), matrix, be32(0, 0, 0, 0, 0, 0), be32(2))
    val tkhd = bmffBox("tkhd", be32(7, 0, 0, 1, 0, nFrames), be32(0, 0),
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 0), matrix,
      be32(width << 16, height << 16))
    val mdhd = bmffBox("mdhd", be32(0, 0, 0, fps, nFrames),
      Array[Byte](0x55, 0xC4.toByte, 0, 0))
    val hdlr = bmffBox("hdlr", be32(0, 0), "vide".getBytes("US-ASCII"),
      be32(0, 0, 0), "VideoHandler".getBytes("US-ASCII"), Array[Byte](0))
    val vmhd = bmffBox("vmhd", be32(1), Array[Byte](0, 0, 0, 0, 0, 0, 0, 0))
    val dref = bmffBox("dinf", bmffBox("dref", be32(0, 1), bmffBox("url ", be32(1))))
    val stbl = bmffBox("stbl",
      bmffBox("stsd", be32(0, 1), visualSampleEntry("jpeg", width, height)),
      bmffBox("stts", be32(0, 1, nFrames, 1)),
      bmffBox("stsc", be32(0, 1, 1, nFrames, 1)),
      bmffBox("stsz", be32((Seq(0, 0, nFrames) ++ frames.map(_.length)): _*)),
      bmffBox("stco", be32(0, 1, ftyp.length + 8)))
    val minf = bmffBox("minf", vmhd, dref, stbl)
    val mdia = bmffBox("mdia", mdhd, hdlr, minf)
    val trak = bmffBox("trak", tkhd, mdia)
    val moov = bmffBox("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }

  /** Resolve the video track's SAMPLE LAYOUT from the container: codec
    * fourcc + per-sample (file offset, byte size), via `stsz` (uniform or
    * table) × `stsc` chunk runs × `stco`/`co64` chunk offsets — the full
    * ISO/IEC 14496-12 sample-location algorithm, not a fixed-layout
    * shortcut. None when the blob is not BMFF or carries no complete
    * video sample table.
    */
  private[multimodal] def bmffVideoSamples(
      bytes: Array[Byte]): Option[(String, IndexedSeq[(Long, Int)])] = {
    if (bytes == null || bytes.length < 16) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
    def fourcc(i: Int): String =
      new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def walk(from: Int, to: Int)(f: (String, Int, Int) => Unit): Unit = {
      var p = from
      while (p + 8 <= to) {
        val size32 = bb.getInt(p).toLong & 0xFFFFFFFFL
        val typ = fourcc(p + 4)
        val (body, end) =
          if (size32 == 1L) (p + 16, p + bb.getLong(p + 8))
          else if (size32 == 0L) (p + 8, to.toLong)
          else (p + 8, p + size32)
        if (end < body || end > to) return
        f(typ, body, end.toInt)
        p = end.toInt
      }
    }
    var found: Option[(String, IndexedSeq[(Long, Int)])] = None
    walk(0, bytes.length) {
      case ("moov", b, t) => walk(b, t) {
        case ("trak", b2, t2) if found.isEmpty =>
          var handler = ""; var codec = ""
          var sizes: IndexedSeq[Int] = IndexedSeq.empty
          var chunkOffs: IndexedSeq[Long] = IndexedSeq.empty
          var runs: IndexedSeq[(Int, Int)] = IndexedSeq.empty
          walk(b2, t2) {
            case ("mdia", b3, t3) => walk(b3, t3) {
              case ("hdlr", b4, _) => handler = fourcc(b4 + 8)
              case ("minf", b4, t4) => walk(b4, t4) {
                case ("stbl", b5, t5) => walk(b5, t5) {
                  case ("stsd", b6, _) =>
                    if (bb.getInt(b6 + 4) > 0) codec = fourcc(b6 + 12)
                  case ("stsz", b6, _) =>
                    val uniform = bb.getInt(b6 + 4)
                    val n = bb.getInt(b6 + 8)
                    sizes =
                      if (uniform != 0) IndexedSeq.fill(n)(uniform)
                      else (0 until n).map(i => bb.getInt(b6 + 12 + i * 4))
                  case ("stsc", b6, _) =>
                    val n = bb.getInt(b6 + 4)
                    runs = (0 until n).map(i =>
                      (bb.getInt(b6 + 8 + i * 12), bb.getInt(b6 + 12 + i * 12)))
                  case ("stco", b6, _) =>
                    val n = bb.getInt(b6 + 4)
                    chunkOffs = (0 until n).map(i =>
                      bb.getInt(b6 + 8 + i * 4).toLong & 0xFFFFFFFFL)
                  case ("co64", b6, _) =>
                    val n = bb.getInt(b6 + 4)
                    chunkOffs = (0 until n).map(i => bb.getLong(b6 + 8 + i * 8))
                  case _ => ()
                }
                case _ => ()
              }
              case _ => ()
            }
            case _ => ()
          }
          if (handler == "vide" && sizes.nonEmpty && chunkOffs.nonEmpty && runs.nonEmpty) {
            val out = IndexedSeq.newBuilder[(Long, Int)]
            var s = 0; var ci = 0
            while (ci < chunkOffs.length && s < sizes.length) {
              val spc = runs.takeWhile(_._1 <= ci + 1).lastOption
                .map(_._2).getOrElse(runs.head._2)
              var off = chunkOffs(ci)
              var k = 0
              while (k < spc && s < sizes.length) {
                out += ((off, sizes(s))); off += sizes(s); s += 1; k += 1
              }
              ci += 1
            }
            if (s == sizes.length) found = Some((codec, out.result()))
          }
        case _ => ()
      }
      case _ => ()
    }
    found
  }

  /** REAL MP4 frame extraction for Motion-JPEG tracks: resolve the sample
    * table ([[bmffVideoSamples]]), pick indexes via
    * [[sampleFrameIndexes]], slice each sampled JPEG out of `mdat` and
    * decode it with ImageIO — only the sampled frames are ever decoded.
    * Tracks whose codec is a predictive bitstream (avc1/hev1/…) emit NO
    * rows: a from-scratch offline engine cannot honestly decode H.264,
    * and a fake decode would be worse than a loud absence (the
    * [[videoMeta]] metadata path still covers those files).
    */
  def sampleMp4Frames(df: DataFrame, stride: Int, maxFrames: Int): Dataset[FrameSample] = {
    val spark = df.sparkSession
    import spark.implicits._
    val decodable = Set("jpeg", "mjpa", "mjpb")
    df.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        try bmffVideoSamples(bytes) match {
          case Some((codec, samples)) if decodable(codec) =>
            val n = samples.length
            sampleFrameIndexes(n, stride, maxFrames).flatMap { i =>
              val (off, sz) = samples(i)
              if (off < 0 || off + sz > bytes.length) Nil
              else {
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(bytes, off.toInt, sz))
                if (img == null) Nil
                else imageChannelMeans(img).map { case (r, g, b) =>
                  FrameSample(id, n, i, img.getWidth, img.getHeight, r, g, b)
                }
              }
            }
          case _ => Nil
        } catch { case scala.util.control.NonFatal(_) => Nil }
      })
  }
}
