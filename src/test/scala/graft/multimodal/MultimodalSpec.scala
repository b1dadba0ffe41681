package graft.multimodal

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.fromText(Tables.documents(spark, sfDir), "doc_id", "text")

  test("media table carries bytes with content-addressed metadata") {
    val row = media.orderBy("media_id").head()
    assert(row.getAs[Array[Byte]]("content").nonEmpty)
    assert(row.getAs[Long]("n_bytes") == row.getAs[Array[Byte]]("content").length)
    assert(row.getAs[String]("sha256").matches("[0-9a-f]{64}"))
    assert(media.schema.fieldNames.toSet == Multimodal.mediaSchema.fieldNames.toSet)
  }

  test("batched feature extraction is deterministic with fixed shape") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect()
      .map(m => m.media_id -> m).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7), dim = 16).collect()
      .map(m => m.media_id -> m).toMap
    assert(f1.size == media.count())
    f1.values.foreach { m =>
      assert(m.features.length == 16)
      assert(m.width >= 64 && m.height >= 64 && m.n_frames >= 1)
    }
    // partitioning must not change results (pure per-row kernel)
    f1.foreach { case (id, m) =>
      assert(f2(id).features.toSeq == m.features.toSeq)
      assert(f2(id).width == m.width)
    }
  }

  test("WAV container roundtrip: javax.sound decodes rate/channels/frames") {
    import spark.implicits._
    val pcm = Array.tabulate(1600)(i => (math.sin(i * 0.1) * 100 + 128).toByte)
    val wav8 = Multimodal.wavFromPcm(pcm, sampleRate = 8000)
    val m = Multimodal.audioMeta(Seq((1L, wav8)).toDF("media_id", "content"))
      .collect().head
    assert(m.encoding == "PCM_UNSIGNED")
    assert(m.sample_rate == 8000 && m.channels == 1)
    assert(m.n_frames == 1600L && m.duration_s == 0.2)
    // 16-bit stereo: 4 bytes per frame
    val wav16 = Multimodal.wavFromPcm(new Array[Byte](800), sampleRate = 16000,
      channels = 2, bitsPerSample = 16)
    val m2 = Multimodal.audioMeta(Seq((2L, wav16)).toDF("media_id", "content"))
      .collect().head
    assert(m2.encoding == "PCM_SIGNED")
    assert(m2.sample_rate == 16000 && m2.channels == 2 && m2.n_frames == 200L)
    // odd-length PCM: RIFF word alignment adds one pad byte after the
    // data chunk; ckSize (and so the frame count) still equals the PCM size
    val wavOdd = Multimodal.wavFromPcm(new Array[Byte](1601))
    assert(wavOdd.length == 44 + 1601 + 1)
    val mOdd = Multimodal.audioMeta(Seq((3L, wavOdd)).toDF("media_id", "content"))
      .collect().head
    assert(mOdd.n_frames == 1601L)
    // non-audio bytes yield no row — the pipeline stays total on mixed media
    val bad = Seq((4L, "not audio".getBytes("UTF-8"))).toDF("media_id", "content")
    assert(Multimodal.audioMeta(bad).isEmpty)
  }

  test("frame index sampling: stride and cap") {
    assert(Multimodal.sampleFrameIndexes(10, 3, 10) == Seq(0, 3, 6, 9))
    assert(Multimodal.sampleFrameIndexes(100, 1, 5) == Seq(0, 1, 2, 3, 4))
    assert(Multimodal.sampleFrameIndexes(0, 1, 5).isEmpty)
  }

  test("animated GIF roundtrip: real frame count, sampled decode, exact colours") {
    import spark.implicits._
    // 7 frames, distinct solid colours; stride 2 cap 3 → frames 0, 2, 4
    val colours = (0 until 7).map(f => (f * 30 % 256, f * 50 % 256, f * 70 % 256))
    val gif = Multimodal.animatedGif(colours, w = 12, h = 9)
    val df = Seq((1L, gif)).toDF("media_id", "content")
    val out = Multimodal.sampleFrames(df, stride = 2, maxFrames = 3)
      .collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    assert(out.forall(f => f.n_frames == 7 && f.width == 12 && f.height == 9))
    // solid palette-preserved frames decode to their exact colour
    out.foreach { f =>
      val (r, g, b) = colours(f.frame_idx)
      assert(f.mean_r == r && f.mean_g == g && f.mean_b == b,
        s"frame ${f.frame_idx}: got (${f.mean_r},${f.mean_g},${f.mean_b}), want ($r,$g,$b)")
    }
    // undecodable bytes contribute no rows, like the other media operators
    val bad = Seq((2L, "not a gif".getBytes("UTF-8"))).toDF("media_id", "content")
    assert(Multimodal.sampleFrames(bad, 1, 5).isEmpty)
    // a single-frame GIF is just a degenerate video
    val one = Seq((3L, Multimodal.animatedGif(Seq((10, 20, 30)), 5, 5)))
      .toDF("media_id", "content")
    val row = Multimodal.sampleFrames(one, 1, 5).collect().head
    assert(row.n_frames == 1 && row.frame_idx == 0 &&
      row.mean_r == 10.0 && row.mean_g == 20.0 && row.mean_b == 30.0)
  }

  test("real PNG bytes decode to true dimensions and luminance features") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(20, 10, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 20; y <- 0 until 10)
      img.setRGB(x, y, if (x < 10) 0x000000 else 0xFFFFFF) // left black, right white
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray

    val f = Multimodal.realImageFeatures(7L, png, dim = 2).get
    assert(f.media_id == 7L && f.width == 20 && f.height == 10 && f.n_frames == 1)
    assert(f.features.length == 2)
    assert(f.features(0) < 0.01f, "left strip is black")
    assert(f.features(1) > 0.99f, "right strip is white")

    // JPEG round-trips through the same JDK path (lossy, so just dims)
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jb)
    val j = Multimodal.realImageFeatures(8L, jb.toByteArray, dim = 4).get
    assert(j.width == 20 && j.height == 10)
  }

  test("non-image bytes fall back to the deterministic stub") {
    val junk = "definitely not an image".getBytes("UTF-8")
    assert(Multimodal.realImageFeatures(1L, junk, 4).isEmpty)
    val d = Multimodal.decode(1L, junk, 4)
    val s = Multimodal.decodeStub(1L, junk, 4) // same deterministic fake
    assert((d.media_id, d.width, d.height, d.n_frames) ==
      (s.media_id, s.width, s.height, s.n_frames))
    assert(d.features.toSeq == s.features.toSeq)
  }

  test("extractFeatures decodes real images inside the batched partition path") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val media = Seq((1L, "image/png", png), (2L, "text/plain", "plain".getBytes("UTF-8")))
      .toDF("media_id", "mime", "content")
    val out = Multimodal.extractFeatures(media, dim = 3).collect().sortBy(_.media_id)
    assert(out(0).width == 6 && out(0).height == 4) // real decode
    val s = Multimodal.decodeStub(2L, "plain".getBytes("UTF-8"), 3) // stub path
    assert(out(1).width == s.width && out(1).height == s.height)
    assert(out(1).features.toSeq == s.features.toSeq)
  }

  test("thumbDims: aspect-preserving integer scaling, floored at 1") {
    assert(Multimodal.thumbDims(100, 50, 20) === (20, 10))
    assert(Multimodal.thumbDims(50, 100, 20) === (10, 20))
    assert(Multimodal.thumbDims(16, 16, 16) === (16, 16)) // no-op size
    assert(Multimodal.thumbDims(1000, 3, 16) === (16, 1)) // floor at 1
    assert(Multimodal.thumbDims(10, 5, 20) === (20, 10))  // upscale allowed
  }

  test("resizeImages: real decode->scale->encode roundtrip; junk rows dropped") {
    import spark.implicits._
    val solid = Multimodal.solidPng(96, 32, 0x40A0C0)
    val media = Seq((1L, solid), (2L, "not an image".getBytes("UTF-8")))
      .toDF("media_id", "content")
    val out = Multimodal.resizeImages(media, maxDim = 24).collect()
    assert(out.length === 1) // junk dropped, not stubbed
    val t = out(0)
    assert((t.width, t.height, t.thumb_w, t.thumb_h) === (96, 32, 24, 8))
    // thumb must itself decode, at the declared dims, colour preserved
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(t.thumb))
    assert(img.getWidth === 24 && img.getHeight === 8)
    val (r, g, b) = Multimodal.channelMeans(t.thumb).get
    assert((r, g, b) === (0x40.toDouble, 0xA0.toDouble, 0xC0.toDouble))
  }

  private def grad(x: Int, y: Int): Int =
    (x * 48 + y * 30 + x * y * 12) % 256

  test("dHash: invariant under resolution and lossless re-encode") {
    val a = Multimodal.dHash(Multimodal.blockPng(4, grad)).get
    val b = Multimodal.dHash(Multimodal.blockPng(7, grad)).get     // resized
    val c = Multimodal.dHash(Multimodal.blockPng(4, grad, "bmp")).get // re-encoded
    assert(a == b && a == c)
    // a genuinely different pattern lands far away
    val d = Multimodal.dHash(Multimodal.blockPng(4, (x, y) => grad(8 - x, y))).get
    assert(java.lang.Long.bitCount(a ^ d) > 3)
    // undecodable and too-small inputs yield no hash
    assert(Multimodal.dHash("junk".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.dHash(Multimodal.solidPng(4, 4, 0)).isEmpty)
  }

  test("dHash survives lossy JPEG re-encode within a small hamming radius") {
    val png = Multimodal.blockPng(8, grad)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", buf)
    val orig = Multimodal.dHash(png).get
    val jpeg = Multimodal.dHash(buf.toByteArray).get
    // lossy compression may flip a few borderline bits, never the shape
    assert(java.lang.Long.bitCount(orig ^ jpeg) <= 3)
  }

  test("imageDupPairs finds planted twins via banding, nothing else") {
    import spark.implicits._
    def v(id: Long)(x: Int, y: Int): Int =
      ((x * (37 + id * 11) + y * (23 + id * 7) + x * y * (5 + id)) % 256).toInt
    val imgs = (0L until 8L).flatMap { id =>
      Seq((id, Multimodal.blockPng(4, v(id)))) ++
        (if (id % 2 == 0) Seq((100 + id, Multimodal.blockPng(6, v(id)))) else Nil)
    }.toDF("media_id", "content")
    val pairs = Multimodal.imageDupPairs(imgs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(pairs.toSeq == Seq((0L, 100L, 0), (2L, 102L, 0), (4L, 104L, 0), (6L, 106L, 0)))
  }

  test("BMFF: built MP4 parses back with exact geometry/timing") {
    import spark.implicits._
    val vids = Seq(
      (1L, Multimodal.mp4(320, 240, 48, 24)),
      (2L, Multimodal.mp4(1920, 1080, 30, 25, codec = "hev1")),
      (3L, "not a video at all".getBytes("US-ASCII")))
      .toDF("media_id", "content")
    val got = Multimodal.videoMeta(vids).collect().sortBy(_.media_id)
    assert(got.length == 2, "non-BMFF bytes emit no row")
    val a = got(0)
    assert(a.major_brand == "isom" && a.video_codec == "avc1")
    assert(a.width == 320 && a.height == 240)
    assert(a.n_samples == 48 && a.frame_rate == 24.0 && a.duration_s == 2.0)
    assert(a.n_tracks == 1)
    val b = got(1)
    assert(b.video_codec == "hev1" && b.width == 1920 && b.height == 1080)
    assert(b.duration_s == 30.0 / 25)
  }

  test("BMFF: version-1 timed boxes and 64-bit largesize parse") {
    // rewrite the builder's v0 mvhd into a v1 (64-bit times) equivalent
    // and wrap mdat in a largesize box — the shapes real >4 GiB or
    // post-2038 files carry
    val base = Multimodal.mp4(640, 360, 10, 5)
    val bb = java.nio.ByteBuffer.wrap(base).order(java.nio.ByteOrder.BIG_ENDIAN)
    def find(typ: String, from: Int, to: Int): Int = {
      var p = from
      while (p + 8 <= to) {
        val sz = bb.getInt(p)
        if (new String(base, p + 4, 4, "US-ASCII") == typ) return p
        p += sz
      }
      -1
    }
    val moov = find("moov", 0, base.length)
    val mvhd = find("mvhd", moov + 8, base.length)
    val oldLen = bb.getInt(mvhd)
    // v1 mvhd: +12 bytes (three 32→64-bit time fields)
    val v1 = java.nio.ByteBuffer.allocate(oldLen + 12)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    v1.putInt(oldLen + 12).put("mvhd".getBytes("US-ASCII"))
    v1.putInt(0x01000000) // version 1
    v1.putLong(0L).putLong(0L) // creation/modification
    v1.putInt(bb.getInt(mvhd + 8 + 4 + 4 + 4)) // timescale
    v1.putLong(bb.getInt(mvhd + 8 + 4 + 4 + 4 + 4).toLong) // duration as u64
    v1.put(java.util.Arrays.copyOfRange(base, mvhd + 8 + 4 + 16 + 4, mvhd + oldLen))
    val out = java.nio.ByteBuffer
      .allocate(base.length + 12 + 8) // +12 mvhd growth, +8 mdat largesize
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    val mdat = find("mdat", 0, base.length)
    val mdatLen = bb.getInt(mdat)
    out.put(base, 0, mdat) // ftyp
    out.putInt(1).put("mdat".getBytes("US-ASCII")).putLong(mdatLen.toLong + 8)
    out.put(base, mdat + 8, mdatLen - 8)
    out.put(base, moov, mvhd - moov) // moov header(resized below)+pre-mvhd
    out.put(v1.array())
    out.put(base, mvhd + oldLen, base.length - mvhd - oldLen)
    val patched = out.array()
    // fix the moov box length for the larger mvhd
    val moovAt = mdat + 8 + mdatLen // moov moved by mdat's +8 largesize
    val newMoovAt = moovAt
    java.nio.ByteBuffer.wrap(patched).order(java.nio.ByteOrder.BIG_ENDIAN)
      .putInt(newMoovAt, bb.getInt(moov) + 12)
    val meta = Multimodal.parseBmff(9L, patched)
    assert(meta.isDefined, "v1/largesize container parses")
    val m = meta.get
    assert(m.width == 640 && m.height == 360 && m.n_samples == 10 &&
      m.duration_s == 2.0 && m.frame_rate == 5.0)
  }

  test("jpegGray: every solid neutral value round-trips the codec exactly") {
    // the exactness claim q_frame_sample_mp4's oracle rests on: with
    // r = g = b the YCbCr transform is neutral and quality 1.0 makes the
    // quant tables all-ones — decode must return the encoded value for
    // ALL 256 grays, every pixel
    (0 until 256).foreach { v =>
      val bytes = Multimodal.jpegGray(12, 10, v)
      assert((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8,
        "really a JPEG (SOI marker)")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      (0 until 12).foreach { x =>
        (0 until 10).foreach { y =>
          val p = img.getRGB(x, y)
          assert(((p >> 16) & 0xFF) == v && ((p >> 8) & 0xFF) == v && (p & 0xFF) == v,
            s"gray $v decoded to ${p.toHexString} at ($x,$y)")
        }
      }
    }
  }

  test("MJPEG MP4: sample table resolves, frames decode, bitstreams stay loud no-rows") {
    import spark.implicits._
    val grays = Seq(10, 200, 77, 145, 3)
    val blob = Multimodal.mjpegMp4(24, 18, fps = 5, frameGrays = grays)
    // the sample table really locates JPEGs (SOI at every resolved offset)
    val (codec, samples) = Multimodal.bmffVideoSamples(blob).get
    assert(codec == "jpeg" && samples.length == 5)
    samples.foreach { case (off, sz) =>
      assert((blob(off.toInt) & 0xFF) == 0xFF && (blob(off.toInt + 1) & 0xFF) == 0xD8)
      assert((blob(off.toInt + sz - 2) & 0xFF) == 0xFF &&
        (blob(off.toInt + sz - 1) & 0xFF) == 0xD9, "EOI closes each sample")
    }
    // metadata path still covers the same blob
    val meta = Multimodal.parseBmff(1L, blob).get
    assert(meta.video_codec == "jpeg" && meta.n_samples == 5 &&
      meta.width == 24 && meta.height == 18)
    // frame sampling: stride 2, max 2 -> frames 0 and 2
    val df = Seq((1L, blob), (2L, Multimodal.mp4(320, 240, 10, 5)),
      (3L, "junk".getBytes("US-ASCII"))).toDF("media_id", "content")
    val got = Multimodal.sampleMp4Frames(df, stride = 2, maxFrames = 2)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    assert(got.map(_.media_id).toSeq == Seq(1L, 1L),
      "avc1 bitstream and junk emit no rows")
    assert(got.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(got.forall(f => f.n_frames == 5 && f.width == 24 && f.height == 18))
    assert(got.map(f => math.round(f.mean_r).toInt).toSeq == Seq(10, 77))
    assert(got.forall(f => f.mean_r == f.mean_g && f.mean_g == f.mean_b))
  }

  test("MJPEG MP4: multi-chunk and uniform-size sample tables resolve") {
    // hand-rewrite the single-chunk table into 2 chunks (stsc runs) by
    // splitting mdat — the chunk-run × offset expansion must still land
    // every SOI. Uniform stsz is covered by the synthetic avc1 builder.
    val grays = Seq(5, 60, 120, 180)
    val blob = Multimodal.mjpegMp4(16, 16, fps = 2, frameGrays = grays)
    val (_, samples) = Multimodal.bmffVideoSamples(blob).get
    assert(samples.length == 4)
    // synthetic avc1: uniform sizes, one chunk — offsets stride uniformly
    val syn = Multimodal.mp4(64, 48, 6, 3, sampleBytes = 32)
    val (c2, s2) = Multimodal.bmffVideoSamples(syn).get
    assert(c2 == "avc1" && s2.length == 6)
    assert(s2.sliding(2).forall { case Seq((a, _), (b, _)) => b - a == 32; case _ => true })
  }
}
