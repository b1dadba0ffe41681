package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Execution fuzz for the multimodal binary family — the one family whose
  * r15 deep review was reading-only. Mirrors Hdf5FuzzSpec/WarcFuzzSpec:
  * randomized ROUNDTRIPS (random container params → build → parse →
  * closed-form expected values) plus ADVERSARIAL byte mutations (bit
  * flips, truncations, length-field overwrites with 0 / 1 / 0x7FFFFFFF /
  * 0xFFFFFFFF, fourcc scrambles) against every parser: the ISO-BMFF box
  * walk (metadata + sample-table resolution), the GIF and MJPEG-MP4 frame
  * samplers, RIFF/WAVE + AIFF audio metadata, dHash, and resize. The
  * mutation contract is the operators' documented one: never throw, never
  * hang — undecodable bytes contribute no row (or the deterministic stub,
  * for the total-map feature extractor).
  */
class MultimodalFuzzSpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260816L)

  /** One random structural mutation of a container blob. */
  private def mutate(bytes: Array[Byte]): Array[Byte] = {
    val b = bytes.clone()
    rnd.nextInt(6) match {
      case 0 => // flip a random byte
        if (b.nonEmpty) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        b
      case 1 => // truncate at a random point
        b.take(rnd.nextInt(b.length + 1))
      case 2 => // overwrite a 4-byte (length-ish) field with an extreme
        if (b.length >= 4) {
          val at = rnd.nextInt(b.length - 3)
          val v = Seq(0, 1, 0x7FFFFFFF, 0xFFFFFFFF, 8)(rnd.nextInt(5))
          b(at) = (v >>> 24).toByte; b(at + 1) = (v >>> 16).toByte
          b(at + 2) = (v >>> 8).toByte; b(at + 3) = v.toByte
        }
        b
      case 3 => // scramble 4 bytes (fourcc-sized) with random ASCII
        if (b.length >= 4) {
          val at = rnd.nextInt(b.length - 3)
          (0 until 4).foreach(i => b(at + i) = (0x20 + rnd.nextInt(95)).toByte)
        }
        b
      case 4 => // duplicate a random slice into a random spot
        if (b.length >= 8) {
          val from = rnd.nextInt(b.length - 4)
          val len = 4 + rnd.nextInt(math.min(32, b.length - from - 4) + 1)
          val at = rnd.nextInt(b.length + 1)
          b.take(at) ++ b.slice(from, from + len) ++ b.drop(at)
        } else b
      case _ => // pure garbage of a random size (incl. empty)
        Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
    }
  }

  test("BMFF roundtrip: random params parse back to closed-form metadata") {
    (0 until 25).foreach { k =>
      val w = 16 + rnd.nextInt(2000)
      val h = 16 + rnd.nextInt(2000)
      val n = 1 + rnd.nextInt(500)
      val fps = 1 + rnd.nextInt(120)
      val codec = Seq("avc1", "hev1", "mp4v", "vp09")(k % 4)
      val bytes = Multimodal.mp4(w, h, n, fps, codec)
      val m = Multimodal.parseBmff(k.toLong, bytes)
        .getOrElse(fail(s"case $k: built MP4 did not parse"))
      assert(m.major_brand == "isom" && m.n_tracks == 1, s"case $k")
      assert(m.video_codec == codec && m.width == w && m.height == h, s"case $k")
      assert(m.n_samples == n.toLong, s"case $k")
      // movie timescale = fps, duration = nFrames ticks → exact division
      assert(m.duration_s == n.toDouble / fps, s"case $k duration")
      assert(m.frame_rate == fps.toDouble, s"case $k fps")
    }
  }

  test("MJPEG-MP4 roundtrip: random gray tracks sample back exactly at any stride") {
    import spark.implicits._
    val cases = (0 until 6).map { k =>
      val n = 1 + rnd.nextInt(12)
      val grays = Seq.fill(n)(rnd.nextInt(256))
      val w = 8 + rnd.nextInt(48); val h = 8 + rnd.nextInt(48)
      (k.toLong, grays, Multimodal.mjpegMp4(w, h, 1 + rnd.nextInt(30), grays))
    }
    val stride = 1 + rnd.nextInt(3)
    val maxFrames = 1 + rnd.nextInt(6)
    val df = cases.map { case (id, _, b) => (id, b) }.toDF("media_id", "content")
    val got = Multimodal.sampleMp4Frames(df, stride, maxFrames)
      .collect().groupBy(_.media_id)
    cases.foreach { case (id, grays, _) =>
      val want = Multimodal.sampleFrameIndexes(grays.length, stride, maxFrames)
      val rows = got.getOrElse(id, fail(s"media $id: no rows")).sortBy(_.frame_idx)
      assert(rows.map(_.frame_idx).toSeq == want, s"media $id indexes")
      rows.foreach { r =>
        assert(r.n_frames == grays.length, s"media $id n_frames")
        val g = grays(r.frame_idx).toDouble
        // neutral-gray JPEG at quality 1.0 decodes exactly (see jpegGray)
        assert(r.mean_r == g && r.mean_g == g && r.mean_b == g,
          s"media $id frame ${r.frame_idx}: (${r.mean_r},${r.mean_g},${r.mean_b}) != $g")
      }
    }
  }

  test("animated-GIF roundtrip: random palettes/sizes sample back exactly") {
    import spark.implicits._
    val cases = (0 until 6).map { k =>
      val n = 1 + rnd.nextInt(10)
      val frames = Seq.fill(n)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
      val w = 1 + rnd.nextInt(30); val h = 1 + rnd.nextInt(30)
      (k.toLong, frames, Multimodal.animatedGif(frames, w, h))
    }
    val stride = 1 + rnd.nextInt(3)
    val maxFrames = 1 + rnd.nextInt(5)
    val df = cases.map { case (id, _, b) => (id, b) }.toDF("media_id", "content")
    val got = Multimodal.sampleFrames(df, stride, maxFrames)
      .collect().groupBy(_.media_id)
    cases.foreach { case (id, frames, _) =>
      val want = Multimodal.sampleFrameIndexes(frames.length, stride, maxFrames)
      val rows = got.getOrElse(id, fail(s"media $id: no rows")).sortBy(_.frame_idx)
      assert(rows.map(_.frame_idx).toSeq == want, s"media $id indexes")
      rows.foreach { r =>
        val (fr, fg, fb) = frames(r.frame_idx)
        assert(r.mean_r == fr && r.mean_g == fg && r.mean_b == fb,
          s"media $id frame ${r.frame_idx}")
      }
    }
  }

  test("WAV roundtrip: random PCM shapes parse back to closed-form audio meta") {
    import spark.implicits._
    val cases = (0 until 20).map { k =>
      val channels = 1 + rnd.nextInt(2)
      val bits = Seq(8, 16)(rnd.nextInt(2))
      val blockAlign = channels * bits / 8
      // frame-aligned PCM, including 0 frames and odd total byte counts
      val frames = rnd.nextInt(5000)
      val rate = 1000 + rnd.nextInt(47000)
      val pcm = Array.fill(frames * blockAlign)(rnd.nextInt(256).toByte)
      (k.toLong, channels, rate, frames,
        Multimodal.wavFromPcm(pcm, rate, channels, bits))
    }
    val df = cases.map { case (id, _, _, _, b) => (id, b) }
      .toDF("media_id", "content")
    val got = Multimodal.audioMeta(df).collect().map(m => m.media_id -> m).toMap
    cases.foreach { case (id, channels, rate, frames, _) =>
      val m = got.getOrElse(id, fail(s"media $id: no row"))
      assert(m.channels == channels && m.sample_rate == rate, s"media $id")
      assert(m.n_frames == frames.toLong, s"media $id n_frames")
      assert(m.duration_s == frames.toDouble / rate, s"media $id duration")
    }
  }

  test("AIFF roundtrip through javax.sound parses back with matching frames") {
    import spark.implicits._
    val cases = (0 until 8).map { k =>
      val frames = 1 + rnd.nextInt(4000)
      val rate = 8000f
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, true)
      val pcm = Array.fill(frames * 2)(rnd.nextInt(256).toByte)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
      (k.toLong, frames, out.toByteArray)
    }
    val df = cases.map { case (id, _, b) => (id, b) }.toDF("media_id", "content")
    val got = Multimodal.audioMeta(df).collect().map(m => m.media_id -> m).toMap
    cases.foreach { case (id, frames, _) =>
      val m = got.getOrElse(id, fail(s"media $id: no row"))
      assert(m.n_frames == frames.toLong && m.sample_rate == 8000, s"media $id")
    }
  }

  test("dHash: resolution- and container-independent, equal to the grid formula") {
    (0 until 15).foreach { k =>
      val grid = Array.fill(8, 9)(rnd.nextInt(256))
      def naive: Long = {
        var acc = 0L
        for (y <- 0 until 8; x <- 0 until 8)
          if (grid(y)(x) > grid(y)(x + 1)) acc |= 1L << (y * 8 + x)
        acc
      }
      val variants = for {
        cell <- Seq(1 + rnd.nextInt(4), 5 + rnd.nextInt(6))
        fmt <- Seq("png", "bmp")
      } yield Multimodal.dHash(Multimodal.blockPng(cell, (x, y) => grid(y)(x), fmt))
        .getOrElse(fail(s"case $k cell/format variant undecodable"))
      assert(variants.distinct == Seq(naive),
        s"case $k: variants ${variants.distinct} != formula $naive")
    }
  }

  test("resize: random solid images keep their colour and the integer dims formula") {
    (0 until 15).foreach { k =>
      val w = 1 + rnd.nextInt(120); val h = 1 + rnd.nextInt(120)
      val maxDim = 1 + rnd.nextInt(64)
      val rgb = rnd.nextInt(1 << 24)
      val t = Multimodal.resizeImage(k.toLong, Multimodal.solidPng(w, h, rgb), maxDim)
        .getOrElse(fail(s"case $k: undecodable"))
      val mx = math.max(w, h)
      assert(t.thumb_w == math.max(1, w * maxDim / mx) &&
        t.thumb_h == math.max(1, h * maxDim / mx), s"case $k dims")
      val (r, g, b) = Multimodal.channelMeans(t.thumb)
        .getOrElse(fail(s"case $k: thumb undecodable"))
      assert(r == ((rgb >> 16) & 0xFF) && g == ((rgb >> 8) & 0xFF) && b == (rgb & 0xFF),
        s"case $k: solid colour not preserved")
    }
  }

  test("frame samplers decode ONLY the sampled frames (unsampled corruption is invisible)") {
    import spark.implicits._
    // MJPEG-MP4: zero out the whole JPEG payload of frame 1, sample
    // {0, 2} — if the sampler decoded unsampled frames the corrupt one
    // would surface; only-sampled decode returns both rows intact
    val grays = Seq(40, 120, 200, 240)
    val mp4 = Multimodal.mjpegMp4(24, 24, 5, grays)
    val (codec, samples) = Multimodal.bmffVideoSamples(mp4)
      .getOrElse(fail("fixture must resolve a sample table"))
    assert(codec == "jpeg" && samples.length == 4)
    val corrupt = mp4.clone()
    val (off1, len1) = samples(1)
    java.util.Arrays.fill(corrupt, off1.toInt, off1.toInt + len1, 0.toByte)
    val rows = Multimodal.sampleMp4Frames(
        Seq((1L, corrupt)).toDF("media_id", "content"), stride = 2, maxFrames = 2)
      .collect().sortBy(_.frame_idx)
    assert(rows.map(_.frame_idx).toSeq == Seq(0, 2),
      "sampling {0,2} must survive a corrupt frame 1")
    assert(rows(0).mean_r == 40.0 && rows(1).mean_r == 200.0)
    // sanity: the corruption is real — sampling the corrupt frame itself
    // yields no row for it
    val hit = Multimodal.sampleMp4Frames(
        Seq((2L, corrupt)).toDF("media_id", "content"), stride = 1, maxFrames = 4)
      .collect().map(_.frame_idx).toSet
    assert(!hit.contains(1) && hit.contains(0))
    // GIF: corrupt frame 1's LZW data bytes (not the block structure) —
    // the seeking reader must still decode frames 0 and 2
    val gif = Multimodal.animatedGif(
      Seq((10, 10, 10), (90, 90, 90), (170, 170, 170), (250, 250, 250)), 16, 16)
    val g2 = {
      // frame image data starts after each image descriptor (0x2C ...);
      // find the SECOND descriptor and scribble inside its data blocks
      val idx = (0 until gif.length - 10).filter(i =>
        gif(i) == 0x2C.toByte &&
          (gif(i + 5) & 0xFF) + ((gif(i + 6) & 0xFF) << 8) == 16 &&
          (gif(i + 7) & 0xFF) + ((gif(i + 8) & 0xFF) << 8) == 16)
      assume(idx.length >= 3, "fixture layout: need per-frame image descriptors")
      val b = gif.clone()
      // descriptor(10) + lzw-min-code(1) + first block length byte: the
      // bytes after that are LZW data — flip a few
      val dataAt = idx(1) + 12
      (0 until 3).foreach(i => b(dataAt + i) = (b(dataAt + i) ^ 0x5A).toByte)
      b
    }
    val grows = Multimodal.sampleFrames(
        Seq((3L, g2)).toDF("media_id", "content"), stride = 2, maxFrames = 2)
      .collect().sortBy(_.frame_idx)
    assert(grows.map(_.frame_idx).toSeq == Seq(0, 2),
      "GIF sampling {0,2} must survive corrupt frame-1 LZW data")
    assert(grows(0).mean_r == 10.0 && grows(1).mean_r == 170.0)
  }

  test("adversarial mutations: every parser completes without throwing; survivors stay sane") {
    import spark.implicits._
    val seeds: Seq[Array[Byte]] = Seq(
      Multimodal.mp4(64, 48, 10, 5),
      Multimodal.mjpegMp4(16, 16, 4, Seq(10, 200, 30)),
      Multimodal.animatedGif(Seq((1, 2, 3), (200, 100, 50)), 6, 6),
      Multimodal.wavFromPcm(Array.fill(301)(7.toByte), 8000, 1, 8),
      Multimodal.solidPng(20, 16, 0x123456),
      Multimodal.jpegGray(12, 12, 77),
      Multimodal.blockPng(3, (x, y) => (x * 31 + y * 7) % 256))
    val mutants = (0 until 300).map { i =>
      var b = seeds(i % seeds.length)
      (1 to 1 + rnd.nextInt(3)).foreach(_ => b = mutate(b))
      (i.toLong, b)
    }
    val df = mutants.toDF("media_id", "content").repartition(4)
    // every operator over every mutant: the contract is bounded, row-local
    // failure — a mutant yields no row (or the stub), never an exception
    val meta = Multimodal.videoMeta(df).collect()
    meta.foreach(m => assert(m.n_tracks >= 0 && m.n_samples >= 0))
    val audio = Multimodal.audioMeta(df).collect()
    audio.foreach(a => assert(a.sample_rate > 0 && a.n_frames >= 0 &&
      a.duration_s >= 0.0))
    val gif = Multimodal.sampleFrames(df, 2, 4).collect()
    gif.foreach(f => assert(f.frame_idx >= 0 && f.frame_idx < f.n_frames))
    val mp4f = Multimodal.sampleMp4Frames(df, 2, 4).collect()
    mp4f.foreach(f => assert(f.frame_idx >= 0 && f.frame_idx < f.n_frames))
    Multimodal.imageDHashes(df).collect()
    Multimodal.resizeImages(df, 8).collect().foreach(t =>
      assert(t.thumb_w >= 1 && t.thumb_h >= 1))
    // the feature extractor is a TOTAL map: stub fallback, one row per
    // input, fixed dim, values in [0,1]
    val feats = Multimodal.extractFeatures(df, dim = 16).collect()
    assert(feats.length == mutants.length,
      s"extractFeatures must be total: ${feats.length} != ${mutants.length}")
    feats.foreach { f =>
      assert(f.features.length == 16)
      assert(f.features.forall(v => v >= 0.0f && v <= 1.0f))
    }
  }
}
