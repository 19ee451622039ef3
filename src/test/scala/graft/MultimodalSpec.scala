package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{AudioOps, ImageOps, VideoOps}

/** Multimodal binary-column pipeline: decode correctness against a
  * hand-computed fixture and the resize contract (shape, determinism,
  * nearest-neighbor identity at 1:1).
  */
class MultimodalSpec extends SparkSpecBase {

  private val imgGlob = "/root/repo/fixtures/images/*.ppm"
  private lazy val decoded = ImageOps.decodePpm(
    spark, ImageOps.readBinary(spark, imgGlob))

  test("PPM decode: dimensions and pixel count agree per image") {
    val rows = decoded.collect()
    assert(rows.nonEmpty)
    rows.foreach { img =>
      assert(img.pixels.length == img.width * img.height * 3,
        s"${img.name}: ${img.pixels.length} != ${img.width}x${img.height}x3")
    }
  }

  test("channelMeans equals a driver-side recomputation") {
    val spark2 = spark
    import spark2.implicits._
    val got = ImageOps.channelMeans(decoded)
      .select(col("name"), col("mean_r"), col("mean_g"), col("mean_b"))
      .as[(String, Double, Double, Double)].collect()
      .map { case (k, r, g, b) => k -> ((r, g, b)) }.toMap
    decoded.collect().foreach { img =>
      def mean(ch: Int): Double = {
        val vs = img.pixels.zipWithIndex.collect { case (p, i) if i % 3 == ch => p.toLong }
        BigDecimal(vs.sum.toDouble / vs.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val (r, g, b) = got(img.name)
      assert((r, g, b) == ((mean(0), mean(1), mean(2))), img.name)
    }
  }

  test("resizeNearest: target shape, and identity at the source size") {
    val small = ImageOps.resizeNearest(spark, decoded, 2, 2).collect()
    small.foreach { img =>
      assert(img.width == 2 && img.height == 2 && img.pixels.length == 12)
    }
    // 1:1 resize must be the identity (stride sampling hits every
    // source pixel exactly once).
    decoded.collect().foreach { img =>
      val same = ImageOps.resizeNearest(
        spark, decoded.filter(col("name") === img.name), img.width, img.height)
        .head()
      assert(same.pixels.toSeq == img.pixels.toSeq, s"${img.name}: 1:1 resize not identity")
    }
    // Deterministic: two runs agree.
    val again = ImageOps.resizeNearest(spark, decoded, 2, 2).collect()
    assert(small.map(i => (i.name, i.pixels.toSeq)).toSet ==
      again.map(i => (i.name, i.pixels.toSeq)).toSet)
  }

  private val wavGlob = "/root/repo/fixtures/audio/*.wav"

  test("WAV header decode matches the generator's specs") {
    val metas = AudioOps.decodeWavMeta(
      spark, ImageOps.readBinary(spark, wavGlob)).collect()
      .map(m => m.name -> m).toMap
    // tools/gen_fixtures.py audio(): (rate, channels, bits, n_samples)
    val expect = Map(
      "clip_0.wav" -> ((8000, 1, 16, 9000L)),
      "clip_1.wav" -> ((16000, 2, 16, 12000L)),
      "clip_2.wav" -> ((22050, 1, 16, 16384L)))
    assert(metas.keySet == expect.keySet)
    expect.foreach { case (n, (rate, ch, bits, ns)) =>
      val m = metas(n)
      assert((m.sample_rate, m.channels, m.bits, m.n_samples) == ((rate, ch, bits, ns)), n)
      assert(m.data_bytes == ns * ch * bits / 8, n)
    }
  }

  test("frame sampling: evenly-strided offsets, deterministic fingerprints") {
    val frames = AudioOps.frameSample(
      spark, ImageOps.readBinary(spark, wavGlob), nFrames = 4, frameBytes = 1024)
      .collect()
    assert(frames.length == 12)
    val meta = AudioOps.decodeWavMeta(
      spark, ImageOps.readBinary(spark, wavGlob)).collect()
      .map(m => m.name -> m.data_bytes).toMap
    frames.groupBy(_.name).foreach { case (n, fs) =>
      val stride = meta(n) / 4
      assert(fs.sortBy(_.frame_idx).map(_.frame_off).toSeq ==
        (0 until 4).map(i => 44L + i * stride), n)
      fs.foreach(f => assert(f.frame_md5.matches("[0-9a-f]{32}")))
    }
    val again = AudioOps.frameSample(
      spark, ImageOps.readBinary(spark, wavGlob), 4, 1024).collect()
    assert(frames.map(f => (f.name, f.frame_idx, f.frame_md5)).toSet ==
      again.map(f => (f.name, f.frame_idx, f.frame_md5)).toSet)
  }

  private val aviGlob = "/root/repo/fixtures/video/*.avi"

  test("AVI container walk matches the generator's specs") {
    val metas = VideoOps.decodeAviMeta(
      spark, ImageOps.readBinary(spark, aviGlob)).collect()
      .map(m => m.name -> m).toMap
    // tools/gen_fixtures.py video(): (width, height, us_per_frame, n_frames)
    val expect = Map(
      "clip_0.avi" -> ((8, 6, 40000L, 12L)),
      "clip_1.avi" -> ((16, 8, 33333L, 10L)),
      "clip_2.avi" -> ((4, 4, 100000L, 20L)))
    assert(metas.keySet == expect.keySet)
    expect.foreach { case (n, (w, h, uspf, nf)) =>
      val m = metas(n)
      assert((m.width, m.height, m.us_per_frame, m.n_frames) == ((w, h, uspf, nf)), n)
    }
  }

  test("AVI frame sampling: every 2nd chunk, canonical offsets, independent md5") {
    val frames = VideoOps.frameSample(
      spark, ImageOps.readBinary(spark, aviGlob), everyK = 2).collect()
    // 12, 10, 20 frames -> 6 + 5 + 10 sampled
    assert(frames.length == 21)
    val expectFs = Map("clip_0.avi" -> 144, "clip_1.avi" -> 384, "clip_2.avi" -> 48)
    frames.groupBy(_.name).foreach { case (n, fs) =>
      val size = expectFs(n)
      fs.foreach { f =>
        assert(f.frame_idx % 2 == 0, n)
        assert(f.frame_bytes == size, n)
        // The walker's offsets must land on the canonical closed form
        // the oracle assumes: 232 + i*(8+frame_size).
        assert(f.frame_off == 232L + f.frame_idx * (8L + size), s"$n idx=${f.frame_idx}")
      }
    }
    // Independent fingerprint recomputation straight from the file
    // bytes (no walker involved).
    val f0 = frames.filter(f => f.name == "clip_0.avi" && f.frame_idx == 2).head
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/video/clip_0.avi"))
    val hex = bytes.slice(f0.frame_off.toInt, f0.frame_off.toInt + f0.frame_bytes)
      .map(b => f"${b & 0xff}%02X").mkString
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(hex.getBytes("US-ASCII")).map(b => f"${b & 0xff}%02x").mkString
    assert(f0.frame_md5 == md5)
  }

  test("DIB frame decode reproduces the generator's LCG stream exactly") {
    // Independent oracle: the fixture writer emits frame bytes from a
    // closed-form LCG (x' = (1103515245x + 12345) mod 2^31, byte =
    // x & 0xFF, seeded 7654321 + clipIdx, continuous across frames).
    // Re-derive pixel values from the FORMULA — never from the file —
    // and compare against the parser's bottom-up BGR -> top-down RGB
    // mapping. clip_0: 8x6, 12 frames, rowBytes = 24 (no padding).
    val frames = VideoOps.decodeDibFrames(
      spark, ImageOps.readBinary(spark, "/root/repo/fixtures/video/clip_0.avi"), everyK = 1)
      .collect().sortBy(_.frame_idx)
    assert(frames.length == 12)
    val (w, h, fs) = (8, 6, 144)
    var x = 7654321L
    val stream = Array.fill(12 * fs) {
      x = (1103515245L * x + 12345L) % (1L << 31)
      (x & 0xff).toInt
    }
    frames.foreach { f =>
      assert(f.width == w && f.height == h && f.pixels.length == w * h * 3, f.frame_idx.toString)
      val base = f.frame_idx * fs
      for (y <- 0 until h; px <- 0 until w; ch <- 0 until 3) {
        // top-down RGB pixel (y,px,ch) <- LCG byte at bottom-up BGR
        // position (h-1-y)*rowBytes + px*3 + (2-ch)
        val expect = stream(base + (h - 1 - y) * (w * 3) + px * 3 + (2 - ch))
        val got = f.pixels((y * w + px) * 3 + ch)
        assert(got == expect, s"frame ${f.frame_idx} y=$y x=$px ch=$ch")
      }
    }
  }

  test("aHash near-dup: planted twins found at their exact distances") {
    val pairs = ImageOps.nearDupPairs(spark, decoded, maxHamming = 6)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // the three planted twins at their generator-documented distances,
    // plus the one TRUE cross-family hamming-6 neighbor the tiny
    // originals admit (see tools/gen_fixtures.py images())
    assert(pairs == Set(
      ("img_0.ppm", "img_0_dup.ppm", 6L),
      ("img_1.ppm", "img_1_dup.ppm", 4L),
      ("img_2.ppm", "img_2_dup.ppm", 1L),
      ("img_1.ppm", "img_2_dup.ppm", 6L)), pairs.toString)
    // tightening the radius drops the boundary pairs but never a
    // closer twin
    val tight = ImageOps.nearDupPairs(spark, decoded, maxHamming = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(tight == Set(
      ("img_1.ppm", "img_1_dup.ppm"),
      ("img_2.ppm", "img_2_dup.ppm")), tight.toString)
  }

  test("aHash banded pairs == brute-force exact pairs at the recall edge") {
    // the banded candidate generator must lose NOTHING vs the
    // all-pairs self-join, including at maxHamming = 2*bands-1 = 7
    // (the pigeonhole boundary) — compute the truth driver-side from
    // the packed signatures (6 images, 15 pairs)
    val sigs = ImageOps.aHash64Packed(spark, decoded).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    for (radius <- Seq(1, 4, 6, 7)) {
      val want = (for {
        (na, sa) <- sigs; (nb, sb) <- sigs if na < nb
        d = java.lang.Long.bitCount(sa ^ sb) if d <= radius
      } yield (na, nb, d.toLong)).toSet
      val got = ImageOps.nearDupPairs(spark, decoded, maxHamming = radius)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got == want, s"radius $radius: $got vs $want")
    }
  }

  test("aHash packed signature matches the bit array; pair plan has no cartesian") {
    val bits = ImageOps.aHash64(spark, decoded).collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    val packed = ImageOps.aHash64Packed(spark, decoded).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bits.keySet == packed.keySet)
    bits.foreach { case (n, bs) =>
      assert(packed(n) == bs.foldLeft(0L)((acc, b) => (acc << 1) | b), n)
    }
    val p = ImageOps.nearDupPairs(spark, decoded, maxHamming = 6)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "image near-dup pair stage must be the banded equi join:\n" + p.take(1500))
  }

  private val audioNdGlob = "/root/repo/fixtures/audio_nd/*.wav"

  /** Independent driver-side eHash: raw bytes → 16-bit LE samples →
    * 64 windows → exact cross-multiplied mean test. Mirrors the
    * generator's python, not the engine's code path. */
  private def driverEHash(b: Array[Byte]): Long = {
    val dataLen = math.min(
      (b(40) & 0xffL) | ((b(41) & 0xffL) << 8) | ((b(42) & 0xffL) << 16) | ((b(43) & 0xffL) << 24),
      (b.length - 44).toLong)
    val n = (dataLen / 2).toInt
    val samples = (0 until n).map { j =>
      math.abs(((b(45 + 2 * j) << 8) | (b(44 + 2 * j) & 0xff)).toLong)
    }
    val total = samples.sum
    val byWin = samples.zipWithIndex.groupBy { case (_, j) => (j.toLong * 64) / n }
    (0 until 64).foldLeft(0L) { (acc, w) =>
      val bit = byWin.get(w.toLong) match {
        case Some(ss) => if (ss.map(_._1).sum * n > total * ss.size) 1L else 0L
        case None => 0L
      }
      (acc << 1) | bit
    }
  }

  test("energy-hash matches a driver-side recomputation from the raw bytes") {
    val got = AudioOps.energyHash64(spark, ImageOps.readBinary(spark, audioNdGlob))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size == 7)
    val dir = new java.io.File("/root/repo/fixtures/audio_nd")
    dir.listFiles().filter(_.getName.endsWith(".wav")).foreach { f =>
      val want = driverEHash(java.nio.file.Files.readAllBytes(f.toPath))
      assert(got(f.getName) == want, f.getName)
    }
  }

  test("audio near-dup: planted twins found at hamming 1, nothing else") {
    val pairs = AudioOps.nearDupPairs(
        spark, ImageOps.readBinary(spark, audioNdGlob), maxHamming = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // generator-asserted planted truth: three twins at hamming 1,
    // cross-family distances all >= 27 (tools/gen_fixtures.py audio_nd())
    assert(pairs == Set(
      ("clip_0.wav", "clip_0_dup.wav", 1L),
      ("clip_1.wav", "clip_1_dup.wav", 1L),
      ("clip_2.wav", "clip_2_dup.wav", 1L)), pairs.toString)
  }

  test("audio banded pairs == brute force at the recall edge; no cartesian") {
    val bins = ImageOps.readBinary(spark, audioNdGlob)
    val sigs = AudioOps.energyHash64(spark, bins).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    for (radius <- Seq(1, 4, 7)) {
      val want = (for {
        (na, sa) <- sigs; (nb, sb) <- sigs if na < nb
        d = java.lang.Long.bitCount(sa ^ sb) if d <= radius
      } yield (na, nb, d.toLong)).toSet
      val got = AudioOps.nearDupPairs(spark, bins, maxHamming = radius)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got == want, s"radius $radius: $got vs $want")
    }
    val p = AudioOps.nearDupPairs(spark, bins, maxHamming = 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "audio near-dup pair stage must be the banded equi join:\n" + p.take(1500))
  }

  private val videoNdGlob = "/root/repo/fixtures/video_nd/*.avi"

  test("video frame near-dup: identical twin frames at 0, the swapped frame at 2") {
    val pairs = VideoOps.frameNearDupPairs(
        spark, ImageOps.readBinary(spark, videoNdGlob), maxHamming = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // generator-asserted planted truth: clip_0_dup shares 5 byte-
    // identical frames with clip_0 (hamming 0) and one total-
    // preserving two-cell swap on frame 3 (hamming exactly 2);
    // cross-content frames all sit > 7 bits apart
    val want = (0 until 6).filter(_ != 3).map(i =>
      (f"clip_0.avi#$i%03d", f"clip_0_dup.avi#$i%03d", 0L)).toSet +
      (("clip_0.avi#003", "clip_0_dup.avi#003", 2L))
    assert(pairs == want, pairs.toString)
  }

  test("video frame banded pairs == brute force; frame hash == image-path hash") {
    val bins = ImageOps.readBinary(spark, videoNdGlob)
    val sigs = VideoOps.frameAHash(spark, bins).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(sigs.length == 18) // 3 files x 6 frames
    for (radius <- Seq(0, 2, 7)) {
      val want = (for {
        (na, sa) <- sigs; (nb, sb) <- sigs if na < nb
        d = java.lang.Long.bitCount(sa ^ sb) if d <= radius
      } yield (na, nb, d.toLong)).toSet
      val got = VideoOps.frameNearDupPairs(spark, bins, maxHamming = radius)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got == want, s"radius $radius: $got vs $want")
    }
    // a decoded frame hashed through the IMAGE path must give the
    // same signature — one signature pipeline across modalities
    val spark2 = spark
    import spark2.implicits._
    val asImages = VideoOps.decodeDibFrames(spark, bins, everyK = 1)
      .map(f => ImageOps.DecodedImage(
        f"${f.name}#${f.frame_idx}%03d", f.width, f.height, f.pixels))
    val viaImage = ImageOps.aHash64Packed(spark, asImages).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sigs.toMap == viaImage)
    val p = VideoOps.frameNearDupPairs(spark, bins, maxHamming = 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "video frame near-dup must use the banded equi join:\n" + p.take(1500))
  }

  test("aHash signature: exact-integer mean test, 64 bits, resize-stable") {
    val sigs = ImageOps.aHash64(spark, decoded).collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(sigs.size == 6)
    sigs.foreach { case (n, bits) =>
      assert(bits.length == 64 && bits.forall(b => b == 0 || b == 1), n)
      // a constant image would be all-zero (strict >); these aren't
      assert(bits.sum > 0 && bits.sum < 64, s"$n: degenerate signature")
    }
    // driver-side recomputation of one signature
    val img = decoded.collect().find(_.name == "img_0.ppm").get
    val gs = (0 until 64).map { k =>
      val sy = (k / 8) * img.height / 8
      val sx = (k % 8) * img.width / 8
      val src = (sy * img.width + sx) * 3
      img.pixels(src).toLong + img.pixels(src + 1) + img.pixels(src + 2)
    }
    val tot = gs.sum
    val want = gs.map(g => if (64 * g > tot) 1 else 0)
    assert(sigs("img_0.ppm") == want)
  }
}
