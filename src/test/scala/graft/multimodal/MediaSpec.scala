package graft.multimodal

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MediaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import Media._

  test("BMP round-trip: decode reads back the constructed geometry and luma") {
    // 9 bytes → w=3, h=3; rowBytes=(9+3)&~3=12 exercises 4-byte row padding
    val payload = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90)
    val bmp = Containers.bmp(payload)
    val (w, h, dur, luma, _) = Codec.decodeBmp(bmp)
    assert((w, h, dur) == (3, 3, 0L))
    // grayscale BT.601: luma of (v,v,v) is exactly v
    val expected = payload.map(_ & 0xFF).sum.toDouble / 9 / 255.0
    assert(math.abs(luma - expected) < 1e-12)
    assert(bmp.length == 54 + 12 * 3)
  }

  test("BMP decode honors top-down (negative height) files") {
    val bmp = Containers.bmp(Array.fill[Byte](16)(100))
    // flip height to negative (top-down variant a real file may use)
    val buf = java.nio.ByteBuffer.wrap(bmp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val h = buf.getInt(22)
    buf.putInt(22, -h)
    val (w2, h2, _, _, _) = Codec.decodeBmp(bmp)
    assert(h2 == h && w2 == 4)
  }

  test("WAV round-trip: chunk walk recovers duration and mean amplitude") {
    val payload = Array[Byte](0, 127, -128, 64) // samples: -32768, -256, 0, -16384
    val wav = Containers.wav(payload)
    val (w, h, durMs, amp, _) = Codec.decodeWav(wav)
    assert((w, h) == (0, 0))
    assert(durMs == 4 * 1000L / 8000) // 4 samples at 8 kHz → 0 ms (integer)
    val samples = payload.map(b => ((b & 0xFF) - 128) * 256)
    val expected = samples.map(math.abs).sum.toDouble / 4 / 32768.0
    assert(math.abs(amp - expected) < 1e-12)
    // 8000 bytes → 1 s exactly
    assert(Codec.decodeWav(Containers.wav(Array.fill[Byte](8000)(3)))._3 == 1000L)
  }

  test("Codec sniffs magic bytes; unrecognized payloads quarantine (throw)") {
    val bytes = "hello world, this is a fake image payload".getBytes("UTF-8")
    // no stub remains: bytes that are not a real container are undecodable,
    // which is the per-row Try quarantine contract upstream
    intercept[IllegalArgumentException](Codec.decode("jpeg", bytes))
    // real containers are routed to the real decoders regardless of label
    assert(Codec.decode("whatever", Containers.bmp(bytes))._1 > 0)
    assert(Codec.decode("whatever", Containers.wav(bytes))._3 >= 0L)
    assert(Codec.decode("whatever", Containers.mp4(bytes))._3 > 0L)
  }

  test("MP4 round-trip: the box walk reads back the written geometry") {
    val payload = Array.tabulate[Byte](100)(i => (i + 1).toByte)
    val mp4 = Containers.mp4(payload)
    val info = Codec.mp4Info(mp4)
    // 100 bytes → w=10, h=10 (grayDims), 4 samples of 32 bytes, 40 ms each
    assert((info.width, info.height) == Containers.grayDims(payload))
    assert(info.nSamples == 4 && info.sampleBytes == 32)
    assert(info.durationMs == 4 * 40L)
    assert(mp4.length == 579 + 4 * 32) // builder geometry = header + data
    val (w, h, dur, mean, _) = Codec.decodeMp4(mp4)
    assert((w, h, dur) == (10, 10, 160L))
    // mean over the PADDED sample region: 100 real bytes + 28 zero pad
    val expected = payload.map(_ & 0xFF).sum.toDouble / (4 * 32) / 255.0
    assert(math.abs(mean - expected) < 1e-12)
    // the sample iterator reassembles payload + zero pad through stsz/stco
    val frames = Codec.mp4Samples(mp4, 1).toSeq
    assert(frames.map(_._1) == Seq(0, 1, 2, 3))
    assert(frames.flatMap(_._2).take(100) == payload.toSeq)
    assert(frames.flatMap(_._2).drop(100).forall(_ == 0))
    assert(Codec.mp4Samples(mp4, 2).map(_._1).toSeq == Seq(0, 2))
  }

  test("MP4 truncation anywhere quarantines: the box walk validates declared sizes") {
    val payload = Array.tabulate[Byte](300)(i => (i * 7).toByte)
    val mp4 = Containers.mp4(payload)
    // a valid file parses; EVERY proper prefix fails (some declared box
    // end always passes the cut — ftyp/moov for early cuts, mdat for late)
    assert(Codec.mp4Info(mp4).nSamples == 10)
    for (cut <- Seq(4, 10, 100, 300, 570, 579, mp4.length / 2, mp4.length - 1)) {
      assert(scala.util.Try(Codec.mp4Info(mp4.take(cut))).isFailure, s"cut at $cut should fail")
    }
    // a box-aligned cut that drops the whole mdat still fails: moov's
    // sample table then points past EOF (the stco bounds check)
    assert(scala.util.Try(Codec.mp4Info(mp4.take(16 + 555))).isFailure)
  }

  test("extractFeatures streams real containers partition-wise") {
    val feats = extractFeatures(mediaContainers(spark, "/root/testdata/sf0.001")).collect()
    assert(feats.length == 500)
    val (bmps, wavs) = feats.partition(_.format == "bmp")
    assert(bmps.nonEmpty && wavs.nonEmpty)
    assert(bmps.forall(f => f.doc_id % 2 == 0 && f.width > 0 && f.height > 0 && f.duration_ms == 0))
    assert(wavs.forall(f => f.doc_id % 2 == 1 && f.width == 0 && f.duration_ms >= 0))
    // deterministic: same doc decodes identically on a second pass
    val again = extractFeatures(
      mediaContainers(spark, "/root/testdata/sf0.001").filter(_.doc_id == 0)).collect().head
    assert(feats.find(_.doc_id == 0).get == again)
  }

  test("sampleMp4Frames walks the real sample table with the stride") {
    import spark.implicits._
    val media = Containers.mp4(Array.fill[Byte](100)(7))
    val one = Seq(MediaRecord(1L, media, "mp4", media.length.toLong)).toDS()
    val frames = sampleMp4Frames(one, stride = 2).collect()
    // ceil(100/32) = 4 samples, stride 2 keeps idx 0 and 2
    assert(frames.map(_.getInt(1)).toSeq.sorted == Seq(0, 2))
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 32))
  }

  test("BMP resize halves dims, preserves mean luma, output is a valid BMP") {
    val rnd = new scala.util.Random(5)
    val payload = Array.fill[Byte](900)((rnd.nextInt(256) - 128).toByte)
    val bmp = Containers.bmp(payload) // 30x30
    val (w0, h0, _, mean0, _) = Codec.decodeBmp(bmp)
    val half = Codec.resizeBmp(bmp, 2)
    val (w1, h1, _, mean1, _) = Codec.decodeBmp(half) // re-decodes => valid container
    assert(w1 == w0 / 2 && h1 == h0 / 2)
    // box average preserves the mean up to integer truncation per block
    assert(math.abs(mean1 - mean0) < 0.01, s"$mean1 vs $mean0")
    // factor larger than the image floors at 1x1
    val (w2, h2, _, _, _) = Codec.decodeBmp(Codec.resizeBmp(bmp, 1000))
    assert(w2 == 1 && h2 == 1)
  }

  test("WAV resample halves rate and samples, preserves duration and mean level") {
    // a slowly-varying signal: adjacent samples are near-equal, so the
    // pair average tracks the signal (white noise would LOSE |amplitude|
    // by ~1/sqrt(2) under averaging — that's physics, not a bug)
    val payload = Array.tabulate[Byte](801)(i => ((i / 8) % 256 - 128).toByte)
    val wav = Containers.wav(payload)
    val (_, _, dur0, mean0, _) = Codec.decodeWav(wav)
    val half = Codec.resampleWav(wav, 2)
    val (_, _, dur1, mean1, _) = Codec.decodeWav(half) // re-decodes => valid container
    assert((half.length - 44) / 2 == 400)
    assert(math.abs(dur1 - dur0) <= 1, s"$dur1 vs $dur0") // duration preserved (ms rounding)
    assert(math.abs(mean1 - mean0) < 0.01, s"$mean1 vs $mean0")
  }

  test("corrupt RIFF chunk lengths fail as unsupported layout, never loop or overrun") {
    val wav = Containers.wav(Array.fill[Byte](800)(3))
    // negative fmt-chunk length (bytes 16-19 little-endian) — the walk
    // would otherwise step backwards forever
    val neg = wav.clone()
    neg(16) = -1; neg(17) = -1; neg(18) = -1; neg(19) = -1
    // positive length overrunning the buffer — would index past the end
    val big = wav.clone()
    big(19) = 0x7f.toByte
    for (bad <- Seq(neg, big)) {
      val e1 = intercept[IllegalArgumentException](Codec.decodeWav(bad))
      assert(e1.getMessage.contains("unsupported WAV layout"), e1.getMessage)
      val e2 = intercept[IllegalArgumentException](Codec.windowEnergies(bad, 100))
      assert(e2.getMessage.contains("unsupported WAV layout"), e2.getMessage)
    }
  }

  test("aHash: identical percept for a near-identical image, far for unrelated ones") {
    val rnd = new scala.util.Random(7)
    val payload = Array.fill(400)((rnd.nextInt(200) + 30).toByte)
    val Some((h0, n0)) = Codec.ahash64(Containers.bmp(payload))
    assert(n0 > 0 && n0 < 64, "threshold must split the cells")
    // tweak ONE pixel slightly: percept unchanged (same cell averages after
    // integer division, or at most a couple of borderline cells flip)
    val tweaked = payload.clone(); tweaked(3) = (tweaked(3) + 2).toByte
    val Some((h1, _)) = Codec.ahash64(Containers.bmp(tweaked))
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 2, "near-dup must stay within 2 bits")
    // structurally different content (inverted gradient) lands far away
    val other = Array.tabulate(400)(i => (255 - (i * 255 / 400)).toByte)
    val Some((h2, _)) = Codec.ahash64(Containers.bmp(other))
    assert(java.lang.Long.bitCount(h0 ^ h2) > 8, "unrelated images must not collide")
    // below the 8x8 grid there is no percept
    assert(Codec.ahash64(Containers.bmp(Array.fill(20)(1.toByte))).isEmpty)
  }

  test("dHash: brightness shift preserves the gradient hash where aHash may flip") {
    val rnd = new scala.util.Random(11)
    // 20x20 image, pixels in [40, 200) so a +20 global shift cannot clip
    val payload = Array.fill(400)((rnd.nextInt(160) + 40).toByte)
    val Some((d0, n0)) = Codec.dhash64(Containers.bmp(payload))
    assert(n0 > 0 && n0 < 64, "gradient signs must split the bits")
    // global brightness shift: every cell average moves by the same +20,
    // so every horizontal difference — and therefore every dHash bit —
    // is unchanged (aHash's global-mean threshold has no such guarantee)
    val brighter = payload.map(b => ((b & 0xFF) + 20).toByte)
    val Some((d1, _)) = Codec.dhash64(Containers.bmp(brighter))
    assert(d0 == d1, "dHash must be invariant to a non-clipping brightness shift")
    // structurally different content (inverted gradient) lands far away
    val other = Array.tabulate(400)(i => (255 - (i * 255 / 400)).toByte)
    val Some((d2, _)) = Codec.dhash64(Containers.bmp(other))
    assert(java.lang.Long.bitCount(d0 ^ d2) > 8, "unrelated images must not collide")
    // below the 9-column grid there is no percept (8x8 image)
    assert(Codec.dhash64(Containers.bmp(Array.fill(64)(1.toByte))).isEmpty)
  }

  test("pHash: exactly invariant to brightness shift; zero on flat fields") {
    val rnd = new scala.util.Random(13)
    val payload = Array.fill(400)((rnd.nextInt(160) + 40).toByte)
    val Some((p0, n0)) = Codec.phash16(Containers.bmp(payload))
    assert(n0 > 0 && n0 < 15, "DCT mean threshold must split the 15 AC bits")
    // +20 on every pixel moves every cell average by exactly +20 (20·count
    // divides evenly), and each DCT basis row u≥1 sums to zero — so every
    // AC coefficient, and therefore the hash, is EXACTLY unchanged (the
    // shift lands entirely in the discarded DC term)
    val brighter = payload.map(b => ((b & 0xFF) + 20).toByte)
    assert(Codec.phash16(Containers.bmp(brighter)).contains((p0, n0)),
      "pHash must be bit-identical under a non-clipping brightness shift")
    // structurally different content lands far away
    val other = Array.tabulate(400)(i => (255 - (i * 255 / 400)).toByte)
    val Some((p2, _)) = Codec.phash16(Containers.bmp(other))
    assert(java.lang.Long.bitCount(p0 ^ p2) > 3, "unrelated images must not collide")
    // constant image: all AC coefficients zero → no bits set
    assert(Codec.phash16(Containers.bmp(Array.fill[Byte](100)(77))).contains((0L, 0)))
    // below the 8x8 grid there is no percept
    assert(Codec.phash16(Containers.bmp(Array.fill(20)(1.toByte))).isEmpty)
  }

  test("edgeStats: Sobel counts a known step edge and nothing on flat fields") {
    // flat image: zero gradient everywhere
    val flat = Containers.bmp(Array.fill[Byte](100)(77)) // 10x10
    assert(Codec.edgeStats(flat, 160).contains((64L, 0L)))
    // vertical step edge down the middle of a 10x10: columns 0-4 are 0,
    // columns 5-9 are 100 → |gx| = 400 at c in {4,5}, 0 elsewhere; gy = 0
    val step = Array.tabulate(100)(i => if (i % 10 >= 5) 100.toByte else 0.toByte)
    val Some((ni, ne)) = Codec.edgeStats(Containers.bmp(step), 160)
    assert(ni == 64L)
    assert(ne == 16L, s"8 interior rows x 2 straddling columns, got $ne")
    // threshold above the response: nothing fires
    assert(Codec.edgeStats(Containers.bmp(step), 401).contains((64L, 0L)))
    // no interior below 3x3
    assert(Codec.edgeStats(Containers.bmp(Array.fill[Byte](4)(1)), 160).isEmpty)
    // orientation invariance: top-down rewrite counts the same edges
    val bu = Containers.bmp(step)
    val td = bu.clone()
    val tbuf = java.nio.ByteBuffer.wrap(td).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val w = tbuf.getInt(18); val h = tbuf.getInt(22)
    val rowBytes = (w * 3 + 3) & ~3
    tbuf.putInt(22, -h)
    for (r <- 0 until h)
      System.arraycopy(bu, 54 + (h - 1 - r) * rowBytes, td, 54 + r * rowBytes, rowBytes)
    assert(Codec.edgeStats(td, 160) == Codec.edgeStats(bu, 160))
  }

  test("audioVad segments equal an independent per-doc recomputation") {
    // recompute VAD from windowEnergies with plain Scala collections and
    // compare every emitted row — exercises the mean threshold, the
    // gaps-and-islands merge, and the drop of constant-energy docs
    val rows = Media.audioVad(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val expected = Media.mediaContainers(spark, "/root/testdata/sf0.001")
      .filter(_.format == "wav").collect().flatMap { r =>
        val es = Codec.windowEnergies(r.media, win = 100).map(_._2)
        val n = es.length.toLong
        val tot = es.sum
        val act = es.zipWithIndex.collect { case (e, i) if e * n > tot => i }
        if (act.isEmpty) None
        else {
          val segs = act.foldLeft(List.empty[List[Int]]) {
            case (cur :: rest, i) if i == cur.head + 1 => (i :: cur) :: rest
            case (acc, i) => List(i) :: acc
          }.map(_.size.toLong)
          Some(r.doc_id -> ((segs.size.toLong, segs.max, segs.sum, segs.sum * 10000 / n)))
        }
      }.toMap
    assert(expected.nonEmpty, "corpus must contain non-constant wav tracks")
    assert(rows == expected)
  }

  test("ahash near-dup chunk join equals the all-pairs ground truth") {
    // pigeonhole soundness: hamming <= 7 over 64 bits must collide on one
    // of the 8 disjoint 8-bit chunks, so the blocked join loses nothing
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val sigs = Media.imageAhash(spark, dir).select("doc_id", "ahash").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ida, ha) <- sigs; (idb, hb) <- sigs if ida < idb
      h = java.lang.Long.bitCount(ha ^ hb) if h <= 7
    } yield (ida, idb, h)).sortBy(p => (p._1, p._2)).toSeq
    val got = Media.imageNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == brute)
  }

  test("aHash is orientation-correct: bottom-up file equals its top-down rewrite") {
    val payload = Array.tabulate(300)(i => (i % 251).toByte)
    val bu = Containers.bmp(payload) // positive height = bottom-up rows
    val buf = java.nio.ByteBuffer.wrap(bu).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val w = buf.getInt(18); val h = buf.getInt(22)
    val rowBytes = (w * 3 + 3) & ~3
    // same logical image stored top-down: reverse the row blocks, negate h
    val td = bu.clone()
    java.nio.ByteBuffer.wrap(td).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(22, -h)
    for (r <- 0 until h)
      System.arraycopy(bu, 54 + (h - 1 - r) * rowBytes, td, 54 + r * rowBytes, rowBytes)
    assert(Codec.ahash64(bu) == Codec.ahash64(td),
      "hash must not depend on row storage order")
    assert(Codec.ahash64(bu).get._1 != 0L)
  }

  test("JPEG round-trip: real ImageIO encode+decode keeps dims exactly and luma within 2 levels") {
    val payload = "the quick brown fox jumps over the lazy dog, repeatedly and at length"
      .*(20).getBytes("UTF-8")
    val jpeg = Containers.jpeg(payload)
    // a real JFIF stream, not a stub artifact
    assert((jpeg(0) & 0xFF) == 0xFF && (jpeg(1) & 0xFF) == 0xD8)
    val (w0, h0) = Containers.grayDims(payload)
    val (w, h, lumaSum) = Codec.jpegLumaSum(jpeg)
    assert(w == w0 && h == h0)
    val exact = payload.foldLeft(0L)((s, b) => s + (b & 0xFF))
    assert(math.abs(lumaSum - exact) <= 2L * w0 * h0,
      s"mean luma drifted: decoded $lumaSum vs exact $exact over ${w0 * h0} px")
    // Codec.decode sniffs the JFIF magic and routes to the real decoder
    val d = Codec.decode("jpeg", jpeg)
    assert(d._1 == w0 && d._2 == h0)
  }

  test("JPEG quarantine: a header-truncated stream never decodes quietly") {
    // deliberately NOT a half-cut: entropy decoders tolerate a cut scan
    // segment and can return a partial image (measured on this JDK), so
    // the deterministic quarantine claim cuts inside the header
    val payload = Array.tabulate(4096)(i => (i * 31 % 251).toByte)
    val jpeg = Containers.jpeg(payload)
    val cut = jpeg.take(24)
    assert(scala.util.Try(Codec.jpegLumaSum(cut)).isFailure,
      "a header-level cut must throw into the per-row Try quarantine")
  }
}
