package graft.multimodal

import graft.Tuning
import graft.Tables
import graft.Tables.QueryDef
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, plus decode / feature-extract / frame-sample
 * operators.
 *
 * The decode path is REAL for the two container formats that need no
 * external codec library — BMP (24-bit, header + pixel rows, pure byte
 * arithmetic) and WAV (RIFF chunk walk + PCM samples). `mediaContainers`
 * synthesizes fully valid single-file containers from the document text, so
 * decoded width/height/duration/mean-level are true properties of the bytes
 * and are verified round-trip in MediaSpec — plus JPEG, which encodes AND
 * decodes through the JDK's own `javax.imageio` codec (real lossy
 * compression; oracled via round-trip claim verdicts, see
 * [[mediaJpegRoundtrip]]), and MP4, whose ISO BMFF container is written and
 * parsed box-exact (`Containers.mp4` / `Codec.mp4Info` — ftyp/moov/trak/
 * stbl walk per ISO/IEC 14496-12): dimensions, duration, sample count and
 * chunk offsets are all genuinely parsed. The ONE remaining non-real step
 * is mp4 pixel decoding (no JDK video codec exists): pixel-level stats read
 * the parsed mdat sample bytes directly instead of decoding a video frame.
 * The Spark-side plumbing (schema, binary payloads, partition-streamed
 * `mapPartitions` batching, explode-style frame sampling) is identical for
 * all formats, so a real video codec would change no plan shape.
 */
object Media {

  // ImageIO's default stream cache writes a TEMP FILE per encode/decode
  // call — per-row disk churn on a tier that processes millions of small
  // in-memory images per task; the memory cache is strictly better here
  javax.imageio.ImageIO.setUseCache(false)

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRecord(doc_id: Long, media: Array[Byte], format: String, n_bytes: Long)

  /** Decoded features for one media item. Images fill width/height +
   *  mean_level (luma); audio fills duration_ms + mean_level (|amplitude|);
   *  phash is a content fingerprint for any format. */
  final case class MediaFeatures(
      doc_id: Long, format: String, n_bytes: Long,
      width: Int, height: Int, duration_ms: Long, mean_level: Double, phash: Long)

  /** Decoded feature tuple: (width, height, duration_ms, mean_level, phash). */
  type Decoded = (Int, Int, Long, Double, Long)

  /** Container builders: minimal but FULLY VALID single-file containers,
   *  synthesized deterministically from a payload byte array. */
  object Containers {

    /** 24-bit bottom-up BMP; payload bytes become grayscale pixels
     *  (width ≈ √n capped at 256, rows padded to 4-byte boundaries). */
    def bmp(payload: Array[Byte]): Array[Byte] = {
      val n = math.max(payload.length, 1)
      val w = math.min(256, math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt))
      val h = (n + w - 1) / w
      val rowBytes = (w * 3 + 3) & ~3
      val imageSize = rowBytes * h
      val fileSize = 54 + imageSize
      val out = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(fileSize).putInt(0).putInt(54)
      out.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24).putInt(0)
        .putInt(imageSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
      var row = h - 1 // file stores rows bottom-up
      while (row >= 0) {
        var x = 0
        while (x < w) {
          val i = row * w + x
          val v: Byte = if (i < payload.length) payload(i) else 0
          out.put(v).put(v).put(v) // BGR, grayscale
          x += 1
        }
        var pad = rowBytes - w * 3
        while (pad > 0) { out.put(0.toByte); pad -= 1 }
        row -= 1
      }
      out.array()
    }

    /** REAL JPEG via the JDK's own codec (`javax.imageio` — no external
     *  library): the payload becomes the same logical grayscale matrix as
     *  [[bmp]] (width ≈ √n capped at 256, zero-padded tail), rendered into
     *  a TYPE_BYTE_GRAY BufferedImage and compressed by the standard JFIF
     *  writer. Lossy, so downstream oracles assert CLAIMS about the
     *  round-trip (exact dimensions, mean luma within tolerance) rather
     *  than exact pixels — the sketch_stats verdict discipline. */
    def jpeg(payload: Array[Byte]): Array[Byte] = {
      val (w, h) = grayDims(payload)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var i = 0
      while (i < w * h) {
        raster.setSample(i % w, i / w, 0, if (i < payload.length) payload(i) & 0xFF else 0)
        i += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }

    /** The shared payload→grayscale geometry (bmp and jpeg agree). */
    def grayDims(payload: Array[Byte]): (Int, Int) = {
      val n = math.max(payload.length, 1)
      val w = math.min(256, math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt))
      (w, (n + w - 1) / w)
    }

    /** PCM WAV, 16-bit mono 8 kHz; one centered sample per payload byte. */
    def wav(payload: Array[Byte]): Array[Byte] = {
      val dataLen = payload.length * 2
      val out = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(8000 * 2).putShort(2).putShort(16)
      out.put("data".getBytes("US-ASCII")).putInt(dataLen)
      payload.foreach(b => out.putShort((((b & 0xFF) - 128) * 256).toShort))
      out.array()
    }

    /** Bytes per video sample in the synthesized MP4 track. */
    val Mp4SampleBytes = 32

    /** Media timescale ticks per sample (timescale 1000 ⇒ 25 fps). */
    val Mp4SampleDelta = 40

    /** REAL ISO BMFF (MP4) container — the public ISO/IEC 14496-12 box
     *  layout written byte-exact, big-endian: `ftyp` + `moov(mvhd,
     *  trak(tkhd, mdia(mdhd, hdlr, minf(vmhd, dinf/dref, stbl(stsd['raw '],
     *  stts, stsc, stsz, stco)))))` + `mdat`. The payload becomes the
     *  track's media data as uniform 32-byte video samples at 25 fps
     *  (timescale 1000, sample delta 40), zero-padded to a whole sample;
     *  frame geometry is the shared [[grayDims]] rule, stored as 16.16
     *  fixed-point in `tkhd` and uint16 in the sample entry. `moov`
     *  precedes `mdat` (the streaming layout), so `stco` carries one
     *  absolute chunk offset. Everything [[Codec.decodeMp4]] reports —
     *  dimensions, timescale, duration, sample count/size, chunk offset —
     *  is genuinely parsed back out of these boxes; only the sample BYTES
     *  themselves have no JDK codec, so pixel-level stats read the mdat
     *  payload directly. */
    def mp4(payload: Array[Byte]): Array[Byte] = {
      val (w, h) = grayDims(payload)
      val nSamples = math.max(1, (payload.length + Mp4SampleBytes - 1) / Mp4SampleBytes)
      val duration = nSamples * Mp4SampleDelta
      val dataLen = nSamples * Mp4SampleBytes
      // box sizes, bottom-up (each constant is header + fixed fields)
      val stsd = 16 + 86; val stts = 24; val stsc = 28; val stsz = 20; val stco = 20
      val stbl = 8 + stsd + stts + stsc + stsz + stco
      val vmhd = 20; val dinf = 36
      val minf = 8 + vmhd + dinf + stbl
      val mdhd = 32; val hdlr = 33
      val mdia = 8 + mdhd + hdlr + minf
      val tkhd = 92
      val trak = 8 + tkhd + mdia
      val mvhd = 108
      val moov = 8 + mvhd + trak
      val ftyp = 16
      val dataOff = ftyp + moov + 8 // absolute offset of the single chunk
      val out = ByteBuffer.allocate(dataOff + dataLen) // BMFF is big-endian (ByteBuffer default)
      def fourcc(s: String): Unit = out.put(s.getBytes("US-ASCII"))
      def zeros(n: Int): Unit = { var i = 0; while (i < n) { out.put(0.toByte); i += 1 } }
      // ftyp: major brand isom, minor version 0, no compatible brands
      out.putInt(ftyp); fourcc("ftyp"); fourcc("isom"); out.putInt(0)
      out.putInt(moov); fourcc("moov")
      // mvhd v0: timescale 1000, movie duration, rate 1.0, volume 1.0,
      // identity matrix, next track id 2
      out.putInt(mvhd); fourcc("mvhd"); out.putInt(0)
      out.putInt(0).putInt(0).putInt(1000).putInt(duration)
      out.putInt(0x00010000).putShort(0x0100.toShort).putShort(0); zeros(8)
      out.putInt(0x00010000).putInt(0).putInt(0)
      out.putInt(0).putInt(0x00010000).putInt(0)
      out.putInt(0).putInt(0).putInt(0x40000000)
      zeros(24); out.putInt(2)
      out.putInt(trak); fourcc("trak")
      // tkhd v0 flags=3 (enabled|in-movie): track 1, duration, identity
      // matrix, width/height as 16.16 fixed point
      out.putInt(tkhd); fourcc("tkhd"); out.putInt(3)
      out.putInt(0).putInt(0).putInt(1).putInt(0).putInt(duration); zeros(8)
      out.putShort(0).putShort(0).putShort(0).putShort(0)
      out.putInt(0x00010000).putInt(0).putInt(0)
      out.putInt(0).putInt(0x00010000).putInt(0)
      out.putInt(0).putInt(0).putInt(0x40000000)
      out.putInt(w << 16).putInt(h << 16)
      out.putInt(mdia); fourcc("mdia")
      // mdhd v0: media timescale 1000, duration, language 'und'
      out.putInt(mdhd); fourcc("mdhd"); out.putInt(0)
      out.putInt(0).putInt(0).putInt(1000).putInt(duration)
      out.putShort(0x55C4.toShort).putShort(0)
      // hdlr: video handler, empty NUL-terminated name
      out.putInt(hdlr); fourcc("hdlr"); out.putInt(0)
      out.putInt(0); fourcc("vide"); zeros(12); out.put(0.toByte)
      out.putInt(minf); fourcc("minf")
      // vmhd v0 flags=1 (spec requires the flag), graphics mode copy
      out.putInt(vmhd); fourcc("vmhd"); out.putInt(1)
      out.putShort(0); zeros(6)
      // dinf/dref: one self-contained url entry
      out.putInt(dinf); fourcc("dinf")
      out.putInt(28); fourcc("dref"); out.putInt(0).putInt(1)
      out.putInt(12); fourcc("url "); out.putInt(1)
      out.putInt(stbl); fourcc("stbl")
      // stsd: one 'raw ' visual sample entry carrying the frame geometry
      out.putInt(stsd); fourcc("stsd"); out.putInt(0).putInt(1)
      out.putInt(86); fourcc("raw "); zeros(6); out.putShort(1)
      out.putShort(0).putShort(0); zeros(12)
      out.putShort(w.toShort).putShort(h.toShort)
      out.putInt(0x00480000).putInt(0x00480000).putInt(0)
      out.putShort(1); zeros(32); out.putShort(0x0018.toShort).putShort(0xFFFF.toShort)
      // stts: one run of nSamples samples, 40 ticks each
      out.putInt(stts); fourcc("stts"); out.putInt(0).putInt(1)
      out.putInt(nSamples).putInt(Mp4SampleDelta)
      // stsc: one chunk holding every sample
      out.putInt(stsc); fourcc("stsc"); out.putInt(0).putInt(1)
      out.putInt(1).putInt(nSamples).putInt(1)
      // stsz: uniform 32-byte samples
      out.putInt(stsz); fourcc("stsz"); out.putInt(0)
      out.putInt(Mp4SampleBytes).putInt(nSamples)
      // stco: the single chunk's absolute file offset
      out.putInt(stco); fourcc("stco"); out.putInt(0).putInt(1).putInt(dataOff)
      // mdat: payload, zero-padded to a whole sample
      out.putInt(8 + dataLen); fourcc("mdat")
      out.put(payload); zeros(dataLen - payload.length)
      out.array()
    }
  }

  /** The codec: sniffs the container by magic bytes. BMP and WAV decode for
   *  real (header parse + full pixel/sample scan); anything else falls back
   *  to the deterministic stub. */
  object Codec {

    def decode(format: String, bytes: Array[Byte]): Decoded =
      if (bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
      else if (isWave(bytes)) decodeWav(bytes)
      else if (isJpeg(bytes)) decodeJpeg(bytes)
      else if (isMp4(bytes)) decodeMp4(bytes)
      else throw new IllegalArgumentException(
        s"unrecognized container (declared '$format') — quarantine")

    private def isJpeg(b: Array[Byte]): Boolean =
      b.length >= 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 && (b(2) & 0xFF) == 0xFF

    /** REAL JPEG decode through the JDK codec: full pixel decode, then the
     *  same BT.601 integer luma accumulation as [[decodeBmp]] (single-band
     *  grayscale rasters short-circuit to the sample value — BT.601 of
     *  (v,v,v) is v). Throws on truncated/invalid streams (ImageIO raises
     *  or returns null), which is exactly what the per-row Try quarantine
     *  upstream expects from a corrupt container. */
    def decodeJpeg(b: Array[Byte]): Decoded = {
      val (w, h, sum) = jpegLumaSum(b)
      val mean = if (w * h == 0) 0.0 else sum.toDouble / (w.toLong * h) / 255.0
      (w, h, 0L, mean, fingerprint(b))
    }

    /** Exact integer luma SUM of a decoded JPEG — the number the
     *  round-trip verdicts compare against the payload's exact sum. */
    def jpegLumaSum(b: Array[Byte]): (Int, Int, Long) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      require(img != null, "undecodable JPEG stream")
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val bands = raster.getNumBands
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val luma =
            if (bands == 1) raster.getSample(x, y, 0)
            else {
              val r = raster.getSample(x, y, 0)
              val g = raster.getSample(x, y, 1)
              val bl = raster.getSample(x, y, 2)
              (299 * r + 587 * g + 114 * bl) / 1000
            }
          sum += luma
          x += 1
        }
        y += 1
      }
      (w, h, sum)
    }

    private def isWave(b: Array[Byte]): Boolean =
      b.length >= 44 && new String(b, 0, 4, "US-ASCII") == "RIFF" &&
        new String(b, 8, 4, "US-ASCII") == "WAVE"

    /** BITMAPFILEHEADER + BITMAPINFOHEADER parse, then a full pixel scan for
     *  mean luma (BT.601 integer weights), honoring 4-byte row padding and
     *  top-down (negative height) files. */
    def decodeBmp(b: Array[Byte]): Decoded = {
      val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      val offset = buf.getInt(10)
      val w = buf.getInt(18)
      val h = math.abs(buf.getInt(22))
      val bpp = buf.getShort(28)
      require(bpp == 24, s"unsupported BMP bpp: $bpp")
      val rowBytes = (w * 3 + 3) & ~3
      var sum = 0L
      var count = 0L
      var row = 0
      while (row < h) {
        val base = offset + row * rowBytes
        var x = 0
        while (x < w) {
          val p = base + x * 3
          val bl = b(p) & 0xFF; val g = b(p + 1) & 0xFF; val r = b(p + 2) & 0xFF
          sum += (299 * r + 587 * g + 114 * bl) / 1000
          count += 1; x += 1
        }
        row += 1
      }
      (w, h, 0L, if (count == 0) 0.0 else sum.toDouble / count / 255.0, fingerprint(b))
    }

    /** RIFF chunk walk (word-aligned) to find `fmt ` and `data`, then a full
     *  sample scan for mean |amplitude|. */
    def decodeWav(b: Array[Byte]): Decoded = {
      val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      var sampleRate = 0; var bits = 0; var channels = 0
      var dataOff = -1; var dataLen = 0
      while (pos + 8 <= b.length) {
        val id = new String(b, pos, 4, "US-ASCII")
        val len = buf.getInt(pos + 4)
        // a corrupt/negative chunk length would walk pos backwards (infinite
        // loop) or past the buffer — reject it as an unsupported layout
        require(len >= 0 && pos + 8 + len <= b.length,
          s"unsupported WAV layout: chunk '$id' len=$len at $pos overruns ${b.length} bytes")
        if (id == "fmt ") {
          channels = buf.getShort(pos + 10)
          sampleRate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22)
        } else if (id == "data") { dataOff = pos + 8; dataLen = len }
        pos += 8 + len + (len & 1)
      }
      require(sampleRate > 0 && bits == 16 && channels == 1 && dataOff >= 0,
        s"unsupported WAV layout: rate=$sampleRate bits=$bits ch=$channels")
      val nSamples = dataLen / 2
      var sum = 0L
      var i = 0
      while (i < nSamples) { sum += math.abs(buf.getShort(dataOff + i * 2).toInt); i += 1 }
      val durationMs = nSamples * 1000L / sampleRate
      (0, 0, durationMs, if (nSamples == 0) 0.0 else sum.toDouble / nSamples / 32768.0, fingerprint(b))
    }

    private def isMp4(b: Array[Byte]): Boolean =
      b.length >= 12 && new String(b, 4, 4, "US-ASCII") == "ftyp"

    /** Parsed MP4 track facts — every field read out of real boxes. */
    final case class Mp4Info(width: Int, height: Int, durationMs: Long,
        nSamples: Int, sampleBytes: Int, dataOff: Int)

    /** Child boxes of the byte range [start, end): (fourcc, contentStart,
     *  contentEnd). Validates every declared box length against the buffer —
     *  a truncated file ALWAYS fails here (some box's declared end passes
     *  the cut), which is exactly the quarantine signal the corrupt audit
     *  relies on. Rejects 64-bit largesize boxes (size==1) and size==0
     *  ("to end of file") as unsupported layouts rather than guessing. */
    private def boxChildren(b: Array[Byte], start: Int, end: Int): List[(String, Int, Int)] = {
      val buf = ByteBuffer.wrap(b)
      var pos = start
      val out = List.newBuilder[(String, Int, Int)]
      while (pos < end) {
        require(pos + 8 <= end, s"truncated box header at $pos")
        val size = buf.getInt(pos)
        require(size >= 8, s"unsupported box size $size at $pos")
        require(pos + size <= end, s"box at $pos overruns: $size bytes declared, ${end - pos} present")
        out += ((new String(b, pos + 4, 4, "US-ASCII"), pos + 8, pos + size))
        pos += size
      }
      out.result()
    }

    private def child(boxes: List[(String, Int, Int)], fourcc: String): (Int, Int) =
      boxes.collectFirst { case (t, s, e) if t == fourcc => (s, e) }
        .getOrElse(throw new IllegalArgumentException(s"missing $fourcc box"))

    /** REAL ISO BMFF parse — the ftyp/moov/trak/stbl walk over the public
     *  ISO/IEC 14496-12 layout: dimensions from `tkhd`'s 16.16 fixed-point
     *  fields, duration from `mdhd`'s timescale+duration, sample count and
     *  uniform size from `stsz`, the chunk offset from `stco` — and every
     *  declared box length validated against the buffer, so structural
     *  truncation anywhere in the file throws (the audit's quarantine
     *  signal is real parsing, not byte-count heuristics). */
    def mp4Info(b: Array[Byte]): Mp4Info = {
      require(isMp4(b), "not an ISO BMFF stream")
      val top = boxChildren(b, 0, b.length)
      val buf = ByteBuffer.wrap(b)
      val (moovS, moovE) = child(top, "moov")
      child(top, "mdat") // must be present and structurally whole
      val moov = boxChildren(b, moovS, moovE)
      val (trakS, trakE) = child(moov, "trak")
      val trak = boxChildren(b, trakS, trakE)
      val (tkhdS, tkhdE) = child(trak, "tkhd")
      require(tkhdE - tkhdS >= 84 && buf.get(tkhdS) == 0, "unsupported tkhd version")
      val width = buf.getInt(tkhdE - 8) >>> 16
      val height = buf.getInt(tkhdE - 4) >>> 16
      val (mdiaS, mdiaE) = child(trak, "mdia")
      val mdia = boxChildren(b, mdiaS, mdiaE)
      val (mdhdS, mdhdE) = child(mdia, "mdhd")
      require(mdhdE - mdhdS >= 24 && buf.get(mdhdS) == 0, "unsupported mdhd version")
      val timescale = buf.getInt(mdhdS + 12)
      val duration = buf.getInt(mdhdS + 16)
      require(timescale > 0, "mdhd timescale must be positive")
      val (minfS, minfE) = child(mdia, "minf")
      val (stblS, stblE) = child(boxChildren(b, minfS, minfE), "stbl")
      val stbl = boxChildren(b, stblS, stblE)
      val (stszS, _) = child(stbl, "stsz")
      val sampleBytes = buf.getInt(stszS + 4)
      val nSamples = buf.getInt(stszS + 8)
      require(sampleBytes > 0, "per-sample size tables unsupported (uniform stsz only)")
      val (stcoS, _) = child(stbl, "stco")
      require(buf.getInt(stcoS + 4) == 1, "multi-chunk stco unsupported")
      val dataOff = buf.getInt(stcoS + 8)
      require(dataOff >= 0 && dataOff.toLong + nSamples.toLong * sampleBytes <= b.length,
        s"sample data [$dataOff, +${nSamples.toLong * sampleBytes}) overruns ${b.length} bytes")
      Mp4Info(width, height, duration.toLong * 1000L / timescale, nSamples, sampleBytes, dataOff)
    }

    /** MP4 decode: genuine box-walk metadata ([[mp4Info]]); mean_level is
     *  the mean mdat sample byte — the one non-parsed number (no JDK video
     *  codec exists), read from the REAL parsed sample region. */
    def decodeMp4(b: Array[Byte]): Decoded = {
      val info = mp4Info(b)
      val total = info.nSamples.toLong * info.sampleBytes
      var sum = 0L
      var i = 0
      while (i < total) { sum += b(info.dataOff + i) & 0xFF; i += 1 }
      val mean = if (total == 0) 0.0 else sum.toDouble / total / 255.0
      (info.width, info.height, info.durationMs, mean, fingerprint(b))
    }

    /** The track's samples, read through the REAL sample table (stsz count
     *  and size, stco chunk offset): every `stride`-th sample as
     *  (sample_idx, bytes) — the honest frame-sampling path. */
    def mp4Samples(b: Array[Byte], stride: Int): Iterator[(Int, Array[Byte])] = {
      val info = mp4Info(b)
      Iterator.range(0, info.nSamples, stride).map { i =>
        val off = info.dataOff + i * info.sampleBytes
        (i, java.util.Arrays.copyOfRange(b, off, off + info.sampleBytes))
      }
    }

    /** BMP writer from a grayscale pixel matrix (row 0 = top), the inverse
     *  of [[decodeBmp]]'s scan — used by [[resizeBmp]]. */
    def bmpFromGray(w: Int, h: Int, pix: Array[Byte]): Array[Byte] = {
      val rowBytes = (w * 3 + 3) & ~3
      val imageSize = rowBytes * h
      val out = ByteBuffer.allocate(54 + imageSize).order(ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(54 + imageSize).putInt(0).putInt(54)
      out.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24).putInt(0)
        .putInt(imageSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
      var row = h - 1
      while (row >= 0) {
        var x = 0
        while (x < w) {
          val v = pix(row * w + x)
          out.put(v).put(v).put(v)
          x += 1
        }
        var pad = rowBytes - w * 3
        while (pad > 0) { out.put(0.toByte); pad -= 1 }
        row -= 1
      }
      out.array()
    }

    /** REAL image resize: box-average downscale of a 24-bit BMP by an
     *  integer factor (each output pixel = integer mean luma of its f×f
     *  source block, partial blocks at the edges use their actual size).
     *  Output dims: max(1, w/f) × max(1, h/f). Pure pixel arithmetic —
     *  no codec library needed for this container. */
    def resizeBmp(b: Array[Byte], factor: Int): Array[Byte] = {
      require(factor >= 1, "factor must be >= 1")
      val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      val offset = buf.getInt(10)
      val w = buf.getInt(18)
      val h = math.abs(buf.getInt(22))
      require(buf.getShort(28) == 24, "unsupported BMP bpp")
      val rowBytes = (w * 3 + 3) & ~3
      val wN = math.max(1, w / factor)
      val hN = math.max(1, h / factor)
      val pix = new Array[Byte](wN * hN)
      var y = 0
      while (y < hN) {
        var x = 0
        while (x < wN) {
          var sum = 0L; var n = 0
          var sy = y * factor
          val syEnd = math.min(h, (y + 1) * factor)
          while (sy < syEnd) {
            var sx = x * factor
            val sxEnd = math.min(w, (x + 1) * factor)
            // file stores rows bottom-up: logical row sy is file row h-1-sy
            val base = offset + (h - 1 - sy) * rowBytes
            while (sx < sxEnd) {
              val p = base + sx * 3
              val bl = b(p) & 0xFF; val g = b(p + 1) & 0xFF; val r = b(p + 2) & 0xFF
              sum += (299 * r + 587 * g + 114 * bl) / 1000
              n += 1; sx += 1
            }
            sy += 1
          }
          pix(y * wN + x) = (sum / n).toByte
          x += 1
        }
        y += 1
      }
      bmpFromGray(wN, hN, pix)
    }

    /** REAL audio resample: downsample a 16-bit mono PCM WAV by an integer
     *  factor — each output sample is the integer mean of its source group
     *  (trailing partial group dropped, like a polyphase decimator's edge),
     *  sample rate divided accordingly so DURATION is preserved. Pure
     *  sample arithmetic, no codec library. */
    def resampleWav(b: Array[Byte], factor: Int): Array[Byte] = {
      require(factor >= 1, "factor must be >= 1")
      val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      var sampleRate = 0; var dataOff = -1; var dataLen = 0
      while (pos + 8 <= b.length) {
        val id = new String(b, pos, 4, "US-ASCII")
        val len = buf.getInt(pos + 4)
        if (id == "fmt ") sampleRate = buf.getInt(pos + 12)
        else if (id == "data") { dataOff = pos + 8; dataLen = len }
        pos += 8 + len + (len & 1)
      }
      require(sampleRate > 0 && dataOff >= 0, "unsupported WAV layout")
      val n = dataLen / 2
      val nOut = n / factor
      val rateOut = math.max(1, sampleRate / factor)
      val out = ByteBuffer.allocate(44 + nOut * 2).order(ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + nOut * 2).put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
        .putInt(rateOut).putInt(rateOut * 2).putShort(2).putShort(16)
      out.put("data".getBytes("US-ASCII")).putInt(nOut * 2)
      var i = 0
      while (i < nOut) {
        var sum = 0L
        var j = 0
        while (j < factor) { sum += buf.getShort(dataOff + (i * factor + j) * 2); j += 1 }
        out.putShort((sum / factor).toShort)
        i += 1
      }
      out.array()
    }

    /** Per-window PCM energy scan: sum of squared int16 samples per
     *  fixed-size window (exact Long arithmetic — max 100·32768² ≈ 2³⁷,
     *  nowhere near overflow). The RIFF walk mirrors [[decodeWav]]. */
    def windowEnergies(b: Array[Byte], win: Int): Seq[(Int, Long, Int)] = {
      val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      var dataOff = -1; var dataLen = 0
      while (pos + 8 <= b.length) {
        val id = new String(b, pos, 4, "US-ASCII")
        val len = buf.getInt(pos + 4)
        // same guard as decodeWav's walk: a corrupt/negative length must
        // fail as an unsupported layout, not loop or overrun the buffer
        require(len >= 0 && pos + 8 + len <= b.length,
          s"unsupported WAV layout: chunk '$id' len=$len at $pos overruns ${b.length} bytes")
        if (id == "data") { dataOff = pos + 8; dataLen = len }
        pos += 8 + len + (len & 1)
      }
      require(dataOff >= 0, "unsupported WAV layout")
      val n = dataLen / 2
      val out = Vector.newBuilder[(Int, Long, Int)]
      var w = 0
      while (w * win < n) {
        val end = math.min(n, (w + 1) * win)
        var e = 0L
        var i = w * win
        while (i < end) {
          val s = buf.getShort(dataOff + i * 2).toLong
          e += s * s
          i += 1
        }
        out += ((w, e, end - w * win))
        w += 1
      }
      out.result()
    }

    /** Perceptual average-hash (aHash) of a 24-bit BMP: decode to the
     *  logical top-down luma matrix, box-average into an 8×8 grid (cell of
     *  pixel (r,c) is `(r·8 div h, c·8 div w)` — the standard partition),
     *  threshold each cell average against the mean of the 64 averages,
     *  bit k = cr·8+cc. ALL-INTEGER (per-pixel BT.601 luma, integer cell
     *  division, integer mean), so the hash is exactly reproducible from
     *  the payload bytes by the SQL oracle. Returns None when the image is
     *  smaller than the grid (w or h < 8) — no meaningful percept there.
     *  One O(pixels) pass; O(1) state. */
    def ahash64(b: Array[Byte]): Option[(Long, Int)] = {
      val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      val offset = buf.getInt(10)
      val w = buf.getInt(18)
      val hRaw = buf.getInt(22)
      val h = math.abs(hRaw)
      require(buf.getShort(28) == 24, "unsupported BMP bpp")
      if (w < 8 || h < 8) return None
      val rowBytes = (w * 3 + 3) & ~3
      val sums = new Array[Long](64)
      val counts = new Array[Long](64)
      var r = 0
      while (r < h) {
        // positive height ⇒ bottom-up file order: logical row r sits at
        // file row h−1−r (same convention decodeBmp honors)
        val fileRow = if (hRaw > 0) h - 1 - r else r
        val base = offset + fileRow * rowBytes
        val cr = r * 8 / h
        var c = 0
        while (c < w) {
          val p = base + c * 3
          val bl = b(p) & 0xFF; val g = b(p + 1) & 0xFF; val rr = b(p + 2) & 0xFF
          val cell = cr * 8 + c * 8 / w
          sums(cell) += (299 * rr + 587 * g + 114 * bl) / 1000
          counts(cell) += 1
          c += 1
        }
        r += 1
      }
      val avgs = Array.tabulate(64)(k => sums(k) / counts(k))
      val mean = avgs.sum / 64
      var hash = 0L
      var nBits = 0
      var k = 0
      while (k < 64) {
        if (avgs(k) > mean) { hash |= 1L << k; nBits += 1 }
        k += 1
      }
      Some((hash, nBits))
    }

    /** Fixed-point DCT-II basis, `round(cos((2r+1)·u·π/16) · 2^14)` for
     *  the 4 lowest frequencies u over 8 sample positions r — the integer
     *  cos table both the codec and the SQL oracle share (hard-coded so
     *  the hash never depends on a platform's libm). */
    val DctC: Array[Array[Long]] = Array(
      Array(16384L, 16384L, 16384L, 16384L, 16384L, 16384L, 16384L, 16384L),
      Array(16069L, 13623L, 9102L, 3196L, -3196L, -9102L, -13623L, -16069L),
      Array(15137L, 6270L, -6270L, -15137L, -15137L, -6270L, 6270L, 15137L),
      Array(13623L, -3196L, -16069L, -9102L, 9102L, 16069L, 3196L, -13623L))

    /** Perceptual DCT hash (pHash, 15 bits) of a 24-bit BMP: box-average
     *  the luma into the same 8×8 grid as [[ahash64]], apply the
     *  fixed-point 8×8 DCT-II (standard pHash pipeline — Zauner 2010 —
     *  but in EXACT integers via [[DctC]]), keep the 4×4 low-frequency
     *  block minus DC, and set bit u·4+v when the coefficient strictly
     *  exceeds the 15-coefficient mean. The compare is cross-multiplied
     *  (`f·15 > Σf`) because signed integer division FLOORS in DuckDB but
     *  TRUNCATES in Spark/JVM — with negative DCT coefficients the two
     *  means would disagree. Headroom: |f| ≤ 64·255·2^28 < 2^43.
     *  None below the 8×8 grid. One O(pixels) pass + an O(1) transform. */
    def phash16(b: Array[Byte]): Option[(Long, Int)] = {
      val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      val offset = buf.getInt(10)
      val w = buf.getInt(18)
      val hRaw = buf.getInt(22)
      val h = math.abs(hRaw)
      require(buf.getShort(28) == 24, "unsupported BMP bpp")
      if (w < 8 || h < 8) return None
      val rowBytes = (w * 3 + 3) & ~3
      val sums = new Array[Long](64)
      val counts = new Array[Long](64)
      var r = 0
      while (r < h) {
        val fileRow = if (hRaw > 0) h - 1 - r else r
        val base = offset + fileRow * rowBytes
        val cr = r * 8 / h
        var c = 0
        while (c < w) {
          val p = base + c * 3
          val bl = b(p) & 0xFF; val g = b(p + 1) & 0xFF; val rr = b(p + 2) & 0xFF
          val cell = cr * 8 + c * 8 / w
          sums(cell) += (299 * rr + 587 * g + 114 * bl) / 1000
          counts(cell) += 1
          c += 1
        }
        r += 1
      }
      val avgs = Array.tabulate(64)(k => sums(k) / counts(k))
      val fs = new Array[Long](16) // fs(0) = DC slot stays 0 (excluded)
      var u = 0
      while (u < 4) {
        var v = 0
        while (v < 4) {
          if (u != 0 || v != 0) {
            var f = 0L
            var rr = 0
            while (rr < 8) {
              var cc = 0
              while (cc < 8) { f += avgs(rr * 8 + cc) * DctC(u)(rr) * DctC(v)(cc); cc += 1 }
              rr += 1
            }
            fs(u * 4 + v) = f
          }
          v += 1
        }
        u += 1
      }
      var tot = 0L
      var k = 1
      while (k < 16) { tot += fs(k); k += 1 }
      var hash = 0L
      var nBits = 0
      k = 1
      while (k < 16) {
        if (fs(k) * 15 > tot) { hash |= 1L << k; nBits += 1 }
        k += 1
      }
      Some((hash, nBits))
    }

    /** Difference-hash (dHash) of a 24-bit BMP: box-average the luma
     *  matrix into an 8×9 grid (one extra column), bit r·8+c = 1 when
     *  cell (r, c+1) is strictly brighter than cell (r, c) — a horizontal
     *  GRADIENT sign, invariant to global brightness/contrast shifts that
     *  flip aHash bits near the mean. Same all-integer arithmetic as
     *  [[ahash64]] so the SQL oracle replays it exactly; None below the
     *  9×8 grid. One O(pixels) pass; O(1) state. */
    def dhash64(b: Array[Byte]): Option[(Long, Int)] = {
      val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      val offset = buf.getInt(10)
      val w = buf.getInt(18)
      val hRaw = buf.getInt(22)
      val h = math.abs(hRaw)
      require(buf.getShort(28) == 24, "unsupported BMP bpp")
      if (w < 9 || h < 8) return None
      val rowBytes = (w * 3 + 3) & ~3
      val sums = new Array[Long](72)
      val counts = new Array[Long](72)
      var r = 0
      while (r < h) {
        val fileRow = if (hRaw > 0) h - 1 - r else r
        val base = offset + fileRow * rowBytes
        val cr = r * 8 / h
        var c = 0
        while (c < w) {
          val p = base + c * 3
          val bl = b(p) & 0xFF; val g = b(p + 1) & 0xFF; val rr = b(p + 2) & 0xFF
          val cell = cr * 9 + c * 9 / w
          sums(cell) += (299 * rr + 587 * g + 114 * bl) / 1000
          counts(cell) += 1
          c += 1
        }
        r += 1
      }
      val avgs = Array.tabulate(72)(k => sums(k) / counts(k))
      var hash = 0L
      var nBits = 0
      var rr2 = 0
      while (rr2 < 8) {
        var cc2 = 0
        while (cc2 < 8) {
          if (avgs(rr2 * 9 + cc2 + 1) > avgs(rr2 * 9 + cc2)) {
            hash |= 1L << (rr2 * 8 + cc2); nBits += 1
          }
          cc2 += 1
        }
        rr2 += 1
      }
      Some((hash, nBits))
    }

    /** INTEGER SOBEL edge statistics over the logical luma grid: at every
     *  interior pixel, gx/gy are the standard 3×3 Sobel responses on the
     *  same integer BT.601 luma as [[ahash64]]; the pixel is an EDGE when
     *  `|gx| + |gy| >= thresh`. Returns (interiorPixels, edgePixels), or
     *  None when the image has no interior (w or h < 3). All-integer —
     *  the SQL oracle replays the stencil exactly. One O(pixels) pass
     *  (each luma re-read is O(1) against the mapped buffer). */
    def edgeStats(b: Array[Byte], thresh: Int): Option[(Long, Long)] = {
      val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      val offset = buf.getInt(10)
      val w = buf.getInt(18)
      val hRaw = buf.getInt(22)
      val h = math.abs(hRaw)
      require(buf.getShort(28) == 24, "unsupported BMP bpp")
      if (w < 3 || h < 3) return None
      val rowBytes = (w * 3 + 3) & ~3
      def luma(r: Int, c: Int): Int = {
        val fileRow = if (hRaw > 0) h - 1 - r else r
        val p = offset + fileRow * rowBytes + c * 3
        val bl = b(p) & 0xFF; val g = b(p + 1) & 0xFF; val rr = b(p + 2) & 0xFF
        (299 * rr + 587 * g + 114 * bl) / 1000
      }
      var edges = 0L
      var r = 1
      while (r < h - 1) {
        var c = 1
        while (c < w - 1) {
          val gx = (luma(r - 1, c + 1) + 2 * luma(r, c + 1) + luma(r + 1, c + 1)) -
                   (luma(r - 1, c - 1) + 2 * luma(r, c - 1) + luma(r + 1, c - 1))
          val gy = (luma(r + 1, c - 1) + 2 * luma(r + 1, c) + luma(r + 1, c + 1)) -
                   (luma(r - 1, c - 1) + 2 * luma(r - 1, c) + luma(r - 1, c + 1))
          if (math.abs(gx) + math.abs(gy) >= thresh) edges += 1
          c += 1
        }
        r += 1
      }
      Some(((w - 2).toLong * (h - 2), edges))
    }

    /** FNV-1a 64-bit over the whole payload — the content fingerprint. */
    def fingerprint(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h = (h ^ (bytes(i) & 0xFF)) * 0x100000001b3L; i += 1 }
      h
    }
  }

  /** Synthesize the opaque media table from documents: payload = UTF-8
   *  bytes of text, format bucketed from a content hash (stable across
   *  engines — this table carries the exact metadata oracle). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      when(substring(md5(col("text")), 1, 1) <= "3", "jpeg")
        .when(substring(md5(col("text")), 1, 1) <= "7", "png")
        .when(substring(md5(col("text")), 1, 1) <= "b", "wav")
        .otherwise("mp4").as("format"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))

  /** REAL container table: fully valid BMP (even doc_ids) / WAV (odd)
   *  files built from the document text, partition-streamed — the table a
   *  decode pipeline would actually receive. */
  def mediaContainers(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val media = if (id % 2 == 0) Containers.bmp(payload) else Containers.wav(payload)
        MediaRecord(id, media, if (id % 2 == 0) "bmp" else "wav", media.length.toLong)
      })
  }

  /** REAL MP4 container table: fully valid ISO BMFF files built from the
   *  documents the content-hash bucket tags as video (the same `md5 > 'b'`
   *  subset [[mediaTable]] labels mp4) — the rows every mp4 query decodes
   *  through the genuine box walk. */
  def mp4Containers(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .filter(substring(md5(col("text")), 1, 1) > "b")
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val media = Containers.mp4(text.getBytes("UTF-8"))
        MediaRecord(id, media, "mp4", media.length.toLong)
      })
  }

  /** CORRUPT-CONTAINER AUDIT — the decode tier's quarantine path (the
   *  media twin of schema_corrupt_audit): every 41st container is
   *  deterministically truncated to half its bytes, each record is
   *  decoded AS ITS DECLARED FORMAT inside a per-row Try, and failures
   *  roll into a per-format audit instead of killing the task — the
   *  error-tolerance a real ingest of scraped media cannot ship without.
   *  Oracle-exact because the failure set is fully determined: a valid
   *  container never throws, and a half-truncated one always does (the
   *  pixel/sample walk or the header read overruns the buffer — there is
   *  no length at which half a container still parses). */
  def mediaCorruptAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaContainers(spark, dir).union(mp4Containers(spark, dir))
      .mapPartitions(_.map { r =>
        val m = if (r.doc_id % 41 == 0) r.media.take(r.media.length / 2) else r.media
        val ok = scala.util.Try {
          r.format match {
            case "bmp" => Codec.decodeBmp(m)
            case "wav" => Codec.decodeWav(m)
            // mp4 quarantine is REAL structural parsing: the half-cut file
            // always leaves some declared box end past the cut (moov for
            // short payloads, mdat for long ones) and the box walk throws
            case _ => Codec.decodeMp4(m)
          }
        }.isSuccess
        (r.doc_id, r.format, ok)
      })
      .toDF("doc_id", "format", "ok")
      .groupBy("format")
      .agg(count(lit(1)).as("n_files"),
        sum(when(not(col("ok")), 1L).otherwise(0L)).as("n_bad"),
        max(when(col("ok"), col("doc_id"))).as("max_good_doc"))
      .orderBy("format")
  }

  /** REAL-JPEG ROUND-TRIP AUDIT — the honest form of "decode jpeg for
   *  real": every image doc's grayscale matrix is compressed by the JDK's
   *  own JPEG codec ([[Containers.jpeg]]) and decoded back through
   *  [[Codec.jpegLumaSum]] (full ImageIO pixel decode). JPEG is lossy, so
   *  the oracle asserts CLAIMS rather than pixels — the sketch_stats
   *  verdict discipline: dimensions must survive the round trip EXACTLY,
   *  and the decoded mean luma must land within 2 levels of the payload's
   *  exact integer mean (the DC coefficients a codec must preserve);
   *  every 41st image is truncated INSIDE its header and must QUARANTINE
   *  (per-row Try, the corrupt-audit discipline).
   *  DuckDB restates the claims as exact counts over the same doc set; a
   *  codec regression (wrong dims, luma drift, truncation accepted)
   *  flips a verdict and fails the hash compare. Same partition-streamed
   *  mapPartitions tier as every decode — encode+decode is per-row CPU,
   *  no shuffle, linear at any corpus size. */
  def mediaJpegRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text")).as[(Long, String)]
      .filter(_._1 % 2 == 0)
      .mapPartitions(_.map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val (w0, h0) = Containers.grayDims(payload)
        val exactSum = payload.foldLeft(0L)((s, b) => s + (b & 0xFF))
        val jpeg = Containers.jpeg(payload)
        if (id % 41 == 0) {
          // cut INSIDE the header (not at half): JPEG entropy decoders are
          // tolerant — a half-cut scan segment can still partially decode
          // (measured), so only a header-level cut is deterministically
          // unparseable, which is what an oracled claim needs
          val quarantined = scala.util.Try(
            Codec.jpegLumaSum(jpeg.take(24))).isFailure
          (id, false, false, quarantined)
        } else {
          val (w, h, lumaSum) = Codec.jpegLumaSum(jpeg)
          (id, w == w0 && h == h0,
            math.abs(lumaSum - exactSum) <= 2L * w0 * h0, false)
        }
      })
      .toDF("doc_id", "dims_ok", "luma_ok", "quarantined")
      .agg(count(lit(1)).as("n_images"),
        sum(when(col("dims_ok"), 1L).otherwise(0L)).as("n_dims_ok"),
        sum(when(col("luma_ok"), 1L).otherwise(0L)).as("n_luma_ok"),
        sum(when(col("quarantined"), 1L).otherwise(0L)).as("n_quarantined"))
  }

  /** Decode + feature-extract: typed `mapPartitions` — each task streams
   *  its partition through the codec, no collect, no per-row UDF boxing. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (w, h, durMs, level, phash) = Codec.decode(r.format, r.media)
        MediaFeatures(r.doc_id, r.format, r.n_bytes, w, h, durMs, level, phash)
      }
    }
  }

  /** Frame sampling over REAL containers: every `stride`-th sample of each
   *  video's parsed sample table ([[Codec.mp4Samples]] — stsz count/size,
   *  stco offset) becomes one frame row (doc_id, frame_idx, frame bytes) —
   *  the explode shape a real video pipeline uses, streamed per partition
   *  so no task ever holds more than one container. */
  def sampleMp4Frames(media: Dataset[MediaRecord], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap(r => Codec.mp4Samples(r.media, stride).map { case (i, f) => (r.doc_id, i, f) })
      .toDF("doc_id", "frame_idx", "frame")
  }

  // ---- harness queries -----------------------------------------------------

  /** Metadata extraction — pure column expressions, exact oracle. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select("doc_id", "format", "n_bytes").orderBy("doc_id")

  /** Full decode pipeline over REAL containers (BMP header+pixel parse,
   *  WAV chunk+sample parse), aggregated per format: image dims for bmp,
   *  durations for wav — every number a true property of the bytes, and
   *  (because the builders are deterministic in the payload size) exactly
   *  reproducible by the SQL oracle from octet_length alone. The pixel/
   *  sample-scan features (mean_level, phash) are verified round-trip in
   *  MediaSpec instead — SQL can't fold over blob bytes. */
  def mediaFeatureStats(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaContainers(spark, dir))
      .groupBy("format")
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("width")).cast("bigint").as("min_w"),
        max(col("height")).cast("bigint").as("max_h"),
        sum(col("duration_ms")).as("sum_duration_ms"))
      .orderBy("format")

  /** REAL resize pipeline over the BMP containers: decode → box-average
   *  half-scale → re-encode, streamed per partition; emits the resized
   *  geometry, which the oracle recomputes from octet_length alone
   *  (orig w ≈ √n capped 256 ⇒ wN = max(1, w/2), hN = max(1, h/2),
   *  bytes = 54 + padded rows). Pixel fidelity (mean preservation) is
   *  verified round-trip in MediaSpec — SQL can't fold over blob bytes. */
  def resizeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaContainers(spark, dir)
      .filter(col("format") === "bmp").as[MediaRecord]
      .mapPartitions(_.map { r =>
        val resized = Codec.resizeBmp(r.media, 2)
        val (w, h, _, _, _) = Codec.decodeBmp(resized)
        (r.doc_id, w.toLong, h.toLong, resized.length.toLong)
      })
      .toDF("doc_id", "new_w", "new_h", "new_bytes")
      .orderBy("doc_id")
  }

  /** REAL resample pipeline over the WAV containers: decode → pair-average
   *  half-rate → re-encode, streamed per partition; emits resampled sample
   *  count, byte size, and duration — all recomputed exactly by the SQL
   *  oracle from octet_length (one source sample per payload byte, 4 kHz
   *  output rate). Sample fidelity (duration + mean level) is verified
   *  round-trip in MediaSpec. */
  def resampleStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaContainers(spark, dir)
      .filter(col("format") === "wav").as[MediaRecord]
      .mapPartitions(_.map { r =>
        val out = Codec.resampleWav(r.media, 2)
        val (_, _, durMs, _, _) = Codec.decodeWav(out)
        (r.doc_id, (out.length - 44L) / 2L, out.length.toLong, durMs)
      })
      .toDF("doc_id", "new_samples", "new_bytes", "new_duration_ms")
      .orderBy("doc_id")
  }

  /** Perceptual image dedup signature: aHash over every decoded BMP — the
   *  image-side analogue of [[graft.dedup.Dedup]]'s SimHash for text.
   *  Near-duplicate images (re-encodes, small edits) collide or land
   *  within a few bits; grouping by the 64-bit value is the map-side
   *  dedup step, and the SimHash pigeonhole band join applies unchanged
   *  for hamming-tolerant matching. Streams per partition through the
   *  codec; emits (doc_id, ahash, n_bits) for every image at least 8×8.
   *  Bit-exactly oracled: the BMP pixels are the ASCII payload bytes, so
   *  SQL recomputes the identical integer cell/threshold arithmetic. */
  def imageAhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaContainers(spark, dir)
      .filter(col("format") === "bmp").as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        Codec.ahash64(r.media).map { case (h, n) => (r.doc_id, h, n.toLong) }
      })
      .toDF("doc_id", "ahash", "n_bits")
      .orderBy("doc_id")
  }

  /** Gradient-sign perceptual hash (dHash) per image — the
   *  brightness-invariant complement of [[imageAhash]]: a global
   *  luma/contrast shift moves every cell AND the mean, flipping aHash
   *  bits near the threshold, but leaves horizontal gradient SIGNS
   *  unchanged. A production near-dup tier keys on both hashes;
   *  [[imageNearDup]]'s pigeonhole chunk join applies to this signature
   *  unchanged. Same typed per-partition decode stream. */
  def imageDhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaContainers(spark, dir)
      .filter(col("format") === "bmp").as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        Codec.dhash64(r.media).map { case (h, n) => (r.doc_id, h, n.toLong) }
      })
      .toDF("doc_id", "dhash", "n_bits")
      .orderBy("doc_id")
  }

  /** Frequency-domain perceptual hash (pHash) per image — the third and
   *  strongest member of the perceptual-hash family: the DCT concentrates
   *  the percept into low-frequency coefficients, so the hash survives
   *  blur/resize/noise that flips spatial-domain aHash/dHash bits. All
   *  integer ([[Codec.phash16]]'s fixed-point cos table), so the SQL
   *  oracle replays the full 2-D transform through a cos-table join.
   *  Same typed per-partition decode stream as the other image ops. */
  def imagePhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaContainers(spark, dir)
      .filter(col("format") === "bmp").as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        Codec.phash16(r.media).map { case (h, n) => (r.doc_id, h, n.toLong) }
      })
      .toDF("doc_id", "phash", "n_bits")
      .orderBy("doc_id")
  }

  /** NEAR-DUPLICATE IMAGE DETECTION — the media-side dedup tier every
   *  multimodal training pipeline runs (resized/re-encoded copies of one
   *  image must collapse before training): perceptual aHash per image,
   *  then pairs within Hamming ≤ 7 via 16-BIT PIGEONHOLE CHUNKS WITH
   *  1-BIT MULTIPROBE. Soundness: ≤ 7 differing bits over 4 disjoint
   *  16-bit chunks means SOME chunk differs in at most ⌊7/4⌋ = 1 bit, so
   *  probing each image's 4 chunk keys plus their 16 one-bit flips
   *  (17 probes/chunk) against the corpus's exact chunk keys catches
   *  every qualifying pair through an equi-join on (chunk, key).
   *
   *  Why not the naive 8×8-bit chunk join (one clean chunk guaranteed):
   *  8-bit keys give only 256 buckets per chunk — at 2.5M images (sf10)
   *  every bucket holds ~10k signatures and the candidate join performs
   *  ~10¹¹ comparisons (measured: 265 s). 16-bit keys give 65k buckets;
   *  the 68-probe expansion costs 68 rows/signature but candidate pairs
   *  drop ~30×, and bucket population stays O(corpus/65536) as the
   *  corpus grows — the same population-vs-key-width reasoning as
   *  [[graft.similarity.Ann.sigBits]].
   *
   *  EXACT-FIRST: identical payloads (and re-encodes that land on the
   *  same aHash) collapse into one DISTINCT-HASH class before any pair
   *  work — the probe join, the hamming test and the multiprobe dedup
   *  all run on distinct hash VALUES (12× fewer rows here, and immune
   *  to exact-dup pileups: a hash carried by m images would otherwise
   *  put m² id-pairs through the join and the probe-dedup distinct —
   *  measured 41 s at sf10, 10× of it class expansion the join never
   *  needed to see). The id-level pair list is then one class-pair
   *  expansion (two generators, linear in the OUTPUT), same rows as
   *  the id-level join emitted. A corpus whose largest exact-dup class
   *  outgrows pair-list semantics (m² output) needs the cluster
   *  representation ([[graft.dedup.Dedup]] survivorship), not a faster
   *  join — the output itself is the bound here. */
  def imageNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigs = mediaContainers(spark, dir)
      .filter(col("format") === "bmp").as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        Codec.ahash64(r.media).map { case (h, _) => (r.doc_id, h) }
      })
      .toDF("doc_id", "ahash")
    // one row per DISTINCT hash value, ids carried as a sorted class
    val classes = sigs.groupBy("ahash")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .persist(Tuning.persistLevel) // both sides of the hash-pair join + both expansions
    def chunkOf(h: Column, c: Int): Column =
      call_function("shiftright", h, lit(c * 16)).bitwiseAND(0xFFFFL)
    // probe side: 4 chunks × (exact + 16 one-bit flips) over distinct hashes
    val probes = for { c <- 0 until 4; f <- 0 to 16 } yield
      struct(lit(c).as("chunk"),
        (if (f == 0) chunkOf(col("ha"), c)
         else chunkOf(col("ha"), c).bitwiseXOR(lit(1L << (f - 1)))).as("ckey"))
    val probe = classes.select(col("ahash").as("ha"))
      .select(col("ha"), explode(array(probes: _*)).as("p"))
      .select(col("ha"), col("p.chunk").as("chunk"), col("p.ckey").as("ckey"))
    val exact = classes.select(col("ahash").as("hb"))
      .select(col("hb"), explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"), chunkOf(col("hb"), c).as("ckey"))): _*)).as("e"))
      .select(col("hb"), col("e.chunk").as("chunk"), col("e.ckey").as("ckey"))
    // qualifying DISTINCT-HASH pairs, each counted once (ha < hb removes
    // both the self-pair and the multiprobe mirror image)
    val hashPairs = probe.join(exact, Seq("chunk", "ckey"))
      .filter(col("ha") < col("hb"))
      .select(col("ha"), col("hb"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .filter(col("hamming") <= 7)
      .distinct() // a hash pair may match through several (chunk, flip) probes
    // cross-class expansion: every id of ha × every id of hb
    val cross = hashPairs
      .join(classes.select(col("ahash").as("ha"), col("ids").as("ids_a")), "ha")
      .join(classes.select(col("ahash").as("hb"), col("ids").as("ids_b")), "hb")
      .select(explode(col("ids_a")).as("x"), col("ids_b"), col("hamming"))
      .select(col("x"), explode(col("ids_b")).as("y"), col("hamming"))
      .select(least(col("x"), col("y")).as("id_a"),
        greatest(col("x"), col("y")).as("id_b"), col("hamming"))
    // within-class expansion: hamming 0 pairs inside one exact-dup class
    val within = classes.filter(size(col("ids")) > 1)
      .select(posexplode(col("ids")).as(Seq("i", "id_a")), col("ids"))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("id_b"))
      .select(col("id_a"), col("id_b"), lit(0).cast("int").as("hamming"))
    cross.unionAll(within).orderBy("id_a", "id_b")
  }

  /** EDGE DENSITY per image — the 2-D stencil pass (integer Sobel) that a
   *  visual-quality filter runs to separate structured content from flat
   *  or noise frames: per-pixel |gx|+|gy| against a fixed threshold over
   *  the interior of the luma grid, rolled up to per-image edge counts
   *  and density in basis points. The stencil runs inside the same typed
   *  per-partition stream as the other decoders (a neighborhood
   *  computation has no Catalyst expression — this is the legitimate
   *  `mapPartitions` tier), and the all-integer arithmetic lets the SQL
   *  oracle replay the full 3×3 convolution with a stencil join. */
  def edgeDensity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaContainers(spark, dir)
      .filter(col("format") === "bmp").as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        Codec.edgeStats(r.media, thresh = 160).map { case (ni, ne) => (r.doc_id, ni, ne) }
      })
      .toDF("doc_id", "n_interior", "n_edges")
      .withColumn("edge_density_bp", expr("n_edges * 10000 div n_interior"))
      .orderBy("doc_id")
  }

  /** Scene-cut detection over the sampled frame stream of the PARSED
   *  containers: per-frame energy (sample-byte sum), then the absolute
   *  delta between consecutive SAMPLED frames — a jump above the threshold
   *  marks a content cut. The video-side shape of the audio loudness pass:
   *  energies are computed in the same typed map the frames stream through
   *  (no second decode), the delta is a lag window over the
   *  HIGH-cardinality doc key, and the rollup is one aggregate. Exactly
   *  oracle-able: the sample bytes are the ASCII text payload (tail frame
   *  zero-padded), so SQL replays energy, lag and threshold bit-for-bit. */
  def sceneCuts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val energies = sampleMp4Frames(mp4Containers(spark, dir), stride = 2)
      .as[(Long, Int, Array[Byte])]
      .map { case (id, i, f) => (id, i, f.foldLeft(0L)((a, b) => a + (b & 0xFF))) }
      .toDF("doc_id", "frame_idx", "energy")
    val byDoc = Window.partitionBy("doc_id").orderBy("frame_idx")
    energies
      .withColumn("delta", abs(col("energy") - lag(col("energy"), 1).over(byDoc)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("delta") > 200L, 1L).otherwise(0L)).as("n_cuts"),
        coalesce(max(col("delta")), lit(0L)).as("max_delta"))
      .orderBy("doc_id")
  }

  /** Frame sampling stats: sampled frames per video, through the REAL
   *  sample table (stsz/stco) of the parsed container. */
  def frameSampleStats(spark: SparkSession, dir: String): DataFrame = {
    sampleMp4Frames(mp4Containers(spark, dir), stride = 2)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        max(octet_length(col("frame"))).cast("bigint").as("frame_bytes"))
      .orderBy("doc_id")
  }

  /** MP4 METADATA — the box-walk facts per video, every column genuinely
   *  parsed: dimensions from tkhd's 16.16 fields, duration from mdhd's
   *  timescale+duration, frame count from stsz, and the container size the
   *  builder's geometry predicts from the payload length alone — so the
   *  SQL oracle checks the WRITER and the PARSER against each other. */
  def mp4Meta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mp4Containers(spark, dir)
      .mapPartitions(_.map { r =>
        val info = Codec.mp4Info(r.media)
        (r.doc_id, info.width.toLong, info.height.toLong,
          info.durationMs, info.nSamples.toLong, r.n_bytes)
      })
      .toDF("doc_id", "width", "height", "duration_ms", "n_frames", "n_bytes")
      .orderBy("doc_id")
  }

  /** Windowed audio LOUDNESS over the real WAV decode: per-100-sample
   *  energy (sum of squared int16 samples, exact Long), rolled up per
   *  document — the VAD/silence-trim precursor an audio-training pipeline
   *  runs. Streams per partition through the codec like every media op;
   *  the per-window fold never materializes the sample array. Exactly
   *  oracle-able because the synthesized PCM is a pure function of the
   *  text bytes (sample = (byte − 128)·256) and the corpus is ASCII, so
   *  SQL reproduces every sample from `ascii(substring(text, i, 1))`. */
  def audioLoudness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaContainers(spark, dir)
      .filter(_.format == "wav")
      .flatMap(r => Codec.windowEnergies(r.media, win = 100)
        .map { case (widx, e, n) => (r.doc_id, widx, e, n) })
      .toDF("doc_id", "widx", "energy", "n_samples")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        max(col("energy")).as("max_energy"),
        sum(col("energy")).as("total_energy"))
      .orderBy("doc_id")
  }

  /** VOICE-ACTIVITY SEGMENTS over the windowed energies — the actual VAD /
   *  silence-trim pass [[audioLoudness]] is the precursor of: a window is
   *  ACTIVE when its energy is strictly above the document's mean window
   *  energy (an integer cross-multiplied compare, `energy·n_windows >
   *  total_energy` — no division, no float), and adjacent active windows
   *  merge into segments by gaps-and-islands. Output per track: segment
   *  count, longest segment, active windows and active ratio. Documents
   *  whose windows all tie the mean have no active window and drop — a
   *  constant-energy track has nothing to trim.
   *
   *  Scale shape: same per-partition codec stream as the other audio ops;
   *  the islands window partitions on doc_id — high-cardinality, with a
   *  per-doc window count bounded by payload/100 — the same per-key window
   *  discipline as text_keywords, never a global or low-cardinality key. */
  def audioVad(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val win = mediaContainers(spark, dir)
      .filter(_.format == "wav")
      .flatMap(r => Codec.windowEnergies(r.media, win = 100)
        .map { case (widx, e, _) => (r.doc_id, widx, e) })
      .toDF("doc_id", "widx", "energy")
    val stats = win.groupBy("doc_id")
      .agg(count(lit(1)).as("nw"), sum("energy").as("tot"))
    val active = win.join(stats, "doc_id")
      .filter(col("energy") * col("nw") > col("tot"))
    val islands = Window.partitionBy("doc_id").orderBy("widx")
    val segs = active
      .withColumn("island", col("widx") - row_number().over(islands))
      .groupBy("doc_id", "island")
      .agg(count(lit(1)).as("seg_len"))
    segs.groupBy("doc_id")
      .agg(count(lit(1)).as("n_segments"),
        max("seg_len").as("longest_seg"),
        sum("seg_len").as("active_windows"))
      .join(stats.select(col("doc_id"), col("nw")), "doc_id")
      .select(col("doc_id"), col("n_segments"), col("longest_seg"),
        col("active_windows"),
        expr("active_windows * 10000 div nw").as("active_ratio_bp"))
      .orderBy("doc_id")
  }

  /** AUDIO FINGERPRINT — the acoustic analogue of the image hashes: a
   *  63-bit signature of the energy-envelope SHAPE (bit i = window i+1
   *  is louder than window i, over the first 63 window transitions).
   *  Volume-invariant the same way dHash is brightness-invariant: global
   *  gain scales every window energy by one factor and preserves every
   *  comparison, so re-levelled copies of one recording collide — the
   *  dedup key a speech corpus needs before training. Bits stop at 62 so
   *  the packed sum stays in signed-long range. Same per-partition PCM
   *  walk as the loudness/VAD queries; exact integer energies, so the
   *  ASCII-replay oracle reproduces every bit. */
  def audioFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val win = mediaContainers(spark, dir)
      .filter(_.format == "wav")
      .flatMap(r => Codec.windowEnergies(r.media, win = 100)
        .map { case (widx, e, _) => (r.doc_id, widx, e) })
      .toDF("doc_id", "widx", "energy")
    val nxt = win.select(col("doc_id"), (col("widx") - 1).as("widx"),
      col("energy").as("e_next"))
    win.join(nxt, Seq("doc_id", "widx"))
      .filter(col("widx") < 63)
      .groupBy("doc_id")
      .agg(
        sum(expr("CASE WHEN e_next > energy THEN shiftleft(cast(1 as bigint), cast(widx as int)) ELSE 0 END")).as("afp"),
        sum(when(col("e_next") > col("energy"), 1L).otherwise(0L)).as("n_rising"),
        count(lit(1)).as("n_transitions"))
      .orderBy("doc_id")
  }

  /** Shared oracle CTE chain: per-image aHash replayed in SQL (BMP
   *  grayscale pixel i = ASCII byte i of the text, zero-padded) —
   *  consumed by the media_image_ahash projection and the
   *  media_dedup_ahash pair join. Final CTE: `bits(doc_id, hv, nb)`. */
  /** Shared oracle prefix: synthetic-BMP geometry + 8×8 luma cell
   *  averages (`cells(doc_id, cr, cc, a)`) — the common input of the
   *  aHash threshold chain and the pHash DCT chain. */
  private val CellCtes: String = """base AS (
        SELECT doc_id, text, octet_length(encode(text)) AS n0
        FROM documents WHERE doc_id % 2 = 0),
      geo AS (
        SELECT doc_id, text, greatest(n0, 1) AS n,
               least(256, greatest(1,
                 cast(ceil(sqrt(cast(greatest(n0, 1) as double))) as bigint))) AS w
        FROM base),
      geo2 AS (
        SELECT doc_id, text, n, w, (n + w - 1) // w AS h
        FROM geo),
      ok AS (SELECT * FROM geo2 WHERE w >= 8 AND h >= 8),
      px AS (
        SELECT doc_id, ((i // w) * 8) // h AS cr, ((i % w) * 8) // w AS cc,
               CASE WHEN i < n THEN ascii(substr(text, cast(i + 1 as int), 1))
                    ELSE 0 END AS v
        FROM ok, unnest(range(0, w * h)) u(i)),
      cells AS (
        SELECT doc_id, cr, cc, sum(v) // count(*) AS a
        FROM px GROUP BY 1, 2, 3)"""

  /** Oracle CTE chain for [[imagePhash]]: the shared cell grid, the
   *  fixed-point DCT as a cos-table JOIN (two ctab probes — one per
   *  spatial axis), and the cross-multiplied mean threshold. Final CTE:
   *  `pbits(doc_id, hv, nb)`. The cos table renders from [[Codec.DctC]]
   *  so codec and oracle can never drift. */
  private lazy val PhashCtes: String = {
    val ctabRows = (for (u <- 0 until 4; r <- 0 until 8)
      yield s"($u, $r, ${Codec.DctC(u)(r)})").mkString(", ")
    s"""$CellCtes,
      ctab AS (SELECT * FROM (VALUES $ctabRows) t(u, r, cv)),
      coef AS (
        SELECT c.doc_id, cu.u AS u, cw.u AS v, sum(c.a * cu.cv * cw.cv) AS f
        FROM cells c
        JOIN ctab cu ON cu.r = c.cr
        JOIN ctab cw ON cw.r = c.cc
        WHERE NOT (cu.u = 0 AND cw.u = 0)
        GROUP BY 1, 2, 3),
      tot AS (SELECT doc_id, sum(f) AS s FROM coef GROUP BY 1),
      pbits AS (
        SELECT coef.doc_id,
               sum(CASE WHEN coef.f * 15 > tot.s
                        THEN (1::HUGEINT << cast(coef.u * 4 + coef.v as int))
                        ELSE 0::HUGEINT END) AS hv,
               sum(CASE WHEN coef.f * 15 > tot.s THEN 1 ELSE 0 END) AS nb
        FROM coef JOIN tot USING (doc_id) GROUP BY 1)"""
  }

  private val AhashCtes: String = s"""$CellCtes,
      m AS (SELECT doc_id, sum(a) // 64 AS mean FROM cells GROUP BY 1),
      bits AS (
        SELECT c.doc_id,
               sum(CASE WHEN c.a > m.mean
                        THEN (1::HUGEINT << cast(c.cr * 8 + c.cc as int))
                        ELSE 0::HUGEINT END) AS hv,
               sum(CASE WHEN c.a > m.mean THEN 1 ELSE 0 END) AS nb
        FROM cells c JOIN m ON m.doc_id = c.doc_id GROUP BY 1)"""

  /** Oracle CTE chain for [[imageDhash]]: same synthetic-BMP geometry as
   *  [[AhashCtes]] but an 8×9 cell grid and a horizontal-neighbor
   *  comparison instead of the global-mean threshold. Final CTE:
   *  `bits(doc_id, hv, nb)`. */
  private val DhashCtes: String = """base AS (
        SELECT doc_id, text, octet_length(encode(text)) AS n0
        FROM documents WHERE doc_id % 2 = 0),
      geo AS (
        SELECT doc_id, text, greatest(n0, 1) AS n,
               least(256, greatest(1,
                 cast(ceil(sqrt(cast(greatest(n0, 1) as double))) as bigint))) AS w
        FROM base),
      geo2 AS (
        SELECT doc_id, text, n, w, (n + w - 1) // w AS h
        FROM geo),
      ok AS (SELECT * FROM geo2 WHERE w >= 9 AND h >= 8),
      px AS (
        SELECT doc_id, ((i // w) * 8) // h AS cr, ((i % w) * 9) // w AS cc,
               CASE WHEN i < n THEN ascii(substr(text, cast(i + 1 as int), 1))
                    ELSE 0 END AS v
        FROM ok, unnest(range(0, w * h)) u(i)),
      cells AS (
        SELECT doc_id, cr, cc, sum(v) // count(*) AS a
        FROM px GROUP BY 1, 2, 3),
      d AS (
        SELECT a.doc_id, a.cr, a.cc,
               CASE WHEN b.a > a.a THEN 1 ELSE 0 END AS bit
        FROM cells a JOIN cells b
          ON b.doc_id = a.doc_id AND b.cr = a.cr AND b.cc = a.cc + 1
        WHERE a.cc < 8),
      bits AS (
        SELECT doc_id,
               sum(CASE WHEN bit = 1
                        THEN (1::HUGEINT << cast(cr * 8 + cc as int))
                        ELSE 0::HUGEINT END) AS hv,
               sum(bit) AS nb
        FROM d GROUP BY 1)"""

  val defs: Vector[QueryDef] = Vector(
    // same PCM energy replay as media_vad; transitions via the widx+1
    // self-join, bits packed below the sign bit
    QueryDef("media_audio_fingerprint", audioFingerprint, Some("""
      WITH s AS (
        SELECT doc_id, (i - 1) // 100 AS widx,
               cast((ascii(substring(text, i, 1)) - 128) * 256 as bigint) AS smp
        FROM documents, unnest(range(1, length(text) + 1)) u(i)
        WHERE doc_id % 2 = 1),
      e AS (SELECT doc_id, widx, sum(smp * smp) AS energy FROM s GROUP BY 1, 2),
      p AS (
        SELECT a.doc_id, a.widx, a.energy, b.energy AS e_next
        FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.widx = a.widx + 1
        WHERE a.widx < 63)
      SELECT doc_id,
             cast(sum(CASE WHEN e_next > energy
                           THEN (1::bigint << cast(widx as int)) ELSE 0 END) as bigint) AS afp,
             cast(sum(CASE WHEN e_next > energy THEN 1 ELSE 0 END) as bigint) AS n_rising,
             count(*) AS n_transitions
      FROM p GROUP BY doc_id ORDER BY doc_id""")),
    // gradient-sign hash replay: same pixel-is-ASCII-byte geometry, 8x9
    // cells, neighbor comparison; HUGEINT bit sum wrapped to signed
    QueryDef("media_image_dhash", imageDhash, Some(s"""
      WITH $DhashCtes
      SELECT doc_id,
             cast(CASE WHEN hv >= (1::HUGEINT << 63) THEN hv - (1::HUGEINT << 64)
                       ELSE hv END as bigint) AS dhash,
             cast(nb as bigint) AS n_bits
      FROM bits ORDER BY doc_id""")),
    // exact twin: the shared cell grid + the SAME fixed-point cos table
    // (rendered from Codec.DctC — single source of truth) as a join, the
    // mean threshold cross-multiplied exactly like the codec
    QueryDef("media_image_phash", imagePhash, Some(s"""
      WITH $PhashCtes
      SELECT doc_id, cast(hv as bigint) AS phash, cast(nb as bigint) AS n_bits
      FROM pbits ORDER BY doc_id""")),
    // same PCM reconstruction as media_audio_loudness; islands via
    // widx − row_number per doc, all arithmetic integer
    QueryDef("media_vad", audioVad, Some("""
      WITH s AS (
        SELECT doc_id, (i - 1) // 100 AS widx,
               cast((ascii(substring(text, i, 1)) - 128) * 256 as bigint) AS smp
        FROM documents, unnest(range(1, length(text) + 1)) u(i)
        WHERE doc_id % 2 = 1),
      e AS (SELECT doc_id, widx, sum(smp * smp) AS energy FROM s GROUP BY 1, 2),
      st AS (SELECT doc_id, count(*) AS nw, sum(energy) AS tot FROM e GROUP BY 1),
      a AS (
        SELECT e.doc_id, e.widx,
               row_number() OVER (PARTITION BY e.doc_id ORDER BY e.widx) AS rn
        FROM e JOIN st USING (doc_id)
        WHERE e.energy * st.nw > st.tot),
      seg AS (SELECT doc_id, widx - rn AS island, count(*) AS seg_len
              FROM a GROUP BY 1, 2)
      SELECT seg.doc_id,
             cast(count(*) as bigint) AS n_segments,
             cast(max(seg_len) as bigint) AS longest_seg,
             cast(sum(seg_len) as bigint) AS active_windows,
             cast(sum(seg_len) * 10000 // max(st.nw) as bigint) AS active_ratio_bp
      FROM seg JOIN st ON seg.doc_id = st.doc_id
      GROUP BY 1 ORDER BY 1""")),
    // same pixel-is-ASCII-byte replay as media_image_ahash; the 3x3 Sobel
    // runs as a stencil join (8 named offsets x weights), densities in
    // integer basis points
    QueryDef("media_edge_density", edgeDensity, Some("""
      WITH base AS (
        SELECT doc_id, text, octet_length(encode(text)) AS n0
        FROM documents WHERE doc_id % 2 = 0),
      geo AS (
        SELECT doc_id, text, greatest(n0, 1) AS n,
               least(256, greatest(1,
                 cast(ceil(sqrt(cast(greatest(n0, 1) as double))) as bigint))) AS w
        FROM base),
      geo2 AS (SELECT doc_id, text, n, w, (n + w - 1) // w AS h FROM geo),
      ok AS (SELECT * FROM geo2 WHERE w >= 3 AND h >= 3),
      px AS (
        SELECT doc_id, i // w AS r, i % w AS c,
               CASE WHEN i < n THEN ascii(substr(text, cast(i + 1 as int), 1))
                    ELSE 0 END AS v
        FROM ok, unnest(range(0, w * h)) u(i)),
      st(dr, dc, wx, wy) AS (
        VALUES (-1,-1,-1,-1), (-1,0,0,-2), (-1,1,1,-1),
               (0,-1,-2,0),                (0,1,2,0),
               (1,-1,-1,1),  (1,0,0,2),  (1,1,1,1)),
      g AS (
        SELECT p.doc_id, p.r, p.c,
               sum(nb.v * s.wx) AS gx, sum(nb.v * s.wy) AS gy
        FROM ok o
        JOIN px p ON p.doc_id = o.doc_id
                 AND p.r BETWEEN 1 AND o.h - 2 AND p.c BETWEEN 1 AND o.w - 2
        CROSS JOIN st s
        JOIN px nb ON nb.doc_id = p.doc_id
                  AND nb.r = p.r + s.dr AND nb.c = p.c + s.dc
        GROUP BY 1, 2, 3),
      e AS (
        SELECT doc_id,
               sum(CASE WHEN abs(gx) + abs(gy) >= 160 THEN 1 ELSE 0 END) AS ne
        FROM g GROUP BY 1)
      SELECT o.doc_id,
             cast((o.w - 2) * (o.h - 2) as bigint) AS n_interior,
             cast(e.ne as bigint) AS n_edges,
             cast(e.ne * 10000 // ((o.w - 2) * (o.h - 2)) as bigint) AS edge_density_bp
      FROM ok o JOIN e ON e.doc_id = o.doc_id
      ORDER BY o.doc_id""")),
    // the BMP grayscale pixel at payload index i IS the ASCII byte (luma of
    // (v,v,v) = 1000v/1000 = v), indices past the text pad with 0 — so the
    // whole aHash (geometry, cell sums, integer mean, sign bit 63) replays
    // in SQL; HUGEINT carries the bit sum, wrapped to signed at the end
    QueryDef("media_image_ahash", imageAhash, Some(s"""
      WITH $AhashCtes
      SELECT doc_id,
             cast(CASE WHEN hv >= (1::HUGEINT << 63) THEN hv - (1::HUGEINT << 64)
                       ELSE hv END as bigint) AS ahash,
             cast(nb as bigint) AS n_bits
      FROM bits ORDER BY doc_id""")),
    // oracle = unblocked all-pairs over the same signed aHash values (the
    // chunk join is lossless by pigeonhole at threshold 7, so the sets
    // must be identical); xor on signed bigints == xor on the raw bits
    QueryDef("media_dedup_ahash", imageNearDup, Some(s"""
      WITH $AhashCtes,
      sigs AS (
        SELECT doc_id,
               cast(CASE WHEN hv >= (1::HUGEINT << 63) THEN hv - (1::HUGEINT << 64)
                         ELSE hv END as bigint) AS ahash
        FROM bits)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             cast(bit_count(xor(a.ahash, b.ahash)) as int) AS hamming
      FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.ahash, b.ahash)) <= 7
      ORDER BY id_a, id_b""")),
    // frame j of doc d covers text chars [j·32+1, j·32+32]; sampled frames
    // are the even indices (stride 2), energy = Σ ascii codes
    // frames come from the PARSED sample table: ceil(n/32) uniform samples,
    // the last zero-padded — pad bytes contribute 0, so the tail frame's
    // energy is the sum of the in-range text bytes only
    QueryDef("media_scene_cuts", sceneCuts, Some("""
      WITH vids AS (
        SELECT doc_id, text, octet_length(encode(text)) AS n,
               greatest(1, (octet_length(encode(text)) + 31) // 32) AS ns
        FROM documents WHERE substr(md5(text), 1, 1) > 'b'),
      en AS (
        SELECT v.doc_id, u.frame_idx,
               cast(coalesce(sum(CASE WHEN u.frame_idx*32 + w.j <= v.n THEN
                 ascii(substr(v.text, cast(u.frame_idx*32 + w.j as int), 1)) END), 0) as bigint)
                 AS energy
        FROM vids v,
             unnest(range(0, v.ns)) u(frame_idx),
             unnest(range(1, 33)) w(j)
        WHERE u.frame_idx % 2 = 0
        GROUP BY 1, 2),
      d AS (
        SELECT doc_id, energy,
               abs(energy - lag(energy) OVER (PARTITION BY doc_id ORDER BY frame_idx))
                 AS delta
        FROM en)
      SELECT doc_id, count(*) AS n_frames,
             cast(sum(CASE WHEN delta > 200 THEN 1 ELSE 0 END) as bigint) AS n_cuts,
             coalesce(max(delta), 0) AS max_delta
      FROM d GROUP BY doc_id ORDER BY doc_id""")),
    QueryDef("media_audio_loudness", audioLoudness, Some("""
      WITH s AS (
        SELECT doc_id, (i - 1) // 100 AS widx,
               cast((ascii(substring(text, i, 1)) - 128) * 256 as bigint) AS smp
        FROM documents, unnest(range(1, length(text) + 1)) u(i)
        WHERE doc_id % 2 = 1),
      e AS (SELECT doc_id, widx, sum(smp * smp) AS energy FROM s GROUP BY 1, 2)
      SELECT doc_id, count(*) AS n_windows,
             cast(max(energy) as bigint) AS max_energy,
             cast(sum(energy) as bigint) AS total_energy
      FROM e GROUP BY doc_id ORDER BY doc_id""")),
    // exact twin: the failure set is the deterministic truncation rule
    // (valid containers never throw; half-truncated ones always do — for
    // mp4 because the real box walk finds a declared box end past the cut)
    QueryDef("media_corrupt_audit", mediaCorruptAudit, Some("""
      WITH f AS (
        SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS format
        FROM documents
        UNION ALL
        SELECT doc_id, 'mp4' FROM documents WHERE substr(md5(text), 1, 1) > 'b')
      SELECT format, count(*) AS n_files,
             cast(sum(CASE WHEN doc_id % 41 = 0 THEN 1 ELSE 0 END) as bigint) AS n_bad,
             cast(max(CASE WHEN doc_id % 41 <> 0 THEN doc_id END) as bigint) AS max_good_doc
      FROM f
      GROUP BY 1 ORDER BY 1""")),
    // the oracle states the round-trip CLAIMS as exact counts over the
    // same doc set: all intact images keep their dimensions and mean luma
    // (within 2 levels), all truncated ones quarantine — a codec
    // regression flips a count and fails the hash
    QueryDef("media_jpeg_roundtrip", mediaJpegRoundtrip, Some("""
      SELECT count(*) AS n_images,
             cast(sum(CASE WHEN doc_id % 41 <> 0 THEN 1 ELSE 0 END) as bigint) AS n_dims_ok,
             cast(sum(CASE WHEN doc_id % 41 <> 0 THEN 1 ELSE 0 END) as bigint) AS n_luma_ok,
             cast(sum(CASE WHEN doc_id % 41 = 0 THEN 1 ELSE 0 END) as bigint) AS n_quarantined
      FROM documents WHERE doc_id % 2 = 0""")),
    QueryDef("media_meta", mediaMeta, Some("""
      SELECT doc_id,
             CASE WHEN substr(md5(text),1,1) <= '3' THEN 'jpeg'
                  WHEN substr(md5(text),1,1) <= '7' THEN 'png'
                  WHEN substr(md5(text),1,1) <= 'b' THEN 'wav'
                  ELSE 'mp4' END AS format,
             octet_length(encode(text)) AS n_bytes
      FROM documents ORDER BY doc_id""")),
    // the oracle recomputes the container geometry the builders derive from
    // the payload size: BMP w ≈ √n (capped 256), 4-byte-padded rows, 54-byte
    // header; WAV 44-byte header + 2 bytes/sample at 8 kHz
    QueryDef("media_feature_stats", mediaFeatureStats, Some("""
      WITH base AS (
        SELECT doc_id, octet_length(encode(text)) AS n,
               CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS format,
               greatest(octet_length(encode(text)), 1) AS n1
        FROM documents),
      calc AS (
        SELECT format, n, n1,
               least(256, greatest(1, cast(ceil(sqrt(cast(n1 as double))) as bigint))) AS w
        FROM base),
      feat AS (
        SELECT format,
               CASE WHEN format = 'bmp'
                    THEN 54 + ((w*3 + 3) // 4) * 4 * ((n1 + w - 1) // w)
                    ELSE 44 + 2*n END AS n_bytes,
               CASE WHEN format = 'bmp' THEN w ELSE 0 END AS width,
               CASE WHEN format = 'bmp' THEN (n1 + w - 1) // w ELSE 0 END AS height,
               CASE WHEN format = 'wav' THEN (n * 1000) // 8000 ELSE 0 END AS dur
        FROM calc)
      SELECT format, count(*) AS n,
             cast(sum(n_bytes) as bigint) AS total_bytes,
             cast(min(width) as bigint) AS min_w,
             cast(max(height) as bigint) AS max_h,
             cast(sum(dur) as bigint) AS sum_duration_ms
      FROM feat GROUP BY format ORDER BY format""")),
    // one 16-bit sample per payload byte; resample drops the trailing
    // partial pair, rate 8000 -> 4000, duration = n2*1000 // 4000
    QueryDef("media_resample_stats", resampleStats, Some("""
      SELECT doc_id,
             octet_length(encode(text)) // 2 AS new_samples,
             44 + (octet_length(encode(text)) // 2) * 2 AS new_bytes,
             ((octet_length(encode(text)) // 2) * 1000) // 4000 AS new_duration_ms
      FROM documents WHERE doc_id % 2 = 1
      ORDER BY doc_id""")),
    QueryDef("media_resize_stats", resizeStats, Some("""
      WITH base AS (
        SELECT doc_id, greatest(octet_length(encode(text)), 1) AS n1
        FROM documents WHERE doc_id % 2 = 0),
      geo AS (
        SELECT doc_id,
               least(256, greatest(1, cast(ceil(sqrt(cast(n1 as double))) as bigint))) AS w,
               n1
        FROM base),
      dims AS (
        SELECT doc_id,
               greatest(1, w // 2) AS new_w,
               greatest(1, ((n1 + w - 1) // w) // 2) AS new_h
        FROM geo)
      SELECT doc_id, new_w, new_h,
             54 + ((new_w*3 + 3) // 4) * 4 * new_h AS new_bytes
      FROM dims ORDER BY doc_id""")),
    // frame geometry is the PARSED sample table, whose shape the builder
    // derives from octet_length alone: ns = max(1, ceil(len/32)) uniform
    // 32-byte samples (tail zero-padded), sampled every 2nd => (ns+1)/2
    // rows per doc — every doc emits at least one frame
    QueryDef("media_frame_samples", frameSampleStats, Some("""
      SELECT doc_id,
             (greatest(1, (octet_length(encode(text)) + 31) // 32) + 1) // 2 AS n_frames,
             cast(32 as bigint) AS frame_bytes
      FROM documents
      WHERE substr(md5(text),1,1) > 'b'
      ORDER BY doc_id""")),
    // writer vs parser cross-check: every column is read back out of real
    // boxes (tkhd 16.16 dims, mdhd timescale+duration, stsz count), and the
    // oracle recomputes what the builder geometry says those boxes must
    // hold from the payload length alone — 579 header bytes + ns*32 data
    QueryDef("media_mp4_meta", mp4Meta, Some("""
      WITH v AS (
        SELECT doc_id, octet_length(encode(text)) AS n FROM documents
        WHERE substr(md5(text), 1, 1) > 'b'),
      c AS (
        SELECT doc_id, greatest(n, 1) AS n1,
               least(256, greatest(1, cast(ceil(sqrt(cast(greatest(n, 1) as double))) as bigint))) AS w,
               greatest(1, (n + 31) // 32) AS ns
        FROM v)
      SELECT doc_id, w AS width, (n1 + w - 1) // w AS height,
             ns * 40 AS duration_ms, ns AS n_frames,
             579 + ns * 32 AS n_bytes
      FROM c ORDER BY doc_id"""))
  )
}
