package graft.pipeline

import graft.SparkSpec

class MediaCodecsSpec extends SparkSpec {
  import spark.implicits._

  test("WAV round-trip: header facts and real PCM amplitude math; " +
      "the chunk walk skips interleaved LIST chunks; malformed bytes " +
      "answer None") {
    val bytes = MediaCodecs.wavBytes(channels = 2, sampleRate = 16000,
      nFrames = 100, tone = 500)
    val info = MediaCodecs.parseWav(bytes).get
    assert(info.channels == 2 && info.sampleRate == 16000 &&
      info.bitsPerSample == 16 && info.nFrames == 100L)
    assert(info.durationMs == 100L * 1000 / 16000) // 6 ms
    // amplitude agrees with direct arithmetic over the synth formula
    val expect = (for (i <- 0 until 100; c <- 0 until 2)
      yield math.abs(((i.toLong * 500 + c * 7) % 65536) - 32768)
        .toDouble).sum / 200
    assert(info.meanAbsAmplitude == expect)
    // a real-world WAV interleaves LIST/fact chunks before data: the
    // parser must walk chunks, not assume fixed offsets
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val withList = bytes.slice(0, 36) ++ listChunk ++
      bytes.slice(36, bytes.length)
    // patch the RIFF size for the inserted 12 bytes
    val bb = java.nio.ByteBuffer.wrap(withList)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, bb.getInt(4) + 12)
    val info2 = MediaCodecs.parseWav(withList).get
    assert(info2 == info)
    // malformed: truncated, wrong magic, non-PCM format code
    assert(MediaCodecs.parseWav(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaCodecs.parseWav(bytes.updated(0, 'X'.toByte)).isEmpty)
    // a corrupt ~2^31 chunk size must answer None, not wrap the Int
    // bounds math negative and throw out-of-bounds
    val hugeChunk = bytes.clone()
    java.nio.ByteBuffer.wrap(hugeChunk)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, 0x7ffffff0) // fmt chunk size field
    assert(MediaCodecs.parseWav(hugeChunk).isEmpty)
    val nonPcm = bytes.clone()
    java.nio.ByteBuffer.wrap(nonPcm)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(20, 3.toShort) // IEEE-float format code
    assert(MediaCodecs.parseWav(nonPcm).isEmpty)
  }

  test("BMP round-trip honors bottom-up rows and 4-byte padding; " +
      "width 5 (15-byte rows padded to 16) keeps channel means exact") {
    // width NOT divisible by 4 exercises the padding math
    val bytes = MediaCodecs.bmpBytes(width = 5, height = 3, seed = 9)
    val info = MediaCodecs.parseBmp(bytes).get
    assert(info.width == 5 && info.height == 3 &&
      info.bitsPerPixel == 24)
    def mean(f: (Int, Int) => Int) =
      (for (x <- 0 until 5; y <- 0 until 3) yield f(x, y).toDouble)
        .sum / 15
    assert(info.meanB == mean((x, y) => (3 * x + 5 * y + 9) % 256))
    assert(info.meanG == mean((x, y) => (7 * x + 11 * y + 9) % 256))
    assert(info.meanR == mean((x, y) => (13 * x + 17 * y + 9) % 256))
    assert(MediaCodecs.parseBmp("notabmp".getBytes).isEmpty)
    // a corruption-controlled width near 2^30 must answer None — an
    // Int rowBytes would wrap negative and defeat the size guard
    val evil = MediaCodecs.bmpBytes(4, 1, 0)
    java.nio.ByteBuffer.wrap(evil)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, 0x30000000)
    assert(MediaCodecs.parseBmp(evil).isEmpty)
    // a sub-header dataOff is invalid, never a negative-index read
    val badOff = MediaCodecs.bmpBytes(4, 1, 0)
    java.nio.ByteBuffer.wrap(badOff)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(10, -100)
    assert(MediaCodecs.parseBmp(badOff).isEmpty)
  }

  test("decodeWav/decodeBmp kernels: parse failures answer null " +
      "fields, never a job-killing exception") {
    val rows = Seq(
      (1L, MediaCodecs.wavBytes(1, 8000, 10, 7)),
      (2L, Array[Byte](0, 1, 2, 3))).toDF("id", "media")
    val out = MediaCodecs.decodeWav(rows, "id", "media")
      .orderBy("id").collect()
    assert(out(0).getInt(out(0).fieldIndex("channels")) == 1)
    assert(out(1).isNullAt(out(1).fieldIndex("channels")))
    val bmps = Seq(
      (1L, MediaCodecs.bmpBytes(4, 4, 0)),
      (2L, Array[Byte](9, 9))).toDF("id", "media")
    val bout = MediaCodecs.decodeBmp(bmps, "id", "media")
      .orderBy("id").collect()
    assert(bout(0).getInt(bout(0).fieldIndex("width")) == 4)
    assert(bout(1).isNullAt(bout(1).fieldIndex("width")))
  }

  test("bmpAHash64: pixel-identical re-encodes hash equal, a " +
      "half-bright/half-dark image sets exactly the bright half's " +
      "bits, and malformed bytes answer None/null") {
    // identical content, two serializations → equal hashes
    val a = MediaCodecs.bmpAHash64(MediaCodecs.bmpBytes(6, 4, 7)).get
    val b = MediaCodecs.bmpAHash64(MediaCodecs.bmpBytes(6, 4, 7)).get
    assert(a == b && a.length == 64 && a.forall(c => c == '0' || c == '1'))
    // a uniform brightness shift (seed+1 adds 1 to every channel)
    // leaves every bit's above/below-mean relation intact — aHash is
    // DESIGNED to be brightness-invariant; assert that, not inequality
    val c = MediaCodecs.bmpAHash64(MediaCodecs.bmpBytes(6, 4, 8)).get
    assert(a == c)
    // hand-built 16x16: left half black, right half white → the 8x8
    // grid's right 4 columns (sampled x >= 8) are the only 1-bits
    val w = 16; val h = 16
    val rowBytes = (w * 3 + 3) / 4 * 4
    val buf = java.nio.ByteBuffer.allocate(54 + rowBytes * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * h)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1.toShort)
      .putShort(24.toShort).putInt(0).putInt(rowBytes * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (_ <- 0 until h; x <- 0 until w) {
      val v = if (x >= 8) 0xff.toByte else 0x00.toByte
      buf.put(v).put(v).put(v)
      if (x == w - 1) (w * 3 until rowBytes).foreach(_ => buf.put(0.toByte))
    }
    val half = MediaCodecs.bmpAHash64(buf.array()).get
    // row-major (j outer): each row reads 00001111
    assert(half == "0000111100001111000011110000111100001111000011110000111100001111")
    // a structurally different image DOES hash differently
    assert(half != a)
    assert(MediaCodecs.bmpAHash64(Array[Byte](1, 2, 3)).isEmpty)
    val out = MediaCodecs.aHashBmp(
      Seq((1L, MediaCodecs.bmpBytes(4, 3, 0)),
        (2L, Array[Byte](9))).toDF("id", "media"),
      "id", "media").orderBy("id").collect()
    assert(out(0).getString(1).length == 64 && out(1).isNullAt(1))
  }

  test("PNG round-trip: inflate + all five filter reversals + " +
      "multi-IDAT reassembly reproduce exact channel means for RGB " +
      "and RGBA") {
    // height 7 cycles through every filter type (y % 5)
    for (alpha <- Seq(false, true)) {
      val w = 6; val h = 7; val seed = 42
      val bytes = MediaCodecs.pngBytes(w, h, seed, alpha)
      val info = MediaCodecs.parsePng(bytes).get
      assert(info.width == w && info.height == h &&
        info.channels == (if (alpha) 4 else 3))
      def mean(fr: (Int, Int) => Int): Double =
        (for (y <- 0 until h; x <- 0 until w) yield fr(x, y).toDouble)
          .sum / (w * h)
      assert(info.meanR == mean((x, y) => (13 * x + 17 * y + seed) % 256))
      assert(info.meanG == mean((x, y) => (7 * x + 11 * y + seed) % 256))
      assert(info.meanB == mean((x, y) => (3 * x + 5 * y + seed) % 256))
    }
    // the builder genuinely splits IDAT (anything over 97 deflate
    // bytes) — assert the walk saw more than one
    val big = MediaCodecs.pngBytes(50, 50, 7)
    val idatCount = big.sliding(4).count(
      _.sameElements("IDAT".getBytes("US-ASCII")))
    assert(idatCount > 1, s"expected multi-IDAT, got $idatCount")
    assert(MediaCodecs.parsePng(big).isDefined)
  }

  test("PNG malformed-input battery: every rejection path answers " +
      "None, never a throw") {
    val good = MediaCodecs.pngBytes(5, 4, 9)
    def be(bytes: Array[Byte]) = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    // wrong signature / truncated
    assert(MediaCodecs.parsePng(good.updated(1, 'X'.toByte)).isEmpty)
    assert(MediaCodecs.parsePng(good.take(20)).isEmpty)
    assert(MediaCodecs.parsePng(Array[Byte](1, 2)).isEmpty)
    // CRC corruption (flip a pixel byte inside IDAT, keep stored CRC)
    val crcBad = good.clone()
    crcBad(good.length - 20) = (crcBad(good.length - 20) ^ 0x7f).toByte
    assert(MediaCodecs.parsePng(crcBad).isEmpty)
    // dimension lies: header claims more pixels than the stream holds
    // (IHDR data starts at byte 16: width 16-19, height 20-23; the
    // CRC now mismatches too — either guard may fire; must be None)
    val dimBad = good.clone()
    be(dimBad).putInt(20, 99)
    assert(MediaCodecs.parsePng(dimBad).isEmpty)
    // zip-bomb budget: a 2^16 × 2^16 IHDR with a VALID CRC must be
    // rejected by the pixel budget itself, before any allocation
    def ihdrOnly(w: Int, h: Int, colorType: Int, interlace: Int,
        comp: Int = 0, filt: Int = 0): Array[Byte] = {
      val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
        0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      val data = java.nio.ByteBuffer.allocate(13)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
        .putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
        .put(comp.toByte).put(filt.toByte).put(interlace.toByte)
        .array()
      val crc = new java.util.zip.CRC32()
      crc.update("IHDR".getBytes("US-ASCII")); crc.update(data)
      sig ++
        java.nio.ByteBuffer.allocate(4).putInt(13).array() ++
        "IHDR".getBytes("US-ASCII") ++ data ++
        java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt)
          .array()
    }
    assert(MediaCodecs.parsePng(ihdrOnly(65536, 65536, 2, 0)).isEmpty)
    // palette color type and interlacing: honestly not owned
    assert(MediaCodecs.parsePng(ihdrOnly(3, 3, 3, 0)).isEmpty)
    assert(MediaCodecs.parsePng(ihdrOnly(3, 3, 2, 1)).isEmpty)
    // undefined compression/filter METHODS (spec defines only 0)
    assert(MediaCodecs.parsePng(ihdrOnly(3, 3, 2, 0, comp = 1)).isEmpty)
    assert(MediaCodecs.parsePng(ihdrOnly(3, 3, 2, 0, filt = 1)).isEmpty)
    // a corrupt ~2^31 chunk length must answer None, not wrap the
    // bounds math and throw
    val hugeLen = good.clone()
    be(hugeLen).putInt(8, Int.MaxValue - 3)
    assert(MediaCodecs.parsePng(hugeLen).isEmpty)
    // kernel: mixed good/bad rows → null fields, no exception
    val rows = Seq((1L, good), (2L, Array[Byte](0, 1, 2)))
      .toDF("id", "media")
    val out = MediaCodecs.decodePng(rows, "id", "media")
      .orderBy("id").collect()
    assert(out(0).getInt(out(0).fieldIndex("width")) == 5)
    assert(out(1).isNullAt(out(1).fieldIndex("width")))
  }

  test("JPEG round-trip (JDK encoder→decoder): exact facts replay — " +
      "dimensions and channel count for RGB and grayscale") {
    val rgb = MediaCodecs.jpegBytes(9, 7, 42)
    assert(MediaCodecs.parseJpeg(rgb) ==
      Some(MediaCodecs.JpegInfo(9, 7, 3)))
    val gray = MediaCodecs.jpegBytes(5, 11, 3, gray = true)
    assert(MediaCodecs.parseJpeg(gray) ==
      Some(MediaCodecs.JpegInfo(5, 11, 1)))
    // real JPEG bytes: SOI..EOI markers present
    assert((rgb(0) & 0xff) == 0xff && (rgb(1) & 0xff) == 0xd8)
  }

  test("JPEG malformed-input battery: every rejection path answers " +
      "None — truncated, corrupt, wrong format, oversize, null") {
    val good = MediaCodecs.jpegBytes(16, 16, 7)
    assert(MediaCodecs.parseJpeg(good).isDefined)
    // truncated mid-stream: header peek succeeds, pixel decode fails
    assert(MediaCodecs.parseJpeg(good.take(good.length / 2)).isEmpty)
    // corrupt entropy data (flip bytes after the headers)
    val corrupt = good.clone()
    (good.length - 20 until good.length - 4)
      .foreach(i => corrupt(i) = (corrupt(i) ^ 0x5a).toByte)
    // corrupt streams may still decode partially; the battery only
    // demands NO exception escapes (None or Some, never a throw)
    MediaCodecs.parseJpeg(corrupt)
    // wrong format: PNG/BMP bytes must NOT decode via the JPEG path
    assert(MediaCodecs.parseJpeg(MediaCodecs.pngBytes(4, 4, 1)).isEmpty)
    assert(MediaCodecs.parseJpeg(MediaCodecs.bmpBytes(4, 4, 1)).isEmpty)
    // oversize: header-peeked pixel budget rejects BEFORE the raster
    assert(MediaCodecs.parseJpeg(good, maxPixels = 100L).isEmpty)
    assert(MediaCodecs.parseJpeg(null).isEmpty)
    assert(MediaCodecs.parseJpeg(Array[Byte](0xff.toByte)).isEmpty)
    assert(MediaCodecs.parseJpeg("not a jpeg".getBytes).isEmpty)
  }

  test("jpegAHash64: same-JVM round trip is deterministic, gradient " +
      "orientation flips the bit pattern, malformed bytes answer null") {
    val a1 = MediaCodecs.jpegAHash64(MediaCodecs.jpegBytes(32, 32, 5))
    val a2 = MediaCodecs.jpegAHash64(MediaCodecs.jpegBytes(32, 32, 5))
    assert(a1.isDefined && a1 == a2)
    assert(a1.get.length == 64 && a1.get.forall(c => c == '0' || c == '1'))
    // the synthesis gradient brightens toward +x/+y: dark corner bits
    // differ from bright corner bits (the hash carries real signal,
    // not a constant)
    assert(a1.get.contains('0') && a1.get.contains('1'))
    assert(MediaCodecs.jpegAHash64("junk".getBytes).isEmpty)
    // kernel: null hash on malformed, real hash on good bytes
    val df = Seq(
      (1L, MediaCodecs.jpegBytes(16, 12, 9)),
      (2L, Array[Byte](1, 2, 3))).toDF("id", "media")
    val out = MediaCodecs.aHashJpeg(df, "id", "media")
      .orderBy("id").collect()
    assert(!out(0).isNullAt(1) && out(1).isNullAt(1))
    val dec = MediaCodecs.decodeJpeg(df, "id", "media")
      .orderBy("id").collect()
    assert(dec(0).getInt(1) == 16 && dec(0).getInt(2) == 12 &&
      dec(0).getInt(3) == 3)
    assert(dec(1).isNullAt(1))
  }
}
