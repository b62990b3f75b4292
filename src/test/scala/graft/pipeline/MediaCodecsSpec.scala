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
}
