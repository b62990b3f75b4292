package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** REAL media decoders for the uncompressed container formats a JVM
  * can parse with zero dependencies — the honest upgrade over
  * [[Multimodal]]'s stub codecs: WAV (RIFF/PCM) and BMP
  * (BITMAPINFOHEADER, 24bpp) are byte-layout formats, so "decode" is
  * deterministic arithmetic this engine can own end-to-end, including
  * the actual sample/pixel math (mean |amplitude| per channel, mean
  * B/G/R). Compressed codecs (JPEG/H.264/FLAC) remain behind the
  * [[Multimodal]] stubs — that boundary is now exactly "formats that
  * need a codec library", not "all of decode".
  *
  * Scale shape: decoding is per-row imperative byte work — the
  * documented mapPartitions discipline (`Dedup.shingleMinhash`): one
  * typed kernel pass, no UDF-in-expression, no shuffle; pair with
  * [[Multimodal.balanceBySize]] when payloads skew.
  */
object MediaCodecs {

  /** Parsed WAV facts: header fields + the REAL per-file feature
    * (mean absolute sample amplitude over all channels). */
  final case class WavInfo(channels: Int, sampleRate: Int,
      bitsPerSample: Int, nFrames: Long, durationMs: Long,
      meanAbsAmplitude: Double)

  /** Parsed BMP facts: dimensions + REAL mean B/G/R over the pixel
    * rows (bottom-up, 4-byte row padding honored). */
  final case class BmpInfo(width: Int, height: Int, bitsPerPixel: Int,
      meanB: Double, meanG: Double, meanR: Double)

  // ------------------------------------------------------------ builders

  /** Serialize a 16-bit PCM WAV: frame i, channel c carries the
    * deterministic sample ((i·tone + c·7) mod 65536) − 32768 — the
    * synthesizer the tests and the gate's oracle replay
    * arithmetically. */
  def wavBytes(channels: Int, sampleRate: Int, nFrames: Int,
      tone: Int): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && nFrames >= 0)
    val bits = 16
    val dataSize = nFrames * channels * (bits / 8)
    val buf = ByteBuffer.allocate(44 + dataSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * (bits / 8))
      .putShort((channels * (bits / 8)).toShort)
      .putShort(bits.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        val v = (((i.toLong * tone + c * 7) % 65536) - 32768).toShort
        buf.putShort(v)
        c += 1
      }
      i += 1
    }
    buf.array()
  }

  /** Serialize a 24bpp bottom-up BMP: pixel (x, y) carries
    * B = (3x+5y+seed) mod 256, G = (7x+11y+seed) mod 256,
    * R = (13x+17y+seed) mod 256 — replayable arithmetically. */
  def bmpBytes(width: Int, height: Int, seed: Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowBytes = (width * 3 + 3) / 4 * 4 // rows pad to 4 bytes
    val dataSize = rowBytes * height
    val buf = ByteBuffer.allocate(54 + dataSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1.toShort).putShort(24.toShort)
      .putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom-up storage
    while (y >= 0) {
      var x = 0
      while (x < width) {
        buf.put(((3 * x + 5 * y + seed) % 256).toByte)
        buf.put(((7 * x + 11 * y + seed) % 256).toByte)
        buf.put(((13 * x + 17 * y + seed) % 256).toByte)
        x += 1
      }
      var p = width * 3
      while (p < rowBytes) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  // ------------------------------------------------------------- parsers

  /** Parse RIFF/WAVE by walking the chunk list (not fixed offsets —
    * real WAVs interleave LIST/fact chunks before data). None when the
    * bytes are not a PCM WAV this parser owns. */
  def parseWav(bytes: Array[Byte]): Option[WavInfo] = {
    if (bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def ascii(off: Int, n: Int) =
      new String(bytes, off, n, "US-ASCII")
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
    var pos = 12
    var channels = 0; var rate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= bytes.length) {
      val id = ascii(pos, 4)
      val size = buf.getInt(pos + 4)
      // bounds math in Long: a corrupt ~2^31 size field would wrap an
      // Int sum negative, sail past this guard, and turn the
      // documented null-on-malformed contract into a thrown
      // out-of-bounds that kills the whole job
      if (size < 0 || pos.toLong + 8L + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          if (buf.getShort(pos + 8) != 1) return None // PCM only
          channels = buf.getShort(pos + 10)
          rate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22)
        case "data" => dataOff = pos + 8; dataLen = size
        case _ => () // LIST/fact/...: skip
      }
      pos += 8 + size + (size % 2) // chunks pad to even length
    }
    if (channels <= 0 || rate <= 0 || bits != 16 || dataOff < 0)
      return None
    val frameBytes = channels * (bits / 8)
    val nFrames = dataLen / frameBytes
    var sumAbs = 0.0
    var i = 0
    while (i < nFrames.toInt * channels) {
      sumAbs += math.abs(buf.getShort(dataOff + i * 2).toDouble)
      i += 1
    }
    val n = nFrames.toLong * channels
    Some(WavInfo(channels, rate, bits, nFrames.toLong,
      nFrames.toLong * 1000L / rate,
      if (n == 0) 0.0 else sumAbs / n))
  }

  /** Parse an uncompressed 24bpp BITMAPINFOHEADER BMP, honoring the
    * bottom-up row order and 4-byte row padding. */
  def parseBmp(bytes: Array[Byte]): Option[BmpInfo] = {
    if (bytes.length < 54) return None
    if (bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOff = buf.getInt(10)
    val width = buf.getInt(18)
    val height = buf.getInt(22)
    val bpp = buf.getShort(28).toInt
    val compression = buf.getInt(30)
    if (width <= 0 || height <= 0 || bpp != 24 || compression != 0)
      return None
    // row math in Long and dataOff validated: a corruption-controlled
    // width near 2^30 wraps an Int rowBytes negative, which would
    // defeat the size guard below (same null-on-malformed argument as
    // the WAV chunk walk)
    val rowBytes = (width.toLong * 3 + 3) / 4 * 4
    // divide, don't multiply: rowBytes * height with both near 2^31
    // overflows even Long (≈1.4e19), wrapping negative and slipping
    // past an additive guard — reject when rowBytes exceeds the
    // per-row budget instead (height ≥ 1 was checked above)
    if (dataOff < 54 || dataOff > bytes.length ||
        rowBytes > (bytes.length.toLong - dataOff) / height)
      return None
    var sb = 0.0; var sg = 0.0; var sr = 0.0
    var y = 0
    while (y < height) {
      // bottom-up; fits Int once the Long-domain guard above passed
      val row = (dataOff + (height - 1 - y) * rowBytes).toInt
      var x = 0
      while (x < width) {
        sb += (bytes(row + x * 3) & 0xff)
        sg += (bytes(row + x * 3 + 1) & 0xff)
        sr += (bytes(row + x * 3 + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    Some(BmpInfo(width, height, bpp, sb / n, sg / n, sr / n))
  }

  // --------------------------------------------------- DataFrame kernels

  /** Decode a WAV binary column through one typed mapPartitions pass:
    * (id, media) → id + the [[WavInfo]] fields (null row fields when
    * the bytes don't parse — the audit spelling, never an exception
    * mid-job). */
  def decodeWav(df: DataFrame, idCol: String, mediaCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
    ds.mapPartitions(_.map { case (id, bytes) =>
      val p = Option(bytes).flatMap(parseWav)
      (id, p.map(_.channels), p.map(_.sampleRate),
        p.map(_.nFrames), p.map(_.durationMs),
        p.map(_.meanAbsAmplitude))
    }).toDF(idCol, "channels", "sample_rate", "n_frames",
      "duration_ms", "mean_abs_amplitude")
  }

  /** Decode a BMP binary column — same kernel contract as
    * [[decodeWav]]. */
  def decodeBmp(df: DataFrame, idCol: String, mediaCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
    ds.mapPartitions(_.map { case (id, bytes) =>
      val p = Option(bytes).flatMap(parseBmp)
      (id, p.map(_.width), p.map(_.height),
        p.map(_.meanB), p.map(_.meanG), p.map(_.meanR))
    }).toDF(idCol, "width", "height", "mean_b", "mean_g", "mean_r")
  }
}
