package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** REAL media decoders for the container formats a JVM can parse with
  * zero dependencies — the honest upgrade over [[Multimodal]]'s stub
  * codecs: WAV (RIFF/PCM) and BMP (BITMAPINFOHEADER, 24bpp) are
  * byte-layout formats, and PNG (non-interlaced 8-bit RGB/RGBA) is
  * decodable because the JDK ships zlib (`java.util.zip.Inflater`) —
  * chunk walk + CRC32 verification + inflate + per-row filter
  * reversal (None/Sub/Up/Average/Paeth) are deterministic arithmetic
  * this engine owns end-to-end, including the actual sample/pixel
  * math (mean |amplitude| per channel, mean B/G/R). JPEG rides the
  * JDK's OWN decoder (`javax.imageio`, still zero external deps) —
  * lossy, so only exactly-replayable facts gate. Codecs the JVM does
  * NOT ship (H.264/FLAC) remain behind the [[Multimodal]] stubs —
  * that boundary is now exactly "formats that need a codec library",
  * not "all of decode".
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

  /** Serialize a non-interlaced 8-bit PNG: pixel (x, y) carries
    * R = (13x+17y+seed) mod 256, G = (7x+11y+seed) mod 256,
    * B = (3x+5y+seed) mod 256 (the [[bmpBytes]] arithmetic family, so
    * oracles replay it the same way); when `alpha`,
    * A = (x+y+seed) mod 256. Row y is filtered with type (y mod 5) —
    * every decode exercises ALL five PNG filters — and the deflate
    * stream is split across multiple IDAT chunks to exercise the
    * chunk-walk reassembly a real PNG requires. */
  def pngBytes(width: Int, height: Int, seed: Int,
      alpha: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0)
    val bpp = if (alpha) 4 else 3
    val stride = width * bpp
    // raw (unfiltered) scanlines
    val raw = Array.ofDim[Byte](height, stride)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raw(y)(x * bpp) = ((13 * x + 17 * y + seed) % 256).toByte
        raw(y)(x * bpp + 1) = ((7 * x + 11 * y + seed) % 256).toByte
        raw(y)(x * bpp + 2) = ((3 * x + 5 * y + seed) % 256).toByte
        if (alpha) raw(y)(x * bpp + 3) = ((x + y + seed) % 256).toByte
        x += 1
      }
      y += 1
    }
    // filter: out[i] = raw[i] - predictor, mod 256 (PNG spec 4.5.4)
    val filtered = new Array[Byte](height * (1 + stride))
    y = 0
    while (y < height) {
      val f = y % 5
      filtered(y * (1 + stride)) = f.toByte
      var i = 0
      while (i < stride) {
        val r = raw(y)(i) & 0xff
        val a = if (i >= bpp) raw(y)(i - bpp) & 0xff else 0
        val b = if (y > 0) raw(y - 1)(i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) raw(y - 1)(i - bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        filtered(y * (1 + stride) + 1 + i) = ((r - pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered)
    deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!deflater.finished())
      zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val z = zbuf.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val be = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
        .putInt(data.length).array()
      out.write(be)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
        .putInt(crc.getValue.toInt).array())
    }
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(width).putInt(height)
      .put(8.toByte)                                 // bit depth
      .put((if (alpha) 6 else 2).toByte)             // color type
      .put(0.toByte).put(0.toByte).put(0.toByte)     // comp/filter/interlace
      .array()
    chunk("IHDR", ihdr)
    // split IDAT: real encoders emit many; the walk must reassemble
    z.grouped(97).foreach(g => chunk("IDAT", g))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** PNG Paeth predictor (spec 4.5.4, filter type 4). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
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

  /** Validated 24bpp BMP header facts, shared by [[parseBmp]] and
    * [[bmpAHash64]] so the overflow guards live in ONE place. */
  private final case class BmpHeader(dataOff: Int, width: Int,
      height: Int, rowBytes: Long)

  /** Parse + validate a 24bpp BITMAPINFOHEADER header. None unless
    * every guard holds — including the two overflow traps: row math
    * in Long (an Int rowBytes wraps negative near width 2^30) and the
    * divide-don't-multiply size check (rowBytes·height with both near
    * 2^31 overflows even Long, ≈1.4e19, wrapping past an additive
    * guard — height ≥ 1 is checked first so the division is safe). */
  private def bmpHeader(bytes: Array[Byte]): Option[BmpHeader] = {
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
    val rowBytes = (width.toLong * 3 + 3) / 4 * 4
    if (dataOff < 54 || dataOff > bytes.length ||
        rowBytes > (bytes.length.toLong - dataOff) / height)
      return None
    Some(BmpHeader(dataOff, width, height, rowBytes))
  }

  /** Parse an uncompressed 24bpp BITMAPINFOHEADER BMP, honoring the
    * bottom-up row order and 4-byte row padding. */
  def parseBmp(bytes: Array[Byte]): Option[BmpInfo] = {
    val hdr = bmpHeader(bytes) match {
      case Some(h) => h
      case None => return None
    }
    val dataOff = hdr.dataOff
    val width = hdr.width
    val height = hdr.height
    val rowBytes = hdr.rowBytes
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
    Some(BmpInfo(width, height, 24, sb / n, sg / n, sr / n))
  }

  /** Parsed PNG facts: dimensions, channel count, and REAL mean R/G/B
    * over the reconstructed (inflate + filter-reversed) pixels. */
  final case class PngInfo(width: Int, height: Int, channels: Int,
      meanR: Double, meanG: Double, meanB: Double)

  /** Inflated-image budget: decode refuses images above this many
    * pixels rather than letting a 16-byte crafted IHDR allocate
    * gigabytes (the PNG analogue of the BMP division guard — the
    * declared size is attacker-controlled, the budget is ours). */
  val pngMaxPixels: Long = 1L << 24

  /** Parse a non-interlaced 8-bit RGB/RGBA PNG: signature, chunk walk
    * with CRC32 verification, multi-IDAT reassembly, zlib inflate, and
    * per-row filter reversal (all five types). None on anything the
    * parser does not own — truncated chunks, CRC mismatch, palette /
    * 16-bit / interlaced files, short or oversized pixel streams —
    * never a thrown row. */
  def parsePng(bytes: Array[Byte]): Option[PngInfo] = {
    if (bytes.length < 8 + 25) return None // signature + IHDR chunk
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    var i = 0
    while (i < 8) { if (bytes(i) != sig(i)) return None; i += 1 }
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    var pos = 8
    var width = 0; var height = 0; var channels = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (pos + 12 <= bytes.length && !seenIend) {
      val len = buf.getInt(pos)
      // Long-domain bounds like the WAV walk: a corrupt ~2^31 length
      // would wrap an Int sum negative and sail past the guard
      if (len < 0 || pos.toLong + 12L + len > bytes.length) return None
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      if (crc.getValue.toInt != buf.getInt(pos + 8 + len)) return None
      typ match {
        case "IHDR" =>
          if (len != 13 || seenIhdr) return None
          seenIhdr = true
          width = buf.getInt(pos + 8)
          height = buf.getInt(pos + 12)
          val bitDepth = bytes(pos + 16) & 0xff
          val colorType = bytes(pos + 17) & 0xff
          val compMethod = bytes(pos + 18) & 0xff
          val filtMethod = bytes(pos + 19) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          // compression/filter METHOD bytes must be 0 (the only
          // values the spec defines) — decoding a nonzero-method file
          // under method-0 rules would answer confident garbage
          if (width <= 0 || height <= 0 || bitDepth != 8 ||
              compMethod != 0 || filtMethod != 0 || interlace != 0)
            return None
          channels = colorType match {
            case 2 => 3
            case 6 => 4
            case _ => return None // palette/gray: not owned here
          }
          if (width.toLong * height > pngMaxPixels) return None
        case "IDAT" =>
          if (!seenIhdr) return None
          idat.write(bytes, pos + 8, len)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks (tEXt, pHYs, ...): skip
      }
      pos += 12 + len
    }
    if (!seenIhdr || !seenIend || idat.size() == 0) return None
    val stride = width * channels
    // expected size fits Int: pixels ≤ 2^24 and channels ≤ 4
    val expected = height * (1 + stride)
    val recon = new Array[Byte](expected)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      var done = false
      while (!done) {
        val n = inf.inflate(recon, off, expected - off)
        off += n
        if (inf.finished()) done = true
        else if (off == expected) {
          // pixel bytes complete but the stream isn't closed: either
          // the final-block marker needs one more pull (fine) or the
          // stream carries MORE pixels than the header declared (a
          // lie — reject)
          val sink = new Array[Byte](1)
          if (inf.inflate(sink, 0, 1) > 0 || !inf.finished())
            return None
          done = true
        } else if (n == 0 &&
            (inf.needsInput() || inf.needsDictionary()))
          return None // truncated or preset-dictionary stream
      }
      if (off != expected) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // filter reversal in place, walking rows forward (spec 4.5.4:
    // recon[i] = filt[i] + predictor, mod 256)
    var y = 0
    while (y < height) {
      val rowOff = y * (1 + stride) + 1
      val prevOff = (y - 1) * (1 + stride) + 1
      val f = recon(rowOff - 1) & 0xff
      if (f > 4) return None
      var j = 0
      while (j < stride) {
        val a = if (j >= channels) recon(rowOff + j - channels) & 0xff
                else 0
        val b = if (y > 0) recon(prevOff + j) & 0xff else 0
        val c = if (y > 0 && j >= channels)
                  recon(prevOff + j - channels) & 0xff
                else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        recon(rowOff + j) =
          (((recon(rowOff + j) & 0xff) + pred) & 0xff).toByte
        j += 1
      }
      y += 1
    }
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    y = 0
    while (y < height) {
      val rowOff = y * (1 + stride) + 1
      var x = 0
      while (x < width) {
        sr += (recon(rowOff + x * channels) & 0xff)
        sg += (recon(rowOff + x * channels + 1) & 0xff)
        sb += (recon(rowOff + x * channels + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    Some(PngInfo(width, height, channels, sr / n, sg / n, sb / n))
  }

  /** Perceptual average-hash (aHash) of a decoded 24bpp BMP: sample
    * an 8×8 grid nearest-neighbor (cell (i,j) reads pixel
    * (⌊i·w/8⌋, ⌊j·h/8⌋)), gray = B+G+R per sample (integer — no
    * division anywhere), bit = 64·gray > Σgray, serialized as a
    * 64-char '0'/'1' string row-major (j outer) — engine-portable,
    * so an oracle replays the whole pipeline arithmetically. Exact
    * integer comparisons keep the hash bit-stable across engines;
    * ties (64·gray = Σ) answer 0. None when the bytes don't parse. */
  def bmpAHash64(bytes: Array[Byte]): Option[String] = {
    val hdr = bmpHeader(bytes) match {
      case Some(h) => h
      case None => return None
    }
    val width = hdr.width
    val height = hdr.height
    val gray = new Array[Long](64)
    var total = 0L
    var j = 0
    while (j < 8) {
      // grid sampling in Long: i·width near 2^31 wraps an Int index
      // negative (the bmpHeader guard class, one level up)
      val sy = (j.toLong * height / 8).toInt
      val row = hdr.dataOff + (height - 1 - sy).toLong * hdr.rowBytes
      var i = 0
      while (i < 8) {
        val sx = (i.toLong * width / 8).toInt
        val p = (row + sx.toLong * 3).toInt
        val g = (bytes(p) & 0xff).toLong +
          (bytes(p + 1) & 0xff) +
          (bytes(p + 2) & 0xff)
        gray(j * 8 + i) = g
        total += g
        i += 1
      }
      j += 1
    }
    val sb = new java.lang.StringBuilder(64)
    var c = 0
    while (c < 64) {
      sb.append(if (64L * gray(c) > total) '1' else '0')
      c += 1
    }
    Some(sb.toString)
  }

  // ------------------------------------------------------------- JPEG

  /** Parsed JPEG facts. JPEG is LOSSY — pixel statistics do not
    * replay across encoders, so only the exactly-replayable fields
    * (dimensions, channel count) are surfaced; perceptual work rides
    * [[jpegAHash64]], gated by same-JVM round trips in spec. */
  final case class JpegInfo(width: Int, height: Int, channels: Int)

  /** Decoded-pixel budget for JPEG (same 16M-pixel line as
    * [[pngMaxPixels]]): dimensions are peeked from the header BEFORE
    * the raster allocates, so a crafted SOF can't demand gigabytes. */
  val jpegMaxPixels: Long = 1L << 24

  /** Serialize a JPEG via the JDK's own encoder (`javax.imageio` —
    * ships with the JVM, zero external deps): RGB pixel (x, y) carries
    * the [[bmpBytes]] arithmetic family (R/G/B = (13x+17y+seed) /
    * (7x+11y+seed) / (3x+5y+seed) mod 256); `gray` instead encodes a
    * single-band image with luma (13x+17y+seed) mod 256. Encoding is
    * lossy — the bytes are real JPEG, the decode gate checks only
    * exact facts. */
  def jpegBytes(width: Int, height: Int, seed: Int,
      gray: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0)
    val typ = if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
    val img = new java.awt.image.BufferedImage(width, height, typ)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (gray) {
          val v = (13 * x + 17 * y + seed) % 256
          img.getRaster.setSample(x, y, 0, v)
        } else {
          val r = (13 * x + 17 * y + seed) % 256
          val g = (7 * x + 11 * y + seed) % 256
          val b = (3 * x + 5 * y + seed) % 256
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
        }
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, "jpg", out)
    require(ok, "JDK JPEG writer unavailable")
    out.toByteArray
  }

  /** Decode JPEG facts: SOI magic + a JPEG-named ImageIO reader +
    * header-peeked dimensions (budget-checked BEFORE the raster
    * allocates) + a full pixel decode so truncated streams fail here,
    * not downstream. None on malformed/oversize/non-JPEG bytes — the
    * audit spelling, never an exception mid-job. */
  def parseJpeg(bytes: Array[Byte],
      maxPixels: Long = jpegMaxPixels): Option[JpegInfo] =
    readJpeg(bytes, maxPixels).map(_._1)

  /** The single-decode JPEG kernel both [[parseJpeg]] and
    * [[jpegAHash64]] share (a per-row hash pass must not pay the
    * dominant decode cost twice). The ImageInputStream is an explicit
    * MemoryCacheImageInputStream — per-call, never the JVM-global
    * `ImageIO.setUseCache` switch. */
  private def readJpeg(bytes: Array[Byte], maxPixels: Long)
      : Option[(JpegInfo, java.awt.image.BufferedImage)] = {
    if (bytes == null || bytes.length < 4) return None
    // SOI marker: without this, ImageIO would happily hand back its
    // PNG/BMP reader and "decode" the wrong format
    if (bytes(0) != 0xff.toByte || bytes(1) != 0xd8.toByte) return None
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      // scan for a JPEG-NAMED reader: a third-party SPI plugin may
      // sort ahead of the JDK's under a different format name
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      var reader: javax.imageio.ImageReader = null
      while (reader == null && readers.hasNext) {
        val r = readers.next()
        if (r.getFormatName.equalsIgnoreCase("JPEG")) reader = r
        else r.dispose()
      }
      if (reader == null) return None
      try {
        reader.setInput(iis, true, true)
        val w = reader.getWidth(0)
        val h = reader.getHeight(0)
        if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) return None
        val img = reader.read(0)
        Some((JpegInfo(w, h, img.getRaster.getNumBands), img))
      } catch {
        case _: Exception => None
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Perceptual average-hash of a decoded JPEG — the [[bmpAHash64]]
    * grid and bit rule (8×8 nearest-neighbor samples, gray = R+G+B
    * via the sRGB view so 1-band and 3-band images hash in the same
    * space, bit = 64·gray > Σ) over `javax.imageio`'s decode. Lossy
    * input, so hashes are pinned by same-JVM round trips in spec —
    * never a cross-engine oracle. */
  def jpegAHash64(bytes: Array[Byte],
      maxPixels: Long = jpegMaxPixels): Option[String] = {
    val img = readJpeg(bytes, maxPixels) match {
      case Some((_, i)) => i
      case None => return None
    }
    val w = img.getWidth
    val h = img.getHeight
    val gray = new Array[Long](64)
    var total = 0L
    var j = 0
    while (j < 8) {
      val sy = (j.toLong * h / 8).toInt
      var i = 0
      while (i < 8) {
        val sx = (i.toLong * w / 8).toInt
        val rgb = img.getRGB(sx, sy)
        val g = ((rgb >> 16) & 0xff).toLong + ((rgb >> 8) & 0xff) +
          (rgb & 0xff)
        gray(j * 8 + i) = g
        total += g
        i += 1
      }
      j += 1
    }
    val sb = new java.lang.StringBuilder(64)
    var c = 0
    while (c < 64) {
      sb.append(if (64L * gray(c) > total) '1' else '0')
      c += 1
    }
    Some(sb.toString)
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

  /** Decode a PNG binary column — same kernel contract as
    * [[decodeWav]]. */
  def decodePng(df: DataFrame, idCol: String, mediaCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
    ds.mapPartitions(_.map { case (id, bytes) =>
      val p = Option(bytes).flatMap(parsePng)
      (id, p.map(_.width), p.map(_.height), p.map(_.channels),
        p.map(_.meanR), p.map(_.meanG), p.map(_.meanB))
    }).toDF(idCol, "width", "height", "channels",
      "mean_r", "mean_g", "mean_b")
  }

  /** Perceptual-hash a BMP binary column — one typed mapPartitions
    * kernel ([[bmpAHash64]] per row), null hash on malformed bytes.
    * Group on the hash downstream for exact perceptual-dup sets; at
    * Hamming-radius > 0, band the 64 bits like [[Dedup.simhash]]. */
  def aHashBmp(df: DataFrame, idCol: String, mediaCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
    ds.mapPartitions(_.map { case (id, bytes) =>
      (id, Option(bytes).flatMap(bmpAHash64))
    }).toDF(idCol, "ahash")
  }

  /** Decode a JPEG binary column — same kernel contract as
    * [[decodeWav]]; only the exactly-replayable facts surface
    * (dimensions, channels — JPEG is lossy, pixel stats don't
    * oracle-replay). */
  def decodeJpeg(df: DataFrame, idCol: String, mediaCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
    ds.mapPartitions(_.map { case (id, bytes) =>
      val p = Option(bytes).flatMap(b => parseJpeg(b))
      (id, p.map(_.width), p.map(_.height), p.map(_.channels))
    }).toDF(idCol, "width", "height", "channels")
  }

  /** Perceptual-hash a JPEG binary column — [[aHashBmp]]'s contract
    * over [[jpegAHash64]]. */
  def aHashJpeg(df: DataFrame, idCol: String, mediaCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
    ds.mapPartitions(_.map { case (id, bytes) =>
      (id, Option(bytes).flatMap(b => jpegAHash64(b)))
    }).toDF(idCol, "ahash")
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
