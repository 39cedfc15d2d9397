package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL pure-JVM container codecs for the two formats whose headers need
  * no external library: WAV (RIFF chunk walk) and BMP (BITMAPFILEHEADER
  * + BITMAPINFOHEADER). This is actual byte-level parsing of actual
  * container bytes — it replaces the [[Multimodal.FakeCodec]] stub at
  * the METADATA step of the multimodal pipeline; only sample/pixel
  * decode (which needs codec libraries this container doesn't ship)
  * remains stubbed.
  *
  * Both parsers are total: any malformed, truncated, or foreign payload
  * returns None — a corrupt file in a 100 TB media crawl must become a
  * classifiable row, never a task failure.
  *
  * The builders exist so fixtures and gates can synthesize REAL headers
  * deterministically from table columns; they are also legitimate
  * encoders (the WAV builder emits a canonical 44-byte-header PCM file,
  * the BMP builder a canonical BI_RGB one).
  */
object Containers {

  /** Parsed "fmt "+"data" facts of a PCM WAV. */
  final case class WavInfo(channels: Int, sampleRate: Int,
                           bitsPerSample: Int, dataBytes: Long) {
    def byteRate: Long = sampleRate.toLong * channels * (bitsPerSample / 8)
    def durationMs: Long =
      if (byteRate == 0) 0L else dataBytes * 1000L / byteRate
  }

  /** Parsed BITMAPINFOHEADER facts of a BMP. `height` is the stored
    * (signed) value — negative means top-down row order. `pixelBytes`
    * comes from the file-header size fields (fileSize - pixelOffset). */
  final case class BmpInfo(width: Int, height: Int, bitsPerPixel: Int,
                           compression: Int, pixelBytes: Long)

  private def le(payload: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)

  // RIFF four-char codes as little-endian ints
  private val RIFF = 0x46464952
  private val WAVE = 0x45564157
  private val FMT_ = 0x20746d66
  private val DATA = 0x61746164

  /** RIFF chunk walk: RIFF/WAVE magic, then scan chunks for "fmt " and
    * "data" (tolerating any other chunks — LIST/INFO/cue are common —
    * and the RIFF even-byte padding rule). */
  def parseWav(payload: Array[Byte]): Option[WavInfo] =
    wavWithDataOffset(payload).map(_._1)

  /** The chunk walk behind [[parseWav]], also yielding the byte offset
    * of the "data" chunk payload — the decode entry point
    * ([[pcmSamples]]) needs it, the metadata surface doesn't. */
  private def wavWithDataOffset(
      payload: Array[Byte]): Option[(WavInfo, Int)] = {
    if (payload.length < 44) return None
    val b = le(payload)
    if (b.getInt(0) != RIFF || b.getInt(8) != WAVE) return None
    // offsets walk in LONG: a crafted chunk size near Int.MaxValue
    // overflows `off + 8 + size` in Int, slips past the bounds check
    // with a wrapped-negative offset, and turns the promised None into
    // an IndexOutOfBounds task failure
    var off = 12L
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var dataBytes = -1L
    var dataOff = -1
    while (off + 8 <= payload.length && (fmt.isEmpty || dataBytes < 0)) {
      val i = off.toInt
      val id = b.getInt(i)
      val size = b.getInt(i + 4)
      if (size < 0 || off + 8 + size > payload.length) return None
      if (id == FMT_) {
        if (size < 16) return None
        // wFormatTag must say PCM: WavInfo's byte-rate duration math is
        // PCM math, and an ADPCM/MP3-in-WAV payload would otherwise
        // parse as a "valid wav" with confidently wrong duration —
        // classify non-PCM as unparseable instead
        if ((b.getShort(i + 8) & 0xFFFF) != 1) return None
        fmt = Some((b.getShort(i + 10) & 0xFFFF,
          b.getInt(i + 12), b.getShort(i + 22) & 0xFFFF))
      } else if (id == DATA) { dataBytes = size.toLong; dataOff = i + 8 }
      off += 8L + size + (size & 1) // chunks pad to even offsets
    }
    fmt.collect { case (ch, rate, bits) if dataBytes >= 0 =>
      (WavInfo(ch, rate, bits, dataBytes), dataOff)
    }
  }

  /** REAL PCM sample decode: the data-chunk bytes of a [[parseWav]]-
    * valid payload as integer sample values — 16-bit → signed
    * little-endian (a trailing odd byte is ignored, per block-align),
    * 8-bit → unsigned re-centered to [-128, 127]. Interleaved channel
    * samples each count as one value (stats over them are
    * channel-agnostic). None for anything parseWav rejects and for bit
    * depths this decoder doesn't cover (24/32-bit containers exist but
    * the fixtures never build them — decline rather than guess). */
  def pcmSamples(payload: Array[Byte]): Option[Array[Int]] =
    wavWithDataOffset(payload).flatMap { case (w, off) =>
      w.bitsPerSample match {
        case 16 =>
          val n = (w.dataBytes / 2).toInt
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            val lo = payload(off + 2 * i) & 0xFF
            val hi = payload(off + 2 * i + 1) // signed → sign-extends
            out(i) = (hi << 8) | lo
            i += 1
          }
          Some(out)
        case 8 =>
          Some(Array.tabulate(w.dataBytes.toInt)(i =>
            (payload(off + i) & 0xFF) - 128))
        case _ => None
      }
    }

  /** BITMAPFILEHEADER ("BM", file size, pixel offset) +
    * BITMAPINFOHEADER (or any later ≥40-byte DIB header, which extends
    * it compatibly). */
  def parseBmp(payload: Array[Byte]): Option[BmpInfo] = {
    if (payload.length < 54) return None
    val b = le(payload)
    if (payload(0) != 'B' || payload(1) != 'M') return None
    val fileSize = b.getInt(2).toLong & 0xFFFFFFFFL
    val pixelOffset = b.getInt(10).toLong & 0xFFFFFFFFL
    val dibSize = b.getInt(14)
    // the header's OWN size claims must fit the actual bytes: a lying
    // fileSize (crafted or truncated payload) would otherwise report
    // pixelBytes in the gigabytes for a 54-byte payload — the WAV path
    // validates every chunk against payload.length for the same reason
    if (dibSize < 40 || pixelOffset > fileSize ||
        fileSize > payload.length || pixelOffset < 54) return None
    Some(BmpInfo(
      width = b.getInt(18),
      height = b.getInt(22),
      bitsPerPixel = b.getShort(28) & 0xFFFF,
      compression = b.getInt(30),
      pixelBytes = fileSize - pixelOffset))
  }

  /** REAL pixel decode of an uncompressed (BI_RGB) BMP: the pixel-array
    * bytes as unsigned values in visual top-down row-major order,
    * EXCLUDING the per-row 4-byte-alignment padding the format mandates
    * (padding is container framing, not image content). Bottom-up
    * storage (positive height) is re-ordered; negative height is the
    * format's top-down flag. None for anything [[parseBmp]] rejects,
    * compressed pixel formats, bit depths without whole-byte samples
    * (1/4-bit palettes), or a pixel array the payload doesn't actually
    * contain. */
  def bmpPixelValues(payload: Array[Byte]): Option[Array[Int]] =
    parseBmp(payload).flatMap { m =>
      val bpp = m.bitsPerPixel
      val w = m.width
      // EVERY size stays in Long until after the bounds check: a
      // hostile width near Int.MaxValue overflows an Int stride to a
      // small/negative number, slips the guard, and turns the promised
      // None into a NegativeArraySize/IndexOutOfBounds task failure —
      // the same overflow class the WAV chunk walk guards against
      val hAbs = math.abs(m.height.toLong)
      val stride = (bpp.toLong * w + 31) / 32 * 4
      val rowBytes = w.toLong * (bpp / 8)
      val pixelOffset = le(payload).getInt(10).toLong & 0xFFFFFFFFL
      val decodable = m.compression == 0 &&
        (bpp == 8 || bpp == 24 || bpp == 32) && w > 0 && hAbs > 0 &&
        pixelOffset + stride * hAbs <= payload.length &&
        rowBytes * hAbs <= Int.MaxValue
      if (!decodable) None
      else {
        val out = new Array[Int]((rowBytes * hAbs).toInt)
        val rb = rowBytes.toInt
        var vr = 0 // visual row, top-down
        while (vr < hAbs) {
          val sr = if (m.height < 0) vr else hAbs.toInt - 1 - vr // stored
          val base = (pixelOffset + sr.toLong * stride).toInt
          var p = 0
          while (p < rb) {
            out(vr * rb + p) = payload(base + p) & 0xFF
            p += 1
          }
          vr += 1
        }
        Some(out)
      }
    }

  /** Canonical 44-byte-header PCM WAV around `data`, RIFF pad byte
    * included when the data length is odd. */
  def buildWav(channels: Int, sampleRate: Int, bitsPerSample: Int,
               data: Array[Byte]): Array[Byte] = {
    val pad = data.length & 1
    val out = ByteBuffer.allocate(44 + data.length + pad)
      .order(ByteOrder.LITTLE_ENDIAN)
    val byteRate = sampleRate * channels * (bitsPerSample / 8)
    out.putInt(RIFF).putInt(36 + data.length + pad).putInt(WAVE)
    out.putInt(FMT_).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(byteRate)
      .putShort((channels * (bitsPerSample / 8)).toShort) // block align
      .putShort(bitsPerSample.toShort)
    out.putInt(DATA).putInt(data.length).put(data)
    if (pad == 1) out.put(0.toByte)
    out.array()
  }

  /** Canonical BI_RGB BMP: 54-byte headers + pixel rows at the
    * 4-byte-aligned stride the format mandates. `fill` supplies the
    * pixel-array byte at each index (padding positions included — they
    * are in the array, just not image content); the default zero fill
    * keeps the historical all-black output. */
  def buildBmp(width: Int, height: Int, bitsPerPixel: Int = 24,
               fill: Int => Byte = _ => 0): Array[Byte] = {
    val rowBytes = ((bitsPerPixel * width + 31) / 32) * 4
    val pixelBytes = rowBytes * height
    val out = ByteBuffer.allocate(54 + pixelBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
      .putInt(54 + pixelBytes) // file size
      .putInt(0)               // reserved
      .putInt(54)              // pixel offset
    out.putInt(40)             // BITMAPINFOHEADER
      .putInt(width).putInt(height)
      .putShort(1)             // planes
      .putShort(bitsPerPixel.toShort)
      .putInt(0)               // BI_RGB
      .putInt(pixelBytes)
      .putInt(2835).putInt(2835) // 72 DPI
      .putInt(0).putInt(0)
    var i = 0
    while (i < pixelBytes) { out.put(fill(i)); i += 1 }
    out.array()
  }
}
