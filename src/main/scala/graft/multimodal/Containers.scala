package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL pure-JVM container codecs for the formats whose header layouts
  * need no external library: WAV (RIFF chunk walk), BMP
  * (BITMAPFILEHEADER + BITMAPINFOHEADER), MPEG Layer III audio (frame
  * header + frame walk — the "MP3" facts: version, bitrate, rate,
  * channels, frame/sample counts, duration), and ISO BMFF ("MP4" box
  * walk: ftyp brand, mvhd timescale/duration, tkhd tracks +
  * dimensions, mdat size). This is actual byte-level parsing of actual
  * container bytes — it replaces the [[Multimodal.FakeCodec]] stub at
  * the METADATA step of the multimodal pipeline; only the compressed
  * SAMPLE decode (which needs codec libraries this container doesn't
  * ship) remains stubbed for MP3/MP4.
  *
  * Every parser is total: any malformed, truncated, or foreign payload
  * returns None — a corrupt file in a 100 TB media crawl must become a
  * classifiable row, never a task failure.
  *
  * The builders exist so fixtures and gates can synthesize REAL headers
  * deterministically from table columns; they are also legitimate
  * encoders (the WAV builder emits a canonical 44-byte-header PCM file,
  * the BMP builder a canonical BI_RGB one, the MP3 builder spec-valid
  * Layer III frames, the MP4 builder a conforming ftyp/moov/mdat tree).
  */
object Containers {

  /** Parsed "fmt "+"data" facts of a PCM, G.711, or IMA ADPCM WAV.
    * `formatTag` is the container's wFormatTag: 1 = linear PCM,
    * 6 = G.711 A-law, 7 = G.711 µ-law (both companded formats are
    * 8 bits/sample, so the PCM byte-rate duration math holds for them
    * unchanged), 0x11 = IMA/DVI ADPCM (4-bit adaptive differential —
    * duration comes from the mandatory `fact` sample count instead,
    * carried in `factSamples`; `blockAlign` is the codec's block
    * size, needed to find each block's predictor header). */
  final case class WavInfo(channels: Int, sampleRate: Int,
                           bitsPerSample: Int, dataBytes: Long,
                           formatTag: Int = 1, blockAlign: Int = 0,
                           factSamples: Long = -1L) {
    def byteRate: Long = sampleRate.toLong * channels * (bitsPerSample / 8)
    def durationMs: Long =
      if (formatTag == FormatImaAdpcm)
        (if (sampleRate <= 0 || factSamples < 0) 0L
         else factSamples * 1000L / sampleRate)
      else if (byteRate == 0) 0L
      else dataBytes * 1000L / byteRate
  }

  /** WAVE_FORMAT tags this library decodes. */
  val FormatPcm = 1
  val FormatAlaw = 6
  val FormatUlaw = 7
  val FormatImaAdpcm = 0x11

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
  private val FACT = 0x74636166

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
    var fmt: Option[(Int, Int, Int, Int)] = None // (tag, channels, rate, bits)
    var blockAlign = 0
    var factSamples = -1L
    var dataBytes = -1L
    var dataOff = -1
    // keep walking past fmt+data while an ADPCM stream still owes its
    // fact chunk — RIFF does not mandate fact-before-data, and exiting
    // early would decline a decodable clip purely on chunk order
    def needMore: Boolean = fmt.isEmpty || dataBytes < 0 ||
      (fmt.exists(_._1 == FormatImaAdpcm) && factSamples < 0)
    while (off + 8 <= payload.length && needMore) {
      val i = off.toInt
      val id = b.getInt(i)
      val size = b.getInt(i + 4)
      if (size < 0 || off + 8 + size > payload.length) return None
      // FIRST-wins for fmt/data/fact: the extended walk (needMore) can
      // scan past the data chunk for ADPCM's fact, so a later
      // duplicate fmt/data is IGNORED, not adopted — the first chunk
      // is the one the committed bytes were laid out for (the same
      // chunk the early-exit PCM walk would have stopped at), and
      // re-keying blockAlign after data would decode them on the
      // wrong stride
      if (id == FMT_ && fmt.isEmpty) {
        if (size < 16) return None
        // wFormatTag must be a format whose duration math we can
        // stand behind: linear PCM, G.711 µ-law/A-law (8-bit
        // companded — same bytes-per-sample arithmetic), or IMA ADPCM
        // (4-bit, duration from the fact chunk — validated below). An
        // MS-ADPCM / MP3-in-WAV payload would otherwise parse as a
        // "valid wav" with confidently wrong duration — classify those
        // as unparseable instead. A fmt chunk whose bit depth
        // contradicts its codec (G.711 IS 8-bit, IMA IS 4-bit) is
        // self-contradictory — decline rather than guess which field
        // lies.
        val tag = b.getShort(i + 8) & 0xFFFF
        val bits = b.getShort(i + 22) & 0xFFFF
        if (tag != FormatPcm &&
            !((tag == FormatAlaw || tag == FormatUlaw) && bits == 8) &&
            !(tag == FormatImaAdpcm && bits == 4))
          return None
        blockAlign = b.getShort(i + 20) & 0xFFFF
        fmt = Some((tag, b.getShort(i + 10) & 0xFFFF,
          b.getInt(i + 12), bits))
      } else if (id == FACT && size >= 4 && factSamples < 0) {
        factSamples = b.getInt(i + 8).toLong & 0xFFFFFFFFL
      } else if (id == DATA && dataBytes < 0) {
        dataBytes = size.toLong
        dataOff = i + 8
      }
      off += 8L + size + (size & 1) // chunks pad to even offsets
    }
    fmt.collect { case (tag, ch, rate, bits) if dataBytes >= 0 &&
        (tag != FormatImaAdpcm || imaFactsHold(ch, rate, blockAlign,
          factSamples, dataBytes)) =>
      (WavInfo(ch, rate, bits, dataBytes, tag, blockAlign, factSamples),
        dataOff)
    }
  }

  /** The IMA ADPCM header facts this decoder stands behind: MONO (the
    * stereo 4-byte channel interleave is a different wire format —
    * decline rather than guess), a positive rate, a block big enough
    * to hold its own 4-byte predictor header, a `fact` chunk present
    * (compressed WAV requires one — without it the tail nibble count
    * is a guess), and a sample claim the data bytes can actually
    * carry: a hostile fact near 2³² would otherwise turn the decode's
    * output allocation into an OOM task failure. */
  private def imaFactsHold(channels: Int, rate: Int, blockAlign: Int,
                           factSamples: Long, dataBytes: Long): Boolean =
    channels == 1 && rate > 0 && blockAlign >= 5 && factSamples >= 0 && {
      val nBlocks = (dataBytes + blockAlign - 1) / blockAlign
      val perBlock = (blockAlign - 4).toLong * 2 + 1
      // absolute cap sized to the per-row allocation it gates: 2^24
      // samples = a 64 MB Array[Int] (≈ 6 min of 48 kHz mono), so even
      // a hostile payload whose fact chunk maxes the ~2×dataBytes bound
      // cannot force a near-GiB allocation in imaAdpcmSamples
      factSamples <= nBlocks * perBlock && factSamples <= (1L << 24)
    }

  /** REAL sample decode: the data-chunk bytes of a [[parseWav]]-valid
    * payload as integer sample values — PCM 16-bit → signed
    * little-endian (a trailing odd byte is ignored, per block-align),
    * PCM 8-bit → unsigned re-centered to [-128, 127], G.711 µ-law /
    * A-law → expanded to 16-bit linear through the ITU-T G.711
    * segment tables ([[ulawToLinear]]/[[alawToLinear]] — pure integer
    * arithmetic, no codec library). Interleaved channel samples each
    * count as one value (stats over them are channel-agnostic). None
    * for anything parseWav rejects and for bit depths this decoder
    * doesn't cover (24/32-bit containers exist but the fixtures never
    * build them — decline rather than guess). */
  def pcmSamples(payload: Array[Byte]): Option[Array[Int]] =
    wavWithDataOffset(payload).flatMap { case (w, off) =>
      (w.formatTag, w.bitsPerSample) match {
        case (FormatPcm, 16) =>
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
        case (FormatPcm, 8) =>
          Some(Array.tabulate(w.dataBytes.toInt)(i =>
            (payload(off + i) & 0xFF) - 128))
        case (FormatUlaw, 8) =>
          Some(Array.tabulate(w.dataBytes.toInt)(i =>
            ulawToLinear(payload(off + i) & 0xFF)))
        case (FormatAlaw, 8) =>
          Some(Array.tabulate(w.dataBytes.toInt)(i =>
            alawToLinear(payload(off + i) & 0xFF)))
        case (FormatImaAdpcm, 4) => imaAdpcmSamples(payload, off, w)
        case _ => None
      }
    }

  /** REAL IMA ADPCM block decode behind [[pcmSamples]] (facts already
    * validated by [[imaFactsHold]]): each block opens with a 4-byte
    * header — the first sample VERBATIM as int16 LE plus the step
    * index — then data bytes carrying two 4-bit codes each, LOW nibble
    * first, every code advancing the predictor through
    * [[imaAdpcmAdvance]]. The fact count trims the final block's pad
    * nibble(s); a block whose header claims an out-of-range step index
    * (> 88) declines the whole payload (a lying header, not a
    * decodable stream); a data chunk that runs out before the fact
    * count is satisfied declines too — never a short-read guess. */
  private def imaAdpcmSamples(payload: Array[Byte], off: Int,
                              w: WavInfo): Option[Array[Int]] = {
    val total = w.factSamples.toInt // ≤ 2^24, imaFactsHold
    val ba = w.blockAlign
    val out = new Array[Int](total)
    var s = 0
    var blockOff = 0L
    var bad = false
    while (!bad && s < total && blockOff + 4 <= w.dataBytes) {
      val base = off + blockOff.toInt
      var pred = (payload(base + 1) << 8) | (payload(base) & 0xFF)
      var idx = payload(base + 2) & 0xFF
      if (idx > 88) bad = true
      else {
        out(s) = pred
        s += 1
        val blockEnd = math.min(ba.toLong, w.dataBytes - blockOff).toInt
        var i = 4
        while (i < blockEnd && s < total) {
          val byte = payload(base + i) & 0xFF
          var half = 0
          while (half < 2 && s < total) {
            val nib = if (half == 0) byte & 0xF else byte >>> 4
            val next = imaAdpcmAdvance(pred, idx, nib)
            pred = next._1
            idx = next._2
            out(s) = pred
            s += 1
            half += 1
          }
          i += 1
        }
        blockOff += ba
      }
    }
    if (bad || s != total) None else Some(out)
  }

  // ── G.711 companding (ITU-T G.711 segment layout; the integer
  // expand/compress arithmetic every telephony stack publishes — pure
  // table math, total over all 256 byte values, no library) ──────────

  /** Expand one µ-law byte to its 16-bit linear sample. µ-law stores
    * the COMPLEMENT of (sign, 3-bit segment, 4-bit mantissa) with bias
    * 0x84; 0xFF and 0x7F are the two zeros. */
  def ulawToLinear(uByte: Int): Int = {
    val u = ~uByte & 0xFF
    val t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** Expand one A-law byte to its 16-bit linear sample. A-law XORs
    * with 0x55 (alternate-bit inversion) and, unlike µ-law, marks
    * POSITIVE samples with the sign bit; segment 0 is linear. */
  def alawToLinear(aByte: Int): Int = {
    val a = (aByte ^ 0x55) & 0xFF
    var t = (a & 0x0F) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else { t += 0x108; if (seg > 1) t <<= (seg - 1) }
    if ((a & 0x80) != 0) t else -t
  }

  /** Compress one 16-bit linear sample to its µ-law byte — the fixture
    * seam for cross-codec dedup tests (a re-encode of a PCM clip) and
    * the inverse the decoder's golden vectors verify against. */
  def linearToUlaw(pcm: Int): Int = {
    var x = pcm >> 2 // 16-bit → the codec's 14-bit domain
    val mask = if (x < 0) { x = -x; 0x7F } else 0xFF
    if (x > 8159) x = 8159 // clip to the top of segment 7
    x += 0x84 >> 2
    var seg = 0 // segment ends are (0x40 << seg) - 1: 0x3F, 0x7F, …, 0x1FFF
    while (seg < 8 && x > ((0x40 << seg) - 1)) seg += 1
    if (seg >= 8) 0x7F ^ mask
    else (((seg << 4) | ((x >> (seg + 1)) & 0x0F)) ^ mask) & 0xFF
  }

  // ── IMA / DVI ADPCM (the public IMA Digital Audio compatibility
  // spec: 4-bit adaptive differential codes over an 89-entry step
  // table — pure integer arithmetic, no library; the second REAL
  // compressed-audio codec beside G.711, at 4:1 instead of 2:1) ──────

  /** The IMA step-size table (89 entries, ~1.1× geometric growth). */
  private val ImaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)

  /** Step-index adjustment by code magnitude (small codes cool the
    * quantizer, large codes heat it). */
  private val ImaIndexAdj: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** ONE decoder step of the IMA ADPCM state machine — the single
    * source of truth shared by the block decoder, the encoder's
    * reconstruction path, fixtures, and golden vectors:
    * `diff = step/8 (+ step/4 if bit0) (+ step/2 if bit1) (+ step if
    * bit2)`, subtracted when bit3 (sign) is set, predictor clamped to
    * int16, index adjusted by magnitude and clamped to [0, 88].
    * Returns (newPredictor, newIndex). */
  def imaAdpcmAdvance(pred: Int, index: Int, nibble: Int): (Int, Int) = {
    val step = ImaStep(index)
    var diff = step >> 3
    if ((nibble & 1) != 0) diff += step >> 2
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 4) != 0) diff += step
    var p = if ((nibble & 8) != 0) pred - diff else pred + diff
    if (p > 32767) p = 32767 else if (p < -32768) p = -32768
    var ix = index + ImaIndexAdj(nibble & 7)
    if (ix < 0) ix = 0 else if (ix > 88) ix = 88
    (p, ix)
  }

  /** The encoder's quantizer: the 4-bit code for reaching `sample`
    * from the current (predictor, index) state — sign bit, then the
    * standard successive-halving of the residue. Exactly inverts
    * [[imaAdpcmAdvance]] when the target diff IS a representable code
    * diff (the property the cross-codec plants ride); saturates at
    * magnitude 7 otherwise. */
  def imaAdpcmQuantize(pred: Int, index: Int, sample: Int): Int = {
    val step = ImaStep(index)
    var diff = sample - pred
    var nib = 0
    if (diff < 0) { nib = 8; diff = -diff }
    if (diff >= step) { nib |= 4; diff -= step }
    if (diff >= (step >> 1)) { nib |= 2; diff -= step >> 1 }
    if (diff >= (step >> 2)) nib |= 1
    nib
  }

  /** Canonical mono IMA ADPCM WAV around `samples`: 20-byte fmt chunk
    * (wFormatTag 0x11, cbSize 2, wSamplesPerBlock), the mandatory fact
    * chunk carrying the true sample count, and data blocks of
    * `samplesPerBlock` samples each — a 4-byte (sample0, stepIndex)
    * header plus two codes per byte, low nibble first, step index
    * carried across blocks. Defaults to one block holding everything,
    * capped at 65533 samples per block (the largest a 16-bit
    * nBlockAlign can state) — longer clips go multi-block.
    * A legitimate encoder (lossy like any ADPCM), and the fixture seam
    * for cross-codec dedup: on a waveform GENERATED by the decoder
    * state machine the quantizer reproduces every code exactly, so
    * decode∘encode is the identity there. */
  def buildWavImaAdpcm(sampleRate: Int, samples: Array[Int],
                       samplesPerBlock: Int = 0): Array[Byte] = {
    require(samples.nonEmpty, "ADPCM build needs at least one sample")
    // the block headers carry sample0 VERBATIM as int16 LE — an
    // out-of-range value would silently truncate to its low 16 bits
    // (the putShort-wrap class the other builders guard), emitting a
    // file whose decode diverges arbitrarily from the input; a
    // legitimate encoder fails loudly instead
    require(samples.forall(s => s >= -32768 && s <= 32767),
      "ADPCM build needs int16 samples in [-32768, 32767]")
    // mirror the parser's absolute decode-allocation cap (imaFactsHold):
    // a longer clip would build a file this library's own parseWav
    // declines
    require(samples.length <= (1 << 24),
      s"ADPCM build caps at 2^24 samples, got ${samples.length}")
    // block capacity must be exact — (blockAlign−4) data bytes carry
    // 2 codes each, plus the header sample, so a block holds an ODD
    // sample count; an even spb would leave a pad nibble the decoder
    // of a NON-final block cannot tell from a code. The final block
    // may still be partial (the fact count trims it).
    // the default caps at 65533 (odd): one block holding everything,
    // until blockAlign would no longer fit the fmt chunk's 16-bit
    // nBlockAlign/wSamplesPerBlock fields — putShort would silently
    // wrap those for a ~131k-sample clip while the body kept the true
    // stride, emitting a file whose own header mis-addresses it
    val spb0 = if (samplesPerBlock <= 0) math.min(samples.length, 65533)
      else math.max(3, samplesPerBlock)
    val spb = if (samplesPerBlock <= 0) spb0
      else if (spb0 % 2 == 0) spb0 + 1 else spb0
    // never below 5: the parser's own imaFactsHold demands a block big
    // enough for a header AND at least one data byte, so a 1-sample
    // clip pads its lone block rather than emit an unparseable file
    val blockAlign = math.max(5, 4 + spb / 2)
    require(blockAlign <= 0xFFFF && (blockAlign - 4) * 2 + 1 <= 0xFFFF,
      s"samplesPerBlock=$spb needs blockAlign=$blockAlign, which cannot " +
        "be stated in the fmt chunk's 16-bit fields")
    // the header's wSamplesPerBlock states the block's CAPACITY — for
    // the padded 1-sample minimum block that is 3, not 1, keeping the
    // emitted fmt internally consistent for strict external readers
    // (blockAlign == 4 + ceil((wSamplesPerBlock-1)/2)); the fact chunk
    // still carries the true sample count
    val headerSpb = (blockAlign - 4) * 2 + 1
    val nBlocks = (samples.length + spb - 1) / spb
    val buf = new java.io.ByteArrayOutputStream()
    var idx = 0
    var bs = 0
    while (bs < samples.length) {
      val inBlock = math.min(spb, samples.length - bs)
      var pred = samples(bs)
      buf.write(pred & 0xFF)
      buf.write((pred >> 8) & 0xFF)
      buf.write(idx)
      buf.write(0)
      var i = 1
      var pendingLow = -1
      while (i < inBlock) {
        val nib = imaAdpcmQuantize(pred, idx, samples(bs + i))
        val next = imaAdpcmAdvance(pred, idx, nib)
        pred = next._1
        idx = next._2
        if (pendingLow < 0) pendingLow = nib
        else { buf.write(pendingLow | (nib << 4)); pendingLow = -1 }
        i += 1
      }
      if (pendingLow >= 0) buf.write(pendingLow)
      // pad the block to blockAlign so every block header lands on the
      // stride the decoder walks
      while (buf.size() % blockAlign != 0) buf.write(0)
      bs += inBlock
    }
    val body = buf.toByteArray
    val pad = body.length & 1
    val out = ByteBuffer.allocate(12 + 8 + 20 + 8 + 4 + 8 + body.length + pad)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(RIFF).putInt(4 + 28 + 12 + 8 + body.length + pad).putInt(WAVE)
    out.putInt(FMT_).putInt(20)
      .putShort(FormatImaAdpcm.toShort)
      .putShort(1.toShort)                 // mono
      .putInt(sampleRate)
      .putInt((sampleRate.toLong * blockAlign / headerSpb).toInt) // avg bytes/sec
      .putShort(blockAlign.toShort)
      .putShort(4.toShort)                 // bits per sample
      .putShort(2.toShort)                 // cbSize
      .putShort(headerSpb.toShort)         // wSamplesPerBlock (capacity)
    out.putInt(FACT).putInt(4).putInt(samples.length)
    out.putInt(DATA).putInt(body.length).put(body)
    if (pad == 1) out.put(0.toByte)
    require(nBlocks * blockAlign == body.length,
      s"ADPCM block layout drifted: $nBlocks x $blockAlign != ${body.length}")
    out.array()
  }

  /** Compress one 16-bit linear sample to its A-law byte. */
  def linearToAlaw(pcm: Int): Int = {
    var x = pcm >> 3 // 16-bit → the codec's 13-bit domain
    val mask = if (x >= 0) 0xD5 else { x = -x - 1; 0x55 }
    var seg = 0 // segment ends are (0x20 << seg) - 1: 0x1F, 0x3F, …, 0xFFF
    while (seg < 8 && x > ((0x20 << seg) - 1)) seg += 1
    if (seg >= 8) (0x7F ^ mask) & 0xFF
    else {
      val shift = if (seg < 2) 1 else seg
      (((seg << 4) | ((x >> shift) & 0x0F)) ^ mask) & 0xFF
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

  /** Canonical 44-byte-header WAV around `data`, RIFF pad byte
    * included when the data length is odd. `formatTag` defaults to
    * linear PCM; pass [[FormatUlaw]]/[[FormatAlaw]] (with
    * `bitsPerSample = 8`) for a G.711 container. */
  def buildWav(channels: Int, sampleRate: Int, bitsPerSample: Int,
               data: Array[Byte],
               formatTag: Int = FormatPcm): Array[Byte] = {
    // the fmt chunk states channels and block align in 16-bit fields —
    // a wider request would putShort-wrap into a header that
    // mis-describes its own body (same class as the ADPCM block cap)
    require(channels >= 1 && channels * (bitsPerSample / 8) <= 0xFFFF,
      s"channels=$channels bits=$bitsPerSample cannot be stated in the " +
        "fmt chunk's 16-bit fields")
    val pad = data.length & 1
    val out = ByteBuffer.allocate(44 + data.length + pad)
      .order(ByteOrder.LITTLE_ENDIAN)
    val byteRate = sampleRate * channels * (bitsPerSample / 8)
    out.putInt(RIFF).putInt(36 + data.length + pad).putInt(WAVE)
    out.putInt(FMT_).putInt(16)
      .putShort(formatTag.toShort)
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(byteRate)
      .putShort((channels * (bitsPerSample / 8)).toShort) // block align
      .putShort(bitsPerSample.toShort)
    out.putInt(DATA).putInt(data.length).put(data)
    if (pad == 1) out.put(0.toByte)
    out.array()
  }

  // ── MPEG audio (MP3) container metadata ─────────────────────────────
  // Frame-header layout per the public MPEG-1/2 audio spec (ISO 11172-3
  // / 13818-3): 11-bit sync, version, layer, bitrate index, sample-rate
  // index, padding, channel mode. HEADER parsing and the frame walk are
  // pure integer arithmetic — only the audio-sample DECODE needs a
  // codec library and stays with [[Multimodal.FakeCodec]].

  /** Parsed facts of an MPEG Layer III stream: `version` ∈ {1, 2, 25}
    * (25 = MPEG-2.5), `bitrateKbps` from the first MUSIC frame (VBR
    * streams vary later frames), `frames`/`samples` from the full
    * frame walk, `musicBytes` the bytes the walked frames span (ID3
    * tags, any pre-sync junk, and a Xing/Info metadata frame
    * excluded), `vbr` when the stream leads with a Xing tag (an Info
    * tag marks a CBR encoder header — excluded from counts but not
    * VBR). */
  final case class Mp3Info(version: Int, bitrateKbps: Int, sampleRate: Int,
                           channels: Int, frames: Int, samples: Long,
                           musicBytes: Long, vbr: Boolean = false) {
    def durationMs: Long =
      if (sampleRate == 0) 0L else samples * 1000L / sampleRate
  }

  private val Mp3BitrateV1 = // Layer III, MPEG-1, kbps by index 1..14
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3BitrateV2 = // Layer III, MPEG-2/2.5
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val Mp3RateV1 = Array(44100, 48000, 32000)
  private val Mp3RateV2 = Array(22050, 24000, 16000)
  private val Mp3RateV25 = Array(11025, 12000, 8000)

  /** One frame header at `off`: (version, bitrateKbps, sampleRate,
    * channels, frameLen). None unless a syntactically valid LAYER III
    * header with defined bitrate/rate indices sits exactly at `off`.
    * Other layers decline (this is an MP3 parser, not a guesser). */
  private def mp3FrameAt(p: Array[Byte], off: Int)
      : Option[(Int, Int, Int, Int, Int)] = {
    if (off + 4 > p.length) return None
    val b0 = p(off) & 0xFF; val b1 = p(off + 1) & 0xFF
    val b2 = p(off + 2) & 0xFF; val b3 = p(off + 3) & 0xFF
    if (b0 != 0xFF || (b1 & 0xE0) != 0xE0) return None
    val versionBits = (b1 >> 3) & 3 // 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    val layerBits = (b1 >> 1) & 3   // 1 = Layer III
    if (versionBits == 1 || layerBits != 1) return None
    val brIdx = (b2 >> 4) & 0xF
    val srIdx = (b2 >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None // free/bad
    val v1 = versionBits == 3
    val bitrate = (if (v1) Mp3BitrateV1 else Mp3BitrateV2)(brIdx)
    val rate = (versionBits match {
      case 3 => Mp3RateV1
      case 2 => Mp3RateV2
      case _ => Mp3RateV25
    })(srIdx)
    val padding = (b2 >> 1) & 1
    val channels = if (((b3 >> 6) & 3) == 3) 1 else 2
    // Layer III frame length; 144 halves to 72 for the half-rate specs
    val frameLen = (if (v1) 144 else 72) * bitrate * 1000 / rate + padding
    if (frameLen < 4) return None
    val version = versionBits match { case 3 => 1; case 2 => 2; case _ => 25 }
    Some((version, bitrate, rate, channels, frameLen))
  }

  /** MPEG Layer III stream walk: skip an ID3v2 tag if present (syncsafe
    * 28-bit size), find the first valid frame header, then walk
    * consecutive frames until the payload ends or sync breaks
    * (truncated tails tolerate — the walked prefix reports; a payload
    * with NO complete frame is None). Version/rate/channels must stay
    * constant across frames (bitrate may vary — VBR); a mid-stream
    * change declines as malformed. */
  def parseMp3(payload: Array[Byte]): Option[Mp3Info] = {
    if (payload.length < 4) return None
    var off = 0L
    if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' &&
        payload(2) == '3') {
      // syncsafe: 4 × 7 bits; Long guard (a crafted tag size must
      // decline, not wrap into the frame walk)
      val sz = ((payload(6) & 0x7F).toLong << 21) |
        ((payload(7) & 0x7F).toLong << 14) |
        ((payload(8) & 0x7F).toLong << 7) | (payload(9) & 0x7F).toLong
      off = 10L + sz
      if (off >= payload.length) return None
    }
    // tolerate a bounded run of pre-sync junk (real encoders pad);
    // bounded so a sync-free 100 MB payload declines fast
    val scanEnd = math.min(payload.length.toLong, off + 4096)
    var first: Option[(Int, Int, Int, Int, Int)] = None
    while (first.isEmpty && off + 4 <= scanEnd) {
      first = mp3FrameAt(payload, off.toInt)
      if (first.isEmpty) off += 1
    }
    first.flatMap { case (ver, br0, rate, ch, len0) =>
      val spf = if (ver == 1) 1152L else 576L
      // Xing/Info detection: most VBR encoders write a metadata tag as
      // the FIRST frame, at the fixed offset right after the side info
      // (MPEG-1: 17 mono / 32 stereo; MPEG-2/2.5: 9 / 17). That frame
      // carries no audio — counting it as music inflates
      // frames/samples/duration by one frame and reports the tag
      // frame's (often arbitrary) bitrate as the stream's, so it is
      // excluded from every count and the reported bitrate comes from
      // the first MUSIC frame. "Xing" marks VBR, "Info" a CBR encoder
      // header — both are metadata, only Xing sets the vbr flag.
      val sideInfo =
        if (ver == 1) { if (ch == 1) 17 else 32 }
        else { if (ch == 1) 9 else 17 }
      val tagOff = off + 4 + sideInfo
      val tag =
        if (tagOff + 4 <= math.min(payload.length.toLong, off + len0))
          new String(payload, tagOff.toInt, 4, "ISO-8859-1") match {
            case t @ ("Xing" | "Info") => Some(t)
            case _ => None
          }
        else None
      val vbr = tag.contains("Xing")
      var reportBr = br0
      var len = len0
      var ok = true
      if (tag.isDefined) {
        // skip the whole metadata frame; the stream must still contain
        // a matching music frame behind it or it has no audio at all
        if (off + len <= payload.length) {
          off += len
          mp3FrameAt(payload, off.toInt) match {
            case Some((v2, b2, r2, c2, l2)) if v2 == ver && r2 == rate &&
                c2 == ch => reportBr = b2; len = l2
            case _ => ok = false
          }
        } else ok = false
      }
      val start = off
      var frames = 0
      while (ok && off + len <= payload.length) {
        frames += 1
        off += len
        mp3FrameAt(payload, off.toInt) match {
          case Some((v2, _, r2, c2, l2)) if v2 == ver && r2 == rate &&
              c2 == ch => len = l2
          case Some(_) => ok = false // mid-stream format change: decline
          case None => ok = false    // end of stream / truncated tail
        }
      }
      if (frames == 0) None
      else Some(Mp3Info(ver, reportBr, rate, ch, frames, frames * spf,
        off - start, vbr))
    }
  }

  /** Canonical fixed-bitrate Layer III stream: `nFrames` valid headers
    * with `fill`-supplied body bytes (zero default — the walk never
    * decodes them), optionally behind a minimal ID3v2 tag. A REAL
    * MPEG audio header writer: any standard tool reads these frames'
    * metadata. Requires spec-defined parameters (kbps present in the
    * version's Layer III table, rate in its rate family). `tag`
    * ("Xing" or "Info") writes that metadata header — 4cc at the
    * post-side-info offset, frames-known flags, and the music-frame
    * count — into frame 0, which then counts as metadata, not music
    * (`nFrames` still counts ALL frames, so a tagged build has
    * nFrames−1 music frames). */
  def buildMp3(version: Int, bitrateKbps: Int, sampleRate: Int,
               channels: Int, nFrames: Int,
               fill: Int => Byte = _ => 0,
               id3Bytes: Int = 0,
               tag: String = ""): Array[Byte] = {
    require(version == 1 || version == 2 || version == 25, "version 1|2|25")
    val v1 = version == 1
    val brIdx = (if (v1) Mp3BitrateV1 else Mp3BitrateV2)
      .indexOf(bitrateKbps)
    val rates = version match {
      case 1 => Mp3RateV1; case 2 => Mp3RateV2; case _ => Mp3RateV25
    }
    val srIdx = rates.indexOf(sampleRate)
    require(brIdx > 0, s"bitrate $bitrateKbps not in the Layer III table")
    require(srIdx >= 0, s"rate $sampleRate not defined for MPEG$version")
    require(channels == 1 || channels == 2, "channels 1|2")
    require(id3Bytes >= 0 && id3Bytes < (1 << 20), "id3Bytes in [0, 1M)")
    val frameLen = (if (v1) 144 else 72) * bitrateKbps * 1000 / sampleRate
    val versionBits = version match { case 1 => 3; case 2 => 2; case _ => 0 }
    val hdr1 = (0xE0 | (versionBits << 3) | (1 << 1) | 1).toByte // layer III, no CRC
    val hdr2 = ((brIdx << 4) | (srIdx << 2)).toByte // no padding
    val hdr3 = (if (channels == 1) 0xC0 else 0x00).toByte // mono | stereo
    val out = new Array[Byte](
      (if (id3Bytes > 0) 10 + id3Bytes else 0) + nFrames * frameLen)
    var base = 0
    if (id3Bytes > 0) {
      out(0) = 'I'; out(1) = 'D'; out(2) = '3'; out(3) = 4; out(4) = 0
      out(5) = 0
      out(6) = ((id3Bytes >> 21) & 0x7F).toByte
      out(7) = ((id3Bytes >> 14) & 0x7F).toByte
      out(8) = ((id3Bytes >> 7) & 0x7F).toByte
      out(9) = (id3Bytes & 0x7F).toByte
      base = 10 + id3Bytes // tag body stays zero — a padding-only tag
    }
    var f = 0
    while (f < nFrames) {
      val o = base + f * frameLen
      out(o) = 0xFF.toByte; out(o + 1) = hdr1; out(o + 2) = hdr2
      out(o + 3) = hdr3
      var i = 4
      while (i < frameLen) { out(o + i) = fill(f * frameLen + i); i += 1 }
      f += 1
    }
    if (tag.nonEmpty) {
      require(tag == "Xing" || tag == "Info", "tag is Xing|Info (or empty)")
      require(nFrames >= 2,
        "a tagged stream needs at least one music frame behind the tag")
      val sideInfo =
        if (v1) { if (channels == 1) 17 else 32 }
        else { if (channels == 1) 9 else 17 }
      val o = base + 4 + sideInfo
      require(o + 12 <= base + frameLen,
        s"frame length $frameLen too small to carry a $tag header")
      tag.getBytes("ISO-8859-1").copyToArray(out, o)
      val bb = ByteBuffer.wrap(out, o + 4, 8)
      bb.putInt(1)           // flags: frames-known
      bb.putInt(nFrames - 1) // music frames behind the tag
    }
    out
  }

  // ── ISO BMFF (MP4) container metadata ───────────────────────────────

  /** Parsed top-level facts of an ISO base-media file: brand from
    * `ftyp`, movie timescale/duration from `moov/mvhd`, track count
    * and the first video track's 16.16-fixed dimensions from
    * `moov/trak/tkhd`, `mdatBytes` the summed media-data payload. */
  final case class Mp4Info(majorBrand: String, timescale: Long,
                           durationMs: Long, nTracks: Int,
                           width: Option[Int], height: Option[Int],
                           mdatBytes: Long)

  private def be32(p: Array[Byte], i: Int): Long =
    ((p(i) & 0xFFL) << 24) | ((p(i + 1) & 0xFFL) << 16) |
      ((p(i + 2) & 0xFFL) << 8) | (p(i + 3) & 0xFFL)

  private def be64(p: Array[Byte], i: Int): Long =
    (be32(p, i) << 32) | be32(p, i + 4)

  private def fourcc(p: Array[Byte], i: Int): String =
    new String(Array(p(i), p(i + 1), p(i + 2), p(i + 3)), "ISO-8859-1")

  /** ISO BMFF box walk. Boxes are [u32 size][4cc type] big-endian;
    * size 1 → 64-bit largesize follows, size 0 → to end of enclosing
    * span. The walk is total: every size is validated against the
    * enclosing span in Long before use (a crafted size must decline,
    * never wrap into an out-of-bounds read). The file must LEAD with
    * `ftyp` (the brand gate — arbitrary binary with a lucky box shape
    * should classify as unknown, and every conforming writer puts ftyp
    * first). */
  def parseMp4(payload: Array[Byte]): Option[Mp4Info] = {
    if (payload.length < 16) return None
    if (be32(payload, 0) < 16 || fourcc(payload, 4) != "ftyp") return None
    val brand = fourcc(payload, 8)
    var timescale = -1L
    var duration = -1L
    var nTracks = 0
    var width: Option[Int] = None
    var height: Option[Int] = None
    var mdat = 0L
    // walk(start, end): iterate sibling boxes in [start, end). Every
    // comparison is phrased as `size > end - off` (a subtraction of two
    // in-bounds offsets), NEVER `off + size > end`: a crafted 64-bit
    // largesize near Long.MaxValue overflows the addition, slips the
    // guard, and turns the promised decline into an out-of-bounds read
    // — the same overflow class the WAV chunk walk guards against.
    def walk(start: Long, end: Long)
        (visit: (String, Long, Long) => Unit): Boolean = {
      var off = start
      while (off + 8 <= end) {
        var size = be32(payload, off.toInt)
        var hdr = 8L
        if (size == 1) {
          if (end - off < 16) return false
          size = be64(payload, off.toInt + 8); hdr = 16L
        } else if (size == 0) size = end - off
        if (size < hdr || size > end - off) return false
        visit(fourcc(payload, off.toInt + 4), off + hdr, off + size)
        off += size
      }
      off == end
    }
    // inner malformedness must propagate: a corrupted box size INSIDE
    // moov/trak would otherwise yield Some(..) with silently partial
    // facts — a corrupt crawl file must classify unknown, not parse
    // as a confident mp4 row with wrong metadata
    var innerOk = true
    val wellFormed = walk(0L, payload.length.toLong) { (typ, bs, be) =>
      typ match {
        case "mdat" => mdat += be - bs
        case "moov" =>
          val ok = walk(bs, be) { (t2, cs, ce) =>
            t2 match {
              case "mvhd" if ce - cs >= 4 =>
                val v = payload(cs.toInt) & 0xFF
                if (v == 1 && ce - cs >= 28) {
                  timescale = be32(payload, cs.toInt + 20)
                  duration = be64(payload, cs.toInt + 24)
                } else if (v == 0 && ce - cs >= 20) {
                  timescale = be32(payload, cs.toInt + 12)
                  duration = be32(payload, cs.toInt + 16)
                }
              case "trak" =>
                nTracks += 1
                val okT = walk(cs, ce) { (t3, ds, de) =>
                  // tkhd content is 84 bytes at v0, 96 at v1 (64-bit
                  // create/modify/duration times — the form modern
                  // muxers emit); width/height are the LAST two 16.16
                  // fields in BOTH layouts
                  if (t3 == "tkhd" && width.isEmpty && de - ds >= 84) {
                    val v = payload(ds.toInt) & 0xFF
                    if (v == 0 || (v == 1 && de - ds >= 96)) {
                      val w = be32(payload, de.toInt - 8)
                      val h = be32(payload, de.toInt - 4)
                      if (w > 0 && h > 0) {
                        width = Some((w >> 16).toInt)
                        height = Some((h >> 16).toInt)
                      }
                    }
                  }
                }
                if (!okT) innerOk = false
              case _ => ()
            }
          }
          if (!ok) innerOk = false
        case _ => ()
      }
    }
    if (!wellFormed || !innerOk || timescale <= 0 || duration < 0) None
    else Some(Mp4Info(brand, timescale,
      duration * 1000L / timescale, nTracks, width, height, mdat))
  }

  /** Canonical minimal ISO BMFF file: ftyp + moov(mvhd v0 +
    * trak(tkhd v0) per track) + mdat with `fill`-supplied bytes. A
    * REAL box writer — the structure any BMFF tool walks. Track
    * dimensions are written 16.16-fixed as the spec mandates. */
  def buildMp4(timescale: Int, duration: Long, tracks: Seq[(Int, Int)],
               mdatBytes: Int, fill: Int => Byte = _ => 0,
               tkhdVersion: Int = 0): Array[Byte] = {
    require(timescale > 0 && duration >= 0 && duration <= 0xFFFFFFFFL)
    require(tkhdVersion == 0 || tkhdVersion == 1,
      "tkhd version is 0 (32-bit times) or 1 (64-bit times)")
    val ftyp = ByteBuffer.allocate(24)
    ftyp.putInt(24).put("ftypisom".getBytes("ISO-8859-1"))
      .putInt(0x200).put("isommp41".getBytes("ISO-8859-1"))
    val mvhd = ByteBuffer.allocate(108)
    mvhd.putInt(108).put("mvhd".getBytes("ISO-8859-1"))
      .putInt(0) // version 0 + flags
      .putInt(0).putInt(0) // ctime, mtime
      .putInt(timescale).putInt(duration.toInt)
      .putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume
      .putLong(0) // reserved
      .putInt(0x00010000).putInt(0).putInt(0) // unity matrix…
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
      .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0) // predefined
      .putInt(tracks.size + 1) // next track id
    val traks = tracks.zipWithIndex.map { case ((w, h), i) =>
      // v1 widens ctime/mtime/duration to 64 bits: content 84 → 96
      // bytes, box 92 → 104
      val tkhdSize = if (tkhdVersion == 0) 92 else 104
      val tkhd = ByteBuffer.allocate(tkhdSize)
      tkhd.putInt(tkhdSize).put("tkhd".getBytes("ISO-8859-1"))
        .putInt((tkhdVersion << 24) | 7) // version, flags: enabled|in-movie|in-preview
      if (tkhdVersion == 0)
        tkhd.putInt(0).putInt(0) // ctime, mtime
          .putInt(i + 1).putInt(0) // track id, reserved
          .putInt(duration.toInt)
      else
        tkhd.putLong(0).putLong(0) // 64-bit ctime, mtime
          .putInt(i + 1).putInt(0) // track id, reserved
          .putLong(duration)
      tkhd.putLong(0) // reserved
        .putShort(0).putShort(0).putShort(0).putShort(0) // layer, group, volume, reserved
        .putInt(0x00010000).putInt(0).putInt(0) // unity matrix…
        .putInt(0).putInt(0x00010000).putInt(0)
        .putInt(0).putInt(0).putInt(0x40000000)
        .putInt(w << 16).putInt(h << 16)
      val trak = ByteBuffer.allocate(8 + tkhdSize)
      trak.putInt(8 + tkhdSize).put("trak".getBytes("ISO-8859-1"))
        .put(tkhd.array())
      trak.array()
    }
    val moovSize = 8 + 108 + traks.map(_.length).sum
    val out = ByteBuffer.allocate(24 + moovSize + 8 + mdatBytes)
    out.put(ftyp.array())
    out.putInt(moovSize).put("moov".getBytes("ISO-8859-1"))
      .put(mvhd.array())
    traks.foreach(out.put)
    out.putInt(8 + mdatBytes).put("mdat".getBytes("ISO-8859-1"))
    var i = 0
    while (i < mdatBytes) { out.put(fill(i)); i += 1 }
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
