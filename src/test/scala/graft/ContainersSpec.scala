package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Containers
import graft.multimodal.Containers.{BmpInfo, WavInfo}

/** Byte-level WAV/BMP codec: build→parse round-trips, chunk-walk
  * tolerance, and total-function behavior on garbage — the parser runs
  * inside media-crawl tasks where a malformed payload must classify,
  * never throw. */
class ContainersSpec extends AnyFunSuite {

  test("fuzz: parsers are total over 10k+ hostile payloads (None, never throw)") {
    // deterministic PRNG: a failure reproduces by seed; the corpus mixes
    // pure noise, truncations/extensions of VALID files, single-byte
    // corruptions, and crafted near-Int.MaxValue chunk/size fields (the
    // Int-overflow class the WAV walk's long offsets exist for)
    val rnd = new scala.util.Random(0xC0FFEE)
    def check(p: Array[Byte]): Unit = {
      val w = Containers.parseWav(p) // Option or bust — any throw fails
      val m = Containers.parseBmp(p)
      assert(w == null || w.isInstanceOf[Option[_]])
      assert(m == null || m.isInstanceOf[Option[_]])
    }
    // 5k pure-noise payloads across the size spectrum (incl. the empty
    // and sub-header sizes the guards special-case)
    for (i <- 0 until 5000) {
      val len = if (i < 100) i else rnd.nextInt(600)
      val p = new Array[Byte](len); rnd.nextBytes(p); check(p)
    }
    val wav = Containers.buildWav(2, 44100, 16, Array.tabulate(101)(_.toByte))
    val bmp = Containers.buildBmp(7, 5)
    // 2k truncations/extensions of valid files at every boundary
    for (base <- Seq(wav, bmp); cut <- 0 to base.length)
      check(base.take(cut))
    for (base <- Seq(wav, bmp); pad <- 1 to 400)
      check(base ++ Array.fill(pad)(rnd.nextInt().toByte))
    // 5k single-field corruptions of valid files: flip a random byte
    for (_ <- 0 until 2500; base <- Seq(wav, bmp)) {
      val p = base.clone()
      p(rnd.nextInt(p.length)) = rnd.nextInt().toByte
      check(p)
    }
    // crafted overflow payloads: chunk/size fields at and around
    // Int.MaxValue, where `off + 8 + size` wraps negative in Int math
    for (evil <- Seq(Int.MaxValue, Int.MaxValue - 1, Int.MaxValue - 7,
        Int.MinValue, -1, -8)) {
      val b = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(0x46464952).putInt(evil).putInt(0x45564157) // RIFF/size/WAVE
      b.putInt(0x20746d66).putInt(evil)                    // "fmt " size=evil
      check(b.array())
      val c = bmp.clone()
      val cb = java.nio.ByteBuffer.wrap(c).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      cb.putInt(2, evil)  // lying fileSize
      cb.putInt(10, evil) // lying pixelOffset
      check(c)
    }
  }

  test("WAV build/parse round-trips across parameter grid") {
    for {
      ch <- Seq(1, 2, 6)
      rate <- Seq(8000, 16000, 44100, 48000)
      bits <- Seq(8, 16, 24)
      dataLen <- Seq(0, 1, 17, 4096) // odd lengths exercise the pad byte
    } {
      val data = Array.tabulate(dataLen)(i => (i * 31).toByte)
      val parsed = Containers.parseWav(Containers.buildWav(ch, rate, bits, data))
      assert(parsed === Some(WavInfo(ch, rate, bits, dataLen.toLong,
          blockAlign = ch * (bits / 8))),
        s"ch=$ch rate=$rate bits=$bits len=$dataLen")
    }
    // a channel layout the fmt chunk's 16-bit fields cannot state must
    // fail loudly at build, never putShort-wrap into a lying header
    intercept[IllegalArgumentException] {
      Containers.buildWav(30000, 8000, 24, Array[Byte](1))
    }
  }

  test("WAV duration derives from the parsed byte rate") {
    val w = Containers.parseWav(
      Containers.buildWav(2, 16000, 16, new Array[Byte](64000))).get
    assert(w.byteRate === 64000L)
    assert(w.durationMs === 1000L)
  }

  test("RIFF walk tolerates foreign chunks before fmt/data") {
    // splice a LIST chunk (odd size → padded) between WAVE and fmt
    val base = Containers.buildWav(1, 8000, 16, Array[Byte](1, 2, 3, 4))
    val list = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0,
      'I', 'N', 'F', 'O', 9, 0) // 5 payload bytes + 1 pad
    val spliced = base.take(12) ++ list ++ base.drop(12)
    // fix the RIFF size field (little-endian at offset 4)
    val riffSize = spliced.length - 8
    for (i <- 0 until 4) spliced(4 + i) = (riffSize >> (8 * i)).toByte
    assert(Containers.parseWav(spliced) ===
      Some(WavInfo(1, 8000, 16, 4L, blockAlign = 2)))
  }

  test("BMP build/parse round-trips and reports aligned pixel bytes") {
    for {
      w <- Seq(1, 13, 64, 640)
      h <- Seq(1, 47, 480)
    } {
      val parsed = Containers.parseBmp(Containers.buildBmp(w, h))
      val stride = ((24 * w + 31) / 32) * 4
      assert(parsed === Some(BmpInfo(w, h, 24, 0, stride.toLong * h)),
        s"w=$w h=$h")
    }
  }

  test("BMP negative height (top-down) passes through as stored") {
    // hand-flip the height field of a built file to its negation
    val bytes = Containers.buildBmp(4, 3)
    val negH = -3
    for (i <- 0 until 4) bytes(22 + i) = (negH >> (8 * i)).toByte
    assert(Containers.parseBmp(bytes).map(_.height) === Some(-3))
  }

  test("non-PCM WAVs and lying BMP headers classify as unparseable") {
    import java.nio.{ByteBuffer, ByteOrder}
    // a valid PCM file with the format tag rewritten to ADPCM (0x11):
    // PCM byte-rate duration math would be confidently wrong for it
    val adpcm = Containers.buildWav(1, 8000, 16, Array.fill[Byte](32)(7))
    ByteBuffer.wrap(adpcm).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(20, 0x11.toShort)
    assert(Containers.parseWav(adpcm).isEmpty)
    // a BMP whose header claims 4 GiB of pixels for a 54-byte payload:
    // pixelBytes must not be reported off the lying fileSize field
    val bmp = Containers.buildBmp(4, 4)
    val lying = java.util.Arrays.copyOf(bmp, 54)
    ByteBuffer.wrap(lying).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(2, Int.MinValue) // fileSize 0x80000000 = 2 GiB unsigned
    assert(Containers.parseBmp(lying).isEmpty)
  }

  test("both parsers are total on garbage, truncation, and cross-format bytes") {
    val wav = Containers.buildWav(1, 8000, 16, Array[Byte](1, 2))
    val bmp = Containers.buildBmp(8, 8)
    assert(Containers.parseWav(Array.empty[Byte]) === None)
    assert(Containers.parseBmp(Array.empty[Byte]) === None)
    assert(Containers.parseWav("not a riff file, just text".getBytes) === None)
    assert(Containers.parseBmp("BMx".getBytes) === None)
    assert(Containers.parseWav(bmp) === None)
    assert(Containers.parseBmp(wav) === None)
    // truncation at every prefix length must return None, never throw
    for (n <- 0 until wav.length) assert(Containers.parseWav(wav.take(n)) === None)
    for (n <- 0 until 54) assert(Containers.parseBmp(bmp.take(n)) === None)
    // a data-chunk size pointing past the buffer is malformed, not a read
    val lying = wav.clone()
    lying(wav.length - 6) = 127 // inflate the data chunk's size field
    assert(Containers.parseWav(lying) === None)
    // a chunk size near Int.MaxValue must not WRAP the bounds math into
    // a negative offset (Int arithmetic did: off + 8 + size overflowed
    // past the check and getInt(negative) threw on hostile bytes)
    val huge = wav.clone()
    for ((v, i) <- Seq(0xF0, 0xFF, 0xFF, 0x7F).zipWithIndex)
      huge(16 + i) = v.toByte // fmt chunk size := 0x7FFFFFF0
    assert(Containers.parseWav(huge) === None)
  }

  test("PCM decode: 16-bit LE signed samples round-trip through the builder") {
    // hand-built samples spanning the signed range, incl. the
    // sign-extension boundary values
    val samples = Array(0, 1, -1, 32767, -32768, 256, -257, 12345, -12345)
    val data = new Array[Byte](samples.length * 2)
    for ((s, i) <- samples.zipWithIndex) {
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val wav = Containers.buildWav(1, 8000, 16, data)
    assert(Containers.pcmSamples(wav).map(_.toSeq) === Some(samples.toSeq))
    // a trailing odd byte is outside any whole sample — ignored, and the
    // RIFF pad byte the builder appends must not leak into the decode
    val odd = Containers.buildWav(2, 44100, 16, data :+ 9.toByte)
    assert(Containers.pcmSamples(odd).map(_.toSeq) === Some(samples.toSeq))
  }

  test("PCM decode: 8-bit recenters unsigned bytes; unsupported depths decline") {
    val data = Array[Byte](0, 127.toByte, 128.toByte, 255.toByte, 64)
    val wav = Containers.buildWav(1, 8000, 8, data)
    assert(Containers.pcmSamples(wav).map(_.toSeq) ===
      Some(Seq(-128, -1, 0, 127, -64)))
    // 24-bit is a real container the decoder deliberately declines
    val deep = Containers.buildWav(1, 8000, 24, Array[Byte](1, 2, 3))
    assert(Containers.parseWav(deep).isDefined)
    assert(Containers.pcmSamples(deep) === None)
    assert(Containers.pcmSamples(Array.empty[Byte]) === None)
  }

  test("G.711 companding: ITU golden vectors, code-level identity, " +
      "and bounded expansion error") {
    import Containers.{alawToLinear, linearToAlaw, linearToUlaw, ulawToLinear}
    // public G.711 landmarks: the two µ-law zeros, the ±full-scale
    // codes, and A-law's smallest/largest magnitudes
    assert(ulawToLinear(0xFF) === 0)
    assert(ulawToLinear(0x7F) === 0)
    assert(ulawToLinear(0x80) === 32124)
    assert(ulawToLinear(0x00) === -32124)
    assert(alawToLinear(0xD5) === 8)
    assert(alawToLinear(0x55) === -8)
    assert(alawToLinear(0xAA) === 32256)
    assert(alawToLinear(0x2A) === -32256)
    // decode→encode identity over every code: A-law for all 256,
    // µ-law for all but the redundant negative zero (0x7F and 0xFF
    // both decode to 0; the encoder canonically picks 0xFF)
    for (b <- 0 until 256) {
      assert(linearToAlaw(alawToLinear(b)) === b, s"alaw code $b")
      if (b != 0x7F)
        assert(linearToUlaw(ulawToLinear(b)) === b, s"ulaw code $b")
    }
    assert(linearToUlaw(ulawToLinear(0x7F)) === 0xFF)
    // compand error is bounded by the top-segment step everywhere
    var x = -32768
    while (x <= 32767) {
      assert(math.abs(ulawToLinear(linearToUlaw(x)) - x) <= 1024,
        s"ulaw roundtrip at $x")
      assert(math.abs(alawToLinear(linearToAlaw(x)) - x) <= 1024,
        s"alaw roundtrip at $x")
      x += 7
    }
  }

  test("G.711 WAV containers decode to 16-bit linear; lying G.711 bit " +
      "depths decline") {
    import Containers.{FormatAlaw, FormatUlaw}
    val codes = Array[Byte](0xFF.toByte, 0x80.toByte, 0x00, 0x7F)
    val uw = Containers.buildWav(1, 8000, 8, codes, FormatUlaw)
    assert(Containers.parseWav(uw) ===
      Some(Containers.WavInfo(1, 8000, 8, 4L, FormatUlaw,
        blockAlign = 1)))
    assert(Containers.pcmSamples(uw).map(_.toSeq) ===
      Some(Seq(0, 32124, -32124, 0)))
    val aw = Containers.buildWav(1, 8000, 8,
      Array[Byte](0xD5.toByte, 0x55, 0xAA.toByte), FormatAlaw)
    assert(Containers.pcmSamples(aw).map(_.toSeq) ===
      Some(Seq(8, -8, 32256)))
    // duration math is unchanged 8-bit arithmetic
    val pcm8 = Containers.parseWav(Containers.buildWav(1, 8000, 8, codes))
    assert(Containers.parseWav(uw).get.durationMs === pcm8.get.durationMs)
    // a G.711 fmt chunk claiming 16 bits contradicts the codec —
    // decline rather than guess which field lies
    assert(Containers.parseWav(
      Containers.buildWav(1, 8000, 16, codes, FormatUlaw)) === None)
    // and unknown tags still decline (ADPCM = 2)
    assert(Containers.parseWav(
      Containers.buildWav(1, 8000, 8, codes, 2)) === None)
  }

  test("BMP decode: stride padding excluded, bottom-up rows reordered") {
    // 3×2 @24bpp: rowBytes 9, stride 12 — three padding bytes per row.
    // fill = array index, so padding positions hold values the decode
    // must NOT emit, and row order distinguishes stored from visual.
    val bmp = Containers.buildBmp(3, 2, fill = i => i.toByte)
    val px = Containers.bmpPixelValues(bmp).get
    // bottom-up storage: stored row 1 (indices 12-20) is the TOP visual
    // row; stored row 0 (0-8) the bottom. Padding (9-11, 21-23) absent.
    assert(px.toSeq === ((12 to 20) ++ (0 to 8)).map(_ % 256))
    // negative height flips to top-down: stored order IS visual order
    val neg = Containers.buildBmp(3, 2, fill = i => i.toByte)
    for (i <- 0 until 4) neg(22 + i) = ((-2) >> (8 * i)).toByte
    assert(Containers.bmpPixelValues(neg).get.toSeq ===
      ((0 to 8) ++ (12 to 20)).map(_ % 256))
    // values are unsigned byte readings
    val dark = Containers.buildBmp(1, 1, fill = _ => 0xF0.toByte)
    assert(Containers.bmpPixelValues(dark).get.toSeq === Seq(240, 240, 240))
    // declines: compressed flag (still header-parseable), and a pixel
    // array the payload doesn't fully contain even when the header's
    // own size fields are internally consistent
    val comp = Containers.buildBmp(3, 2)
    java.nio.ByteBuffer.wrap(comp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(30, 1) // BI_RLE8
    assert(Containers.bmpPixelValues(comp) === None)
    assert(Containers.parseBmp(comp).isDefined)
    val short = java.util.Arrays.copyOf(Containers.buildBmp(3, 2), 70)
    java.nio.ByteBuffer.wrap(short).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(2, 70) // fileSize matches the truncated payload
    assert(Containers.parseBmp(short).isDefined)
    assert(Containers.bmpPixelValues(short) === None)
    // hostile width near Int.MaxValue: an Int stride wraps negative,
    // slips the bounds check, and crashes on array allocation — the
    // decode must keep its size math in Long and decline
    val evil = java.util.Arrays.copyOf(Containers.buildBmp(1, 1, 32), 58)
    val eb = java.nio.ByteBuffer.wrap(evil)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    eb.putInt(2, 58)            // fileSize = payload length
    eb.putInt(18, Int.MaxValue) // width
    eb.putInt(22, 2)            // height
    assert(Containers.parseBmp(evil).isDefined)
    assert(Containers.bmpPixelValues(evil) === None)
  }

  test("MP3 build/parse round-trips across the parameter grid, with and " +
      "without an ID3v2 tag") {
    for (ver <- Seq(1, 2, 25);
         (br, rate) <- Seq((if (ver == 1) 128 else 64,
           ver match { case 1 => 44100; case 2 => 22050; case _ => 8000 }),
           (if (ver == 1) 320 else 160,
             ver match { case 1 => 32000; case 2 => 16000; case _ => 12000 }));
         ch <- Seq(1, 2); frames <- Seq(1, 3, 7); id3 <- Seq(0, 17)) {
      val p = Containers.buildMp3(ver, br, rate, ch, frames,
        fill = i => (i % 250).toByte, id3Bytes = id3)
      val got = Containers.parseMp3(p)
      assert(got.isDefined, s"v$ver $br/$rate ch$ch f$frames id3=$id3")
      val m = got.get
      assert(m.version === ver)
      assert(m.bitrateKbps === br && m.sampleRate === rate)
      assert(m.channels === ch && m.frames === frames)
      val spf = if (ver == 1) 1152L else 576L
      assert(m.samples === frames * spf)
      assert(m.durationMs === frames * spf * 1000L / rate)
      val frameLen = (if (ver == 1) 144 else 72) * br * 1000 / rate
      assert(m.musicBytes === frames.toLong * frameLen,
        "ID3 bytes must not count as music")
    }
  }

  test("MP3 parser declines truncation to zero frames, mid-stream format " +
      "changes, lying ID3 sizes, and non-Layer-III streams") {
    val base = Containers.buildMp3(1, 128, 44100, 2, 3)
    // truncated inside the first frame: no complete frame → None
    assert(Containers.parseMp3(base.take(100)) === None)
    // truncated inside frame 3: the walked prefix reports 2 frames
    assert(Containers.parseMp3(base.take(base.length - 10)).get.frames === 2)
    // a second stream at a DIFFERENT sample rate spliced on: decline the
    // splice point — frames before it still report
    val other = Containers.buildMp3(1, 128, 32000, 2, 1)
    assert(Containers.parseMp3(base ++ other).get.frames === 3)
    // ID3 size pointing past the payload: decline, never wrap
    val withTag = Containers.buildMp3(1, 128, 44100, 2, 1, id3Bytes = 17)
    val evil = withTag.clone()
    evil(6) = 0x7F; evil(7) = 0x7F; evil(8) = 0x7F; evil(9) = 0x7F
    assert(Containers.parseMp3(evil) === None)
    // non-Layer-III layer bits: not an MP3 — decline
    val l2 = base.clone(); l2(1) = (l2(1) | 0x04).toByte
    assert(Containers.parseMp3(Array(l2(0), l2(1), l2(2), l2(3))) === None)
  }

  test("MP4 build/parse round-trips brand, timescale math, tracks, and " +
      "16.16 dimensions") {
    for (ts <- Seq(600, 1000, 90000); dur <- Seq(0L, 1234L, 987654L);
         nT <- Seq(0, 1, 3); mdat <- Seq(0, 33)) {
      val tracks = Seq.tabulate(nT)(t => (320 + t, 240 + t))
      val p = Containers.buildMp4(ts, dur, tracks, mdat)
      val got = Containers.parseMp4(p)
      assert(got.isDefined, s"ts=$ts dur=$dur nT=$nT mdat=$mdat")
      val m = got.get
      assert(m.majorBrand === "isom")
      assert(m.timescale === ts)
      assert(m.durationMs === dur * 1000L / ts)
      assert(m.nTracks === nT && m.mdatBytes === mdat)
      if (nT > 0) assert(m.width === Some(320) && m.height === Some(240))
      else assert(m.width === None && m.height === None)
    }
  }

  test("MP4 parser declines foreign bytes, crafted box sizes, and " +
      "ftyp-less files; MP3/MP4 fuzz stays total") {
    assert(Containers.parseMp4("not a box tree at all".getBytes("UTF-8"))
      === None)
    val good = Containers.buildMp4(600, 100L, Seq((8, 8)), 4)
    // no leading ftyp → decline (arbitrary binary with a lucky box
    // shape must classify unknown)
    assert(Containers.parseMp4(good.drop(24)) === None)
    // crafted sizes: zero, negative-as-unsigned-huge, and truncations
    for (evil <- Seq(0, -1, Int.MaxValue, 17)) {
      val c = good.clone()
      val cb = java.nio.ByteBuffer.wrap(c)
      cb.putInt(24, evil) // moov box size
      val r = Containers.parseMp4(c) // Option or bust
      assert(r == null || r.isInstanceOf[Option[_]])
    }
    for (cut <- 0 to good.length)
      assert(Containers.parseMp4(good.take(cut)).isInstanceOf[Option[_]])
    // crafted 64-bit largesize near Long.MaxValue: `off + size` wraps
    // negative, evades an addition-phrased bounds check, and reads out
    // of bounds — the walk must phrase the guard as subtraction and
    // decline (this exact payload threw AIOOBE before the fix)
    val big = java.nio.ByteBuffer.allocate(48)
    big.put(good, 0, 24) // valid ftyp
    big.putInt(1).put("moov".getBytes("ISO-8859-1"))
      .putLong(0x7FFFFFFFFFFFFFF0L) // 64-bit largesize, absurd
    assert(Containers.parseMp4(big.array()) === None)
    // corrupted box size INSIDE moov: the file must decline, not parse
    // as a confident mp4 with silently partial facts (trak counted,
    // width/height lost)
    val inner = good.clone()
    java.nio.ByteBuffer.wrap(inner).putInt(140, 17) // trak box size
    assert(Containers.parseMp4(inner) === None)
    // largesize sweep: extremes and boundary values all stay total
    for (evilL <- Seq(Long.MaxValue, Long.MinValue, -1L, 0L, 15L, 16L,
        Long.MaxValue - 15, Int.MaxValue.toLong + 1)) {
      val b2 = java.nio.ByteBuffer.allocate(48)
      b2.put(good, 0, 24)
      b2.putInt(1).put("moov".getBytes("ISO-8859-1")).putLong(evilL)
      assert(Containers.parseMp4(b2.array()).isInstanceOf[Option[_]])
    }
    // cross-format and noise fuzz over both new parsers
    val rnd = new scala.util.Random(0xA5F022)
    val mp3 = Containers.buildMp3(1, 64, 44100, 1, 2)
    for (_ <- 0 until 2000) {
      val p = new Array[Byte](rnd.nextInt(300)); rnd.nextBytes(p)
      Containers.parseMp3(p); Containers.parseMp4(p)
    }
    for (base <- Seq(mp3, good); cut <- 0 to base.length) {
      Containers.parseMp3(base.take(cut))
      Containers.parseMp4(base.take(cut))
    }
    Containers.parseMp3(Containers.buildWav(1, 8000, 16, new Array[Byte](64)))
    Containers.parseMp4(Containers.buildBmp(4, 4))
  }

  test("MP3 Xing/Info header: the tag frame is excluded from every " +
      "count, vbr flags only Xing, bitrate reports from the music") {
    val frameLen = 144 * 128 * 1000 / 44100
    // Xing-tagged: frames/samples/musicBytes count only MUSIC frames
    val x = Containers.buildMp3(1, 128, 44100, 2, 5, tag = "Xing")
    val mx = Containers.parseMp3(x).get
    assert(mx.vbr && mx.frames === 4 && mx.samples === 4 * 1152L)
    assert(mx.musicBytes === 4L * frameLen)
    assert(mx.bitrateKbps === 128)
    assert(mx.durationMs === 4 * 1152L * 1000 / 44100)
    // Info-tagged: excluded from counts but NOT VBR (CBR encoder tag)
    val mi = Containers.parseMp3(
      Containers.buildMp3(1, 128, 44100, 2, 5, tag = "Info")).get
    assert(!mi.vbr && mi.frames === 4)
    // untagged: all frames are music, vbr false — counts unchanged
    val mu = Containers.parseMp3(
      Containers.buildMp3(1, 128, 44100, 2, 5)).get
    assert(!mu.vbr && mu.frames === 5)
    // side-info offsets differ by version/channels: MPEG-1 mono (17),
    // MPEG-2 stereo (17) and mono (9) must all find the tag
    for ((v, br, rate, ch) <- Seq((1, 64, 32000, 1), (2, 64, 24000, 2),
        (2, 48, 16000, 1))) {
      val m = Containers.parseMp3(
        Containers.buildMp3(v, br, rate, ch, 3, tag = "Xing")).get
      assert(m.vbr && m.frames === 2, s"v=$v ch=$ch")
    }
    // the tag survives behind an ID3v2 wrapper
    val mid3 = Containers.parseMp3(
      Containers.buildMp3(1, 128, 44100, 2, 4, id3Bytes = 21,
        tag = "Xing")).get
    assert(mid3.vbr && mid3.frames === 3)
    // a tag frame with NO music frame behind it has no audio: decline
    assert(Containers.parseMp3(x.take(frameLen)) === None)
    // corruption fuzz on a tagged stream stays total
    val rnd = new scala.util.Random(0x3A11F0)
    for (_ <- 0 until 500) {
      val c = x.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      assert(Containers.parseMp3(c).isInstanceOf[Option[_]])
    }
    for (cut <- 0 to x.length)
      assert(Containers.parseMp3(x.take(cut)).isInstanceOf[Option[_]])
  }

  test("MP4 tkhd v1 (64-bit times) round-trips dimensions; undersized " +
      "or unknown-version tkhd keeps the track but not dimensions") {
    // v1 content is 96 bytes (64-bit ctime/mtime/duration); the
    // width/height fields sit at the same END offsets as v0, which is
    // what the parser reads — a v1 track from a modern muxer must not
    // silently lose its dimensions (round-14 gap)
    for (ts <- Seq(600, 90000); dur <- Seq(0L, 987654L); nT <- Seq(1, 3)) {
      val tracks = Seq.tabulate(nT)(t => (320 + t, 240 + t))
      val p = Containers.buildMp4(ts, dur, tracks, mdatBytes = 8,
        tkhdVersion = 1)
      val m = Containers.parseMp4(p).get
      assert(m.nTracks === nT && m.timescale === ts)
      assert(m.durationMs === dur * 1000L / ts)
      assert(m.width === Some(320) && m.height === Some(240),
        s"v1 tkhd must yield dimensions (ts=$ts dur=$dur nT=$nT)")
    }
    val v1 = Containers.buildMp4(600, 100L, Seq((8, 8)), 4, tkhdVersion = 1)
    // a tkhd CLAIMING v1 but sized like v0 content (84 bytes) must not
    // read dimensions it cannot have — rewrite the version byte of a
    // v0 file to 1 and expect track counted, dimensions declined
    val v0 = Containers.buildMp4(600, 100L, Seq((8, 8)), 4)
    val fakeV1 = v0.clone()
    // layout: ftyp 24 + moov hdr 8 + mvhd 108 + trak hdr 8 + tkhd hdr 8
    // → tkhd 4cc at 152, version byte at 156
    assert(new String(fakeV1, 152, 4, "ISO-8859-1") === "tkhd")
    fakeV1(156) = 1
    val fm = Containers.parseMp4(fakeV1)
    assert(fm.isDefined && fm.get.nTracks === 1 &&
      fm.get.width === None && fm.get.height === None)
    // unknown future version: decline dimensions, keep totality
    val fakeV9 = v0.clone(); fakeV9(156) = 9
    val f9 = Containers.parseMp4(fakeV9)
    assert(f9.isDefined && f9.get.width === None)
    // truncation + noise fuzz sweep over the v1 layout, mirroring the
    // largesize sweep: every prefix stays total
    for (cut <- 0 to v1.length)
      assert(Containers.parseMp4(v1.take(cut)).isInstanceOf[Option[_]])
    val rnd = new scala.util.Random(0x71CD01)
    for (_ <- 0 until 500) {
      val c = v1.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      assert(Containers.parseMp4(c).isInstanceOf[Option[_]])
    }
  }
}
