package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL pure-JVM AVI (RIFF) video container codec — the VIDEO leg of
  * the multimodal surface, upgrading frame decode from the
  * [[Multimodal.FakeCodec.sampleFrames]] byte-slicer to actual pixel
  * decode for the one video format whose frames need no codec library:
  * uncompressed DIB ("full frames (uncompressed)" in the public
  * AVI/VfW spec — fccHandler 'DIB ', biCompression = BI_RGB). Each
  * frame is then a BMP-style pixel array (bottom-up BGR rows padded to
  * 4 bytes), which [[aviAllFramePixelGrids]] decodes with the
  * [[Containers.bmpPixelValues]] row discipline into the same
  * `(w, h, rgbUnits)` shape the GIF frame reader emits — so the whole
  * perceptual machinery ([[ImageHash.frameDHashes]], the SigSeen
  * rolling fold, animation near-dup pairing) rides video payloads
  * unchanged.
  *
  * Compressed video (MJPEG/H.264/…) stays a loud STUB elsewhere
  * ([[Multimodal.FakeCodec]]): the JDK ships no such codec, and this
  * module's contract is REAL bytes or None — never a guessed decode.
  *
  * Every parser is total: malformed, truncated, hostile-header, or
  * foreign payloads return None/empty — a corrupt clip in a 100 TB
  * media crawl must become a classifiable row, never a task failure.
  * All size arithmetic stays in Long until after the bounds check (the
  * [[Containers.bmpPixelValues]] overflow discipline: a crafted width
  * near Int.MaxValue must not wrap a stride into a small positive
  * number and slip the guard).
  *
  * The builder ([[encodeAviGray]]) exists so fixtures and gates can
  * synthesize REAL spec-conforming AVI bytes deterministically from
  * table columns — the [[Images.encodeAnimatedGifGray]] role for
  * video. It is also a legitimate encoder: the emitted tree is a
  * conforming RIFF('AVI ') { LIST hdrl { avih, LIST strl { strh,
  * strf } }, LIST movi { 00db… } } any AVI reader accepts.
  */
object Avi {

  /** Parsed header facts of an AVI: main-header dimensions and frame
    * count, the first video stream's codec facts, and the movi chunk
    * span (the frame-walk entry point). `compression` is the strf
    * biCompression (0 = BI_RGB = decodable here); `handler` is the
    * strh fccHandler string. */
  final case class AviInfo(width: Int, height: Int, totalFrames: Int,
                           usecPerFrame: Int, streams: Int,
                           handler: String, bitsPerPixel: Int,
                           compression: Int, moviBytes: Long,
                           strfWidth: Int = 0, strfHeight: Int = 0) {
    def durationMs: Long = usecPerFrame.toLong * totalFrames / 1000L
  }

  private def le(payload: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)

  // RIFF four-char codes as little-endian ints
  private val RIFF = 0x46464952
  private val AVI_ = 0x20495641
  private val LIST = 0x5453494c
  private val HDRL = 0x6c726468
  private val AVIH = 0x68697661
  private val STRL = 0x6c727473
  private val STRH = 0x68727473
  private val STRF = 0x66727473
  private val MOVI = 0x69766f6d
  private val VIDS = 0x73646976
  /** biCompression fourcc 'MJPG' — each movi '##dc' chunk is one plain
    * JFIF payload (the de-facto MJPEG-in-AVI wire format). */
  private val MJPG = 0x47504A4D

  private def fourcc(v: Int): String =
    new String(Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** Structural sniff — RIFF magic + 'AVI ' form type. Cheap enough
    * for the per-row dispatch in [[ImageHash]]. */
  def isAvi(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 && {
      val b = le(p)
      b.getInt(0) == RIFF && b.getInt(8) == AVI_
    }

  /** RIFF walk: top-level LIST chunks, looking for hdrl (avih + the
    * first 'vids' strl) and movi. None for anything that is not a
    * structurally valid single-video AVI with a complete header. */
  def parseAvi(payload: Array[Byte]): Option[AviInfo] =
    aviWithMovi(payload).map(_._1)

  /** The walk behind [[parseAvi]], also yielding the movi chunk's
    * payload offset — the frame decoder needs it, the metadata
    * surface doesn't. */
  private def aviWithMovi(
      payload: Array[Byte]): Option[(AviInfo, Long)] = {
    if (!isAvi(payload)) return None
    val b = le(payload)
    val riffEnd = {
      val sz = b.getInt(4).toLong & 0xFFFFFFFFL
      math.min(8L + sz, payload.length.toLong)
    }
    var off = 12L
    var mainHdr: Option[(Int, Int, Int, Int, Int)] = None
    var vids: Option[(String, Int, Int, Int, Int)] = None
    // (handler, bpp, compression, strf biWidth, strf biHeight)
    var movi: Option[(Long, Long)] = None // (payload offset, bytes)
    while (off + 8 <= riffEnd) {
      val i = off.toInt
      val id = b.getInt(i)
      val size = b.getInt(i + 4).toLong & 0xFFFFFFFFL
      if (off + 8 + size > riffEnd) return None
      if (id == LIST && size >= 4) {
        val listType = b.getInt(i + 8)
        // first-wins, like movi below and fmt/data/fact in parseWav: a
        // duplicate hdrl LIST must not clobber an already-parsed header
        if (listType == HDRL && mainHdr.isEmpty) {
          val r = parseHdrl(payload, off + 12, off + 8 + size)
          mainHdr = r._1
          vids = r._2
        } else if (listType == MOVI && movi.isEmpty) {
          movi = Some((off + 12, size - 4))
        }
      }
      off += 8L + size + (size & 1) // RIFF chunks pad to even offsets
    }
    for {
      (w, h, nf, usec, ns) <- mainHdr
      (handler, bpp, comp, sw, sh) <- vids
      (mOff, mBytes) <- movi
    } yield (AviInfo(w, h, nf, usec, ns, handler, bpp, comp, mBytes,
      sw, sh), mOff)
  }

  /** hdrl LIST body: the avih main header plus the FIRST 'vids'
    * stream's strh/strf pair (audio or extra streams are tolerated and
    * skipped — a real capture AVI interleaves them). */
  private def parseHdrl(payload: Array[Byte], start: Long, end: Long)
      : (Option[(Int, Int, Int, Int, Int)],
         Option[(String, Int, Int, Int, Int)]) = {
    val b = le(payload)
    var off = start
    var mainHdr: Option[(Int, Int, Int, Int, Int)] = None
    var vids: Option[(String, Int, Int, Int, Int)] = None
    while (off + 8 <= end) {
      val i = off.toInt
      val id = b.getInt(i)
      val size = b.getInt(i + 4).toLong & 0xFFFFFFFFL
      if (off + 8 + size > end) return (None, None)
      if (id == AVIH && size >= 40) {
        // MainAVIHeader: usec/frame @0, totalFrames @16, streams @24,
        // width @32, height @36
        val usec = b.getInt(i + 8)
        val nf = b.getInt(i + 24)
        val ns = b.getInt(i + 32)
        val w = b.getInt(i + 40)
        val h = b.getInt(i + 44)
        if (usec < 0 || nf < 0 || ns < 0) return (None, None)
        mainHdr = Some((w, h, nf, usec, ns))
      } else if (id == LIST && size >= 4 && b.getInt(i + 8) == STRL &&
          vids.isEmpty) {
        vids = parseStrl(payload, off + 12, off + 8 + size)
      }
      off += 8L + size + (size & 1)
    }
    (mainHdr, vids)
  }

  /** strl LIST body: strh (stream kind + handler) and strf
    * (BITMAPINFOHEADER for video, including its OWN dimensions — the
    * frame decoder cross-checks them against the main header, and the
    * biHeight SIGN carries the DIB row order). None when this stream
    * is not 'vids' — the caller keeps scanning. */
  private def parseStrl(payload: Array[Byte], start: Long, end: Long)
      : Option[(String, Int, Int, Int, Int)] = {
    val b = le(payload)
    var off = start
    var isVids = false
    var handler = ""
    var fmt: Option[(Int, Int, Int, Int)] = None
    // (bpp, compression, biWidth, biHeight)
    while (off + 8 <= end) {
      val i = off.toInt
      val id = b.getInt(i)
      val size = b.getInt(i + 4).toLong & 0xFFFFFFFFL
      if (off + 8 + size > end) return None
      if (id == STRH && size >= 8) {
        isVids = b.getInt(i + 8) == VIDS
        handler = fourcc(b.getInt(i + 12))
      } else if (id == STRF && size >= 40 && isVids && fmt.isEmpty) {
        // BITMAPINFOHEADER: biWidth @4, biHeight @8 (signed — negative
        // means top-down rows), biBitCount @14, biCompression @16
        fmt = Some((b.getShort(i + 8 + 14) & 0xFFFF, b.getInt(i + 8 + 16),
          b.getInt(i + 8 + 4), b.getInt(i + 8 + 8)))
      }
      off += 8L + size + (size & 1)
    }
    if (isVids) fmt.map { case (bpp, comp, sw, sh) =>
      (handler, bpp, comp, sw, sh)
    } else None
  }

  /** REAL frame pixel decode: every `step`-th uncompressed-DIB video
    * frame chunk ('##db') of the movi LIST, up to `maxFrames` decoded
    * frames, as the GIF frame reader's `(width, height, rgbUnits)`
    * shape — RGB unit triplets in visual top-down row-major order (the
    * stored rows are bottom-up BGR with 4-byte stride padding; both
    * are undone here, the [[Containers.bmpPixelValues]] discipline).
    * Skipped frames cost only chunk-header offset arithmetic, never a
    * pixel read — the frame-SAMPLING path a video pipeline runs over
    * long clips pays for the frames it keeps, not the clip length.
    * Decodable frames require the header to declare 24-bit BI_RGB and
    * each chunk to carry exactly the declared pixel array — short,
    * oversized, or non-DIB chunks end the walk (decline rather than
    * guess, the totality boundary matching what a strict reader
    * accepts). Empty for non-AVI/corrupt payloads or compressed
    * codecs. Emitted tuples are (frameIdx, width, height, rgbUnits)
    * collapsed to the grid triple — frame indices are implicit
    * (i·step) by the sequential walk. */
  def aviAllFramePixelGrids(payload: Array[Byte], maxFrames: Int,
                            step: Int = 1): Seq[(Int, Int, Array[Int])] =
    aviInfoAndFrames(payload, maxFrames, step) match {
      case Some((_, frames)) => frames
      case None => Seq.empty
    }

  /** The walk behind [[aviAllFramePixelGrids]], also yielding the
    * parsed header facts — consumers that need BOTH (frame sampling
    * with the header's own frame count) pay one header parse, not
    * two. None when the payload is not a decodable uncompressed-DIB
    * AVI at all; Some(info, Seq.empty) when the header parses but no
    * frame decodes. */
  def aviInfoAndFrames(payload: Array[Byte], maxFrames: Int,
      step: Int = 1): Option[(AviInfo, Seq[(Int, Int, Array[Int])])] = {
    if (maxFrames <= 0 || step <= 0) return None
    aviWithMovi(payload) match {
      case None => None
      case Some((info, mOff)) =>
        val w = info.width
        // the strf BITMAPINFOHEADER carries its own dimensions: the
        // SIGN of biHeight is the DIB row order (negative = top-down),
        // and a width/extent disagreement with the main header means
        // one of them lies — decline rather than guess which
        // (the bmpPixelValues discipline)
        val topDown = info.strfHeight < 0
        val h = info.height
        if (w <= 0 || h <= 0 || info.strfWidth != w ||
            math.abs(info.strfHeight.toLong) != h.toLong)
          return Some((info, Seq.empty))
        // MJPEG route: compressed frames are plain JFIF payloads in
        // '##dc' chunks — decode through the same javax.imageio JPEG
        // reader the still-image path trusts ([[Images]]), with the
        // header's dimensions cross-checked against every decoded
        // frame (a frame disagreeing with its own container lies —
        // decline rather than guess, the DIB discipline)
        if (info.compression == MJPG)
          return Some((info,
            mjpegFrames(payload, mOff, info.moviBytes, w, h,
              maxFrames, step)))
        if (info.compression != 0 || info.bitsPerPixel != 24)
          return Some((info, Seq.empty))
        val stride = (3L * w + 3) / 4 * 4
        val frameBytes = stride * h
        if (frameBytes > Int.MaxValue || 3L * w * h > Int.MaxValue)
          return Some((info, Seq.empty))
        val b = le(payload)
        val out = Seq.newBuilder[(Int, Int, Array[Int])]
        var off = mOff
        val end = mOff + info.moviBytes
        var taken = 0
        var walked = 0
        var ok = true
        while (ok && taken < maxFrames && off + 8 <= end &&
            off + 8 <= payload.length) {
          val i = off.toInt
          val id = b.getInt(i)
          val size = b.getInt(i + 4).toLong & 0xFFFFFFFFL
          if (off + 8 + size > end || off + 8 + size > payload.length) {
            ok = false
          } else {
            // video frame chunks are '##db' (uncompressed DIB bits);
            // '##dc'/'##wb'/rec LISTs and anything else end the walk
            // for strictness parity with the metadata contract
            val tag = id >>> 16
            if (tag == 0x6264 /* 'db' */) {
              if (size != frameBytes) ok = false
              else {
                if (walked % step == 0) { // sampled: decode the pixels
                  val px = new Array[Int](3 * w * h)
                  var vr = 0
                  while (vr < h) {
                    // stored bottom-up unless strf flags top-down
                    val sr = if (topDown) vr else h - 1 - vr
                    val base = (off + 8 + sr.toLong * stride).toInt
                    var x = 0
                    while (x < w) {
                      val k = base + 3 * x
                      val o = 3 * (vr * w + x)
                      px(o) = payload(k + 2) & 0xFF     // R (stored BGR)
                      px(o + 1) = payload(k + 1) & 0xFF // G
                      px(o + 2) = payload(k) & 0xFF     // B
                      x += 1
                    }
                    vr += 1
                  }
                  out += ((w, h, px))
                  taken += 1
                }
                walked += 1
              }
            } else ok = false
            off += 8L + size + (size & 1)
          }
        }
        Some((info, out.result()))
    }
  }

  /** The movi walk behind the MJPEG route: every `step`-th '##dc'
    * chunk's JFIF payload decoded to the (width, height, rgbUnits)
    * grid shape. Skipped frames cost only offset arithmetic — the
    * JPEG decode (the expensive part) runs only for sampled frames.
    * A sampled chunk that is not a decodable JPEG, or whose decoded
    * dimensions disagree with the header, ends the walk with the
    * frames taken so far (truncation totality, as the DIB walk). */
  private def mjpegFrames(payload: Array[Byte], mOff: Long,
                          moviBytes: Long, w: Int, h: Int,
                          maxFrames: Int, step: Int)
      : Seq[(Int, Int, Array[Int])] = {
    val b = le(payload)
    val out = Seq.newBuilder[(Int, Int, Array[Int])]
    var off = mOff
    val end = mOff + moviBytes
    var taken = 0
    var walked = 0
    var ok = true
    while (ok && taken < maxFrames && off + 8 <= end &&
        off + 8 <= payload.length) {
      val i = off.toInt
      val id = b.getInt(i)
      val size = b.getInt(i + 4).toLong & 0xFFFFFFFFL
      if (off + 8 + size > end || off + 8 + size > payload.length) {
        ok = false
      } else {
        // compressed video frame chunks are '##dc'; anything else ends
        // the walk (strictness parity with the DIB route)
        if ((id >>> 16) == 0x6364 /* 'dc' */) {
          if (walked % step == 0) {
            val jpeg = java.util.Arrays.copyOfRange(payload,
              (off + 8).toInt, (off + 8 + size).toInt)
            Images.imagePixelGrid(jpeg) match {
              case Some((gw, gh, px)) if gw == w && gh == h =>
                out += ((gw, gh, px))
                taken += 1
              case _ => ok = false
            }
          }
          walked += 1
        } else ok = false
        off += 8L + size + (size & 1)
      }
    }
    out.result()
  }

  /** Build an uncompressed-DIB AVI from a per-frame grayscale fill —
    * `fill(frame, pixelIndex)` in [0, 255], pixelIndex row-major
    * top-down — the [[Images.encodeAnimatedGifGray]] role for video.
    * Gray pixels are written r=g=b, so integer luma recovers the fill
    * value exactly ((299+587+114)/1000 of v is v) — which is what lets
    * a SQL oracle recompute frame statistics and the dHash-walk
    * constructions realize an exact per-frame signature. 25 fps
    * (40000 µs/frame). */
  def encodeAviGray(width: Int, height: Int, nFrames: Int,
                    fill: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0,
      s"encodeAviGray: bad shape ${width}x$height x$nFrames")
    // strh's rcFrame states the dims in SIGNED 16-bit fields while
    // avih/strf carry 32 bits — a wider frame would putShort-wrap
    // rcFrame into a header that contradicts the other two
    require(width <= 0x7FFF && height <= 0x7FFF,
      s"encodeAviGray: ${width}x$height exceeds rcFrame's 16-bit fields")
    val stride = (3 * width + 3) / 4 * 4
    val frameBytes = stride * height
    require(frameBytes.toLong * nFrames < Int.MaxValue / 2,
      s"encodeAviGray: fixture too large (${width}x$height x$nFrames)")
    val strfSize = 40
    val strhSize = 56
    val avihSize = 56
    val strlSize = 4 + 8 + strhSize + 8 + strfSize
    val hdrlSize = 4 + 8 + avihSize + 8 + strlSize
    val moviSize = 4 + nFrames * (8 + frameBytes)
    val riffSize = 4 + 8 + hdrlSize + 8 + moviSize
    val out = ByteBuffer.allocate(8 + riffSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(RIFF).putInt(riffSize).putInt(AVI_)
    // LIST hdrl
    out.putInt(LIST).putInt(hdrlSize).putInt(HDRL)
    // avih: MainAVIHeader
    out.putInt(AVIH).putInt(avihSize)
    out.putInt(40000)               // dwMicroSecPerFrame (25 fps)
      .putInt(frameBytes * 25)      // dwMaxBytesPerSec
      .putInt(0)                    // dwPaddingGranularity
      .putInt(0)                    // dwFlags: no idx1 chunk is emitted,
                                    // so AVIF_HASINDEX (0x10) must NOT
                                    // be claimed — a strict reader
                                    // honoring the flag would reject
                                    // the file
      .putInt(nFrames)              // dwTotalFrames
      .putInt(0)                    // dwInitialFrames
      .putInt(1)                    // dwStreams
      .putInt(frameBytes)           // dwSuggestedBufferSize
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    // LIST strl
    out.putInt(LIST).putInt(strlSize).putInt(STRL)
    // strh: AVIStreamHeader
    out.putInt(STRH).putInt(strhSize)
    out.putInt(VIDS)                // fccType 'vids'
      .putInt(0x20424944)           // fccHandler 'DIB '
      .putInt(0)                    // dwFlags
      .putShort(0).putShort(0)      // wPriority, wLanguage
      .putInt(0)                    // dwInitialFrames
      .putInt(1).putInt(25)         // dwScale / dwRate = 25 fps
      .putInt(0)                    // dwStart
      .putInt(nFrames)              // dwLength
      .putInt(frameBytes)           // dwSuggestedBufferSize
      .putInt(-1)                   // dwQuality (default)
      .putInt(0)                    // dwSampleSize (0 = one sample per frame)
      .putShort(0).putShort(0)      // rcFrame
      .putShort(width.toShort).putShort(height.toShort)
    // strf: BITMAPINFOHEADER
    out.putInt(STRF).putInt(strfSize)
    out.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24)     // biPlanes, biBitCount
      .putInt(0)                    // biCompression = BI_RGB
      .putInt(frameBytes)           // biSizeImage
      .putInt(0).putInt(0).putInt(0).putInt(0)
    // LIST movi
    out.putInt(LIST).putInt(moviSize).putInt(MOVI)
    var f = 0
    while (f < nFrames) {
      out.putInt(0x62643030) // '00db'
      out.putInt(frameBytes)
      var sr = height - 1 // write stored rows bottom-up
      while (sr >= 0) {
        val rowStart = out.position()
        var x = 0
        while (x < width) {
          val v = fill(f, sr * width + x) & 0xFF
          out.put(v.toByte).put(v.toByte).put(v.toByte) // B G R (equal)
          x += 1
        }
        // stride padding
        while (out.position() < rowStart + stride) out.put(0.toByte)
        sr -= 1
      }
      f += 1
    }
    out.array()
  }

  /** [[encodeAviGray]]'s MJPEG twin: the SAME grayscale fill, each
    * frame JPEG-encoded ([[Images.encodeJpegGrayPixels]]) into a
    * '00dc' chunk, handler/biCompression 'MJPG'. A legitimate (lossy)
    * encoder — the cross-codec dedup gates plant a clip through both
    * builders and assert the perceptual signatures land within the
    * Hamming radius, the [[Containers.buildWavImaAdpcm]] discipline
    * applied to video. 25 fps, header layout otherwise identical to
    * the DIB builder. */
  def encodeAviMjpegGray(width: Int, height: Int, nFrames: Int,
                         fill: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0,
      s"encodeAviMjpegGray: bad shape ${width}x$height x$nFrames")
    require(width <= 0x7FFF && height <= 0x7FFF,
      s"encodeAviMjpegGray: ${width}x$height exceeds rcFrame's " +
        "16-bit fields")
    val frames = (0 until nFrames).map { f =>
      Images.encodeJpegGrayPixels(width, height, k => fill(f, k))
    }
    val maxFrame = frames.map(_.length).max
    val strfSize = 40
    val strhSize = 56
    val avihSize = 56
    val strlSize = 4 + 8 + strhSize + 8 + strfSize
    val hdrlSize = 4 + 8 + avihSize + 8 + strlSize
    val moviSize = 4 + frames.map(p => 8 + p.length + (p.length & 1)).sum
    val riffSize = 4 + 8 + hdrlSize + 8 + moviSize
    require(riffSize.toLong + 8 < Int.MaxValue / 2,
      s"encodeAviMjpegGray: fixture too large")
    val out = ByteBuffer.allocate(8 + riffSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(RIFF).putInt(riffSize).putInt(AVI_)
    out.putInt(LIST).putInt(hdrlSize).putInt(HDRL)
    out.putInt(AVIH).putInt(avihSize)
    out.putInt(40000)               // dwMicroSecPerFrame (25 fps)
      .putInt(maxFrame * 25)        // dwMaxBytesPerSec
      .putInt(0)                    // dwPaddingGranularity
      .putInt(0)                    // dwFlags (no idx1 → no HASINDEX)
      .putInt(nFrames)              // dwTotalFrames
      .putInt(0)                    // dwInitialFrames
      .putInt(1)                    // dwStreams
      .putInt(maxFrame)             // dwSuggestedBufferSize
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    out.putInt(LIST).putInt(strlSize).putInt(STRL)
    out.putInt(STRH).putInt(strhSize)
    out.putInt(VIDS)
      .putInt(MJPG)                 // fccHandler 'MJPG'
      .putInt(0)
      .putShort(0).putShort(0)
      .putInt(0)
      .putInt(1).putInt(25)
      .putInt(0)
      .putInt(nFrames)
      .putInt(maxFrame)
      .putInt(-1)
      .putInt(0)
      .putShort(0).putShort(0)
      .putShort(width.toShort).putShort(height.toShort)
    out.putInt(STRF).putInt(strfSize)
    out.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24)
      .putInt(MJPG)                 // biCompression 'MJPG'
      .putInt(maxFrame)             // biSizeImage (largest frame)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    out.putInt(LIST).putInt(moviSize).putInt(MOVI)
    frames.foreach { p =>
      out.putInt(0x63643030) // '00dc'
      out.putInt(p.length)
      out.put(p)
      if ((p.length & 1) == 1) out.put(0.toByte) // RIFF even padding
    }
    out.array()
  }
}
