package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** REAL compressed-image codecs via `javax.imageio` — the JPEG/PNG/GIF
  * readers that ship in every standard JDK (pure JVM, no native install,
  * headless-safe). This closes the compressed-IMAGE leg of the
  * multimodal stub surface: [[Multimodal.decodeFeatures]] now computes
  * sample statistics from ACTUAL decoded pixels for JPEG/PNG/GIF
  * payloads, and [[Multimodal.containerMeta]] classifies them with
  * header-only dimension parsing. Only compressed AUDIO/VIDEO codecs
  * (MP3/MP4 — genuinely absent from the JDK) remain stubbed, in
  * [[Multimodal.FakeCodec]].
  *
  * Totality contract (the [[Containers]] discipline): any malformed,
  * truncated, or foreign payload returns None — a corrupt file in a
  * 100 TB media crawl must become a classifiable row, never a task
  * failure. A cheap magic-byte gate rejects non-image payloads before
  * ImageIO is ever consulted, which both bounds the cost of the common
  * miss path and keeps [[Containers]]' byte-exact BMP/WAV parsers
  * canonical for their formats (ImageIO also ships a BMP reader; it is
  * deliberately not reachable here).
  *
  * The builders ([[encodePng]], [[encodeJpegGray]]) exist so fixtures
  * and gates can synthesize REAL compressed payloads deterministically
  * from table columns; PNG is lossless, so a decode of [[encodePng]]
  * output returns the fill function's exact values — which is what lets
  * a SQL oracle recompute decoded-pixel statistics it could never get
  * from decoding the payload itself.
  */
object Images {

  // In-memory image streams, never temp files: executor-side decode
  // must not do disk IO per payload. Scoped PER CALL by constructing
  // MemoryCache image streams directly instead of flipping the
  // process-global ImageIO.setUseCache flag — a library must not
  // silently change ImageIO behavior for every other user of the JVM.
  private def memIn(payload: Array[Byte]) =
    new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(payload))

  /** Decode via an explicit in-memory stream (never ImageIO's
    * global-cache-configured path); null when no reader claims it. */
  private def readImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
    val iis = memIn(payload)
    try ImageIO.read(iis) // closes iis per ImageIO.read(ImageInputStream) contract
    catch { case e: Throwable => iis.close(); throw e }
  }

  /** Encode to bytes via an explicit in-memory output stream. */
  private def writeImage(img: java.awt.image.RenderedImage,
                         fmt: String): Option[Array[Byte]] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      val ok = ImageIO.write(img, fmt, ios)
      ios.flush()
      if (ok) Some(bos.toByteArray) else None
    } finally ios.close()
  }

  /** Header-only facts of a compressed image payload. `format` is the
    * lowercase ImageIO reader name: png, jpeg, gif. */
  final case class ImageInfo(format: String, width: Int, height: Int)

  private def isPng(p: Array[Byte]): Boolean =
    p.length >= 8 && (p(0) & 0xFF) == 0x89 && p(1) == 'P' && p(2) == 'N' &&
      p(3) == 'G' && (p(4) & 0xFF) == 0x0D && (p(5) & 0xFF) == 0x0A &&
      (p(6) & 0xFF) == 0x1A && (p(7) & 0xFF) == 0x0A

  private def isJpeg(p: Array[Byte]): Boolean =
    p.length >= 3 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8 &&
      (p(2) & 0xFF) == 0xFF

  private def isGif(p: Array[Byte]): Boolean =
    p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
      p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a'

  /** The magic gate: only payloads whose leading bytes claim an
    * ImageIO-decodable format are worth a reader lookup. */
  private[multimodal] def looksLikeImage(p: Array[Byte]): Boolean =
    isPng(p) || isJpeg(p) || isGif(p)

  /** Header-only parse: format + dimensions WITHOUT decoding the pixel
    * array (reader.getWidth/getHeight read only the header), the right
    * cost for a metadata-extraction pass over payloads whose pixels
    * nothing downstream wants. None for non-image or corrupt-header
    * bytes. */
  def parseImage(payload: Array[Byte]): Option[ImageInfo] = {
    if (payload == null || !looksLikeImage(payload)) return None
    try {
      val iis = memIn(payload)
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0) None
          else Some(ImageInfo(reader.getFormatName.toLowerCase, w, h))
        } finally reader.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL pixel decode: the image's RGB channel values as unsigned ints
    * in [0, 255], row-major top-down, 3 values (r, g, b) per pixel —
    * the same units-array shape as [[Containers.bmpPixelValues]], so
    * [[Multimodal.decodeFeatures]]' integer-exact statistics apply
    * unchanged. Grayscale images decode with r = g = b; alpha is
    * dropped (content statistics, not compositing). None for anything
    * ImageIO cannot fully decode — truncated streams, corrupt chunk
    * CRCs, foreign bytes behind an image magic. */
  def imagePixelValues(payload: Array[Byte]): Option[Array[Int]] = {
    if (payload == null || !looksLikeImage(payload)) return None
    try {
      val img = readImage(payload)
      if (img == null) return None
      rgbValues(img)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** [[imagePixelValues]] plus the decoded dimensions — the shape the
    * perceptual-hash resampler needs ([[ImageHash]]). Same totality:
    * None for anything ImageIO cannot fully decode. */
  def imagePixelGrid(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (payload == null || !looksLikeImage(payload)) return None
    try {
      val img = readImage(payload)
      if (img == null) return None
      rgbValues(img).map(px => (img.getWidth, img.getHeight, px))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The shared RGB extraction behind [[imagePixelValues]] and
    * [[gifFramePixels]]. */
  private def rgbValues(img: java.awt.image.BufferedImage): Option[Array[Int]] = {
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0 || 3L * w * h > Int.MaxValue) return None
    val out = new Array[Int](3 * w * h)
    var y = 0
    while (y < h) {
      // one getRGB row call per row, not per pixel: the batched form
      // converts through the color model once per scanline
      val row = img.getRGB(0, y, w, 1, null, 0, w)
      var x = 0
      while (x < w) {
        val rgb = row(x)
        val k = 3 * (y * w + x)
        out(k) = (rgb >>> 16) & 0xFF
        out(k + 1) = (rgb >>> 8) & 0xFF
        out(k + 2) = rgb & 0xFF
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  // ── animated GIF (multi-frame) ─────────────────────────────────────

  /** Frame count of a GIF payload — 1 for stills, N for animations.
    * None for non-GIF or corrupt bytes (the totality contract). */
  def gifFrameCount(payload: Array[Byte]): Option[Int] = {
    if (payload == null || !isGif(payload)) return None
    try {
      val iis = memIn(payload)
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val r = readers.next()
        try {
          // seekForwardOnly=false: getNumImages(allowSearch=true) must
          // walk the whole stream
          r.setInput(iis, false, true)
          val n = r.getNumImages(true)
          if (n > 0) Some(n) else None
        } finally r.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL per-frame pixel decode of a (possibly animated) GIF: frame
    * `idx`'s RGB values in the [[imagePixelValues]] shape. The frame
    * raster is returned AS STORED — full frames for payloads this
    * library's [[encodeAnimatedGifGray]] builds; a real-world
    * delta-optimized GIF returns that frame's own (possibly partial)
    * raster, which is the content-statistics contract, not a player's
    * composited screen. None for non-GIF, corrupt bytes, or an
    * out-of-range index. */
  def gifFramePixels(payload: Array[Byte], idx: Int): Option[Array[Int]] = {
    if (payload == null || !isGif(payload) || idx < 0) return None
    try {
      val iis = memIn(payload)
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val r = readers.next()
        try {
          r.setInput(iis, false, true)
          if (idx >= r.getNumImages(true)) return None
          rgbValues(r.read(idx))
        } finally r.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** [[gifFramePixels]] plus the frame's dimensions — the shape the
    * animation perceptual-hash resampler needs. Same totality. */
  def gifFramePixelGrid(payload: Array[Byte],
                        idx: Int): Option[(Int, Int, Array[Int])] = {
    if (payload == null || !isGif(payload) || idx < 0) return None
    try {
      val iis = memIn(payload)
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val r = readers.next()
        try {
          r.setInput(iis, false, true)
          if (idx >= r.getNumImages(true)) return None
          val img = r.read(idx)
          rgbValues(img).map(px => (img.getWidth, img.getHeight, px))
        } finally r.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Frame count + all frames' pixel grids in ONE reader pass (the
    * per-frame [[gifFramePixelGrid]] re-opens the stream per frame —
    * fine for one probe, quadratic for hashing every frame).
    *
    * Longest-valid-prefix totality (the WARC convention): a GIF whose
    * frame k is truncated still serves frames 0..k-1 — the per-frame
    * catch breaks on the first failing read but KEEPS the frames
    * already decoded, so a trimmed animation still gets a signature
    * from its good prefix instead of silently escaping near-dup
    * detection. */
  def gifAllFramePixelGrids(payload: Array[Byte],
                            maxFrames: Int): Seq[(Int, Int, Array[Int])] = {
    if (payload == null || !isGif(payload) || maxFrames <= 0) return Seq.empty
    val out = Seq.newBuilder[(Int, Int, Array[Int])]
    try {
      val iis = memIn(payload)
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return Seq.empty
        val r = readers.next()
        try {
          r.setInput(iis, false, true)
          val n = math.min(r.getNumImages(true), maxFrames)
          var i = 0
          var ok = true
          while (i < n && ok) {
            try {
              val img = r.read(i)
              rgbValues(img).foreach(px =>
                out += ((img.getWidth, img.getHeight, px)))
            } catch {
              case scala.util.control.NonFatal(_) => ok = false
            }
            i += 1
          }
        } finally r.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => () }
    out.result()
  }

  /** Build an animated GIF from a per-frame grayscale fill —
    * `fill(frame, pixelIndex)` in [0, 255] — the multi-frame fixture
    * builder behind the REAL frame-sampling gate. The bytes come from
    * an IN-REPO deterministic GIF89a encoder (real LZW, spec-standard
    * variable-width codes), NOT the JDK's GIF writer: the writer's
    * derived palette and interlacing quirks vary across JVM versions,
    * which made fixture bytes — and therefore oracle comparisons —
    * environment-dependent. Here the global color table IS the sorted
    * distinct fill values (≤ 256 across all frames, loud-fail), so any
    * compliant decoder (the read path stays `javax.imageio`) returns
    * the fill values EXACTLY — which is what lets a SQL oracle
    * recompute every sampled frame's statistics from the formula
    * (round-trip AND golden bytes pinned in ImagesSpec). */
  def encodeAnimatedGifGray(width: Int, height: Int, nFrames: Int,
                            fill: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0,
      "dimensions and frame count must be positive")
    require(width <= 0xFFFF && height <= 0xFFFF, "GIF dimensions are u16")
    val frames = Array.tabulate(nFrames)(f =>
      Array.tabulate(width * height)(k => fill(f, k) & 0xFF))
    val palette = frames.flatMap(_.toSeq).distinct.sorted
    require(palette.length <= 256,
      "more than 256 distinct gray values — a GIF color table holds 256")
    val index = palette.zipWithIndex.toMap
    // GCT size field encodes 2^(field+1) entries; LZW min code size must
    // cover the table and be >= 2 per spec
    var gctBits = 1
    while ((1 << gctBits) < palette.length) gctBits += 1
    val minCode = math.max(2, gctBits)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v); u8(v >>> 8) }
    out.write(Array[Byte]('G', 'I', 'F', '8', '9', 'a'))
    u16(width); u16(height)
    u8(0x80 | (7 << 4) | (gctBits - 1)) // GCT present, 8-bit resolution
    u8(0) // background color index
    u8(0) // square pixels
    var i = 0
    while (i < (1 << gctBits)) {
      val v = if (i < palette.length) palette(i) else 0
      u8(v); u8(v); u8(v)
      i += 1
    }
    var f = 0
    while (f < nFrames) {
      // graphic control: disposal "do not dispose", 0.1 s delay, opaque
      u8(0x21); u8(0xF9); u8(4); u8(0x04); u16(10); u8(0); u8(0)
      // image descriptor: full logical screen, global table, no interlace
      u8(0x2C); u16(0); u16(0); u16(width); u16(height); u8(0)
      u8(minCode)
      val data = lzwEncode(frames(f).map(index), minCode)
      var off = 0
      while (off < data.length) {
        val n = math.min(255, data.length - off)
        u8(n); out.write(data, off, n)
        off += n
      }
      u8(0) // block terminator
      f += 1
    }
    u8(0x3B) // trailer
    out.toByteArray
  }

  /** Spec-standard GIF LZW: variable-width codes starting at
    * minCode + 1 bits, CLEAR emitted first and again whenever the
    * table fills (4096), width bumped exactly when the next free slot
    * reaches the width's capacity — the mirror of every compliant
    * decoder's growth rule, so the stream is unambiguous regardless of
    * decoder implementation. Bits pack LSB-first per the spec. */
  private def lzwEncode(indices: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val bytes = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var codeSize = minCode + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeSize
      while (bitCnt >= 8) {
        bytes.write((bitBuf & 0xFF).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    val dict = new scala.collection.mutable.HashMap[Long, Int]
    var next = eoi + 1
    emit(clear)
    if (indices.nonEmpty) {
      var cur = indices(0)
      var i = 1
      while (i < indices.length) {
        val c = indices(i)
        val key = cur.toLong << 8 | c
        dict.get(key) match {
          case Some(code) => cur = code
          case None =>
            emit(cur)
            if (next == 4096) {
              emit(clear)
              dict.clear()
              next = eoi + 1
              codeSize = minCode + 1
            } else {
              dict(key) = next
              next += 1
              // +1, not the naive 1<<codeSize: the decoder adds NO
              // entry for the first post-clear code, so its table lags
              // the encoder's by one — it processes the code emitted
              // here at the OLD width and bumps one code later
              if (next == (1 << codeSize) + 1 && codeSize < 12)
                codeSize += 1
            }
            cur = c
        }
        i += 1
      }
      emit(cur)
    }
    emit(eoi)
    if (bitCnt > 0) bytes.write((bitBuf & 0xFF).toInt)
    bytes.toByteArray
  }

  /** Canonical RGB PNG whose channel value at flat index
    * k = 3*(y*width + x) + c is `fill(k)` (masked to [0, 255]). PNG is
    * lossless: [[imagePixelValues]] of this payload returns exactly
    * `fill(0 until 3*w*h)` — the determinism the image-decode oracle
    * rides. */
  def encodePng(width: Int, height: Int, fill: Int => Int): Array[Byte] =
    encode("png", width, height, fill)

  /** Uniform-gray JPEG (every channel of every pixel = `gray`). JPEG is
    * lossy in general, but a uniform image is pure DC energy with zero
    * chroma, so the decode is uniform and lands within quantization
    * rounding of `gray` — the bounded invariant the oracle pins (the
    * fixtures use even gray values, where the default quantization
    * tables round-trip exactly). */
  def encodeJpegGray(width: Int, height: Int, gray: Int): Array[Byte] = {
    val g = gray & 0xFF
    encode("jpg", width, height, _ => g)
  }

  /** Per-PIXEL gray JPEG (r=g=b = `fill(pixelIdx)`, row-major
    * top-down) at an explicit compression quality — the frame encoder
    * behind the MJPEG-in-AVI fixture ([[Avi.encodeAviMjpegGray]]).
    * Lossy like any JPEG: a fixture riding it must assert within a
    * perceptual radius (the cross-codec discipline), never byte
    * equality. The default 0.95 keeps quantization noise well inside
    * a ±14-step gradient's sign margin (measured: the class-walk
    * frame dHashes come back IDENTICAL to the DIB original at 0.95
    * across 240 random-signature frames, vs Hamming up to 13 at the
    * ImageIO default ~0.75 — smooth gradients survive, it is the
    * quantization floor that moves). */
  def encodeJpegGrayPixels(width: Int, height: Int, fill: Int => Int,
                           quality: Float = 0.95f): Array[Byte] = {
    require(width > 0 && height > 0, "image dimensions must be positive")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = fill(y * width + x) & 0xFF
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** REAL image resize: decode, NEAREST-NEIGHBOR sample to the target
    * dimensions, re-encode as (lossless) PNG. Nearest-neighbor on
    * purpose: output pixel (x, y) is exactly input pixel
    * (floor(x*sw/dw), floor(y*sh/dh)) — integer-deterministic, so an
    * external engine can recompute every output byte from the source
    * (the multimodal_resize oracle), where any interpolating kernel
    * would be at the mercy of float rounding. A production bilinear/
    * Lanczos kernel slots in behind the same signature. None for
    * anything [[imagePixelValues]] cannot decode. */
  def resizeNearest(payload: Array[Byte], dw: Int, dh: Int): Option[Array[Byte]] = {
    require(dw > 0 && dh > 0, "target dimensions must be positive")
    if (payload == null || !looksLikeImage(payload)) return None
    try {
      val img = readImage(payload)
      if (img == null) return None
      val sw = img.getWidth
      val sh = img.getHeight
      if (sw <= 0 || sh <= 0) return None
      val out = new java.awt.image.BufferedImage(
        dw, dh, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < dh) {
        val sy = (y.toLong * sh / dh).toInt
        val srcRow = img.getRGB(0, sy, sw, 1, null, 0, sw)
        var x = 0
        while (x < dw) {
          out.setRGB(x, y, srcRow((x.toLong * sw / dw).toInt) & 0xFFFFFF)
          x += 1
        }
        y += 1
      }
      writeImage(out, "png")
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def encode(fmt: String, width: Int, height: Int,
                     fill: Int => Int): Array[Byte] = {
    require(width > 0 && height > 0, "image dimensions must be positive")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val k = 3 * (y * width + x)
        img.setRGB(x, y, ((fill(k) & 0xFF) << 16) |
          ((fill(k + 1) & 0xFF) << 8) | (fill(k + 2) & 0xFF))
        x += 1
      }
      y += 1
    }
    writeImage(img, fmt)
      .getOrElse(throw new IllegalArgumentException(s"no ImageIO writer for $fmt"))
  }
}
