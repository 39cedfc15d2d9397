package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video travel as opaque `binary` payloads with typed metadata, and the
  * compute-heavy decode/feature steps run batched per partition.
  *
  * REAL, not stubbed: container METADATA parsing for every format whose
  * header layout is public-spec byte arithmetic — [[Containers]] walks
  * WAV RIFF chunks, BMP DIB headers, MPEG Layer III frame headers
  * (MP3: version/bitrate/rate/channels/frame-walk duration), and ISO
  * BMFF boxes (MP4: brand, mvhd timescale/duration, tkhd tracks and
  * 16.16 dimensions, mdat size) — plus sample/pixel DECODE for every
  * format whose codec is pure JVM ([[Containers.pcmSamples]],
  * [[Containers.bmpPixelValues]], and [[Images]]' JPEG/PNG/GIF via
  * `javax.imageio`) — all of which [[decodeFeatures]] turns into
  * integer-exact sample statistics and [[containerMeta]] into typed
  * header facts.
  *
  * STUB MARKERS — the remaining stand-ins, each for a codec the JDK
  * genuinely doesn't ship (MP3/MP4 SAMPLE decode needs native
  * libraries; their container metadata is real, above):
  * [[FakeCodec.decodeFeatures]] (the fallback feature vector for
  * payloads whose samples nothing here can decode), [[FakeCodec.resize]],
  * and [[FakeCodec.sampleFrames]] (COMPRESSED video frames —
  * uncompressed-DIB AVI has a REAL frame decode, [[Avi]] +
  * [[sampleVideoFrameTable]]). Swapping in a real decoder (ffmpeg
  * pipe, JNI codec) changes ONLY FakeCodec — the partition-batched
  * execution plan stays identical.
  */
object Multimodal {

  /** One media row: payload + typed metadata. At 100 TB the payload
    * column dominates — keep it out of every shuffle that doesn't need
    * it (the pipelines below only shuffle ids + features). */
  case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte],
                      meta: Map[String, String])

  case class MediaFeatures(doc_id: Long, modality: String, n_bytes: Long,
                           checksum: String, features: Array[Double])

  /** Deterministic fake codec — stands in for the COMPRESSED
    * AUDIO/VIDEO decoders (MP3/MP4) the JDK doesn't ship; WAV/BMP
    * decode is real ([[Containers]]), and so is JPEG/PNG/GIF
    * ([[Images]]). */
  object FakeCodec {
    /** STUB: a real implementation decodes the payload (MP3/MP4/…)
      * and runs a feature extractor. Deterministic stand-in: normalized
      * 16-bin byte histogram. Only reached for payloads neither
      * [[Containers]] nor [[Images]] can decode — NOTE the shape
      * contract on [[Multimodal.decodeFeatures]]: this fallback emits
      * length 16, the real decode paths emit length 4. */
    def decodeFeatures(payload: Array[Byte]): Array[Double] = {
      val hist = new Array[Double](16)
      var i = 0
      while (i < payload.length) { hist((payload(i) & 0xFF) >> 4) += 1; i += 1 }
      val n = math.max(payload.length, 1).toDouble
      hist.map(_ / n)
    }

    /** STUB for NON-IMAGE payload resize (video thumbnailing etc.): a
      * real kernel rescales decoded frames; the deterministic stand-in
      * re-buckets the byte stream to `target` bytes, preserving the
      * plumbing contract (binary in → binary out). Decodable IMAGES have
      * a REAL resize — [[Images.resizeNearest]] (gated by
      * `multimodal_resize`). */
    def resize(payload: Array[Byte], target: Int): Array[Byte] = {
      if (payload.isEmpty) new Array[Byte](0)
      else Array.tabulate(target)(i => payload((i.toLong * payload.length / target).toInt))
    }

    /** STUB for video frame sampling: returns `n` evenly-spaced "frames"
      * (byte slices) of the payload. */
    def sampleFrames(payload: Array[Byte], n: Int, frameLen: Int = 16): Seq[Array[Byte]] =
      if (payload.isEmpty) Seq.empty
      else (0 until n).map { i =>
        val off = (i.toLong * payload.length / n).toInt
        payload.slice(off, math.min(off + frameLen, payload.length))
      }
  }

  /** Build a media table from the documents fixture: the text bytes stand
    * in for an encoded payload; modality/meta are typed columns. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(lit("image/"), col("source")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      map(
        lit("source"), col("source"),
        lit("lang"), col("lang"),
        lit("n_chars"), col("n_chars").cast("string")).as("meta"))

  /** Integer-exact decoded-sample statistics: (count, sum, min, max)
    * over PCM samples (WAV) or pixel-array bytes (BMP) — values exact
    * in doubles (sums bounded by payload size × 2^15), so downstream
    * casts to long round-trip and an external engine can recompute them
    * bit-identically. Empty decodes pin min/max to 0 so the vector
    * shape is constant. */
  private def unitStats(units: Array[Int]): Array[Double] =
    if (units.isEmpty) Array(0d, 0d, 0d, 0d)
    else {
      var sum = 0L; var mn = units(0); var mx = units(0); var i = 0
      while (i < units.length) {
        val v = units(i)
        sum += v; if (v < mn) mn = v; if (v > mx) mx = v
        i += 1
      }
      Array(units.length.toDouble, sum.toDouble, mn.toDouble, mx.toDouble)
    }

  /** Partition-batched decode IN PLACE: each input partition iterates in
    * fixed-size batches — the exact execution shape a vectorized/Arrow
    * decode path wants. Deliberately NO repartition: shuffling would ship
    * every payload byte across the cluster, the one cost this design
    * exists to avoid; decode-load balance comes from file-source split
    * sizing (`spark.sql.files.maxPartitionBytes`) instead. Only ids +
    * fixed-width features leave the stage; payloads never shuffle.
    *
    * Feature semantics per payload: a decodable WAV, BMP, or
    * JPEG/PNG/GIF yields REAL decoded-sample statistics ([[unitStats]]
    * over [[Containers.pcmSamples]] / [[Containers.bmpPixelValues]] /
    * [[Images.imagePixelValues]]); anything else falls back to the STUB
    * histogram ([[FakeCodec.decodeFeatures]]) — the compressed
    * audio/video stand-in.
    *
    * SHAPE CONTRACT: `features` is per-modality, NOT a fixed-dimension
    * embedding — length 4 (count, sum, min, max) on the real-decode
    * paths, length 16 on the histogram fallback. A consumer wanting a
    * uniform vector space (ANN, cosine math) must first partition by
    * decode path (e.g. on `size(features)` or the modality column);
    * feeding mixed shapes into a fixed-dim kernel is a caller error
    * this column deliberately surfaces rather than papers over with
    * zero-padding. */
  def decodeFeatures(spark: SparkSession, media: DataFrame,
                     batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    // decode where the payloads already are — a repartition here would
    // ship every payload byte through a shuffle, the one cost this
    // design exists to avoid; file-source split sizing spreads the load
    media.select(col("doc_id"), col("modality"), col("payload"), col("meta"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // ONE digest per partition, not per row — getInstance pays a
        // provider lookup, and this loop is the documented 100 TB path
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.grouped(batchSize).flatMap { batch =>
          // a real codec would decode the whole batch in one native call
          batch.iterator.map { m =>
            // null payload = empty payload: the contract everywhere in
            // this module is that malformed input degrades, never NPEs a
            // task (payload columns are nullable parquet binary)
            val p = if (m.payload == null) Array.emptyByteArray else m.payload
            val feats = Containers.pcmSamples(p)
              .orElse(Containers.bmpPixelValues(p))
              .orElse(Images.imagePixelValues(p)) match {
                case Some(units) => unitStats(units)
                case None => FakeCodec.decodeFeatures(p)
              }
            MediaFeatures(m.doc_id, m.modality, p.length.toLong,
              md5Hex(md, p), feats)
          }
        }
      }
  }

  /** REAL audio features over decoded PCM samples — the DSP-ish step a
    * speech-data pipeline runs between decode and filtering. All
    * integer-exact on purpose (energy = Σ v², bounded by n·2^30 — fits
    * a long for any physical clip; zero-crossings counted with the
    * v ≥ 0 sign convention; peak = max |v|), so an external engine can
    * recompute every value bit-identically from the source bytes. */
  case class AudioFeatures(doc_id: Long, n_samples: Long, energy: Long,
                           zero_crossings: Long, peak: Long)

  /** Per-payload PCM features for every decodable WAV in `media`;
    * non-WAV payloads are skipped (this is the audio leg — images have
    * their own decode path). Same placement rules as [[decodeFeatures]]:
    * runs where the payloads already are, only slim typed rows leave
    * the stage. */
  def audioFeatures(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p0) =>
        val p = if (p0 == null) Array.emptyByteArray else p0
        Containers.pcmSamples(p).map { s =>
          var energy = 0L
          var zc = 0L
          var peak = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i)
            energy += v.toLong * v
            val a = math.abs(v.toLong)
            if (a > peak) peak = a
            if (i > 0 && (v >= 0) != (s(i - 1) >= 0)) zc += 1
            i += 1
          }
          AudioFeatures(id, s.length.toLong, energy, zc, peak)
        }
      })
  }

  case class FrameRow(doc_id: Long, frame_idx: Int, n_bytes: Int,
                      checksum: String)

  /** Video-style frame sampling as a partition-batched pipeline: `n`
    * evenly-spaced frames per payload (codec stubbed —
    * [[FakeCodec.sampleFrames]]), emitting per-frame metadata. Frames
    * explode AFTER the heavy decode stage; payloads never shuffle. */
  def sampleFrameTable(spark: SparkSession, media: DataFrame,
                       n: Int = 4): Dataset[FrameRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("modality"), col("payload"), col("meta"))
      .as[MediaRow]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { m =>
          val p = if (m.payload == null) Array.emptyByteArray else m.payload
          FakeCodec.sampleFrames(p, n).zipWithIndex.map {
            case (frame, i) =>
              FrameRow(m.doc_id, i, frame.length, md5OfHex(md, frame))
          }
        }
      }
  }

  case class GifFrameRow(doc_id: Long, frame_idx: Int, n_frames: Int,
                         n_units: Long, unit_sum: Long, unit_min: Int,
                         unit_max: Int)

  /** REAL video-style frame sampling: every `stride`-th frame of each
    * animated-GIF payload decoded with `javax.imageio`
    * ([[Images.gifFramePixels]]) and reduced to integer-exact per-frame
    * RGB-unit statistics — the real-decode leg beside
    * [[sampleFrameTable]] (which stays the codec-agnostic byte sampler
    * for formats the JDK cannot decode, MP3/MP4 being the remaining
    * stubs). Non-GIF or corrupt payloads emit no rows (classify them
    * via [[containerMeta]]). Scale shape: frames decode INSIDE the
    * partition over the payload at rest — payloads never shuffle, and
    * only slim stat rows leave the stage. */
  def sampleGifFrameTable(spark: SparkSession, media: DataFrame,
                          stride: Int = 2): Dataset[GifFrameRow] = {
    import spark.implicits._
    require(stride >= 1, "stride must be >= 1")
    media.select(col("doc_id"), col("modality"), col("payload"), col("meta"))
      .as[MediaRow]
      .mapPartitions(_.flatMap { m =>
        val p = if (m.payload == null) Array.emptyByteArray else m.payload
        Images.gifFrameCount(p) match {
          case None => Iterator.empty
          case Some(nf) =>
            (0 until nf by stride).iterator.flatMap { f =>
              Images.gifFramePixels(p, f).map { vals =>
                var s = 0L
                var mn = 255
                var mx = 0
                var i = 0
                while (i < vals.length) {
                  val v = vals(i)
                  s += v
                  if (v < mn) mn = v
                  if (v > mx) mx = v
                  i += 1
                }
                GifFrameRow(m.doc_id, f, nf, vals.length.toLong, s,
                  if (vals.isEmpty) 0 else mn, if (vals.isEmpty) 0 else mx)
              }
            }
        }
      })
  }

  /** REAL VIDEO frame sampling: every `stride`-th frame of each
    * uncompressed-DIB AVI payload decoded by the in-repo RIFF walk
    * ([[Avi.aviAllFramePixelGrids]]) and reduced to integer-exact
    * per-frame RGB-unit statistics — the video sibling of
    * [[sampleGifFrameTable]], and the upgrade of
    * [[FakeCodec.sampleFrames]] to real pixels for the one video
    * container the JVM can decode without a codec library. Skipped
    * frames cost only chunk-offset arithmetic (never a pixel read), so
    * a sparse sample over a long clip pays for the frames it keeps.
    * Non-AVI, compressed-codec, or corrupt payloads emit no rows
    * (classify them via [[containerMeta]]). Same placement rules as
    * every decode here: frames decode INSIDE the partition over the
    * payload at rest — payloads never shuffle, only slim stat rows
    * leave the stage. */
  def sampleVideoFrameTable(spark: SparkSession, media: DataFrame,
                            stride: Int = 2, maxFrames: Int = 64)
      : Dataset[GifFrameRow] = {
    import spark.implicits._
    require(stride >= 1, "stride must be >= 1")
    require(maxFrames >= 1, "maxFrames must be >= 1")
    media.select(col("doc_id"), col("modality"), col("payload"), col("meta"))
      .as[MediaRow]
      .mapPartitions(_.flatMap { m =>
        val p = if (m.payload == null) Array.emptyByteArray else m.payload
        // ONE header parse serves both the frame count and the walk
        val (nf, grids) = Avi.aviInfoAndFrames(p, maxFrames, stride) match {
          case Some((info, g)) => (info.totalFrames, g)
          case None => (0, Seq.empty[(Int, Int, Array[Int])])
        }
        grids.iterator
          .zipWithIndex.map { case ((_, _, vals), i) =>
            var s = 0L
            var mn = 255
            var mx = 0
            var k = 0
            while (k < vals.length) {
              val v = vals(k)
              s += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              k += 1
            }
            GifFrameRow(m.doc_id, i * stride, nf, vals.length.toLong, s,
              if (vals.isEmpty) 0 else mn, if (vals.isEmpty) 0 else mx)
          }
      })
  }

  /** One media payload's parsed container facts; format ∈ {wav, bmp,
    * png, jpeg, gif, avi, mp4, mp3, unknown}, with the fields of the other
    * formats null. Compressed-image facts (png/jpeg/gif) come from
    * ImageIO's header-only parse — dimensions without a pixel decode;
    * mp3 carries channels/sample_rate/duration_ms and music bytes in
    * data_bytes, mp4 carries duration_ms/width/height and mdat bytes
    * in data_bytes. */
  case class ContainerInfo(doc_id: Long, format: String,
                           channels: Option[Int], sample_rate: Option[Int],
                           bits: Option[Int], data_bytes: Option[Long],
                           duration_ms: Option[Long], width: Option[Int],
                           height: Option[Int], bpp: Option[Int],
                           vbr: Option[Boolean] = None)

  /** REAL container-metadata extraction over a media table: each
    * payload's magic bytes route it to the matching [[Containers]]
    * parser (WAV RIFF walk, BMP DIB header, ISO BMFF box walk, MPEG
    * Layer III frame walk) or ImageIO header parse, malformed bytes
    * classify as `unknown` instead of failing the task. Same placement
    * rules as
    * [[decodeFeatures]]: runs where the payloads already are, only slim
    * typed metadata ever leaves the stage. */
  def containerMeta(spark: SparkSession, media: DataFrame): Dataset[ContainerInfo] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => classifyOne(id, p) })
  }

  /** Narrow payload → format routing: (doc_id, payload, format) in ONE
    * partition-local pass — the modality-router entry point. The
    * format-and-payload JOIN alternative (containerMeta then join back
    * on doc_id) ships every payload byte through a shuffle, the one
    * cost this module's placement rules exist to avoid; here the
    * payload never leaves its partition. */
  def withFormat(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        (id, p, classifyOne(id, p).format)
      }).toDF("doc_id", "payload", "format")
  }

  /** The ONE classification cascade behind [[containerMeta]] and
    * [[withFormat]]. */
  private def classifyOne(id: Long, p0: Array[Byte]): ContainerInfo = {
          // null payload parses as nothing — classify "unknown", the
          // same degradation path as malformed bytes
          val p = if (p0 == null) Array.emptyByteArray else p0
          Containers.parseWav(p) match {
            case Some(w) =>
              ContainerInfo(id, "wav", Some(w.channels), Some(w.sampleRate),
                Some(w.bitsPerSample), Some(w.dataBytes), Some(w.durationMs),
                None, None, None)
            case None => Containers.parseBmp(p) match {
              case Some(m) =>
                ContainerInfo(id, "bmp", None, None, None,
                  Some(m.pixelBytes), None, Some(m.width), Some(m.height),
                  Some(m.bitsPerPixel))
              case None => Avi.parseAvi(p) match {
                case Some(av) =>
                  // RIFF video: movi bytes in data_bytes, the header's
                  // own frame timing in duration_ms
                  ContainerInfo(id, "avi", None, None, None,
                    Some(av.moviBytes), Some(av.durationMs),
                    Some(av.width), Some(av.height), Some(av.bitsPerPixel))
                case None => Images.parseImage(p) match {
                  case Some(im) =>
                    ContainerInfo(id, im.format, None, None, None, None,
                      None, Some(im.width), Some(im.height), None)
                  case None => Containers.parseMp4(p) match {
                    // ISO BMFF before MPEG audio: the ftyp gate is
                    // structural, while the MP3 sync scan could in
                    // principle fire inside arbitrary binary
                    case Some(m4) =>
                      ContainerInfo(id, "mp4", None, None, None,
                        Some(m4.mdatBytes), Some(m4.durationMs),
                        m4.width, m4.height, None)
                    case None => Containers.parseMp3(p) match {
                      case Some(m3) =>
                        ContainerInfo(id, "mp3", Some(m3.channels),
                          Some(m3.sampleRate), None, Some(m3.musicBytes),
                          Some(m3.durationMs), None, None, None,
                          Some(m3.vbr))
                      case None =>
                        ContainerInfo(id, "unknown", None, None, None, None,
                          None, None, None, None)
                    }
                  }
                }
              }
            }
          }
  }

  private val HexChars = "0123456789abcdef".toCharArray

  // lookup-table hex, not a per-byte f-interpolator: the formatter form
  // instantiates a java.util.Formatter PER BYTE — measurable waste on
  // the per-row/per-frame hashing loops
  private def hexOf(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = HexChars(b >>> 4)
      out(i * 2 + 1) = HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Digest is caller-supplied (one per partition); `digest()` leaves it
    * reset for the next row. */
  private def md5Hex(md: java.security.MessageDigest,
                     bytes: Array[Byte]): String =
    hexOf(md.digest(bytes))

  /** Frame checksums hash the LOWERCASE-HEX rendering of the bytes, not
    * the raw bytes: hex is an injective byte encoding, and it keeps the
    * checksum computable by any engine whose md5 takes only strings
    * (arbitrary byte slices are not valid UTF-8, so they cannot travel
    * as strings themselves) — which is what lets the driver's DuckDB
    * oracle re-derive frame checksums from `substr(hex(payload), …)`. */
  private def md5OfHex(md: java.security.MessageDigest,
                       bytes: Array[Byte]): String =
    md5Hex(md, hexOf(bytes).getBytes("UTF-8"))
}
