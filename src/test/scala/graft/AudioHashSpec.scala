package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{AudioHash, Containers}

/** Audio perceptual fingerprint: golden vectors over exact window
  * energies, amplitude/bit-depth invariance, totality, and the
  * near-dup pair integration. */
class AudioHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def wav16(samples: Seq[Int], rate: Int = 8000,
                    channels: Int = 1): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      data(2 * i) = (v & 0xFF).toByte
      data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    Containers.buildWav(channels, rate, 16, data)
  }

  private def wav8(samples: Seq[Int]): Array[Byte] =
    Containers.buildWav(1, 8000, 8,
      samples.map(v => (v + 128).toByte).toArray)

  private def fp(p: Array[Byte]): Option[Long] =
    Option(AudioHash.fingerprint64(p)).map(_.longValue)

  test("golden vectors: 65 one-sample windows realize exact bit patterns") {
    // alternating |10|,|20| energies: E_w > E_{w+1} exactly at odd w →
    // bits 0101…01 MSB-first = 0x5555555555555555
    val alt = Seq.tabulate(65)(i => if (i % 2 == 0) 10 else 20)
    assert(fp(wav16(alt)) === Some(0x5555555555555555L))
    // strictly increasing |v| → every delta negative → all bits clear
    assert(fp(wav16(Seq.tabulate(65)(i => i + 1))) === Some(0L))
    // strictly decreasing |v| → all bits set
    assert(fp(wav16(Seq.tabulate(65)(i => 100 - i))) === Some(-1L))
    // equal energies tie to 0 (strict >): constant signal → all clear,
    // and SIGN of the sample is irrelevant (energy = v²)
    assert(fp(wav16(Seq.tabulate(65)(i => if (i % 2 == 0) 7 else -7))) ===
      Some(0L))
    // one bit: single descent at window 0 → only bit 63
    val oneBit = Seq(9) ++ Seq.fill(64)(3)
    assert(fp(wav16(oneBit)) === Some(1L << 63))
  }

  test("floor-grid windows: multi-sample clips follow ⌊w·n/65⌋ bounds") {
    // n = 130 → every window exactly 2 samples; pairs (a, a) give
    // E_w = 2a²: alternating pairs of 10s and 20s → 0x5555…
    val alt2 = Seq.tabulate(130)(i => if ((i / 2) % 2 == 0) 10 else 20)
    assert(fp(wav16(alt2)) === Some(0x5555555555555555L))
    // n = 131: window w spans [⌊131w/65⌋, ⌊131(w+1)/65⌋) — recompute
    // expected signature directly from the definition
    val s131 = Seq.tabulate(131)(i => ((i * 37) % 113) - 56)
    val e = Array.tabulate(65) { w =>
      val from = w * 131 / 65
      val until = (w + 1) * 131 / 65
      (from until until).map(i => s131(i).toLong * s131(i)).sum
    }
    val want = (0 until 64).foldLeft(0L)((s, w) =>
      (s << 1) | (if (e(w) > e(w + 1)) 1L else 0L))
    assert(fp(wav16(s131)) === Some(want))
  }

  test("invariance: amplitude scale and bit-depth requantization " +
      "preserve the signature with different bytes") {
    val base = Seq.tabulate(200)(i => ((i * 13) % 101) - 50)
    val sig = fp(wav16(base)).get
    assert(fp(wav16(base.map(_ * 3))) === Some(sig), "3× volume")
    assert(fp(wav16(base.map(_ * -2))) === Some(sig), "inverted 2×")
    assert(fp(wav8(base)) === Some(sig), "8-bit requantization")
    assert(!java.util.Arrays.equals(wav16(base), wav16(base.map(_ * 3))))
    // stereo interleave of the same mono signal doubles every window
    // energy → same signature, PROVIDED window boundaries don't split
    // interleaved pairs (length divisible by 65 keeps the grids
    // aligned; arbitrary lengths drift by at most the boundary sample)
    val aligned = Seq.tabulate(195)(i => ((i * 13) % 101) - 50)
    assert(fp(wav16(aligned.flatMap(v => Seq(v, v)), channels = 2)) ===
      fp(wav16(aligned)), "mono→stereo duplication")
  }

  test("totality: corrupt, non-PCM, and too-short clips decline to null") {
    assert(fp(null) === None)
    assert(fp(Array.emptyByteArray) === None)
    assert(fp("RIFFgarbage".getBytes("UTF-8")) === None)
    assert(fp(wav16(Seq.tabulate(64)(identity))) === None, "64 samples")
    assert(fp(wav16(Seq.tabulate(65)(identity))).isDefined, "65 samples")
    val rnd = new scala.util.Random(0xAC0057)
    for (_ <- 0 until 500) {
      val noise = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(noise)
      AudioHash.fingerprint64(noise) // never throws
    }
    // truncation at every prefix of a valid clip
    val good = wav16(Seq.tabulate(100)(i => i % 40))
    for (cut <- 0 to good.length)
      AudioHash.fingerprint64(good.take(cut))
  }

  test("nearDupPairs: planted scaled copy pairs at hamming 0; far " +
      "clips don't pair; SQL surface registered") {
    val base = Seq.tabulate(200)(i => ((i * 13) % 101) - 50)
    val rows = Seq(
      (1L, wav16(base)),
      (2L, wav16(base.map(_ * 2))),             // scaled → hamming 0
      (3L, wav16(Seq.tabulate(200)(i => ((i * 29 + 7) % 97) - 48))), // unrelated
      (4L, "not audio".getBytes("UTF-8")))      // null sig → no pair
    val pairs = AudioHash.nearDupPairs(
        rows.toDF("doc_id", "payload"), col("doc_id"), col("payload"),
        maxHamming = 2, wideTables = Some(false))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((1L, 2L, 0)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    graft.ops.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      s"SELECT audio_fingerprint64(payload) AS s FROM " +
        "(SELECT cast(null AS binary) AS payload)").head()
    assert(viaSql.isNullAt(0))
  }

  test("cross-codec: a G.711 re-encode of a PCM clip lands within the " +
      "dedup radius of its original") {
    // a deterministic multi-tone waveform long enough for real window
    // energies (10 samples/window), amplitudes spanning the compander's
    // segments so quantization error is exercised at every scale
    val base = Seq.tabulate(650) { i =>
      (math.sin(i * 0.13) * 11000 + math.sin(i * 0.047) * 5200 +
        math.sin(i * 0.71) * 800).toInt
    }
    val pcm = wav16(base)
    val ulawBytes = base.map(v =>
      Containers.linearToUlaw(v).toByte).toArray
    val alawBytes = base.map(v =>
      Containers.linearToAlaw(v).toByte).toArray
    val ulaw = Containers.buildWav(1, 8000, 8, ulawBytes,
      Containers.FormatUlaw)
    val alaw = Containers.buildWav(1, 8000, 8, alawBytes,
      Containers.FormatAlaw)
    val (f0, fu, fa) = (fp(pcm).get, fp(ulaw).get, fp(alaw).get)
    assert(java.lang.Long.bitCount(f0 ^ fu) <= 7,
      s"ulaw hamming ${java.lang.Long.bitCount(f0 ^ fu)}")
    assert(java.lang.Long.bitCount(f0 ^ fa) <= 7,
      s"alaw hamming ${java.lang.Long.bitCount(f0 ^ fa)}")
    // and the pair operator finds the cross-codec pairs while keeping
    // unrelated audio apart
    val far = wav16(Seq.tabulate(650)(i => if (i % 13 < 3) 20000 else -15))
    val pairs = AudioHash.nearDupPairs(
        Seq((1L, pcm), (2L, ulaw), (3L, alaw), (4L, far))
          .toDF("doc_id", "payload"),
        col("doc_id"), col("payload"), maxHamming = 7,
        wideTables = Some(false))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("windowEnergies: fixed windows, kept partial tail, empty on undecodable") {
    // 10 samples, windows of 4 → [4, 4, 2]: the partial tail window is
    // KEPT (dropping it would silently lose trailing speech)
    val s = Array(1, 2, 3, -4, 5, 6, -7, 8, 9, 10)
    val wav = Containers.buildWav(1, 8000, 16, {
      val d = new Array[Byte](2 * s.length)
      for (i <- s.indices) {
        d(2 * i) = (s(i) & 0xFF).toByte
        d(2 * i + 1) = ((s(i) >> 8) & 0xFF).toByte
      }
      d
    })
    assert(AudioHash.windowEnergies(wav, 4).toSeq ===
      Seq(1L + 4 + 9 + 16, 25L + 36 + 49 + 64, 81L + 100))
    assert(AudioHash.windowEnergies(wav, 100).toSeq ===
      Seq(s.map(v => v.toLong * v).sum))
    // a huge window literal must yield ONE full-clip window, not
    // overflow the ceil into zero windows
    assert(AudioHash.windowEnergies(wav, Int.MaxValue).toSeq ===
      Seq(s.map(v => v.toLong * v).sum))
    assert(AudioHash.windowEnergies(wav, 0).isEmpty)
    assert(AudioHash.windowEnergies(null, 4).isEmpty)
    assert(AudioHash.windowEnergies("junk".getBytes("UTF-8"), 4).isEmpty)
    // the Column surface computes the same values through codegen
    val got = Seq((1L, wav)).toDF("doc_id", "payload")
      .select(AudioHash.windowEnergy(col("payload"), 4))
      .collect()(0).getSeq[Long](0)
    assert(got === Seq(30L, 174L, 181L))
    // and the SQL surface — window size as a required literal
    graft.ops.GraftFunctions.register(spark)
    Seq((1L, wav)).toDF("doc_id", "payload").createOrReplaceTempView("awe")
    val viaSql = spark.sql(
      "SELECT audio_window_energies(payload, 4) AS e FROM awe")
      .head().getSeq[Long](0)
    assert(viaSql === Seq(30L, 174L, 181L))
    // a zero/negative window is a SQL typo, not "no decodable audio" —
    // it must fail loudly at plan time, never return empty arrays
    for (w <- Seq(0, -4)) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT audio_window_energies(payload, $w) AS e FROM awe")
          .head()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("must be positive")),
        s"window=$w: $e")
    }
  }
}
