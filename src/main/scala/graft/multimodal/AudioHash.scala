package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit perceptual AUDIO fingerprint and the near-dup operator over
  * it — the audio leg of the rolling-crawl dedup surface, the exact
  * analogue of [[ImageHash]]'s dHash: where dHash signs horizontal
  * luma gradients over a fixed 9×8 grid, this signs ENERGY deltas
  * over a fixed 65-window grid of the clip.
  *
  * Construction, INTEGER-EXACT end to end:
  *  - decode: [[Containers.pcmSamples]] (16-bit signed / 8-bit
  *    recentered PCM; interleaved channel samples count equally);
  *  - grid: 65 windows over the whole clip by the same floor
  *    convention as the image resampler — window w spans samples
  *    `[⌊w·n/65⌋, ⌊(w+1)·n/65⌋)` — so the grid is RELATIVE to clip
  *    length (a resampled/speed-shifted copy keeps its window
  *    identity, the way any-size images share the 9×8 grid);
  *  - energy: `E_w = Σ v²` over the window, in Long (v² ≤ 2³⁰, so a
  *    window would need ~2³³ samples — ~27 hours at 44.1 kHz — to
  *    overflow);
  *  - bits: bit (63 − w) set iff `E_w > E_{w+1}`, w ∈ [0, 64) —
  *    MSB-first in window order, the [[ImageHash]] packing convention.
  *
  * Invariance mirrors dHash's brightness invariance: scaling the
  * amplitude by any constant scales every window energy by its
  * square, preserving every delta sign — so an 8-bit re-quantization,
  * a volume change, or a re-encode at different gain all land at
  * Hamming distance ~0 from the original with entirely different
  * bytes. Sensitivity to trimming is inherent to a relative grid (a
  * cropped clip shifts every window) — the same trade dHash makes for
  * scale invariance.
  *
  * Totality: null for anything [[Containers.pcmSamples]] declines
  * (corrupt/truncated/non-PCM payloads) and for clips shorter than 65
  * samples — too short to fingerprint; decline rather than emit a
  * degenerate near-constant signature that would form a corpus-wide
  * accidental equivalence class (the parseWav "decline rather than
  * guess" convention). A declined payload joins into no bucket —
  * never a task failure, never a spurious pair. */
object AudioHash {

  /** Audio fingerprint of a WAV payload; null (boxed) when
    * undecodable or shorter than 65 samples. */
  def fingerprint64(payload: Array[Byte]): java.lang.Long =
    (if (payload == null) None else Containers.pcmSamples(payload)) match {
      case Some(s) if s.length >= 65 =>
        val n = s.length
        val e = new Array[Long](65)
        var w = 0
        while (w < 65) {
          val from = (w.toLong * n / 65).toInt
          val until = ((w + 1).toLong * n / 65).toInt
          var acc = 0L
          var i = from
          while (i < until) { acc += s(i).toLong * s(i); i += 1 }
          e(w) = acc
          w += 1
        }
        var sig = 0L
        w = 0
        while (w < 64) {
          sig <<= 1
          if (e(w) > e(w + 1)) sig |= 1L
          w += 1
        }
        java.lang.Long.valueOf(sig)
      case _ => null
    }

  /** Column surface (codegen expression — one static kernel call per
    * row inside whole-stage codegen). */
  def fingerprint(payload: Column): Column =
    ColumnBridge.column(
      AudioFingerprint64Expr(ColumnBridge.expression(payload)))

  /** Integer-exact per-window energies of a decodable clip — fixed
    * `windowSamples`-sample windows (the FINAL partial window is kept:
    * dropping it would silently lose trailing speech), energy = Σ v²
    * in Long. The reusable kernel behind energy-threshold SEGMENTATION
    * (the VAD-ish silence-split step a speech-data pipeline runs
    * between decode and filtering): the declarative tail — explode,
    * threshold, gaps-and-islands over a per-document window — stays in
    * SQL/DataFrame land where Catalyst can see it. Empty array (not
    * null) for undecodable payloads, so exploding consumers simply
    * emit no rows. */
  def windowEnergies(payload: Array[Byte], windowSamples: Int): Array[Long] =
    (if (payload == null) None else Containers.pcmSamples(payload)) match {
      case Some(s) if s.length > 0 && windowSamples > 0 =>
        // overflow-safe ceil: (len + ws - 1) wraps negative for a huge
        // windowSamples literal, silently yielding zero windows where
        // the contract promises one full-clip window
        val nw = (s.length - 1) / windowSamples + 1
        val e = new Array[Long](nw)
        var w = 0
        while (w < nw) {
          var acc = 0L
          var i = w * windowSamples
          val until = math.min(i + windowSamples, s.length)
          while (i < until) { acc += s(i).toLong * s(i); i += 1 }
          e(w) = acc
          w += 1
        }
        e
      case _ => Array.emptyLongArray
    }

  /** Column surface of [[windowEnergies]]. */
  def windowEnergy(payload: Column, windowSamples: Int): Column =
    ColumnBridge.column(AudioWindowEnergiesExpr(
      ColumnBridge.expression(payload), windowSamples))

  /** Perceptual near-dup audio pairs: fingerprints banded through the
    * shared pigeonhole tables ([[graft.dedup.Dedup.hammingPairs]]),
    * exact Hamming verify — recall 1.0 at the radius over
    * fingerprintable clips, candidates ∝ true pairs. */
  def nearDupPairs(media: DataFrame, id: Column, payload: Column,
                   maxHamming: Int = 7,
                   wideTables: Option[Boolean] = None): DataFrame =
    graft.dedup.Dedup.hammingPairs(media, id, fingerprint(payload),
      maxHamming, wideTables)
}

/** Codegen expression over the audio-fingerprint kernel — the
  * [[ImageHashExpression]] shape: boxed-Long kernel, null-checked in
  * generated code, nullable even over a non-null child. */
case class AudioFingerprint64Expr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_fingerprint64"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long r = graft.multimodal.AudioHash.fingerprint64($c);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r.longValue(); }""")

  override def nullSafeEval(input: Any): Any =
    AudioHash.fingerprint64(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression) =
    copy(child = newChild)
}

/** Per-window clip energies — empty array (not null) for undecodable
  * bytes, the [[FrameDHashesExpr]] convention. */
case class AudioWindowEnergiesExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    windowSamples: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "audio_window_energies"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        graft.multimodal.AudioHash.windowEnergies($c, $windowSamples));""")

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      AudioHash.windowEnergies(input.asInstanceOf[Array[Byte]], windowSamples))

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression) =
    copy(child = newChild)
}
