package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{col, explode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit perceptual image hashes (dHash / aHash) and the near-dup
  * pair operator over them — the image leg of the dedup surface.
  *
  * Both hashes are INTEGER-EXACT end to end, so the same image bytes
  * always produce the same signature on any executor:
  *   - grayscale: ITU-R BT.601 integer luma `(299·r + 587·g + 114·b)
  *     / 1000` (floor) over [[Images.imagePixelValues]]' decoded RGB;
  *   - resample: nearest-neighbor on the floor grid `src = x·sw / dw`
  *     — the SAME sampling convention as [[Images.resizeNearest]], so
  *     a hash of a `resizeNearest` output degrades predictably;
  *   - dHash (64 bits): 9×8 grid, bit (y,x) set iff `g(x,y) >
  *     g(x+1,y)` — the horizontal-gradient sign, invariant to global
  *     brightness/contrast shifts (monotone per-pixel transforms);
  *   - aHash (64 bits): 8×8 grid, bit set iff the cell exceeds the
  *     floor-mean of all 64 cells.
  * Bits pack MSB-first in row-major scan order (bit 63 = top-left),
  * pinned by golden vectors in ImagesSpec.
  *
  * Totality: a payload [[Images.imagePixelValues]] cannot decode
  * (truncated, corrupt, foreign bytes) hashes to NULL — a corrupt
  * image in a 100 TB media crawl becomes a null-signature row that
  * simply joins into no candidate bucket, never a task failure.
  *
  * Near-dup candidates reuse the text side's pigeonhole machinery
  * ([[graft.dedup.Dedup.hammingPairs]]): signatures within Hamming
  * distance d share a clean bucket key in at least one table, so
  * recall at the radius is exactly 1.0 and the verify step only
  * removes false candidates — same 100 TB scaling argument as SimHash
  * (banded candidates ∝ true pairs, never all-pairs). */
object ImageHash {

  /** Nearest-neighbor grayscale grid over a decoded RGB units array —
    * `dw`×`dh` integer lumas, row-major. */
  private[multimodal] def grayGrid(px: Array[Int], w: Int, h: Int,
                                   dw: Int, dh: Int): Array[Int] = {
    val out = new Array[Int](dw * dh)
    var y = 0
    while (y < dh) {
      val sy = (y.toLong * h / dh).toInt
      var x = 0
      while (x < dw) {
        val sx = (x.toLong * w / dw).toInt
        val k = 3 * (sy * w + sx)
        out(y * dw + x) = (299 * px(k) + 587 * px(k + 1) + 114 * px(k + 2)) / 1000
        x += 1
      }
      y += 1
    }
    out
  }

  /** dHash of an image payload; null (boxed) when undecodable. */
  def dhash64(payload: Array[Byte]): java.lang.Long =
    Images.imagePixelGrid(payload) match {
      case None => null
      case Some((w, h, px)) =>
        val g = grayGrid(px, w, h, 9, 8)
        var sig = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            sig <<= 1
            if (g(y * 9 + x) > g(y * 9 + x + 1)) sig |= 1L
            x += 1
          }
          y += 1
        }
        java.lang.Long.valueOf(sig)
    }

  /** aHash of an image payload; null (boxed) when undecodable. */
  def ahash64(payload: Array[Byte]): java.lang.Long =
    Images.imagePixelGrid(payload) match {
      case None => null
      case Some((w, h, px)) =>
        val g = grayGrid(px, w, h, 8, 8)
        var sum = 0L
        var i = 0
        while (i < 64) { sum += g(i); i += 1 }
        val mean = sum / 64 // floor — integer-exact threshold
        var sig = 0L
        i = 0
        while (i < 64) {
          sig <<= 1
          if (g(i) > mean) sig |= 1L
          i += 1
        }
        java.lang.Long.valueOf(sig)
    }

  /** The 32-point DCT-II basis behind [[phash64]]: `basis(u*32+x)` =
    * `c(u)·cos((2x+1)uπ/64)` with the orthonormal scaling. StrictMath,
    * so every executor on every platform computes bit-identical
    * coefficients (Math.cos may use platform intrinsics). */
  private lazy val dctBasis: Array[Double] = {
    val b = new Array[Double](32 * 32)
    var u = 0
    while (u < 32) {
      val c = if (u == 0) StrictMath.sqrt(1.0 / 32)
        else StrictMath.sqrt(2.0 / 32)
      var x = 0
      while (x < 32) {
        b(u * 32 + x) = c * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 64.0)
        x += 1
      }
      u += 1
    }
    b
  }

    /** pHash of an image payload — the DCT perceptual hash: 32×32
    * grayscale grid, 2-D DCT-II (separable, StrictMath basis, fixed
    * evaluation order — deterministic across executors), the top-left
    * 8×8 low-frequency block INCLUDING the DC row and column (a purely
    * horizontal/vertical pattern carries all its energy there —
    * excluding them, as some constructions do, blinds the hash to
    * stripes), bit set iff the coefficient exceeds the median of the
    * 63 non-DC block coefficients. Null (boxed) when undecodable — and
    * for (near-)constant images, whose non-DC block is pure
    * accumulation noise (decline rather than mint a degenerate
    * noise-sign signature).
    *
    * Complements dHash: dHash signs LOCAL gradients (robust to global
    * tone shifts, sensitive to blur); pHash thresholds GLOBAL spectral
    * shape (robust to blur/resize/gamma, sensitive to crops). The
    * median split is invariant under any positive LINEAR rescale of
    * the gray values — and for a power-of-two rescale of an
    * equal-channel (gray) image the invariance is FLOATING-POINT
    * EXACT, not just approximate: integer luma of r=g=b=v is v itself
    * (299+587+114 = 1000), doubling every input doubles every partial
    * sum exactly (×2 commutes with rounding), and `2a > 2b ⟺ a > b` —
    * the oracle-restatable plant the gate rides.
    *
    * Bits pack MSB-first over the block scan (v-major): bit 63 = the
    * DC coefficient (v=0, u=0), which a non-degenerate 8-bit image
    * always sets. */
  def phash64(payload: Array[Byte]): java.lang.Long =
    Images.imagePixelGrid(payload) match {
      case None => null
      case Some((w, h, px)) => phashOfGrid(w, h, px)
    }

  /** pHash of each frame of a multi-frame payload, up to `maxFrames` —
    * the spectral ANIMATION/VIDEO signature family ([[frameDHashes]]'
    * construction over [[phash64]]'s kernel). Degenerate
    * (near-constant) frames decline individually and contribute no
    * signature; empty for corrupt or unsupported payloads. */
  def framePHashes(payload: Array[Byte], maxFrames: Int): Array[Long] =
    allFramePixelGrids(payload, maxFrames).flatMap {
      case (w, h, px) => Option(phashOfGrid(w, h, px)).map(_.longValue)
    }.toArray

  /** The one multi-frame decode dispatch behind the per-frame hash
    * kernels: GIF animations via the `javax.imageio` reader,
    * uncompressed-DIB AVI video via the in-repo RIFF walk — both emit
    * the same `(w, h, rgbUnits)` grid shape, so every consumer
    * (near-dup pairing, the SigSeen rolling fold, the SQL surface)
    * covers video for free. Anything else decodes to no frames. */
  private def allFramePixelGrids(payload: Array[Byte],
                                 maxFrames: Int): Seq[(Int, Int, Array[Int])] =
    if (Avi.isAvi(payload)) Avi.aviAllFramePixelGrids(payload, maxFrames)
    else Images.gifAllFramePixelGrids(payload, maxFrames)

  private def phashOfGrid(w: Int, h: Int,
                          px: Array[Int]): java.lang.Long = {
        val g = grayGrid(px, w, h, 32, 32)
        // rows pass: t(y,u) = Σ_x g(y,x)·basis(u,x)
        val t = new Array[Double](32 * 32)
        var y = 0
        while (y < 32) {
          var u = 0
          while (u < 32) {
            var acc = 0.0
            var x = 0
            while (x < 32) { acc += g(y * 32 + x) * dctBasis(u * 32 + x); x += 1 }
            t(y * 32 + u) = acc
            u += 1
          }
          y += 1
        }
        // cols pass over the needed block only: s(v,u) = Σ_y t(y,u)·basis(v,y)
        val block = new Array[Double](64)
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            var acc = 0.0
            var yy = 0
            while (yy < 32) { acc += t(yy * 32 + u) * dctBasis(v * 32 + yy); yy += 1 }
            block(v * 8 + u) = acc
            u += 1
          }
          v += 1
        }
        val sorted = new Array[Double](63) // the non-DC coefficients
        System.arraycopy(block, 1, sorted, 0, 63)
        java.util.Arrays.sort(sorted)
        // a (near-)constant image has no spectral structure: its
        // non-DC block is floating-point noise around zero and every
        // bit would be a noise sign. Decline rather than emit a
        // degenerate signature (the AudioHash <65-sample convention) —
        // real structure puts the block spread orders of magnitude
        // above the ~1e-11 accumulation noise of a uniform 8-bit image.
        if (sorted(62) - sorted(0) < 1e-6) return null
        val med = sorted(31) // the median of 63 — deterministic split
        var sig = 0L
        var i = 0
        while (i < 64) {
          sig <<= 1
          if (block(i) > med) sig |= 1L
          i += 1
        }
        java.lang.Long.valueOf(sig)
    }

  /** dHash of each frame in its row-major grid, up to `maxFrames` —
    * the ANIMATION/VIDEO signature family (one 64-bit hash per frame,
    * one reader pass per payload; GIF or uncompressed-DIB AVI via
    * [[allFramePixelGrids]]). Empty for corrupt/unsupported payloads. */
  def frameDHashes(payload: Array[Byte], maxFrames: Int): Array[Long] =
    allFramePixelGrids(payload, maxFrames).map {
      case (w, h, px) =>
        val g = grayGrid(px, w, h, 9, 8)
        var sig = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            sig <<= 1
            if (g(y * 9 + x) > g(y * 9 + x + 1)) sig |= 1L
            x += 1
          }
          y += 1
        }
        sig
    }.toArray

  /** Column surface (codegen expressions — one static kernel call per
    * row inside whole-stage codegen, the TextExprs discipline). */
  def dHash(payload: Column): Column =
    ColumnBridge.column(DHash64Expr(ColumnBridge.expression(payload)))
  def aHash(payload: Column): Column =
    ColumnBridge.column(AHash64Expr(ColumnBridge.expression(payload)))
  def pHash(payload: Column): Column =
    ColumnBridge.column(PHash64Expr(ColumnBridge.expression(payload)))
  def frameDHash(payload: Column, maxFrames: Int = 8): Column =
    ColumnBridge.column(
      FrameDHashesExpr(ColumnBridge.expression(payload), maxFrames))
  def framePHash(payload: Column, maxFrames: Int = 8): Column =
    ColumnBridge.column(
      FramePHashesExpr(ColumnBridge.expression(payload), maxFrames))

  /** Perceptual near-dup image pairs: dHash signatures banded through
    * the shared pigeonhole tables, exact Hamming verify. Undecodable
    * payloads (null signature) surface in no pair. Exhaustive at the
    * radius — recall 1.0 over decodable images. */
  def nearDupPairs(media: DataFrame, id: Column, payload: Column,
                   maxHamming: Int = 7,
                   wideTables: Option[Boolean] = None): DataFrame =
    graft.dedup.Dedup.hammingPairs(media, id, dHash(payload),
      maxHamming, wideTables)

  /** ANIMATION near-dup pairs: two animations pair when ANY frame of
    * one is within `maxHamming` of any frame of the other (re-encoded,
    * trimmed, or frame-rate-shifted copies share frames even when
    * alignment drifts); the reported hamming is the best frame match.
    * Rides [[graft.dedup.Dedup.hammingPairs]] over the exploded
    * per-frame signature stream — the min-per-pair tail makes the
    * multi-signature-per-id input well-defined. Frame volume is capped
    * per payload (`maxFrames`), so the exploded stream is at most
    * `maxFrames`× the row count. */
  def animationNearDupPairs(media: DataFrame, id: Column, payload: Column,
                            maxHamming: Int = 7, maxFrames: Int = 8,
                            wideTables: Option[Boolean] = None): DataFrame = {
    val frames = media
      .select(id.as("__id"), explode(frameDHash(payload, maxFrames)).as("__sig"))
    graft.dedup.Dedup.hammingPairs(frames, col("__id"), col("__sig"),
      maxHamming, wideTables)
  }

  /** Scene-CUT signal over a multi-frame payload (GIF animation or
    * uncompressed-DIB AVI video): the Hamming distance between each
    * consecutive frame-dHash pair, as an array of (frame_idx, hamming)
    * structs — a cut is a distance above the caller's threshold
    * (within-scene motion moves a few gradient signs; a cut rewrites
    * the frame). Purely declarative over [[frameDHash]]:
    * `zip_with(h[0..n-2], h[1..n-1], bit_count(xor))` — stays inside
    * whole-stage codegen, one decode pass per payload, no new kernel.
    * Empty array for payloads with fewer than two decodable frames. */
  def frameCutSignal(payload: Column, maxFrames: Int = 32): Column = {
    import org.apache.spark.sql.functions._
    val h = frameDHash(payload, maxFrames)
    val n = size(h)
    val pairsHamming = zip_with(
      slice(h, lit(1), greatest(n - 1, lit(0))),
      slice(h, lit(2), greatest(n - 1, lit(0))),
      (a, b) => call_function("bit_count", a.bitwiseXOR(b)))
    val zipped = zip_with(pairsHamming,
      sequence(lit(1), greatest(n - 1, lit(1))),
      (d, i) => struct(i.as("frame_idx"), d.as("hamming")))
    // under two frames there is no consecutive pair: zip_with pads the
    // empty hamming side with one null — drop it instead of emitting a
    // phantom boundary
    filter(zipped, s => s.getField("hamming").isNotNull)
  }

  /** [[animationNearDupPairs]] over the SPECTRAL frame family
    * ([[framePHashes]]) — robust where frame re-renders shift tone or
    * blur rather than move gradients; same any-frame-match,
    * best-hamming semantics. */
  def animationNearDupPairsSpectral(media: DataFrame, id: Column,
      payload: Column, maxHamming: Int = 7, maxFrames: Int = 8,
      wideTables: Option[Boolean] = None): DataFrame = {
    val frames = media
      .select(id.as("__id"), explode(framePHash(payload, maxFrames)).as("__sig"))
    graft.dedup.Dedup.hammingPairs(frames, col("__id"), col("__sig"),
      maxHamming, wideTables)
  }
}

/** Unary codegen expressions over the image-hash kernels. The kernel
  * returns a BOXED Long (null = undecodable payload), so the generated
  * code null-checks the kernel result — the expression is nullable
  * even over a non-null child. */
abstract class ImageHashExpression extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  protected def kernelName: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long r = graft.multimodal.ImageHash.$kernelName($c);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r.longValue(); }""")
}

case class DHash64Expr(child: Expression) extends ImageHashExpression {
  override def prettyName: String = "image_dhash64"
  override protected def kernelName: String = "dhash64"
  override def nullSafeEval(in: Any): Any =
    ImageHash.dhash64(in.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Per-frame dHashes of an animated payload — empty array (not null)
  * for undecodable bytes, so the exploding consumer simply emits no
  * signature rows. */
case class FrameDHashesExpr(child: Expression, maxFrames: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gif_frame_dhashes"
  override def nullSafeEval(in: Any): Any =
    new GenericArrayData(
      ImageHash.frameDHashes(in.asInstanceOf[Array[Byte]], maxFrames))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        graft.multimodal.ImageHash.frameDHashes($c, $maxFrames));""")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class AHash64Expr(child: Expression) extends ImageHashExpression {
  override def prettyName: String = "image_ahash64"
  override protected def kernelName: String = "ahash64"
  override def nullSafeEval(in: Any): Any =
    ImageHash.ahash64(in.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Per-frame pHashes of an animated payload — empty array (not null)
  * for undecodable bytes; degenerate frames contribute no entry. */
case class FramePHashesExpr(child: Expression, maxFrames: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gif_frame_phashes"
  override def nullSafeEval(in: Any): Any =
    new GenericArrayData(
      ImageHash.framePHashes(in.asInstanceOf[Array[Byte]], maxFrames))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        graft.multimodal.ImageHash.framePHashes($c, $maxFrames));""")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class PHash64Expr(child: Expression) extends ImageHashExpression {
  override def prettyName: String = "image_phash64"
  override protected def kernelName: String = "phash64"
  override def nullSafeEval(in: Any): Any =
    ImageHash.phash64(in.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
