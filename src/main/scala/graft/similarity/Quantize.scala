package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric linear int8 quantization for embedding columns — the 4×
  * storage/shuffle cut that makes a 100 TB embedding corpus tractable
  * (float32 → int8 + one scale per vector). Pure codegen builtins: the
  * whole transform stays inside WholeStageCodegen and Catalyst can still
  * prune/push around it.
  *
  * Scheme: `scale = max(|v|)/127`, `q_i = clamp(round(v_i/scale), ±127)`.
  * Symmetric (no zero-point) keeps dot products linear: `a·b ≈
  * scale_a·scale_b·(qa·qb)`, so ANN prefilters can run on the int8
  * vectors and only the final rerank touches floats. A zero vector (or
  * empty input) quantizes to scale 0 and all-zero codes; a null input
  * yields scale 0 with null codes (null propagates through the
  * element-wise transform, so there is no length to emit zeros over).
  */
object Quantize {

  /** (scale: double, q: array<int> ∈ [-127,127]) struct. `q` is int, not
    * tinyint, to keep the gate comparison dialect-neutral; a storage
    * writer should cast to tinyint/byte at the sink.
    *
    * ONE codegen kernel call per row (the element cast is a native
    * array cast, not a lambda). The previous five-lambda declarative
    * form interpreted its transforms AND re-derived the scale
    * subexpression per element — measured ~0.6 s per pass over 2000
    * embeddings at sf0.1; semantics are replicated bit-for-bit
    * ([[graft.ops.TextKernels.quantizeInt8]] scaladoc, QuantizeSpec
    * A/B). */
  def quantize(vec: Column): Column =
    graft.ops.TextExprs.quantizeInt8(vec.cast("array<double>"))

  /** Reconstruct doubles from a [[quantize]] struct. */
  def dequantize(qs: Column): Column = {
    val scale = qs.getField("scale")
    transform(qs.getField("q"), x => x.cast("double") * scale)
  }
}
