package graft.core

/** Driver-side arithmetic shared by the histogram-cutoff refinement
  * loops ([[graft.text.BudgetSelect]], [[graft.text.Binning]]): both
  * solve "find the element of a huge (score, id) order at a given
  * cumulative threshold" by id-chunk histograms, and both need the same
  * two carefully-guarded pieces — the overflow-safe chunk width and the
  * boundary pick over a sorted chunk histogram. One implementation so
  * the edge cases (full-Long spans, the 2^62 clamp, the strict
  * cum > threshold pick) cannot drift between the two operators. */
private[graft] object Refine {

  /** Chunk width that splits [lo, hi] into ~`fanout` id chunks. Works
    * on the BigInt span: ids may legitimately span the full Long range,
    * where `hi - lo` overflows. The 2^62 clamp keeps the width a
    * positive Long even at the full-2^64 span with a tiny fanout
    * (ceil(2^64 / 2) overflows); clamped rounds still cut the span
    * ≥ 4×, so the round bound only rises from log_fanout to log_4 for
    * the first round or two. width < span always (fanout ≥ 2,
    * span ≥ 2), so hi - lo ≥ width forces ≥ 2 occupied chunks and every
    * round strictly shrinks the span. */
  def chunkWidth(lo: Long, hi: Long, fanout: Int): Long = {
    val span = BigInt(hi) - BigInt(lo) + 1
    ((span + fanout - 1) / fanout).max(1)
      .min(BigInt(Long.MaxValue / 2)).toLong
  }

  /** The boundary element of `elems` (already sorted in walk order):
    * the first whose cumulative weight STRICTLY exceeds `threshold`,
    * with the cumulative weight before it. None when the total never
    * exceeds the threshold (the caller's keep-all case). */
  def boundary[T](elems: Seq[T], weight: T => Long,
                  threshold: Long): Option[(T, Long)] = {
    var acc = 0L
    var found = Option.empty[(T, Long)]
    elems.foreach { e =>
      if (found.isEmpty && acc + weight(e) > threshold) found = Some((e, acc))
      acc += weight(e)
    }
    found
  }
}
