package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators Spark lacks as built-ins, composed scalably:
  *
  *  - as-of join: for each left row, the latest right row with
  *    rightTs <= leftTs on the same key. Implemented as union + keyed
  *    window (one shuffle on the key, forward-fill of the right payload)
  *    — never the naive range join whose candidate space explodes.
  *  - sessionization: gap-based session ids per key via lag + running
  *    sum of gap-breaks — the standard two-window formulation.
  *
  * HOT-KEY CAVEAT (asofJoin, sessionize): both are ORDER-DEPENDENT
  * windows partitioned by the key, and a window partition is
  * indivisible — every row of a key lands in ONE task, and AQE's skew
  * handling (which splits shuffle-JOIN partitions only) cannot help. A
  * key owning 20% of a 100 TB corpus serializes 20% of the work in one
  * task; correctness is unaffected (TemporalSkewSpec pins that), but
  * the stage's wall-clock becomes the hot key's. Mitigation is NOT the
  * generic [[SkewOps]] salt (order-dependent logic breaks under
  * arbitrary row splits) but chunking the hot key BY TIME:
  * [[sessionizeChunked]] implements it for sessionization — local
  * sessions per (key, time-chunk), then a slim boundary-merge pass —
  * and [[asofJoinChunked]] for the as-of fill — per-chunk windows
  * seeded by a carry of the latest earlier right row. Both are
  * output-identical to their keyed forms at any chunk width.
  * [[rangeJoin]] already has this built in — its (key, bucket)
  * exchange spreads a hot key across its time range.
  */
object TemporalOps {

  /** Epoch-microseconds projection of an event-time column, tolerant of
    * fixture vintage: a `LongType` column is epoch NANOS (the legacy
    * `nanosAsLong` parquet read) → integral `div 1000`; a
    * TIMESTAMP / TIMESTAMP_NTZ column (the current `timestamp[us]`
    * fixture) → `unix_micros`, exact in a UTC session because the cast
    * from NTZ preserves wall time. Branching on the ACTUAL dtype means a
    * fixture regeneration in either direction cannot silently break the
    * temporal operators again. */
  def epochMicros(df: DataFrame, name: String = "ts"): Column =
    df.schema(name).dataType match {
      case org.apache.spark.sql.types.LongType => expr(s"`$name` div 1000")
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(name).cast("timestamp"))
      // DATE → midnight in the (UTC) session: lossless, never null
      case org.apache.spark.sql.types.DateType =>
        unix_micros(col(name).cast("timestamp"))
      // any other dtype (e.g. a StringType from a malformed fixture
      // regeneration) must fail ANALYSIS, not cast-to-null silently
      case other => throw new IllegalArgumentException(
        s"event-time column `$name` has unsupported dtype $other — " +
          "expected LONG (epoch nanos), TIMESTAMP, TIMESTAMP_NTZ, or DATE")
    }

  /** TIMESTAMP projection of the same column, for event-time operators
    * (watermarks, windows) that want a native timestamp rather than
    * epoch micros. Same dtype branch as [[epochMicros]]. */
  def eventTime(df: DataFrame, name: String = "ts"): Column =
    df.schema(name).dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr(s"`$name` div 1000"))
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType |
           org.apache.spark.sql.types.DateType =>
        col(name).cast("timestamp")
      case other => throw new IllegalArgumentException(
        s"event-time column `$name` has unsupported dtype $other — " +
          "expected LONG (epoch nanos), TIMESTAMP, TIMESTAMP_NTZ, or DATE")
    }

  /** Sign-exact floor division of a Long timestamp column by a positive
    * width — the chunk/bucket coordinate shared by [[rangeJoin]],
    * [[sessionizeChunked]], and [[asofJoinChunked]]. The classic
    * `(ts - pmod(ts, w)) div w` idiom underflows when ts is within
    * pmod-of-w of Long.MinValue (the subtraction wraps positive and the
    * earliest events land in the LAST chunk); truncating `div` plus a
    * remainder-sign correction computes the same floor with no wrapping
    * intermediate — q·w = ts − r with r ∈ (−w, w) sharing ts's sign, so
    * q·w and q − 1 stay in range for EVERY representable ts. A double
    * `/` is not an option either: it rounds past 2^53. */
  private[graft] def floorDivChunk(ts: Column, w: Long): Column =
    floorDivChunk(ts, lit(w))

  /** Column-divisor form (positive `w` per row — BudgetSelect's
    * per-group chunk widths); same sign-exact floor arithmetic. */
  private[graft] def floorDivChunk(ts: Column, w: Column): Column = {
    val q = call_function("div", ts, w)
    when(ts - q * w < 0, q - lit(1L)).otherwise(q)
  }

  /** As-of join. `right` must be unique per (key, ts) — pre-aggregate it
    * if not, or ties make the filled value nondeterministic.
    * @return left rows + `payload` column holding the as-of right value
    *         in its NATIVE type (null when no right row precedes the
    *         left row).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: Column, rightKey: Column,
               leftTs: Column, rightTs: Column,
               payload: Column): DataFrame = {
    val (l, r0, _, rowType) =
      asofFrames(left, right, leftKey, rightKey, leftTs, rightTs, payload)
    asofFill(l.unionByName(asRightRows(r0, rowType)), Seq(col("__k")))
  }

  /** The framed union sides shared by [[asofJoin]] and
    * [[asofJoinChunked]] — ONE home for the marker-struct and
    * null-exclusion semantics, so a fix to either cannot silently skip
    * the twin (their outputs are contractually identical).
    *
    * The fill marker is a STRUCT, not the payload itself: a right row
    * with a legitimately-null payload must still win the forward fill
    * (bare last(payload, ignoreNulls) would skip it and resurrect an
    * older value — SQL ASOF semantics return the null). The marker
    * struct is parameterized on the payload's own type, so the filled
    * value round-trips typed (a long stays a long, a timestamp a
    * timestamp) instead of degrading to string.
    *
    * Null right keys never equi-match — dropped, or the keyed window
    * would pair null-key left rows with null-key right rows. Null right
    * TIMESTAMPS go too: `rightTs <= leftTs` is unknown for them, and a
    * null-ts right row sorts FIRST in the ascending window (nulls
    * first), so its payload would forward-fill into left rows that have
    * no true preceding right row; ASOF semantics want null there.
    *
    * @return (left frame `__k/__ts/__isLeft/__p/__row`, filtered right
    *         frame `__k/__ts/__p`, payload marker type, row struct type)
    */
  private def asofFrames(left: DataFrame, right: DataFrame,
                         leftKey: Column, rightKey: Column,
                         leftTs: Column, rightTs: Column, payload: Column)
      : (DataFrame, DataFrame, org.apache.spark.sql.types.StructType,
         org.apache.spark.sql.types.DataType) = {
    val pType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "v", right.select(payload.as("v")).schema.head.dataType)))
    val l = left.select(leftKey.as("__k"), leftTs.as("__ts"),
      lit(1).as("__isLeft"),
      lit(null).cast(pType).as("__p"),
      struct(col("*")).as("__row"))
    val r0 = right
      .select(rightKey.as("__k"), rightTs.as("__ts"),
        struct(payload.as("v")).as("__p"))
      .where(rightKey.isNotNull && rightTs.isNotNull)
    (l, r0, pType, l.schema("__row").dataType)
  }

  /** Widen a filtered right frame to the union row shape. */
  private def asRightRows(r0: DataFrame,
                          rowType: org.apache.spark.sql.types.DataType)
      : DataFrame =
    r0.withColumn("__isLeft", lit(0))
      .withColumn("__row", lit(null).cast(rowType))

  /** The forward-fill tail shared by both as-of forms: at equal ts the
    * right row sorts first, so ts >= rightTs is inclusive. */
  private def asofFill(unioned: DataFrame,
                       partCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partCols: _*)
      .orderBy(col("__ts"), col("__isLeft"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("payload",
        last(col("__p"), ignoreNulls = true).over(w).getField("v"))
      .where(col("__isLeft") === 1)
      .select(col("__row.*"), col("payload"))
  }

  /** [[asofJoin]] with BOUNDED window partitions — the hot-key
    * mitigation of [[sessionizeChunked]] applied to the as-of fill.
    * Both sides shuffle on (key, chunk = ts div chunkWidth) and the
    * forward fill runs per chunk; left rows whose as-of right row lives
    * in an EARLIER chunk are served by a CARRY — the latest right row
    * of any preceding chunk, computed on the slim per-chunk summary
    * frame (one row per occupied (key, chunk), chunk-occupancy times
    * smaller than the event stream) and injected into each chunk's
    * window as a synthetic right row that sorts first. Output is
    * IDENTICAL to [[asofJoin]] at ANY chunkWidth ≥ 1 (TemporalSkewSpec
    * pins equivalence, hostile input included); chunkWidth bounds the
    * largest event-scale window partition by the hot key's per-chunk
    * row count. */
  def asofJoinChunked(left: DataFrame, right: DataFrame,
                      leftKey: Column, rightKey: Column,
                      leftTs: Column, rightTs: Column,
                      payload: Column, chunkWidth: Long): DataFrame = {
    require(chunkWidth >= 1, "chunkWidth must be >= 1")
    def chunkOf(c: Column): Column = floorDivChunk(c, chunkWidth)
    // the framing (marker struct, null exclusions) is the SHARED
    // asofFrames — the chunked form only adds the chunk coordinate
    val (l0, rBase, pType, rowType) =
      asofFrames(left, right, leftKey, rightKey, leftTs, rightTs, payload)
    val l = l0.withColumn("__c", chunkOf(col("__ts")))
    val r0 = rBase.withColumn("__c", chunkOf(col("__ts")))
    val r = asRightRows(r0, rowType)
    // per-(key, chunk) LATEST right row — the summary frame. row_number
    // over the bounded (key, chunk) partition, not a global per-key
    // window; ties on ts are the caller's contract violation, same as
    // the unchunked form.
    val latestW = Window.partitionBy(col("__k"), col("__c"))
      .orderBy(col("__ts").desc)
    val summaries = r0
      .withColumn("__rn", row_number().over(latestW))
      .where(col("__rn") === 1)
      .select(col("__k"), col("__c"), col("__p"))
    // carry per occupied LEFT chunk: the latest summary of any STRICTLY
    // earlier chunk, via the same union+forward-fill trick on the slim
    // frames — targets sort before the same chunk's summary, so a
    // same-chunk right row never rides the carry (it is already in the
    // chunk's own window)
    val targets = l.select(col("__k"), col("__c")).distinct()
    val carryW = Window.partitionBy(col("__k"))
      .orderBy(col("__c"), col("__srt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carries = targets
      .select(col("__k"), col("__c"), lit(0).as("__srt"),
        lit(null).cast(pType).as("__sp"))
      .unionByName(summaries.select(col("__k"), col("__c"),
        lit(1).as("__srt"), col("__p").as("__sp")))
      .withColumn("__carry",
        last(col("__sp"), ignoreNulls = true).over(carryW))
      .where(col("__srt") === 0 && col("__carry").isNotNull)
      .select(col("__k"), col("__c"),
        lit(null).cast(l.schema("__ts").dataType).as("__ts"),
        lit(0).as("__isLeft"), col("__carry").as("__p"),
        lit(null).cast(rowType).as("__row"))
    // within a chunk every real ts is non-null, so the null-ts carry
    // sorts first (asc = nulls first) and seeds the fill; the shared
    // asofFill keeps the equal-ts inclusive semantics
    asofFill(
      l.unionByName(r).unionByName(carries.select(
        col("__k"), col("__ts"), col("__isLeft"), col("__p"),
        col("__row"), col("__c"))),
      Seq(col("__k"), col("__c")))
  }

  /** Interval/range join: every (left, right) pair on the same key with
    * `rightTs ∈ [leftTs + lower, leftTs + upper]` — "orders placed in
    * the 30 days before each event", the join Spark only plans as a
    * key-equi join with the range as a post-filter, which degenerates to
    * a per-key cross product when keys are hot.
    *
    * Scale shape — binned bucket join: timestamps are floor-divided into
    * buckets of width `upper - lower + 1`, so every left row's target
    * window spans AT MOST TWO buckets. The left side explodes to those
    * ≤2 (key, bucket) coordinates, the right side computes its single
    * bucket, and the join is equi on (key, bucket) with the exact range
    * check as a filter — candidates are bounded by bucket co-residency
    * (time-local rows), never the full per-key history. One shuffle on
    * (key, bucket), which also spreads a hot key across its time range.
    * Each right row lives in exactly one bucket, so no pair dedup is
    * needed.
    *
    * Domain: `leftTs + lower` and `leftTs + upper` must not overflow
    * Long (the bucket explode adds the bounds before flooring). With
    * epoch-micros timestamps and physical window widths this holds by
    * ~290,000 years of margin; only synthetic timestamps within
    * `|lower|`/`upper` of the Long extremes can wrap.
    *
    * @return left rows (unchanged columns) + the `rightCols` projection
    *         of every matching right row; inner semantics (left rows
    *         with no match are absent)
    */
  def rangeJoin(left: DataFrame, right: DataFrame,
                leftKey: Column, rightKey: Column,
                leftTs: Column, rightTs: Column,
                lower: Long, upper: Long,
                rightCols: Seq[Column]): DataFrame = {
    require(upper >= lower, "upper bound must be >= lower bound")
    val w = upper - lower + 1 // window span fits in <= 2 buckets of this width
    def fdiv(ts: Column): Column = floorDivChunk(ts, w)
    val l = left.select(struct(col("*")).as("__lrow"),
        leftKey.as("__k"), leftTs.as("__lts"))
      .where(col("__k").isNotNull && col("__lts").isNotNull)
      .select(col("__lrow"), col("__k"), col("__lts"),
        explode(sequence(fdiv(col("__lts") + lower),
          fdiv(col("__lts") + upper))).as("__b"))
    val r = right.select(struct(rightCols: _*).as("__rrow"),
        rightKey.as("__k"), rightTs.as("__rts"))
      .where(col("__k").isNotNull && col("__rts").isNotNull)
      .withColumn("__b", fdiv(col("__rts")))
    l.join(r, Seq("__k", "__b"))
      .where(col("__rts").between(col("__lts") + lower, col("__lts") + upper))
      .select(col("__lrow.*"), col("__rrow.*"))
  }

  /** The lag/break/running-sum session core over an arbitrary partition
    * spec — ONE home for the gap semantics, shared by [[sessionize]]
    * (key) and [[sessionizeChunked]] (key, chunk) so a fix to either
    * cannot silently skip the twin. */
  private def localSessions(events: DataFrame, partCols: Seq[Column],
                            ts: Column, gap: Long, out: String): DataFrame = {
    val w = Window.partitionBy(partCols: _*).orderBy(ts)
    events
      .withColumn("__prev", lag(ts, 1).over(w))
      .withColumn("__break",
        when(col("__prev").isNull || ts - col("__prev") > gap, 1L).otherwise(0L))
      .withColumn(out,
        sum(col("__break")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)) - 1)
      .drop("__prev", "__break")
  }

  /** Gap-based sessionization: a new session starts when the time since
    * the previous event on the same key exceeds `gap` (in the ts unit).
    * Adds `session_id` (0-based per key, by time order). */
  def sessionize(events: DataFrame, key: Column, ts: Column,
                 gap: Long): DataFrame =
    localSessions(events, Seq(key), ts, gap, "session_id")

  /** [[sessionize]] with BOUNDED window partitions — the time-chunk
    * mitigation the hot-key caveat above prescribes, as a first-class
    * operator. Events shuffle on (key, chunk = ts div chunkWidth) and
    * session locally per chunk; a second window over the SLIM per-chunk
    * summary frame — (first ts, last ts, session count) per occupied
    * (key, chunk), chunk-occupancy times smaller than the event stream —
    * decides which chunk-boundary sessions bridge (boundary gap ≤ `gap`)
    * and offsets every chunk's local ids into the global numbering.
    *
    * Output is IDENTICAL to [[sessionize]] at ANY chunkWidth ≥ 1
    * (bridging is per-adjacent-occupied-chunk and composes through the
    * running offset, so even sessions spanning many chunks merge;
    * TemporalSkewSpec pins equivalence on hot-key and hostile corpora).
    * chunkWidth is purely a performance knob: the largest event-window
    * partition shrinks from "the hot key's whole history" to "the hot
    * key's events in one chunk". The summary window is still keyed, but
    * over bounded rows — at 100 TB pick chunkWidth so a hot key's
    * per-chunk event count fits a task comfortably; the summary frame
    * then fits trivially.
    *
    * Cost: the events cross TWO exchanges (the chunked window, then the
    * offsets join when AQE picks a shuffle join over broadcasting the
    * slim offsets frame) vs the keyed form's one — the premium that
    * buys the bounded partitions. Prefer [[sessionize]] when no key is
    * hot enough to serialize a task. */
  def sessionizeChunked(events: DataFrame, key: Column, ts: Column,
                        gap: Long, chunkWidth: Long): DataFrame = {
    require(chunkWidth >= 1, "chunkWidth must be >= 1")
    val chunk = floorDivChunk(ts, chunkWidth)
    val prepared = events.withColumn("__k", key).withColumn("__c", chunk)
    // the gap semantics live in the SHARED localSessions core — the
    // chunked form only narrows the partition to (key, chunk)
    val local = localSessions(prepared, Seq(col("__k"), col("__c")),
      ts, gap, "__lsid")
    // slim summary: one row per OCCUPIED (key, chunk); empty chunks
    // simply don't appear, and the lag below bridges across the hole
    // with the true boundary timestamps
    val summary = local.groupBy(col("__k"), col("__c"))
      .agg(min(ts).as("__first"), max(ts).as("__last"),
        (max(col("__lsid")) + 1).as("__nsess"))
    val byKey = Window.partitionBy(col("__k")).orderBy(col("__c"))
    val offsets = summary
      .withColumn("__prevLast", lag(col("__last"), 1).over(byKey))
      // a null boundary ts (null-ts rows chunk together and sort first)
      // never bridges — matching the unchunked form, where a null gap
      // comparison starts a fresh session
      .withColumn("__bridge",
        when(col("__first") - col("__prevLast") <= gap, 1L).otherwise(0L))
      .withColumn("__base",
        coalesce(sum(col("__nsess")).over(byKey.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L))
          - sum(col("__bridge")).over(byKey.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)))
      .select(col("__k").as("__ok"), col("__c").as("__oc"), col("__base"))
    // null-safe equi-join: null keys and null-ts chunks are legitimate
    // groups in both frames (a plain equi-join would silently drop
    // every null-key event the unchunked operator keeps)
    local
      .join(offsets, col("__k") <=> col("__ok") && col("__c") <=> col("__oc"))
      .withColumn("session_id", col("__lsid") + col("__base"))
      .drop("__k", "__c", "__lsid", "__ok", "__oc", "__base")
  }
}
