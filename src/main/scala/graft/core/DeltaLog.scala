package graft.core

import org.apache.spark.sql.SparkSession

/** The ONE delta-log layout and fold contract every rolling state
  * index in the engine shares — [[graft.dedup.UrlSeen]] (URL state),
  * [[graft.dedup.SigSeen]] (media-signature state),
  * [[graft.ingest.CdxLog]] (the rolling archive index):
  * {{{
  *   path/gen-<%016d>/delta-b<batchId>/  parquet + _SUCCESS
  *   path/delta-b<batchId>/              legacy (generation-0) layout
  * }}}
  * One committed directory per folded batch; `_SUCCESS` gates crash
  * safety (a fold that died mid-write is invisible); the max committed
  * stamp is the watermark; a batchId with a committed delta is a
  * REPLAY (the caller mutates nothing and re-derives its annotation);
  * a batchId at/below the watermark WITHOUT its own delta is an
  * out-of-order backfill and fails loudly — silently treating it as a
  * replay would permanently drop that batch's novel rows.
  *
  * GENERATIONS make compaction an atomic cutover instead of a manual
  * pointer swap: [[compactCutover]] materializes the min-folded state
  * as the FIRST delta of generation N+1 (stamped with the source
  * watermark), and the generation becomes current the instant that
  * delta's `_SUCCESS` marker lands — a single filesystem create, the
  * same commit discipline [[GenState]] uses for snapshot state. There
  * is no pointer FILE to flip and therefore no window between "new
  * state written" and "pointer flipped": a reader resolves the current
  * generation as the highest-numbered `gen-*` directory holding at
  * least one committed delta, so before the marker it sees exactly the
  * old generation and after it exactly the new — never neither, never
  * both. A crash mid-compaction leaves an orphan generation with no
  * committed delta (invisible; the retry overwrites it). Post-cutover
  * folds land in the new generation automatically ([[foldDir]]
  * resolves through the same rule). Old generations are NOT deleted by
  * the cutover — [[pruneGenerations]] is the explicit maintenance step,
  * and it keeps the immediately previous state so a reader that
  * resolved the old generation just before a cutover still finds its
  * files. A pre-generation path (bare `delta-b*` under the root) reads
  * as generation 0 and migrates on its first cutover.
  *
  * Single writer per path (folds, cutover, prune) is the caller's
  * contract, as everywhere in this lifecycle; concurrent cutovers
  * would race for the same generation number.
  *
  * Keeping the mechanics in one object is what makes "all rolling
  * indexes share one lifecycle contract" a checkable property instead
  * of a convention: an index family cannot drift to its own replay
  * semantics without leaving this file. */
object DeltaLog {

  val deltaPrefix = "delta-b"
  val genPrefix = "gen-"

  def fsRoot(spark: SparkSession, path: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** One committed delta: batch stamp, directory, parquet file count
    * (the count rides the same listing that proved `_SUCCESS` — one
    * metadata round trip per delta, not three). */
  final case class Delta(batchId: Long, dir: String, parquetFiles: Int)

  /** The resolved state of a delta-log path: the current generation
    * number (0 = the legacy bare layout), the directory folds write
    * into, and the committed deltas under it. ONE resolution pass —
    * one listing of the root, one per generation root probed, one per
    * delta dir — and the fold/read/guard sites thread one Listing
    * through instead of re-resolving per question. */
  final case class Listing(generation: Long, genRoot: String,
                           deltas: Seq[Delta]) {
    /** Per-read parquet file total — the IndexHealth `files`
      * compaction signal. */
    def parquetFiles: Int = deltas.map(_.parquetFiles).sum
    /** Max committed batch stamp. */
    def watermark: Option[Long] =
      if (deltas.isEmpty) None else Some(deltas.map(_.batchId).max)
  }

  private def genDirName(n: Long): String = f"$genPrefix$n%016d"

  def genDir(path: String, n: Long): String = s"$path/${genDirName(n)}"

  /** Committed deltas directly under `root` — each delta dir costs one
    * listStatus serving both the `_SUCCESS` check and the parquet
    * count. */
  private def deltasUnder(fs: org.apache.hadoop.fs.FileSystem,
                          root: org.apache.hadoop.fs.Path): Seq[Delta] =
    fs.listStatus(root).toSeq.filter(_.isDirectory).flatMap { st =>
      val n = st.getPath.getName
      if (!n.startsWith(deltaPrefix)) None
      else scala.util.Try(n.drop(deltaPrefix.length).toLong).toOption
        .flatMap { b =>
          val files = fs.listStatus(st.getPath)
          if (!files.exists(_.getPath.getName == "_SUCCESS")) None
          else Some(Delta(b, st.getPath.toString,
            files.count(_.getPath.getName.endsWith(".parquet"))))
        }
    }

  /** The `gen-*` directories under `root`, number-parsed, newest
    * first. Junk names (unparseable or overflowing numbers) and plain
    * files are ignored — they can never shadow real state. */
  def genDirsUnder(fs: org.apache.hadoop.fs.FileSystem,
                   root: org.apache.hadoop.fs.Path)
      : Seq[(Long, org.apache.hadoop.fs.Path)] =
    fs.listStatus(root).toSeq.filter(_.isDirectory).flatMap { st =>
      val n = st.getPath.getName
      if (!n.startsWith(genPrefix)) None
      else scala.util.Try(n.drop(genPrefix.length).toLong).toOption
        .map(g => (g, st.getPath))
    }.sortBy(-_._1)

  /** Generic current-generation resolver — the ONE rule every
    * generation-versioned store shares (delta logs here; the minhash
    * bucketed-table store with its params-marker validity): the
    * highest-numbered `gen-*` dir satisfying `valid`, else the root
    * itself as generation 0 (the legacy flat layout). Orphans (crashed
    * cutovers — `valid` false) are skipped; that skip IS the reader
    * side of cutover atomicity. */
  def resolveGeneration(spark: SparkSession, path: String)
                       (valid: (org.apache.hadoop.fs.FileSystem,
                                org.apache.hadoop.fs.Path) => Boolean)
      : (Long, String) = {
    val (fs, root) = fsRoot(spark, path)
    if (!fs.exists(root)) return (0L, path)
    genDirsUnder(fs, root)
      .find { case (_, p) => valid(fs, p) }
      .map { case (g, p) => (g, p.toString) }
      .getOrElse((0L, path))
  }

  /** Resolve `path` to its current generation: the highest-numbered
    * `gen-*` directory holding ≥1 committed delta, else the root
    * itself (legacy generation 0). An orphan generation (crashed
    * cutover — no committed delta) is skipped, which is exactly what
    * makes the cutover atomic from the reader's side. */
  def listing(spark: SparkSession, path: String): Listing = {
    val (fs, root) = fsRoot(spark, path)
    if (!fs.exists(root)) return Listing(0L, path, Seq.empty)
    genDirsUnder(fs, root).iterator
      .map { case (g, p) => Listing(g, p.toString, deltasUnder(fs, p)) }
      .find(_.deltas.nonEmpty)
      .getOrElse(Listing(0L, path, deltasUnder(fs, root)))
  }

  /** Committed (batchId, dir) deltas of the CURRENT generation,
    * unordered. */
  def committedDeltas(spark: SparkSession, path: String)
      : Seq[(Long, String)] =
    listing(spark, path).deltas.map(d => (d.batchId, d.dir))

  /** Max committed batch stamp — the replay guard. Survives compaction:
    * the cutover stamps the merged delta with the source watermark. */
  def watermark(spark: SparkSession, path: String): Option[Long] =
    listing(spark, path).watermark

  /** Current generation number: 0 until the first [[compactCutover]]. */
  def generation(spark: SparkSession, path: String): Long =
    listing(spark, path).generation

  /** The fold-entry check: true when `batchId` is a REPLAY (its delta
    * committed — mutate nothing, annotate as the first run did);
    * throws on an out-of-order backfill (at/below the watermark with
    * no committed delta of its own). */
  def replayOrGuard(deltas: Seq[(Long, String)], batchId: Long,
                    path: String): Boolean = {
    val replay = deltas.exists(_._1 == batchId)
    if (!replay && deltas.nonEmpty && batchId <= deltas.map(_._1).max)
      throw new IllegalArgumentException(
        s"out-of-order fold: batch $batchId is below the watermark " +
          s"${deltas.map(_._1).max} but was never committed at $path — " +
          "batches must be folded in ascending order (backfill would " +
          "silently lose this batch's novel rows)")
    replay
  }

  /** The delta directory a fold of `batchId` writes WITHIN a resolved
    * generation root. Pure path join — fold sites resolve ONE
    * [[listing]] and write to `deltaDir(l.genRoot, batchId)` so the
    * same resolution serves the replay guard, the state reads, and the
    * placement. */
  def deltaDir(path: String, batchId: Long): String =
    s"$path/$deltaPrefix$batchId"

  /** Parquet files across the current generation's committed deltas —
    * the IndexHealth `files` compaction signal (every fold adds at
    * least one; reads open all). */
  def parquetFileCount(spark: SparkSession, path: String): Int =
    listing(spark, path).deltas.map(_.parquetFiles).sum

  /** Atomic in-place compaction: `write` receives the NEXT generation's
    * root and must commit the merged state as a delta under it (the
    * families write `deltaDir(genRoot, watermark)` with overwrite —
    * the parquet `_SUCCESS` marker IS the cutover). Returns the new
    * generation number after verifying the cutover took; throws if
    * `write` committed nothing (the old generation stays current — a
    * failed compaction can never destroy state). */
  def compactCutover(spark: SparkSession, path: String)
                    (write: String => Unit): Long = {
    val l = listing(spark, path)
    if (l.deltas.isEmpty)
      throw new IllegalStateException(s"nothing committed at $path")
    cutoverBy(spark, path, l.generation,
      () => listing(spark, path).generation)(write)
  }

  /** The cutover mechanism itself, shared with non-delta-log
    * generation stores (the minhash bucketed-table store): write
    * generation `cur`+1 and verify the cutover took via `resolve` —
    * throwing (old generation stays current) when `write` committed
    * nothing. `cur` is the CALLER's already-resolved generation so a
    * cutover costs one post-write verification listing, not two extra
    * resolutions. */
  private[graft] def cutoverBy(spark: SparkSession, path: String,
                               cur: Long, resolve: () => Long)
                              (write: String => Unit): Long = {
    val next = cur + 1
    write(genDir(path, next))
    val after = resolve()
    if (after != next)
      throw new IllegalStateException(
        s"compaction cutover did not take at $path: wrote generation " +
          s"$next but $after is current — the write committed nothing")
    next
  }

  /** The fold-loop's self-maintenance policy: when the current
    * generation's per-read parquet file count exceeds `maxFiles`, run
    * the family's atomic cutover (`compact` — e.g.
    * [[graft.dedup.UrlSeen.compactInPlace]]) and prune retired
    * generations; otherwise do nothing. Returns the new generation
    * when a cutover ran. This is what keeps a year of rolling folds
    * bounded-file WITHOUT a maintenance window: the fold loop calls it
    * on the cadence it already probes IndexHealth, every cutover is
    * crash-atomic, and the watermark survives so the loop's replay
    * guarantees are unchanged across generations. O(listing) when no
    * compaction is due. */
  def compactIfFragmented(spark: SparkSession, path: String,
                          maxFiles: Int)(compact: => Long): Option[Long] = {
    require(maxFiles >= 1, "maxFiles must be >= 1")
    val l = listing(spark, path)
    // convergence guard: a single-delta generation IS the compacted
    // form — if it alone exceeds maxFiles, another rewrite cannot
    // shrink it, and triggering anyway would re-run an O(index)
    // rewrite (and retire the reader-safety previous generation) on
    // EVERY maintenance call, forever
    if (l.deltas.size <= 1 || l.parquetFiles <= maxFiles) None
    else {
      val g = compact
      pruneGenerations(spark, path)
      Some(g)
    }
  }

  /** Explicit maintenance: delete generations older than the previous
    * valid state and any orphan (uncommitted) generation dirs.
    * KEEPS the current generation and the newest valid state before it
    * (a generation dir, or the legacy root deltas when no older
    * generation exists) — a reader that resolved the previous
    * generation just before a cutover must still find its files; the
    * NEXT prune after the next cutover retires it. Returns the deleted
    * paths. No-op (empty) when nothing is deletable. */
  def pruneGenerations(spark: SparkSession, path: String): Seq[String] =
    pruneBy(spark, path,
      (fs, p) => deltasUnder(fs, p).nonEmpty,
      st => st.getPath.getName.startsWith(deltaPrefix))

  /** The shared prune rule behind [[pruneGenerations]] and the minhash
    * store's prune: keep the current generation and the newest valid
    * predecessor (or the legacy root state when no older generation
    * exists); delete other generation dirs, orphans, and — once two
    * generation dirs cover the keep-previous guarantee — the legacy
    * root entries `legacyOf` selects. */
  private[graft] def pruneBy(spark: SparkSession, path: String,
      valid: (org.apache.hadoop.fs.FileSystem,
              org.apache.hadoop.fs.Path) => Boolean,
      legacyOf: org.apache.hadoop.fs.FileStatus => Boolean)
      : Seq[String] = {
    val (fs, root) = fsRoot(spark, path)
    if (!fs.exists(root)) return Seq.empty
    val gens = genDirsUnder(fs, root)
      .map { case (g, p) => (g, p, valid(fs, p)) }
    val validGens = gens.filter(_._3).map(_._1)
    if (validGens.isEmpty) return Seq.empty // legacy-only: no prune
    val current = validGens.max
    val keep: Set[Long] =
      Set(current) ++ validGens.filter(_ < current).take(1)
    val dropGens = gens.filterNot(g => keep.contains(g._1)).map(_._2)
    val legacy =
      if (keep.size > 1)
        fs.listStatus(root).toSeq.filter(legacyOf).map(_.getPath)
      else Seq.empty
    val victims = dropGens ++ legacy
    victims.foreach(p => fs.delete(p, true))
    victims.map(_.toString)
  }
}
