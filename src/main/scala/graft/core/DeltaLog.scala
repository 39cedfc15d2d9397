package graft.core

import org.apache.spark.sql.SparkSession

/** The ONE delta-log layout and fold contract every rolling state
  * index in the engine shares — [[graft.dedup.UrlSeen]] (URL state),
  * [[graft.dedup.SigSeen]] (media-signature state),
  * [[graft.ingest.CdxLog]] (the rolling archive index):
  * {{{
  *   path/delta-b<batchId>/  parquet + _SUCCESS
  * }}}
  * One committed directory per folded batch; `_SUCCESS` gates crash
  * safety (a fold that died mid-write is invisible); the max committed
  * stamp is the watermark; a batchId with a committed delta is a
  * REPLAY (the caller mutates nothing and re-derives its annotation);
  * a batchId at/below the watermark WITHOUT its own delta is an
  * out-of-order backfill and fails loudly — silently treating it as a
  * replay would permanently drop that batch's novel rows.
  *
  * Keeping the mechanics in one object is what makes "all rolling
  * indexes share one lifecycle contract" a checkable property instead
  * of a convention: an index family cannot drift to its own replay
  * semantics without leaving this file. */
object DeltaLog {

  val deltaPrefix = "delta-b"

  def fsRoot(spark: SparkSession, path: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Committed (batchId, dir) deltas under `path`, unordered. */
  def committedDeltas(spark: SparkSession, path: String)
      : Seq[(Long, String)] = {
    val (fs, root) = fsRoot(spark, path)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.filter(_.isDirectory).flatMap { st =>
      val n = st.getPath.getName
      if (!n.startsWith(deltaPrefix)) None
      else scala.util.Try(n.drop(deltaPrefix.length).toLong).toOption
        .filter(_ => fs.exists(
          new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
        .map(b => (b, st.getPath.toString))
    }
  }

  /** Max committed batch stamp — the replay guard. */
  def watermark(spark: SparkSession, path: String): Option[Long] = {
    val ds = committedDeltas(spark, path)
    if (ds.isEmpty) None else Some(ds.map(_._1).max)
  }

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

  /** The delta directory a fold of `batchId` writes. */
  def deltaDir(path: String, batchId: Long): String =
    s"$path/$deltaPrefix$batchId"

  /** Parquet files across committed deltas — the IndexHealth `files`
    * compaction signal (every fold adds at least one; reads open all). */
  def parquetFileCount(spark: SparkSession, path: String): Int = {
    val ds = committedDeltas(spark, path)
    val (fs, _) = fsRoot(spark, path)
    ds.map { case (_, d) =>
      fs.listStatus(new org.apache.hadoop.fs.Path(d))
        .count(_.getPath.getName.endsWith(".parquet"))
    }.sum
  }
}
