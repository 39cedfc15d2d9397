package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Generation-versioned parquet state — the shared persistence layer
  * under every rolling-corpus manifest in this library (budget-cutoff
  * histograms, profile histograms): small driver-validated snapshots
  * that must survive crashed writes, reject concurrent writers loudly,
  * and skip replayed streaming batches.
  *
  * Layout: `path/` holds complete snapshot generations
  * `gen-<%016d>[-b<batchId>]`; the CURRENT state is the
  * highest-numbered generation carrying the committer's `_SUCCESS`
  * marker. Writers NEVER touch an existing generation: every commit
  * materializes the NEXT generation (mode errorifexists) and only then
  * prunes, so
  *
  *  - a crash mid-write leaves an unmarked orphan that readers skip —
  *    the previous valid generation stays current (callers validate
  *    content BEFORE calling commit, so neither bad input nor a write
  *    failure can destroy existing state);
  *  - pruning keeps the immediately previous valid generation too (a
  *    reader that resolved the old current just before a writer pruned
  *    must still find its files);
  *  - two concurrent writers race for the same next generation number
  *    and the errorifexists write makes the loser FAIL LOUDLY instead
  *    of silently dropping its fold (single writer at a time is the
  *    caller's contract);
  *  - a streaming fold's `batchId` rides the committing generation's
  *    directory NAME — atomic with the parquet commit itself, no
  *    marker-file crash window — so an at-least-once foreachBatch
  *    replay is detected by [[batchWatermark]] and skipped.
  *
  * A bare-parquet path written by a pre-generation version reads as the
  * current state and migrates to a generation on the next commit.
  * State size is the caller's contract (driver-validated, bounded
  * histograms — manifest-class, never corpus-scale).
  */
object GenState {

  private val genPrefix = "gen-"

  private def fsRoot(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** All generation dirs under the root, valid or not: (number, path,
    * hasSuccessMarker, folded streaming batchId if any). */
  private def genDirs(fs: org.apache.hadoop.fs.FileSystem,
                      root: org.apache.hadoop.fs.Path)
      : Seq[(Long, org.apache.hadoop.fs.Path, Boolean, Option[Long])] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.filter(_.isDirectory).flatMap { st =>
      val n = st.getPath.getName
      if (!n.startsWith(genPrefix)) None
      else {
        val body = n.drop(genPrefix.length)
        val (genPart, batchPart) = body.indexOf("-b") match {
          case -1 => (body, None)
          case i  => (body.take(i), Some(body.drop(i + 2)))
        }
        scala.util.Try(genPart.toLong).toOption.map { g =>
          (g, st.getPath,
            fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")),
            batchPart.flatMap(b => scala.util.Try(b.toLong).toOption))
        }
      }
    }

  /** Read the CURRENT state (latest valid generation; a legacy
    * bare-parquet root reads as-is — including throwing the reader's
    * own loud error for a missing or schema-foreign path). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val (fs, root) = fsRoot(spark, path)
    genDirs(fs, root).filter(_._3).sortBy(-_._1).headOption match {
      case Some((_, p, _, _)) => spark.read.parquet(p.toString)
      case None               => spark.read.parquet(path)
    }
  }

  /** True when nothing committed lives at `path` — no valid generation
    * and no legacy bare-parquet files (orphaned generation dirs do not
    * count). The streaming cold-start init gate. */
  def isUninitialized(spark: SparkSession, path: String): Boolean = {
    val (fs, root) = fsRoot(spark, path)
    genDirs(fs, root).forall(!_._3) &&
      (!fs.exists(root) || fs.listStatus(root).forall(_.isDirectory))
  }

  /** The highest streaming batchId folded into any surviving valid
    * generation — the foreachBatch replay guard. None when the state
    * holds no batch-stamped generations. */
  def batchWatermark(spark: SparkSession, path: String): Option[Long] = {
    val (fs, root) = fsRoot(spark, path)
    val ids = genDirs(fs, root).filter(_._3).flatMap(_._4)
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** Snapshot of a state dir's generation machinery — the ops probe
    * matching [[graft.meta.PipelineMetrics.indexHealth]]: more than two
    * surviving valid generations, or any unmarked orphan, signals an
    * interrupted or misbehaving writer worth investigating (a healthy
    * single-writer dir holds the current generation plus at most the
    * retained previous one, and prunes orphans at every commit). */
  final case class StateHealth(currentGen: Option[Long], validGens: Int,
                               orphans: Int, batchWatermark: Option[Long],
                               rows: Long) {
    override def toString: String =
      s"currentGen=${currentGen.getOrElse(-1L)} validGens=$validGens " +
        s"orphans=$orphans watermark=${batchWatermark.getOrElse(-1L)} " +
        s"rows=$rows"
  }

  /** Probe `path`'s generations and current-snapshot row count. Loud
    * (like [[read]]) on a path with neither generations nor legacy
    * parquet. */
  def health(spark: SparkSession, path: String): StateHealth = {
    val (fs, root) = fsRoot(spark, path)
    val gens = genDirs(fs, root)
    val valid = gens.filter(_._3)
    StateHealth(
      currentGen = valid.map(_._1).sorted.lastOption,
      validGens = valid.size,
      orphans = gens.size - valid.size,
      batchWatermark = { val ids = valid.flatMap(_._4)
        if (ids.isEmpty) None else Some(ids.max) },
      rows = read(spark, path).count())
  }

  /** Commit `rows` (already driver-validated by the caller) as the next
    * generation, then auto-prune: unmarked orphans and all valid
    * generations older than the retained previous one are deleted
    * (retention = the new current + its immediate predecessor, i.e.
    * `prune(keepLast = 2)` — long-lived rolling state stays at a
    * bounded two snapshots no matter how many commits it has seen). */
  def commit(spark: SparkSession, rows: Seq[Row], schema: StructType,
             path: String, batchId: Option[Long] = None): Unit = {
    val (fs, root) = fsRoot(spark, path)
    val existing = genDirs(fs, root)
    val next = (existing.map(_._1) :+ 0L).max + 1
    val suffix = batchId.map(b => s"-b$b").getOrElse("")
    val nextPath = new org.apache.hadoop.fs.Path(root,
      f"$genPrefix$next%016d$suffix")
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("errorifexists").parquet(nextPath.toString)
    // a generation is only VALID (readable, prune-surviving) with its
    // _SUCCESS marker. On a deployment where the committer writes none
    // (mapreduce.fileoutputcommitter.marksuccessfuljobs=false, common
    // on object stores) protecting only the committing call is NOT
    // enough: the NEXT commit's sweep would classify this unmarked
    // generation as a crash-orphan and delete it, and read() could
    // never resolve it either. The write above has already completed,
    // so the commit IS done — write the marker ourselves; failing to
    // create it must fail the commit loudly rather than hand the next
    // sweep a doomed snapshot.
    val marker = new org.apache.hadoop.fs.Path(nextPath, "_SUCCESS")
    if (!fs.exists(marker)) fs.create(marker, false).close()
    // the just-written generation stays explicitly protected anyway —
    // a racing concurrent sweep between write and marker must not
    // delete the data either
    pruneImpl(spark, path, keepLast = 2, protectGen = Some(next))
  }

  /** Retention sweep, also runnable standalone (ops hygiene on a dir
    * whose writer died before its commit-time auto-prune, or to tighten
    * retention to `keepLast = 1`): deletes every unmarked crash-orphan
    * and all but the newest `keepLast` VALID generations. The current
    * generation is never deleted (`keepLast` is clamped to ≥ 1), and a
    * legacy bare-parquet root has no generation dirs so the sweep is a
    * no-op there. Per-dir delete failures are non-fatal (a reader
    * holding an open file on some filesystems) — the next sweep
    * retries them. Returns the number of directories deleted. */
  def prune(spark: SparkSession, path: String, keepLast: Int = 2): Int =
    pruneImpl(spark, path, keepLast, protectGen = None)

  private def pruneImpl(spark: SparkSession, path: String, keepLast: Int,
                        protectGen: Option[Long]): Int = {
    val (fs, root) = fsRoot(spark, path)
    val gens = genDirs(fs, root)
    val keep = gens.filter(_._3).map(_._1).sorted
      .takeRight(math.max(1, keepLast)).toSet
    gens.count { case (g, p, valid, _) =>
      val stale = ((!valid) || !keep.contains(g)) &&
        !protectGen.contains(g)
      stale && (try fs.delete(p, true) catch {
        case _: java.io.IOException => false
      })
    }
  }
}
