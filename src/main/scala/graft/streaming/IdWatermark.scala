package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{max, min}

/** Monotone-ingest-id guard for the index-backed dedup streams.
  *
  * [[DocStream]]/[[EmbStream]]'s first-copy-wins contract (strict
  * `j < i` keeps the SMALLEST id of a near-dup cluster) assumes ids
  * increase monotonically from bootstrap corpus through the stream —
  * a later batch carrying an id smaller than an already-admitted
  * near-dup's would be admitted as a second survivor. The assumption
  * was documented but unenforced; this guard makes a violation LOUD:
  * a max-id watermark rides beside the index (`<indexDir>.maxid`,
  * "lastBatchId,maxId"), each NEW batch's min id is compared against
  * it, and a violation logs a warning (and returns false for specs).
  * Replays (batchId <= lastBatchId) skip the comparison — their ids
  * were already admitted once, so re-seeing them is not a violation.
  *
  * Durability (r7 ADVICE, both items):
  *  - When the watermark file is ABSENT (first stream batch over a
  *    pre-existing bootstrap index), maxSeen seeds from `max(id)` of
  *    the index parquet itself — one scan, once, persisted IMMEDIATELY
  *    (even when that first batch is empty or a replay) — so the very
  *    first batch is checked against the bootstrap ids too, not waved
  *    through against Long.MinValue, and quiet streams never re-pay
  *    the index scan. An ABSENT index is deliberately NOT persisted:
  *    caching MinValue would disable the check forever if the
  *    bootstrap indexer finishes after the stream's first trigger
  *    (until then, re-checking costs one exists() probe, not a scan).
  *  - The file is written to a temp sibling and atomically renamed
  *    into place (FileContext OVERWRITE — the same primitive Spark's
  *    own checkpoint manager uses — with a delete+rename fallback on
  *    filesystems without a FileContext binding), and a malformed file
  *    (torn write from a crash mid-write) logs + falls back to the
  *    reinitialization path instead of throwing NumberFormatException
  *    forever and wedging the stream.
  *  - All file I/O goes through the Hadoop FileSystem resolved from
  *    the index path, NOT java.nio — `s3a://bucket/idx.maxid` reads
  *    and writes where the index lives, not on one driver's local
  *    disk (where a multi-driver restart would silently reset the
  *    guard).
  *
  * Cost: one min/max aggregate over the (already-persisted) micro
  * batch and a tiny file read/write — no index scan after the first
  * batch, empty or not.
  */
private[graft] object IdWatermark {

  /** (lastBatchId, maxSeen) from the watermark file; None when the
    * file is absent OR unreadable (malformed content falls back to
    * reinitialization, loudly).
    */
  private def readWatermark(fs: FileSystem, wmPath: Path, tag: String)
      : Option[(Long, Long)] = {
    if (!fs.exists(wmPath)) None
    else {
      try {
        val in = fs.open(wmPath)
        val raw = try {
          val buf = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
          buf.toString("UTF-8")
        } finally in.close()
        val parts = raw.trim.split(",")
        Some((parts(0).toLong, parts(1).toLong))
      } catch {
        case _: NumberFormatException | _: ArrayIndexOutOfBoundsException =>
          System.err.println(
            s"[$tag] malformed watermark file $wmPath — reinitializing " +
              "from the index (a crash mid-write left a torn line)")
          None
        case _: java.io.FileNotFoundException =>
          // the delete+rename fallback's absence window, hit from a
          // concurrent reader: absent == reinitialize, same as exists()
          // returning false a moment earlier
          None
      }
    }
  }

  /** One-time bootstrap of maxSeen from the index parquet when no
    * watermark file exists yet: without it, ids already admitted by
    * the bootstrap index would never be compared against the first
    * stream batch — the exact monotonicity gap the guard exists for.
    */
  private def bootstrapMaxSeen(batch: DataFrame, idCol: String,
      indexDir: String): Long = {
    val spark = batch.sparkSession
    val hconf = org.apache.spark.sql.graft.Bridge.newHadoopConf(spark)
    val p = new Path(indexDir)
    // A transient FS error here must FAIL the batch (the stream
    // retries), not silently default to MinValue: once a later
    // non-empty batch persists the watermark, a swallowed error would
    // have permanently skipped the bootstrap ids — the exact gap this
    // guard exists to close.
    val exists = p.getFileSystem(hconf).exists(p)
    if (!exists) Long.MinValue
    else try {
      val r = spark.read.parquet(indexDir).agg(max(idCol)).collect()(0)
      if (r.isNullAt(0)) Long.MinValue else r.getLong(0)
    } catch {
      // a dir with no parquet yet (schema inference fails) is an
      // empty index — nothing admitted, nothing to guard against
      case _: org.apache.spark.sql.AnalysisException => Long.MinValue
    }
  }

  private def writeWatermark(fs: FileSystem, hconf: Configuration,
      wmPath: Path, batchId: Long, maxId: Long): Unit = {
    val tmp = new Path(wmPath.getParent, wmPath.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$batchId,$maxId".getBytes("UTF-8")) finally out.close()
    try {
      FileContext.getFileContext(fs.getUri, hconf)
        .rename(tmp, wmPath, Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        // no AbstractFileSystem binding (some object stores): the
        // delete+rename window leaves the file ABSENT, never torn —
        // the absent-file path re-bootstraps correctly.
        if (fs.exists(wmPath)) fs.delete(wmPath, false)
        if (!fs.rename(tmp, wmPath))
          // lost a race (e.g. a concurrent driver recreated the file):
          // drop OUR update loudly rather than silently leaking tmp —
          // the surviving file is the racer's complete line, and the
          // next batch's read-compare-write re-advances past it.
          System.err.println(
            s"[watermark] rename $tmp -> $wmPath returned false; " +
              "keeping the concurrent writer's watermark")
    }
  }

  def checkAndAdvance(batch: DataFrame, idCol: String, indexDir: String,
      batchId: Long, tag: String): Boolean = {
    val hconf =
      org.apache.spark.sql.graft.Bridge.newHadoopConf(batch.sparkSession)
    val wmPath = new Path(s"$indexDir.maxid")
    val fs = wmPath.getFileSystem(hconf)
    val read = readWatermark(fs, wmPath, tag)
    val (lastBatch, maxSeen) = read.getOrElse(
      (-1L, bootstrapMaxSeen(batch, idCol, indexDir)))
    // Persist the bootstrap BEFORE the batch check: an empty or
    // replayed first batch must not leave the file absent and force
    // the next batch to re-scan the whole index. BUT only when the
    // scan actually found an index — caching "index absent" as
    // MinValue would permanently disable the bootstrap check if the
    // indexer finishes writing <indexDir> after the stream's first
    // (empty) trigger.
    if (read.isEmpty && maxSeen != Long.MinValue)
      writeWatermark(fs, hconf, wmPath, lastBatch, maxSeen)
    val r = batch.agg(min(idCol), max(idCol)).collect()(0)
    if (r.isNullAt(0) || batchId <= lastBatch) true
    else {
      val (bMin, bMax) = (r.getLong(0), r.getLong(1))
      val ok = bMin > maxSeen
      if (!ok) System.err.println(
        s"[$tag] batch $batchId violates the monotone-id assumption: " +
          s"min $idCol=$bMin <= already-admitted max $maxSeen — " +
          "first-copy-wins may admit a second survivor of a near-dup cluster")
      writeWatermark(fs, hconf, wmPath, batchId, math.max(maxSeen, bMax))
      ok
    }
  }
}
