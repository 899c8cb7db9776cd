package graft.streaming

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
  * Cost: one min/max aggregate over the (already-persisted) micro
  * batch and a tiny file read/write — no index scan.
  */
private[graft] object IdWatermark {

  def checkAndAdvance(batch: DataFrame, idCol: String, indexDir: String,
      batchId: Long, tag: String): Boolean = {
    val wmPath = java.nio.file.Paths.get(s"$indexDir.maxid")
    val (lastBatch, maxSeen) =
      if (java.nio.file.Files.exists(wmPath)) {
        val parts = new String(
          java.nio.file.Files.readAllBytes(wmPath), "UTF-8").trim.split(",")
        (parts(0).toLong, parts(1).toLong)
      } else (-1L, Long.MinValue)
    val r = batch.agg(min(idCol), max(idCol)).collect()(0)
    if (r.isNullAt(0) || batchId <= lastBatch) true
    else {
      val (bMin, bMax) = (r.getLong(0), r.getLong(1))
      val ok = bMin > maxSeen
      if (!ok) System.err.println(
        s"[$tag] batch $batchId violates the monotone-id assumption: " +
          s"min $idCol=$bMin <= already-admitted max $maxSeen — " +
          "first-copy-wins may admit a second survivor of a near-dup cluster")
      java.nio.file.Files.write(wmPath,
        s"$batchId,${math.max(maxSeen, bMax)}".getBytes("UTF-8"))
      ok
    }
  }
}
