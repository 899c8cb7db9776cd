package graft

import graft.operators.Similarity
import graft.streaming.EmbStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The CELL-BLOCKED [[graft.streaming.EmbStream]] loop — the streaming
  * twin of the batch 100-TB default (r10/r11 verdict task: EmbStream
  * banded the whole index per batch while the registered batch path
  * went blocked/hier). Proves (1) the full cross-batch loop on the
  * cell-keyed index — corpus dups, in-batch first-copy-wins, dup of an
  * earlier batch's survivor via the index append, index growth by
  * survivors only; (2) replay idempotence through the real sink path
  * (same batchId overwrites, rows AND values stable); (3) candidate
  * generation is genuinely CELL-CONFINED — identical band values in a
  * non-probed cell produce no candidate, the property a banded index
  * does not have; (4) the frozen-codebook roundtrip (bootstrap train →
  * parquet → per-batch read) is exact.
  */
class EmbStreamBlockedSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private val dirs = scala.collection.mutable.ArrayBuffer.empty[String]

  private def tmp(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_esb_$tag").toString
    dirs += p; p
  }

  override def afterAll(): Unit = dirs.foreach { d =>
    import scala.reflect.io.Directory
    new Directory(new java.io.File(d)).deleteRecursively()
  }

  // three mutually orthogonal directions (disjoint support -> exact
  // integer dot = 0): near-dups exist only within a direction
  private val dirA: Seq[Double] = Seq.tabulate(64)(i => if (i < 21) 0.5 + 0.01 * i else 0.0)
  private val dirB: Seq[Double] = Seq.tabulate(64)(i => if (i >= 21 && i < 42) 0.5 + 0.01 * i else 0.0)
  private val dirC: Seq[Double] = Seq.tabulate(64)(i => if (i >= 42) 0.5 + 0.01 * i else 0.0)

  private def verdictMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("cross-batch blocked dedup through the cell-keyed index, replay-stable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (centDir, bandDir, vecDir, verdictsDir, ckpt) =
      (tmp("cent"), tmp("band"), tmp("vec"), tmp("out"), tmp("ckpt"))
    // bootstrap: two accepted vectors on dense ids 0, 1 -> k = 2 cells
    EmbStream.writeIndexBlocked(
      Seq((0L, dirA), (1L, dirB)).toDF("vec_id", "embedding"),
      centDir, bandDir, vecDir)

    val input = MemoryStream[(Long, Seq[Double])]
    val q = EmbStream.dedupIndexedStreamBlocked(
      input.toDF().toDF("vec_id", "embedding"),
      centDir, bandDir, vecDir, verdictsDir, ckpt)
    try {
      // batch 1: 10 = corpus dup of 0; 11 = novel direction
      // (survivor); 12 = dup of 11 (same batch, larger id -> 11 wins)
      input.addData((10L, dirA), (11L, dirC), (12L, dirC))
      q.processAllAvailable()
      // batch 2: 20 = dup of batch-1 SURVIVOR 11 via the index
      // append; 21 = dup of corpus vec 1
      input.addData((20L, dirC), (21L, dirB))
      q.processAllAvailable()
    } finally q.stop()

    val got = verdictMap(spark.read.parquet(verdictsDir))
    assert(got === Map(
      10L -> Some(0L), 11L -> None, 12L -> Some(11L),
      20L -> Some(11L), 21L -> Some(1L)), s"verdicts: $got")

    // index grew by survivors only, and every index row cites a
    // codebook cell (the frozen-quantizer invariant)
    val idxVecs = spark.read.parquet(vecDir)
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    assert(idxVecs === Set(0L, 1L, 11L), s"vector store: $idxVecs")
    val (cellIds, _) = EmbStream.readCodebook(spark, centDir)
    val idxCells = spark.read.parquet(bandDir)
      .select("cell").distinct().collect().map(_.getLong(0)).toSet
    assert(idxCells.subsetOf(cellIds.toSet),
      s"index cites unknown cells: ${idxCells -- cellIds.toSet}")

    // forced batch replay through the ACTUAL sink path: re-running
    // micro-batch 0 with the same batchId overwrites its own
    // batch=0 partition — rows and values both stable
    val before = spark.read.parquet(verdictsDir).count()
    EmbStream.processBatchBlocked(
      Seq((10L, dirA), (11L, dirC), (12L, dirC)).toDF("vec_id", "embedding"),
      centDir, bandDir, vecDir, verdictsDir, batchId = 0L)
    val after = spark.read.parquet(verdictsDir)
    assert(after.count() === before, "replayed batch duplicated verdict rows")
    assert(verdictMap(after) === got, "replay changed verdict values")
  }

  test("candidate generation is cell-confined: same bands, wrong cell, no candidate") {
    import spark.implicits._
    val (centDir, bandDir, vecDir) = (tmp("cent2"), tmp("band2"), tmp("vec2"))
    EmbStream.writeIndexBlocked(
      Seq((0L, dirA), (1L, dirB)).toDF("vec_id", "embedding"),
      centDir, bandDir, vecDir)
    val (cellIds, cents) = EmbStream.readCodebook(spark, centDir)
    val arrival = Similarity.quantizeCols(
      Seq((30L, dirA)).toDF("vec_id", "embedding"))

    // sanity: against the real index the exact dup IS flagged
    val sane = verdictMap(EmbStream.dedupBatchBlocked(arrival,
      spark.read.parquet(bandDir), spark.read.parquet(vecDir),
      cellIds, cents))
    assert(sane === Map(30L -> Some(0L)), s"sanity flag failed: $sane")

    // corrupt ONLY the index rows' cell column: band values stay
    // bit-identical to the arrival's, so a banded join would still
    // match — the blocked join must not (cell equality is a join key,
    // not advisory metadata)
    val wrongCell = spark.read.parquet(bandDir)
      .withColumn("cell", lit(-999L))
    val confined = verdictMap(EmbStream.dedupBatchBlocked(arrival,
      wrongCell, spark.read.parquet(vecDir), cellIds, cents))
    assert(confined === Map(30L -> None),
      s"candidates leaked across cells: $confined")
  }

  test("frozen codebook roundtrip is exact; band rows follow the block plan") {
    import spark.implicits._
    val (centDir, bandDir, vecDir) = (tmp("cent3"), tmp("band3"), tmp("vec3"))
    val corpus = Seq((0L, dirA), (1L, dirB)).toDF("vec_id", "embedding")
    EmbStream.writeIndexBlocked(corpus, centDir, bandDir, vecDir)
    val q = Similarity.quantizeCols(corpus)
    val k = Similarity.requireBlockCells(2L)
    val (trainIds, trainCents) = Similarity.lloydCells(q, k)
    val (readIds, readCents) = EmbStream.readCodebook(spark, centDir)
    assert(readIds.toSeq === trainIds.toSeq, "cell ids drifted through parquet")
    assert(readCents.map(_.toSeq).toSeq === trainCents.map(_.toSeq).toSeq,
      "centroids drifted through parquet")

    // every vector contributes exactly probes * BlockBands index rows
    // under the CONSTANT in-cell plan (two live cells here, so both
    // probes are real)
    val (bands, _) = Similarity.blockBandPlan
    val perVec = spark.read.parquet(bandDir)
      .groupBy("vec_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perVec === Map(0L -> (bands.toLong * Similarity.blockProbe),
      1L -> (bands.toLong * Similarity.blockProbe)),
      s"band-row fan-out off the block plan: $perVec")
  }
}
