package graft

import graft.operators.Shared
import org.scalatest.funsuite.AnyFunSuite

class SharedPairsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("shared pair graph yields identical results to the registered queries") {
    val sh = Shared.pairGraph(spark, d)
    try {
      val keepShared = sh.clusterKeep.collect().map(_.toSeq).toSet
      val keepFresh = SparkEntry.queries("dedup_cluster_keep")(spark, d)
        .collect().map(_.toSeq).toSet
      assert(keepShared == keepFresh)

      val curShared = sh.curated.collect().map(_.toSeq).toSet
      val curFresh = SparkEntry.queries("pipeline_curate")(spark, d)
        .collect().map(_.toSeq).toSet
      assert(curShared == curFresh)

      val triShared = sh.triangles.collect().map(_.toSeq).toSet
      val triFresh = SparkEntry.queries("graph_triangles")(spark, d)
        .collect().map(_.toSeq).toSet
      assert(triShared == triFresh)

      val curNbShared = sh.curatedNb.collect().map(_.toSeq).toSet
      val curNbFresh = SparkEntry.queries("pipeline_curate_nb")(spark, d)
        .collect().map(_.toSeq).toSet
      assert(curNbShared == curNbFresh)
    } finally sh.release()
  }

  test("second consumer reads the cached pairs, not a recomputed jaccard join") {
    // NOTE: clusterKeep/curated end behind the CC loop's localCheckpoints,
    // so their FINAL plans read checkpointed RDDs — the pair cache is
    // consumed when the edge list materializes. The observable contract
    // is therefore (a) the pairs plan is an in-memory scan and (b) the
    // cache is actually materialized after the first consumer runs.
    val sh = Shared.pairGraph(spark, d)
    try {
      val p = sh.pairs.queryExecution.executedPlan.toString
      assert(p.contains("InMemoryTableScan"),
        s"pairs should plan as a cache scan:\n$p")
      // non-vacuous persist guard: Dataset.storageLevel consults the
      // cache manager for THIS frame (localCheckpoint RDDs from the CC
      // loop cannot satisfy it the way generic storage info could)
      assert(sh.pairs.storageLevel ==
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sh.clusterKeep.collect() // first consumer materializes the cache
    } finally sh.release()
  }

  test("release is idempotent and unpersists the cache") {
    val sh = Shared.pairGraph(spark, d)
    sh.pairs.count()
    sh.release()
    sh.release()
    assert(sh.pairs.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("shared embedding pair graph matches the registered keep query") {
    val sh = Shared.embPairGraph(spark, d)
    try {
      assert(sh.pairs.storageLevel ==
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val keepShared = sh.keep.collect().map(_.toSeq).toSet
      val keepFresh = SparkEntry.queries("dedup_embedding_keep")(spark, d)
        .collect().map(_.toSeq).toSet
      assert(keepShared == keepFresh)
      // the generic graph diagnostics run over the same cache
      assert(sh.triangles.count() >= 0)
      assert(sh.labelProp.select("doc_id").distinct().count() ==
        sh.pageRank.select("doc_id").count())
    } finally sh.release()
  }
}
