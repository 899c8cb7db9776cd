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

      val shardShared = sh.curatedShard.collect().map(_.toSeq).toSet
      val shardFresh = SparkEntry.queries("pipeline_shard")(spark, d)
        .collect().map(_.toSeq).toSet
      assert(shardShared == shardFresh)
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

  test("pruned keep-only session: same rows, NO raw-pair persist, direct access refused") {
    val sh = Shared.pairGraphFor(spark, d,
      Set("pipeline_curate", "pipeline_curate_nb"))
    try {
      // parity: the pruned session serves the registered queries' rows
      val curShared = sh.curated.collect().map(_.toSeq).toSet
      val curFresh = SparkEntry.queries("pipeline_curate")(spark, d)
        .collect().map(_.toSeq).toSet
      assert(curShared == curFresh)
      val curNbShared = sh.curatedNb.collect().map(_.toSeq).toSet
      val curNbFresh = SparkEntry.queries("pipeline_curate_nb")(spark, d)
        .collect().map(_.toSeq).toSet
      assert(curNbShared == curNbFresh)
      // pruning: the raw pair frame was never registered with the
      // cache manager — the only shared materialization is the CC
      // loop's edge checkpoint (Dataset.storageLevel consults the
      // cache manager for this exact frame, so NONE is non-vacuous)
      assert(sh.rawPairs.storageLevel ==
        org.apache.spark.storage.StorageLevel.NONE)
      // direct raw-pair access is the 2.9x footgun — refused loudly
      val e = intercept[IllegalArgumentException](sh.pairs)
      assert(e.getMessage.contains("pruned to keep-only consumers"))
    } finally sh.release() // must be a safe no-op on a pruned session
  }

  test("declared session with a direct-pair consumer still persists the cache") {
    val sh = Shared.pairGraphFor(spark, d,
      Set("pipeline_curate", "graph_pagerank"))
    try {
      assert(sh.pairs.storageLevel ==
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val prShared = operators.Graph.pageRankFrom(sh.pairs)
        .collect().map(_.toSeq).toSet
      val prFresh = SparkEntry.queries("graph_pagerank")(spark, d)
        .collect().map(_.toSeq).toSet
      assert(prShared == prFresh)
    } finally sh.release()
  }

  test("pruned session refuses undeclared KEEP-ONLY members too (guard symmetry)") {
    // r12 advisor: only `pairs` was guarded, so a session declared for
    // one member silently served the others against a cache plan
    // pruned without them — every accessor now checks its own names
    val sh = Shared.pairGraphFor(spark, d, Set("pipeline_curate"))
    try {
      val e = intercept[IllegalArgumentException](sh.curatedNb)
      assert(e.getMessage.contains("pipeline_curate_nb"))
      val e2 = intercept[IllegalArgumentException](sh.clusterKeep)
      assert(e2.getMessage.contains("dedup_cluster_keep"))
      val e3 = intercept[IllegalArgumentException](sh.triangles)
      assert(e3.getMessage.contains("graph_triangles"))
      // the declared member still serves
      assert(sh.curated.limit(1).count() >= 0)
    } finally sh.release()
  }

  test("pairGraphFor fails loudly on unknown or empty consumer sets") {
    val e = intercept[IllegalArgumentException](
      Shared.pairGraphFor(spark, d, Set("pipeline_curate", "q1_pricing_summary")))
    assert(e.getMessage.contains("q1_pricing_summary"))
    intercept[IllegalArgumentException](
      Shared.pairGraphFor(spark, d, Set.empty))
  }

  test("GraftSession honors a declared keep-only consumer set") {
    val gs = new GraftSession(spark, d,
      ngramConsumers = Some(Set("pipeline_curate", "pipeline_curate_nb")))
    try {
      val rows = gs.query("pipeline_curate").collect().map(_.toSeq).toSet
      val fresh = SparkEntry.queries("pipeline_curate")(spark, d)
        .collect().map(_.toSeq).toSet
      assert(rows == fresh)
      // an undeclared raw-pair member must fail loudly, not silently
      // recompute the jaccard pipeline per consumer
      intercept[IllegalArgumentException](gs.query("graph_pagerank"))
    } finally gs.close()
  }

  test("pruned 1-member emb session: registered rows, zero persists, guard on others") {
    val sh = Shared.embFamilyFor(spark, d, Set("dedup_semantic_prune"))
    try {
      val prShared = sh.semanticPrune.collect().map(_.toSeq).toSet
      val prFresh = SparkEntry.queries("dedup_semantic_prune")(spark, d)
        .collect().map(_.toSeq).toSet
      assert(prShared == prFresh)
      // a 1-member session persists NOTHING — it degenerates to the
      // registered query body (the -2.9x class is structurally gone)
      assert(sh.emb.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      assert(sh.pairs.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      assert(sh.cc.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      val e = intercept[IllegalArgumentException](sh.knn)
      assert(e.getMessage.contains("emb_knn_graph was not declared"))
    } finally sh.release()
  }

  test("declared emb session persists exactly the artifacts >=2 consumers share") {
    // semantic_prune + centroid share cc; pairs/emb each have 1 reader
    val sh = Shared.embFamilyFor(spark, d,
      Set("dedup_semantic_prune", "emb_centroid"))
    try {
      val cShared = sh.centroid.collect().map(_.toSeq).toSet
      val cFresh = SparkEntry.queries("emb_centroid")(spark, d)
        .collect().map(_.toSeq).toSet
      assert(cShared == cFresh)
      assert(sh.cc.storageLevel ==
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      assert(sh.emb.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      assert(sh.pairs.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      val prShared = sh.semanticPrune.collect().map(_.toSeq).toSet
      val prFresh = SparkEntry.queries("dedup_semantic_prune")(spark, d)
        .collect().map(_.toSeq).toSet
      assert(prShared == prFresh)
    } finally sh.release()
    intercept[IllegalArgumentException](
      Shared.embFamilyFor(spark, d, Set("dedup_semantic_prune", "nope")))
    intercept[IllegalArgumentException](Shared.embFamilyFor(spark, d, Set.empty))
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

  test("embFamily session serves pipeline_curate_emb (declared), refuses undeclared") {
    val sh = Shared.embFamilyFor(spark, d,
      Set("pipeline_curate_emb", "decontaminate_embedding"))
    try {
      val shared = sh.curatedEmb.collect().map(_.toSeq).toSet
      val fresh = SparkEntry.queries("pipeline_curate_emb")(spark, d)
        .collect().map(_.toSeq).toSet
      assert(shared == fresh)
      // a member outside the declared slice is still refused loudly
      intercept[IllegalArgumentException](sh.semanticPrune)
    } finally sh.release()
  }
}
