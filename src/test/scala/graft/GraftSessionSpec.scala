package graft

import org.scalatest.funsuite.AnyFunSuite

/** The name-routed facade must be indistinguishable from the raw
  * registry row-wise (SharedPairsSpec already proves the underlying
  * Shared results; this spec proves the ROUTING — including the three
  * graph queries Shared has no method for — plus memoization and
  * fall-through).
  */
class GraftSessionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("routed pair-graph queries match the registered registry rows") {
    GraftSession.withSession(spark, d) { s =>
      for (name <- Seq("graph_pagerank", "graph_label_prop", "dedup_keep_rank",
          "dedup_cluster_keep", "corpus_dup_profile")) {
        assert(rows(s.query(name)) ==
          rows(SparkEntry.queries(name)(spark, d)),
          s"facade drifted from registry for $name")
      }
    }
  }

  test("routed embedding-family queries match the registered registry rows") {
    GraftSession.withSession(spark, d) { s =>
      for (name <- Seq("dedup_semantic_prune", "emb_centroid",
          "emb_knn_graph", "mine_hard_negatives", "knn_score_diffusion",
          "decontaminate_embedding")) {
        assert(rows(s.query(name)) ==
          rows(SparkEntry.queries(name)(spark, d)),
          s"facade drifted from registry for $name")
      }
      // the shared pair stream must actually be the cache under the
      // routed members (not a silent recompute)
      assert(s.query("emb_knn_graph").queryExecution.executedPlan.toString
        .contains("InMemoryTableScan"),
        "routed knn must read the persisted pair stream")
      // dedup_embedding_blocked deliberately falls through to the
      // registry (measured slower when CONSTRUCTED over the session
      // cache — see GraftSession's comment). Row parity of the
      // fall-through is covered by the loop above; note Spark's
      // CacheManager may still substitute the hot cached scan into
      // the registry-built plan (the harmless "cache already hot"
      // case), so plan shape is not asserted here.
      assert(rows(s.query("dedup_embedding_blocked")) ==
        rows(SparkEntry.queries("dedup_embedding_blocked")(spark, d)))
      val fam = operators.Shared.embFamily(spark, d)
      try assert(rows(fam.blocked) ==
        rows(SparkEntry.queries("dedup_embedding_blocked")(spark, d)),
        "the Shared.blocked seam drifted from the registered query")
      finally fam.release()
    }
  }

  test("non-family names fall through to the registry untouched") {
    GraftSession.withSession(spark, d) { s =>
      assert(rows(s.query("dedup_exact")) ==
        rows(SparkEntry.queries("dedup_exact")(spark, d)))
      intercept[NoSuchElementException](s.query("no_such_query"))
    }
  }

  test("the pair graph is memoized across family queries and released on close") {
    val s = new GraftSession(spark, d)
    try {
      // every family route goes through ONE Shared session (same
      // object, so the persisted pairs frame is shared — the eager
      // graph loops consume the cache when the edge list materializes,
      // see SharedPairsSpec's plan-shape notes)
      s.query("graph_triangles").collect()
      val sh1 = s.ngram
      s.query("graph_pagerank").collect()
      assert(s.ngram eq sh1, "facade must not open a second pair-graph session")
      assert(s.ngram.pairs.storageLevel ==
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      assert(s.ngram.pairs.queryExecution.executedPlan.toString
        .contains("InMemoryTableScan"))
      val cached = s.ngram.pairs
      s.close()
      assert(cached.storageLevel ==
        org.apache.spark.storage.StorageLevel.NONE,
        "close() must unpersist the pair cache")
    } finally s.close() // idempotent
  }
}
