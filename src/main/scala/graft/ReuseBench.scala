package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only measurement (not part of the driver contract): the
  * session-level pair-graph reuse delta that `operators.Shared`
  * exists to capture.
  *
  * Seven registered queries each recompute the ngram-jaccard near-dup
  * pair graph standalone — the honest per-query bench shape. A
  * production orchestrator running the family in one session computes
  * the pair graph ONCE (`Shared.pairGraph`) and feeds every consumer
  * from the cache. This main times both shapes on the same session
  * and prints one JSON line; the measured delta lives in SURVEY §5.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ReuseBench"
  */
object ReuseBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    plans.GraftOps.install(spark)

    // by-name: construction is INSIDE the timing — the CC/PageRank
    // loops run eagerly (localCheckpoint) at DataFrame build time, so
    // timing only the noop write would miss most of their cost
    def run(tag: String)(mk: => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[reuse]   $tag: $s%.2f s")
      s
    }

    // warmup: the parquet reader, a shuffle, codegen
    Tables.documents(spark, sfDir).groupBy("lang").count().collect()
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val family = Seq("dedup_cluster_keep", "pipeline_curate",
      "pipeline_curate_nb", "graph_triangles", "graph_pagerank",
      "dedup_keep_rank", "graph_label_prop")

    val (standalone, shared) = (1 to reps).map { _ =>
      // per-query shape: every consumer pays the pair graph itself
      val ta0 = System.nanoTime()
      family.foreach(q => run(s"alone:$q")(SparkEntry.queries(q)(spark, sfDir)))
      val alone = (System.nanoTime() - ta0) / 1e9
      // session shape: one cached pair graph feeds all seven
      val t0 = System.nanoTime()
      val sh = operators.Shared.pairGraph(spark, sfDir)
      try {
        run("shared:cluster_keep")(sh.clusterKeep)
        run("shared:curated")(sh.curated)
        run("shared:curated_nb")(sh.curatedNb)
        run("shared:triangles")(sh.triangles)
        run("shared:pagerank")(operators.Graph.pageRankFrom(sh.pairs))
        run("shared:keep_rank")(operators.Graph.keepRankFrom(sh.pairs))
        run("shared:label_prop")(operators.Graph.labelPropFrom(sh.pairs))
      } finally sh.release()
      val together = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[reuse] standalone $alone%.1f s vs session $together%.1f s")
      (alone, together)
    }.unzip

    val a = standalone.min
    val t = shared.min

    // ---- the label-blocked embedding family (r7): five queries
    // sharing one quantized scan + one within-cluster pair stream ----
    val embFamily = Seq("dedup_semantic_prune", "emb_knn_graph",
      "mine_hard_negatives", "knn_score_diffusion", "decontaminate_embedding")
    val (embAlone, embShared) = (1 to reps).map { _ =>
      val ta0 = System.nanoTime()
      embFamily.foreach(q => run(s"alone:$q")(SparkEntry.queries(q)(spark, sfDir)))
      val alone = (System.nanoTime() - ta0) / 1e9
      val t0 = System.nanoTime()
      val sh = operators.Shared.embFamily(spark, sfDir)
      try {
        run("shared:semantic_prune")(sh.semanticPrune)
        run("shared:knn")(sh.knn)
        run("shared:hard_negatives")(sh.hardNegatives)
        run("shared:diffusion")(sh.diffusion)
        run("shared:decontaminate")(sh.decontaminate)
      } finally sh.release()
      val together = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[reuse] emb standalone $alone%.1f s vs session $together%.1f s")
      (alone, together)
    }.unzip
    val ea = embAlone.min
    val et = embShared.min

    println(f"""{"metric":"pair_graph_reuse","standalone_sec":$a%.2f,"session_sec":$t%.2f,"saving_pct":${100 * (a - t) / a}%.1f,"queries":${family.size},"emb_standalone_sec":$ea%.2f,"emb_session_sec":$et%.2f,"emb_saving_pct":${100 * (ea - et) / ea}%.1f,"emb_queries":${embFamily.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
