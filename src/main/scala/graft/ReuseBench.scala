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

    // Optional name filters (comma-separated) so a scale-tier run can
    // measure ONE family slice (e.g. the two curate pipelines at 100x)
    // without paying the full seven-query family twice per rep.
    // An EMPTY value skips the family entirely (its JSON fields read
    // 0); unknown names must fail loudly (the Bench filter rule).
    def familyEnv(envKey: String, default: Seq[String],
        legal: Set[String]): Seq[String] = {
      val f = sys.env.get(envKey)
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(default)
      val unknown = f.toSet -- legal
      require(unknown.isEmpty,
        s"$envKey names not in this family: ${unknown.toSeq.sorted.mkString(", ")}")
      f
    }

    val ngramRunners: Map[String, operators.Shared.PairGraphSession => DataFrame] =
      Map(
        "dedup_cluster_keep" -> (_.clusterKeep),
        "pipeline_curate"    -> (_.curated),
        "pipeline_curate_nb" -> (_.curatedNb),
        "graph_triangles"    -> (_.triangles),
        "graph_pagerank"     -> (sh => operators.Graph.pageRankFrom(sh.pairs)),
        "dedup_keep_rank"    -> (sh => operators.Graph.keepRankFrom(sh.pairs)),
        "graph_label_prop"   -> (sh => operators.Graph.labelPropFrom(sh.pairs)))
    val family = familyEnv("SPARK_GRAFT_REUSE_FAMILY",
      Seq("dedup_cluster_keep", "pipeline_curate", "pipeline_curate_nb",
        "graph_triangles", "graph_pagerank", "dedup_keep_rank",
        "graph_label_prop"),
      ngramRunners.keySet)

    val (standalone, shared) = (1 to reps).map { _ =>
      if (family.isEmpty) (0.0, 0.0) else {
      // per-query shape: every consumer pays the pair graph itself
      val ta0 = System.nanoTime()
      family.foreach(q => run(s"alone:$q")(SparkEntry.queries(q)(spark, sfDir)))
      val alone = (System.nanoTime() - ta0) / 1e9
      // session shape: one cached pair graph feeds every consumer.
      // The consumer set is DECLARED (pairGraphFor), so a keep-only
      // slice (e.g. the two curate pipelines) measures the pruned
      // session — no raw-pair persist — while the full family (which
      // includes the four direct-pair readers) persists exactly as the
      // undeclared constructor always did.
      val t0 = System.nanoTime()
      val sh = operators.Shared.pairGraphFor(spark, sfDir, family.toSet)
      try family.foreach(q => run(s"shared:$q")(ngramRunners(q)(sh)))
      finally sh.release()
      val together = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[reuse] standalone $alone%.1f s vs session $together%.1f s")
      (alone, together)
      }
    }.unzip

    val a = standalone.min
    val t = shared.min

    // ---- the label-blocked embedding family (r7): six queries
    // sharing one quantized scan (five also share the within-cluster
    // pair stream; the blocked composition shares the scan only) ----
    val embRunners: Map[String, operators.Shared.EmbFamilySession => DataFrame] =
      Map(
        "dedup_semantic_prune"    -> (_.semanticPrune),
        "emb_knn_graph"           -> (_.knn),
        "mine_hard_negatives"     -> (_.hardNegatives),
        "knn_score_diffusion"     -> (_.diffusion),
        "decontaminate_embedding" -> (_.decontaminate),
        "dedup_embedding_blocked" -> (_.blocked))
    val embFamily = familyEnv("SPARK_GRAFT_REUSE_EMB_FAMILY",
      Seq("dedup_semantic_prune", "emb_knn_graph", "mine_hard_negatives",
        "knn_score_diffusion", "decontaminate_embedding",
        "dedup_embedding_blocked"),
      embRunners.keySet)
    val (embAlone, embShared) = (1 to reps).map { _ =>
      if (embFamily.isEmpty) (0.0, 0.0) else {
      val ta0 = System.nanoTime()
      embFamily.foreach(q => run(s"alone:$q")(SparkEntry.queries(q)(spark, sfDir)))
      val alone = (System.nanoTime() - ta0) / 1e9
      // declared (embFamilyFor): slices measure the pruned session —
      // a 1-member slice persists nothing and degenerates to the
      // registered query body
      val t0 = System.nanoTime()
      val sh = operators.Shared.embFamilyFor(spark, sfDir, embFamily.toSet)
      try embFamily.foreach(q => run(s"shared:$q")(embRunners(q)(sh)))
      finally sh.release()
      val together = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[reuse] emb standalone $alone%.1f s vs session $together%.1f s")
      (alone, together)
      }
    }.unzip
    val ea = embAlone.min
    val et = embShared.min
    def pct(alone: Double, sess: Double): Double =
      if (alone > 0) 100 * (alone - sess) / alone else 0.0

    println(f"""{"metric":"pair_graph_reuse","standalone_sec":$a%.2f,"session_sec":$t%.2f,"saving_pct":${pct(a, t)}%.1f,"queries":${family.size},"emb_standalone_sec":$ea%.2f,"emb_session_sec":$et%.2f,"emb_saving_pct":${pct(ea, et)}%.1f,"emb_queries":${embFamily.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
