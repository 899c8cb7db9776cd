package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale rehearsal (not part of the driver contract): run
  * the heavy dedup/text/graph family on the shipped sf0.1 corpus AND
  * on a derived 10x corpus, and report the wall-time / shuffle-bytes
  * scaling ratios — the empirical check of SURVEY §5's "would this
  * plan survive a 10x scale-up" claims.
  *
  * The 10x corpus is DERIVED deterministically from the shipped one
  * (no synthetic distributions): `copies` replicas with disjoint id
  * ranges, each replica DECORRELATED so cross-replica near-dups do
  * not exist and per-replica dup density matches the original —
  * otherwise identical replicas would inflate pair counts by
  * copies^2 within every dup group and the measurement would conflate
  * data volume with dup-density change:
  *
  *   - documents: per-replica lowercase-alphabet rotation via
  *     `translate` (replica 0 = identity) — word shapes, lengths,
  *     whitespace, and therefore shingle/token statistics are
  *     preserved, but no shingle survives across replicas;
  *   - embeddings: per-replica circular shift of the vector (norms
  *     and pairwise geometry within a replica preserved; shifted
  *     replicas mutually near-orthogonal on this corpus);
  *   - events (r13 — the events family previously had no scale tier):
  *     id-space decorrelation only — event_id AND user_id shift by
  *     disjoint per-replica ranges, so the group count (users,
  *     user-hours, sessions) scales with copies while every per-group
  *     density and the time range are preserved; content columns
  *     never compare across users, so nothing else needs permuting.
  *
  * The replica count is stamped into the derived dir
  * (`derived_copies.txt`) and a reuse under a different factor
  * refuses loudly — the events table derives under its own guard, so
  * without the stamp a stale dir could silently mix factors.
  *
  * Expected shapes, which the printed ratios verify: the hash/band
  * blocked dedups, text statistics, and fixed-round graph loops scale
  * ~linearly; `dedup_embedding` is the documented exception — at
  * tau=0.45 (near the random-cosine regime of this corpus) banding
  * prunes little, so its CANDIDATE volume grows ~quadratically; the
  * hi-tau variant's 8-bit bands keep the candidate rate ~16x lower at
  * the same growth law (both Scaladoc'd in Similarity).
  *
  * Usage: sbt "runMain graft.ScaleRehearsal" — generates the derived
  * corpus under /tmp on first run (SPARK_GRAFT_SCALE_DIR to move it,
  * SPARK_GRAFT_SCALE_COPIES for the factor).
  */
object ScaleRehearsal {

  private final class ShuffleListener
      extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null)
        bytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale10")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    plans.GraftOps.install(spark)
    val listener = new ShuffleListener
    spark.sparkContext.addSparkListener(listener)
    def shuffleNow(): Long = {
      org.apache.spark.graft.SparkInternals.drainListeners(spark.sparkContext)
      listener.bytes.get()
    }

    // ---- derive the scaled corpus (idempotent; stamp written after
    // all tables, reuse gated on _SUCCESS — see ScaleCorpus) ----
    ScaleCorpus.ensure(spark, src, out, copies)

    // warmup
    Tables.documents(spark, src).groupBy("lang").count().collect()
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val family = sys.env.get("SPARK_GRAFT_SCALE_FAMILY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("dedup_exact", "dedup_norm_exact", "dedup_minhash_lsh",
        "dedup_ngram_jaccard", "dedup_simhash", "dedup_substring",
        "dedup_winnow", "text_tokens", "text_tfidf", "text_lm_score",
        "text_ppl_bucket", "corpus_stats", "dedup_cluster_keep",
        "graph_pagerank", "dedup_embedding", "dedup_embedding_hi",
        "dedup_embedding_wide", "dedup_embedding_blocked",
        "dedup_embedding_hier", "dedup_semantic_prune", "ann_ivf_pq",
        "emb_kmeans"))

    def measure(dir: String, q: String): (Double, Long, Long) = {
      val sh0 = shuffleNow()
      val t0 = System.nanoTime()
      // persist so the untimed row count reads the cached result
      // instead of re-running the whole (possibly quadratic) query
      val df = SparkEntry.queries(q)(spark, dir).persist()
      df.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val sh = shuffleNow() - sh0
      val rows = df.count() // untimed: result-size sanity for the density story
      df.unpersist()
      // queries with an internal materialize-once persist (the ranking
      // layouts, pipeline_shard's base projection) must not leak cache
      // entries into the next measurement (the Verify/Bench discipline)
      spark.catalog.clearCache()
      (secs, sh, rows)
    }

    val lines = family.map { q =>
      val (tB, sB, rB) = measure(src, q)
      val (tS, sS, rS) = measure(out, q)
      val line =
        f"""{"query":"$q","base_sec":$tB%.2f,"scaled_sec":$tS%.2f,"time_ratio":${tS / tB}%.1f,"base_shuffle":$sB,"scaled_shuffle":$sS,"base_rows":$rB,"scaled_rows":$rS}"""
      System.err.println(s"[scale] $line")
      line
    }
    println(lines.mkString("[", ",\n", "]"))
    spark.stop()
  }
}
