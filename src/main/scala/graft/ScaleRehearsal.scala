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

    // ---- derive the scaled corpus (idempotent) ----
    val outPath = java.nio.file.Paths.get(out)
    val Step = 1000000000L
    // The replica count is STAMPED into the dir at derivation and
    // re-checked on reuse: the events table derives under its own
    // guard (added r13 — pre-r13 dirs carried an unscaled symlink),
    // so without the stamp a stale dir could silently end up with
    // documents at one factor and events at another, and every
    // "scaled" measurement in it would be mislabeled.
    val stamp = outPath.resolve("derived_copies.txt")
    if (java.nio.file.Files.exists(stamp)) {
      val stamped = new String(
        java.nio.file.Files.readAllBytes(stamp), "UTF-8").trim.toInt
      require(stamped == copies,
        s"$out was derived with copies=$stamped but this run asks for " +
          s"copies=$copies - delete the dir (or point " +
          "SPARK_GRAFT_SCALE_DIR elsewhere) instead of measuring a " +
          "mixed-factor corpus")
    } else {
      require(!java.nio.file.Files.exists(outPath.resolve("documents.parquet")),
        s"$out holds a derived corpus with no copies stamp (pre-r13 " +
          "layout) - delete it and re-derive so the factor is recorded")
      java.nio.file.Files.createDirectories(outPath)
      java.nio.file.Files.write(stamp, s"$copies\n".getBytes("UTF-8"))
    }
    if (!java.nio.file.Files.exists(outPath.resolve("documents.parquet"))) {
      java.nio.file.Files.createDirectories(outPath)
      val abc = "abcdefghijklmnopqrstuvwxyz"
      // Per-replica AFFINE letter permutation i -> i*stride + rot mod
      // 26 (stride coprime to 26): 12x26 = 312 distinct permutations,
      // so decorrelation holds past the 26 plain rotations (replica 0
      // = identity as before). Word shapes/lengths/whitespace — and so
      // every shingle/token statistic — are preserved; no multi-letter
      // word (hence effectively no shingle) survives across replicas.
      val strides = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
      require(copies <= strides.size * 26,
        s"affine permutation family supports <= ${strides.size * 26} replicas")
      val docs = spark.read.parquet(s"$src/documents.parquet")
      // The decorrelation argument needs EVERY content character to be
      // permuted: an uppercase/digit/punctuation token would survive
      // verbatim across replicas and reintroduce exactly the
      // cross-replica near-dups the derivation exists to exclude.
      // Fail fast rather than silently measure a confounded corpus.
      val nonAlpha = docs.filter(col("text").rlike("[^a-z ]")).count()
      require(nonAlpha == 0,
        s"$nonAlpha documents contain characters outside [a-z ] — the " +
          "affine a-z permutation cannot decorrelate them; extend the " +
          "permutation alphabet before deriving")
      (0 until copies).map { k =>
        val (stride, rot) = (strides(k / 26), k % 26)
        val img = (0 until 26).map(i => abc((i * stride + rot) % 26)).mkString
        docs.select((col("doc_id") + lit(k * Step)).as("doc_id"),
          translate(col("text"), abc, img).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      val dim = 64
      // Per-replica circular shift x sign flip: 128 decorrelated
      // variants (negation preserves norms and within-replica pairwise
      // cosines; a replica and its negated twin see each other at
      // MINUS the original cosine — never a near-dup at positive tau).
      require(copies <= 2 * dim,
        s"shift x sign family supports <= ${2 * dim} replicas")
      (0 until copies).map { k =>
        val sh = k % dim
        val shifted =
          if (sh == 0) col("embedding")
          else concat(slice(col("embedding"), sh + 1, dim - sh),
            slice(col("embedding"), 1, sh))
        val signed =
          if (k < dim) shifted
          else transform(shifted, x => -x)
        emb.select((col("vec_id") + lit(k * Step)).as("vec_id"),
          signed.as("embedding"), col("label"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      // remaining tables: symlink, so any registered query can run
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem")) {
        val link = outPath.resolve(s"$t.parquet")
        if (!java.nio.file.Files.exists(link))
          java.nio.file.Files.createSymbolicLink(
            link, java.nio.file.Paths.get(s"$src/$t.parquet"))
      }
      System.err.println(s"[scale] derived ${copies}x corpus at $out")
    }
    // events: derived OUTSIDE the documents guard (r13 — the events
    // family had no scale tier at all; a pre-r13 corpus dir carries an
    // unscaled symlink, which is deleted and replaced). Decorrelation
    // here is id-space, not content: replicas shift event_id AND
    // user_id by disjoint ranges, so the GROUP COUNT (users,
    // user-hours, sessions) scales with copies while every per-group
    // density (events per user, per hour, value/type distributions,
    // the time range itself) is preserved — the right null hypothesis
    // for the group-by/window/asof queries that consume this table.
    // No content column changes, so there is nothing to decorrelate
    // the way documents/embeddings need: events queries never compare
    // rows across users.
    val eventsOut = outPath.resolve("events.parquet")
    if (java.nio.file.Files.isSymbolicLink(eventsOut))
      java.nio.file.Files.delete(eventsOut)
    if (!java.nio.file.Files.exists(eventsOut)) {
      val ev = spark.read.parquet(s"$src/events.parquet")
      // Disjointness of the per-replica id shift needs every base id
      // below Step - a base tier past 1e9 events would silently
      // overlap replica ranges (duplicate event_ids, colliding users)
      // and break the decorrelation premise. Fail loudly instead.
      val mx = ev.agg(max(col("event_id")), max(col("user_id"))).head()
      require(mx.getLong(0) < Step && mx.getLong(1) < Step,
        s"events ids exceed the replica step $Step (max event_id " +
          s"${mx.getLong(0)}, max user_id ${mx.getLong(1)}) - raise " +
          "Step before deriving this tier")
      (0 until copies).map { k =>
        ev.select((col("event_id") + lit(k * Step)).as("event_id"),
          col("ts"),
          (col("user_id") + lit(k * Step)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(eventsOut.toString)
      System.err.println(s"[scale] derived ${copies}x events at $eventsOut")
    }

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
