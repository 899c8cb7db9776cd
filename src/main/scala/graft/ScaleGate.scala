package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-tier INVARIANT gate — the mechanization of SCALE100's family
  * laws (r13 verdict: the 11th-decile AQE mis-ranking was invisible to
  * every small-SF oracle and was caught only because a human read
  * bucket sizes in a new query's first 100x run; the laws those manual
  * verdicts assert are now asserted in code).
  *
  * Each gated query runs on the DERIVED corpus ([[ScaleCorpus]], same
  * derivation the rehearsal times) and its output is checked against
  * the laws its family GUARANTEES at that tier:
  *
  *  - EXACT ROW LINEARITY for the events family — the id-shift
  *    derivation preserves every per-group density while scaling the
  *    group count, so output rows are exactly `copies` x base;
  *  - GROUPWISE SCALED EQUALITY for the watermark audit — per
  *    watermark row, counts scale exactly and shares are preserved;
  *  - NTILE / bucket-size laws for the ranking family (the r13 bug
  *    class): exact decile allocation, running-sum consistency,
  *    head/middle/tail thirds per language;
  *  - keep ⊆ corpus, partner ∈ cluster, one-keep-per-cluster for the
  *    dedup family; dup_of acyclicity (dup_of < vec_id) and pair
  *    orientation (i < j, endpoints in corpus) for the graph shapes;
  *  - one-summary-row contracts for the audit queries.
  *
  * Checks are pure DataFrame aggregations over the query's own output
  * (collected only at summary size), so the gate runs at any tier;
  * ScaleGateSpec drives the full check list on a 3x sf0.01 derivation
  * in `sbt test`, and the [[main]] runs it at the 100x tier, writes
  * the per-invariant artifact, and exits non-zero on any violation.
  */
object ScaleGate {

  final case class Check(query: String, invariant: String, pass: Boolean,
      detail: String)

  private def ok(q: String, inv: String, detail: String = "") =
    Check(q, inv, pass = true, detail)
  private def bad(q: String, inv: String, detail: String) =
    Check(q, inv, pass = false, detail)

  private def check(q: String, inv: String, pass: Boolean, detail: String) =
    Check(q, inv, pass, detail)

  /** The queries whose output-row count is EXACTLY linear in the
    * events id-shift derivation (each replica contributes the base
    * output verbatim under shifted ids). ep_latest_state is one row
    * per user; agg_window_sliding carries its designed 2x window
    * expansion — still exactly linear.
    */
  val LinearEventQueries: Seq[String] = Seq(
    "agg_window_tumbling", "agg_window_sliding", "q_sessionize",
    "ts_interp", "ts_fill_forward", "q_scd2", "q_asof_join_custom",
    "q_anomaly_hourly", "q_range_frame", "ep_latest_state")

  /** All gated queries, in the order the main runs them. */
  def gatedQueries(extra: Seq[String] = Seq.empty): Seq[String] =
    (LinearEventQueries ++ Seq(
      "q_watermark_audit", "classify_calibration", "q_decile",
      "text_ppl_bucket", "dedup_cluster_keep", "dedup_minhash_lsh",
      "dedup_embedding_blocked", "dedup_embedding_hier",
      "corpus_dup_profile", "graph_pagerank", "graph_label_prop",
      "emb_cell_skew", "mix_kl",
      "pipeline_curate", "pipeline_curate_emb", "pipeline_shard") ++ extra)
      .distinct

  // ------------------------------------------------------------------
  // law helpers
  // ------------------------------------------------------------------

  /** Exact NTILE allocation: with n rows over `buckets` buckets,
    * bucket b holds n div buckets + 1 rows when b <= n mod buckets,
    * else n div buckets. `counts` = (bucket, n_rows), any order.
    */
  private[graft] def ntileLaw(q: String, counts: Seq[(Long, Long)],
      buckets: Int): Seq[Check] = {
    val sorted = counts.sortBy(_._1)
    val n = counts.map(_._2).sum
    val (quo, rem) = (n / buckets, n % buckets)
    val idCheck =
      check(q, s"bucket ids are exactly 1..$buckets",
        sorted.map(_._1) == (1L to buckets.toLong),
        s"got ${sorted.map(_._1).mkString(",")}")
    val sizeViolations = sorted.collect {
      case (b, c) if c != (if (b <= rem) quo + 1 else quo) =>
        s"bucket $b holds $c rows, NTILE law says ${if (b <= rem) quo + 1 else quo}"
    }
    Seq(idCheck,
      check(q, s"bucket sizes follow the exact NTILE($buckets) allocation of n=$n",
        sizeViolations.isEmpty, sizeViolations.mkString("; ")))
  }

  private def countDistinctOf(df: DataFrame, c: String): (Long, Long) = {
    val r = df.agg(count(lit(1)), count_distinct(col(c))).head()
    (r.getLong(0), r.getLong(1))
  }

  // ------------------------------------------------------------------
  // per-query invariant suites (scaled output; base only where a law
  // compares tiers)
  // ------------------------------------------------------------------

  private def checkLinearity(spark: SparkSession, q: String, baseDir: String,
      scaledDir: String, copies: Int): Seq[Check] = {
    val base = SparkEntry.queries(q)(spark, baseDir).count()
    val scaled = SparkEntry.queries(q)(spark, scaledDir).count()
    Seq(check(q, s"output rows exactly ${copies}x the base tier",
      scaled == copies * base, s"base=$base scaled=$scaled copies=$copies"))
  }

  private def checkWatermarkAudit(spark: SparkSession, baseDir: String,
      scaledDir: String, copies: Int): Seq[Check] = {
    val q = "q_watermark_audit"
    val base = SparkEntry.queries(q)(spark, baseDir)
      .select("watermark_ms", "n_late", "n_total").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val scaled = SparkEntry.queries(q)(spark, scaledDir)
      .select("watermark_ms", "n_late", "n_total").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sameKeys = check(q, "one row per candidate watermark, same candidates",
      base.keySet == scaled.keySet && base.size == 3,
      s"base=${base.keySet.toSeq.sorted} scaled=${scaled.keySet.toSeq.sorted}")
    val viol = base.toSeq.sortBy(_._1).collect {
      case (w, (late, total)) if scaled.get(w).exists(s =>
          s._1 != copies * late || s._2 != copies * total) =>
        s"w=$w base=($late,$total) scaled=${scaled(w)} copies=$copies"
    }
    Seq(sameKeys,
      check(q, s"per-watermark (n_late, n_total) scale exactly ${copies}x " +
        "(per-user disorder distribution is replica-invariant)",
        viol.isEmpty, viol.mkString("; ")))
  }

  private def checkCalibration(spark: SparkSession, dir: String): Seq[Check] = {
    val q = "classify_calibration"
    val rows = SparkEntry.queries(q)(spark, dir)
      .orderBy("decile").collect()
    val deciles = rows.map(r => (r.getLong(0), r.getLong(2))) // (decile, n_docs)
    val nPos = rows.map(_.getLong(3))
    val cumDocs = rows.map(_.getLong(4))
    val cumPos = rows.map(_.getLong(5))
    val prec = rows.map(_.getDouble(6))
    val rec = rows.map(_.getDouble(7))
    val runDocs = deciles.map(_._2).scanLeft(0L)(_ + _).tail
    val runPos = nPos.scanLeft(0L)(_ + _).tail
    ntileLaw(q, deciles.toSeq, 10) ++ Seq(
      check(q, "cum_docs/cum_pos are the exact running sums of n_docs/n_pos",
        cumDocs.sameElements(runDocs) && cumPos.sameElements(runPos),
        s"cum_docs=${cumDocs.mkString(",")} expected=${runDocs.mkString(",")}"),
      check(q, "n_pos <= n_docs per decile; precision/recall in [0,1]",
        rows.indices.forall(i => nPos(i) >= 0 && nPos(i) <= deciles(i)._2 &&
          prec(i) >= 0 && prec(i) <= 1 && rec(i) >= 0 && rec(i) <= 1),
        ""),
      check(q, "cumulative recall reaches 1.0 at the last decile",
        cumPos.lastOption.forall(p => p == 0 || rec.last == 1.0),
        s"recall_cum(10)=${rec.lastOption.getOrElse(-1.0)}"))
  }

  private def checkDecile(spark: SparkSession, dir: String): Seq[Check] = {
    val counts = SparkEntry.queries("q_decile")(spark, dir)
      .select("decile", "n_orders").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    ntileLaw("q_decile", counts, 10)
  }

  private def checkPplBucket(spark: SparkSession, dir: String): Seq[Check] = {
    val q = "text_ppl_bucket"
    val out = SparkEntry.queries(q)(spark, dir).persist()
    try {
      val (rows, distinct) = countDistinctOf(out, "doc_id")
      val docs = spark.read.parquet(s"$dir/documents.parquet").count()
      val perLang = out.groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(when(col("bucket") === "head", 1L).otherwise(0L)).as("h"),
          sum(when(col("bucket") === "middle", 1L).otherwise(0L)).as("m"),
          sum(when(col("bucket") === "tail", 1L).otherwise(0L)).as("t"))
        .collect()
      // rk*3 <= n rule: head = floor(n/3), middle = floor(2n/3) - head
      val viol = perLang.collect {
        case r if r.getLong(2) != r.getLong(1) / 3 ||
            r.getLong(3) != 2 * r.getLong(1) / 3 - r.getLong(1) / 3 ||
            r.getLong(4) != r.getLong(1) - 2 * r.getLong(1) / 3 =>
          s"lang=${r.getString(0)} n=${r.getLong(1)} " +
            s"h/m/t=${r.getLong(2)}/${r.getLong(3)}/${r.getLong(4)}"
      }
      Seq(
        check(q, "one row per document (no rank duplication or loss)",
          rows == docs && distinct == rows,
          s"rows=$rows distinct=$distinct docs=$docs"),
        check(q, "per-language head/middle/tail counts are exact thirds " +
          "(floor(n/3) / floor(2n/3)-floor(n/3) / rest)",
          viol.isEmpty, viol.mkString("; ")))
    } finally { out.unpersist(); () }
  }

  private def checkClusterKeep(spark: SparkSession, dir: String): Seq[Check] = {
    val q = "dedup_cluster_keep"
    val out = SparkEntry.queries(q)(spark, dir).persist()
    try {
      val (rows, distinct) = countDistinctOf(out, "doc_id")
      val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
      val orphans = out.join(docs, Seq("doc_id"), "left_anti").count()
      val keepLaw = out.filter(
        (col("doc_id") === col("canonical_id")) =!= col("keep")).count()
      val canonAbove = out.filter(col("canonical_id") > col("doc_id")).count()
      val partnerMissing = out.select(col("canonical_id").as("doc_id")).distinct()
        .join(out.select("doc_id"), Seq("doc_id"), "left_anti").count()
      // an empty frame is legitimate (a corpus/tier with no near-dups
      // emits nothing) and must read as a vacuous PASS, not an NPE on
      // the all-null min/max row (r14 review)
      val clusterCheck =
        if (rows == 0)
          check(q, "every cluster has >= 2 members and exactly one keeper",
            pass = true, "vacuous: no near-dup clusters at this tier")
        else {
          val st = out.groupBy("canonical_id")
            .agg(count(lit(1)).as("sz"),
              sum(when(col("keep"), 1L).otherwise(0L)).as("keeps"))
            .agg(min("sz"), min("keeps"), max("keeps")).head()
          check(q, "every cluster has >= 2 members and exactly one keeper",
            st.getLong(0) >= 2 && st.getLong(1) == 1 && st.getLong(2) == 1,
            s"min_size=${st.getLong(0)} keeps(min,max)=" +
              s"(${st.getLong(1)},${st.getLong(2)})")
        }
      Seq(
        check(q, "doc_id unique and every id in the corpus (keep ⊆ corpus)",
          rows == distinct && orphans == 0,
          s"rows=$rows distinct=$distinct orphans=$orphans"),
        check(q, "keep ⟺ doc_id = canonical_id; canonical is the cluster min",
          keepLaw == 0 && canonAbove == 0,
          s"keepLaw violations=$keepLaw canonical>doc=$canonAbove"),
        check(q, "every canonical_id is itself a cluster member (partner ∈ cluster)",
          partnerMissing == 0, s"missing=$partnerMissing"),
        clusterCheck)
    } finally { out.unpersist(); () }
  }

  private def checkMinhashPairs(spark: SparkSession, dir: String): Seq[Check] = {
    val q = "dedup_minhash_lsh"
    val out = SparkEntry.queries(q)(spark, dir).persist()
    try {
      val n = out.count()
      val misoriented = out.filter(col("i") >= col("j")).count()
      val dupPairs = n - out.select("i", "j").distinct().count()
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"))
      val orphanEnds = out.select(col("i").as("doc_id"))
        .unionByName(out.select(col("j").as("doc_id")))
        .join(docs, Seq("doc_id"), "left_anti").count()
      Seq(
        check(q, "pairs are oriented i < j and distinct",
          misoriented == 0 && dupPairs == 0,
          s"misoriented=$misoriented duplicated=$dupPairs of $n"),
        check(q, "both pair endpoints are corpus documents",
          orphanEnds == 0, s"orphan endpoints=$orphanEnds"))
    } finally { out.unpersist(); () }
  }

  /** Shared by dedup_embedding_blocked AND dedup_embedding_hier —
    * stages 2-3 are literally the same code (bandedPruneFrom), so the
    * verdict-frame laws are identical; gating both means the
    * 1e9-tier hier assignment path is law-checked too.
    */
  private def checkBlocked(spark: SparkSession, dir: String,
      q: String): Seq[Check] = {
    val out = SparkEntry.queries(q)(spark, dir).persist()
    try {
      val (rows, distinct) = countDistinctOf(out, "vec_id")
      val dupOfLaw = out.filter(
        col("dup_of").isNull =!= col("keep_dup")).count()
      val cyclic = out.filter(col("dup_of").isNotNull &&
        col("dup_of") >= col("vec_id")).count()
      val orphanDupOf = out.filter(col("dup_of").isNotNull)
        .select(col("dup_of").as("vec_id"))
        .join(out.select("vec_id"), Seq("vec_id"), "left_anti").count()
      val keepImplies = out.filter(col("keep") && !col("keep_dup")).count()
      Seq(
        check(q, "vec_id unique (one verdict row per corpus vector)",
          rows == distinct, s"rows=$rows distinct=$distinct"),
        check(q, "dup_of present ⟺ not first-copy survivor (keep_dup)",
          dupOfLaw == 0, s"violations=$dupOfLaw"),
        check(q, "dup_of < vec_id (first-copy-wins is acyclic)",
          cyclic == 0, s"violations=$cyclic"),
        check(q, "dup_of points at a row of the verdict frame (partner ∈ corpus)",
          orphanDupOf == 0, s"orphans=$orphanDupOf"),
        check(q, "keep ⇒ keep_dup (SemDeDup prunes only among survivors)",
          keepImplies == 0, s"violations=$keepImplies"))
    } finally { out.unpersist(); () }
  }

  /** corpus_dup_profile algebra: per row n_docs = cluster_size x
    * n_clusters; the profile ACCOUNTS FOR the whole corpus (sum of
    * n_docs = documents count — the singleton row is defined as the
    * unclustered remainder, so a drift in either side breaks this);
    * one row per cluster_size; sizes >= 1 with counts >= 0.
    */
  private def checkDupProfile(spark: SparkSession, dir: String): Seq[Check] = {
    val q = "corpus_dup_profile"
    val rows = SparkEntry.queries(q)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    val badAlgebra = rows.collect {
      case (sz, nc, nd) if nd != sz * nc || sz < 1 || nc < 0 =>
        s"size=$sz clusters=$nc docs=$nd"
    }
    Seq(
      check(q, "per-row algebra: n_docs = cluster_size x n_clusters, sizes >= 1",
        badAlgebra.isEmpty, badAlgebra.mkString("; ")),
      check(q, "one row per cluster size",
        rows.map(_._1).distinct.length == rows.length,
        s"sizes=${rows.map(_._1).sorted.mkString(",")}"),
      check(q, "the profile accounts for every corpus document (sum n_docs = corpus)",
        rows.map(_._3).sum == docs,
        s"sum=${rows.map(_._3).sum} corpus=$docs"))
  }

  /** graph_pagerank laws from the fixed-point arithmetic itself:
    * every node holds at least the teleport floor (0.15e9 in the
    * 1e9-scale integers), the double column is exactly rank9/1e9,
    * total rank never exceeds n (integer floor division only LOSES
    * mass, never creates it), and the node set is corpus documents.
    */
  private def checkPagerank(spark: SparkSession, dir: String): Seq[Check] = {
    val q = "graph_pagerank"
    val out = SparkEntry.queries(q)(spark, dir).persist()
    try {
      val (rows, distinct) = countDistinctOf(out, "doc_id")
      val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
      val orphans = out.join(docs, Seq("doc_id"), "left_anti").count()
      val belowFloor = out.filter(col("rank9") < 150000000L).count()
      val inconsistent = out.filter(
        col("rank") =!= col("rank9").cast("double") / 1e9).count()
      val total = if (rows == 0) 0L
        else out.agg(sum(col("rank9"))).head().getLong(0)
      Seq(
        check(q, "one row per graph node, nodes ⊆ corpus",
          rows == distinct && orphans == 0,
          s"rows=$rows distinct=$distinct orphans=$orphans"),
        check(q, "every rank >= the teleport floor; rank = rank9 / 1e9 exactly",
          belowFloor == 0 && inconsistent == 0,
          s"below_floor=$belowFloor inconsistent=$inconsistent"),
        check(q, "total rank <= n (integer floor division only loses mass)",
          total <= rows * 1000000000L,
          s"total9=$total n*1e9=${rows * 1000000000L}"))
    } finally { out.unpersist(); () }
  }

  /** graph_label_prop: communities are node-labelled — every assigned
    * community id is itself a node of the output (the min-label
    * propagation can only ever assign an EXISTING node's id), one row
    * per node, nodes ⊆ corpus.
    */
  private def checkLabelProp(spark: SparkSession, dir: String): Seq[Check] = {
    val q = "graph_label_prop"
    val out = SparkEntry.queries(q)(spark, dir).persist()
    try {
      val (rows, distinct) = countDistinctOf(out, "doc_id")
      val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
      val orphans = out.join(docs, Seq("doc_id"), "left_anti").count()
      val ghostCommunities = out.select(col("community").as("doc_id")).distinct()
        .join(out.select("doc_id"), Seq("doc_id"), "left_anti").count()
      Seq(
        check(q, "one row per graph node, nodes ⊆ corpus",
          rows == distinct && orphans == 0,
          s"rows=$rows distinct=$distinct orphans=$orphans"),
        check(q, "every community id is itself a node (labels ∈ node set)",
          ghostCommunities == 0, s"ghost communities=$ghostCommunities"))
    } finally { out.unpersist(); () }
  }

  private def checkCellSkew(spark: SparkSession, dir: String): Seq[Check] = {
    val q = "emb_cell_skew"
    val rows = SparkEntry.queries(q)(spark, dir).collect()
    val oneRow = check(q, "exactly one summary row by contract",
      rows.length == 1, s"rows=${rows.length}")
    if (rows.length != 1) Seq(oneRow)
    else {
      val r = rows(0)
      val (cells, nVecs, maxOcc, minOcc) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (avg, skew) = (r.getDouble(4), r.getDouble(5))
      Seq(oneRow,
        check(q, "occupancy algebra: min <= avg <= max, skew = max/avg >= 1",
          cells > 0 && nVecs > 0 && minOcc <= maxOcc &&
            minOcc <= avg && avg <= maxOcc &&
            math.abs(skew - maxOcc * cells.toDouble / nVecs) < 1e-9 &&
            skew >= 1.0 - 1e-9,
          s"cells=$cells n_vecs=$nVecs max=$maxOcc min=$minOcc avg=$avg skew=$skew"))
    }
  }

  private def checkMixKl(spark: SparkSession, baseDir: String,
      scaledDir: String, copies: Int): Seq[Check] = {
    val q = "mix_kl"
    val rows = SparkEntry.queries(q)(spark, scaledDir).collect()
    val oneRow = check(q, "exactly one summary row by contract",
      rows.length == 1, s"rows=${rows.length}")
    if (rows.length != 1) Seq(oneRow)
    else {
      val baseDocs = spark.read.parquet(s"$baseDir/documents.parquet").count()
      val r = rows(0)
      Seq(oneRow,
        check(q, s"n_docs is exactly ${copies}x the base corpus; KL >= 0",
          r.getLong(1) == copies * baseDocs && r.getDouble(2) >= -1e-12,
          s"n_docs=${r.getLong(1)} base=$baseDocs kl=${r.getDouble(2)}"))
    }
  }

  private def checkCurate(spark: SparkSession, dir: String): Seq[Check] = {
    val q = "pipeline_curate"
    val out = SparkEntry.queries(q)(spark, dir).persist()
    try {
      val (rows, distinct) = countDistinctOf(out, "doc_id")
      val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
      val orphans = out.join(docs, Seq("doc_id"), "left_anti").count()
      val badQuality = out.filter(col("quality_score") < 0.5).count()
      Seq(
        check(q, "train shard ⊆ corpus, one row per kept doc",
          rows == distinct && orphans == 0,
          s"rows=$rows distinct=$distinct orphans=$orphans"),
        check(q, "every kept doc clears the quality gate (score >= 0.5)",
          badQuality == 0, s"violations=$badQuality"))
    } finally { out.unpersist(); () }
  }

  private def checkCurateEmb(spark: SparkSession, dir: String): Seq[Check] = {
    val q = "pipeline_curate_emb"
    val out = SparkEntry.queries(q)(spark, dir).persist()
    try {
      val (rows, distinct) = countDistinctOf(out, "vec_id")
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id")
      val orphans = out.join(vecs, Seq("vec_id"), "left_anti").count()
      val cosRange = out.filter(col("cos_centroid") < -1.0 - 1e-9 ||
        col("cos_centroid") > 1.0 + 1e-9).count()
      Seq(
        check(q, "kept slice ⊆ raw train vectors, one row per kept vector",
          rows == distinct && orphans == 0,
          s"rows=$rows distinct=$distinct orphans=$orphans"),
        check(q, "audit cosine in [-1, 1]",
          cosRange == 0, s"violations=$cosRange"))
    } finally { out.unpersist(); () }
  }

  /** Run every gated invariant for `family` (defaults to all gated
    * queries present in the registry — pipeline_shard joins the list
    * when registered).
    */
  def checksFor(spark: SparkSession, baseDir: String, scaledDir: String,
      copies: Int, family: Seq[String],
      onCheck: Check => Unit = _ => ()): Seq[Check] =
    family.flatMap { q =>
      val run: Seq[Check] =
        try q match {
          case _ if LinearEventQueries.contains(q) =>
            checkLinearity(spark, q, baseDir, scaledDir, copies)
          case "q_watermark_audit" =>
            checkWatermarkAudit(spark, baseDir, scaledDir, copies)
          case "classify_calibration" => checkCalibration(spark, scaledDir)
          case "q_decile" => checkDecile(spark, scaledDir)
          case "text_ppl_bucket" => checkPplBucket(spark, scaledDir)
          case "dedup_cluster_keep" => checkClusterKeep(spark, scaledDir)
          case "dedup_minhash_lsh" => checkMinhashPairs(spark, scaledDir)
          case "dedup_embedding_blocked" | "dedup_embedding_hier" =>
            checkBlocked(spark, scaledDir, q)
          case "corpus_dup_profile" => checkDupProfile(spark, scaledDir)
          case "graph_pagerank" => checkPagerank(spark, scaledDir)
          case "graph_label_prop" => checkLabelProp(spark, scaledDir)
          case "emb_cell_skew" => checkCellSkew(spark, scaledDir)
          case "mix_kl" => checkMixKl(spark, baseDir, scaledDir, copies)
          case "pipeline_curate" => checkCurate(spark, scaledDir)
          case "pipeline_curate_emb" => checkCurateEmb(spark, scaledDir)
          case "pipeline_shard" => operators.Curate.shardChecksFor(
            spark, scaledDir).map { case (inv, pass, det) =>
              check(q, inv, pass, det) }
          case other =>
            Seq(bad(other, "gated query has an invariant suite",
              s"no invariant suite registered for $other"))
        } catch {
          case scala.util.control.NonFatal(e) =>
            Seq(bad(q, "query executes at the gated tier",
              s"${e.getClass.getSimpleName}: ${e.getMessage}"))
        }
      // the persists above (and the ranking queries' internal
      // materialize-once layouts) must not accumulate across the gate
      spark.catalog.clearCache()
      run.foreach(onCheck)
      run
    }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale100")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "100").toInt
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
    ScaleCorpus.ensure(spark, src, out, copies)

    val family = sys.env.get("SPARK_GRAFT_GATE_FAMILY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(gatedQueries().filter(SparkEntry.queries.contains))
    val unknown = family.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"gate family names not in the registry: " +
      unknown.mkString(", "))

    // per-query streaming progress: a 100x run takes tens of minutes,
    // and an all-at-the-end dump would hide where a hang or OOM landed
    val checks = checksFor(spark, src, out, copies, family, c =>
      System.err.println(
        s"[gate] ${if (c.pass) "PASS" else "FAIL"} ${c.query}: ${c.invariant}" +
          (if (c.detail.nonEmpty) s" (${c.detail})" else "")))
    // Full JSON string escape incl. control chars (r14 review): the
    // failure path puts e.getMessage into detail, and Spark exception
    // messages are routinely multi-line - a raw newline would make the
    // artifact unparseable exactly when it carries failure evidence
    // (the Verify.q escaper rule).
    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val json = checks.map(c =>
      s"""{"query":"${c.query}","invariant":"${esc(c.invariant)}","pass":${c.pass},"detail":"${esc(c.detail)}"}""")
      .mkString(
        s"""{"copies":$copies,"base":"$src","scaled":"$out","n_checks":${checks.size},"n_failed":${checks.count(!_.pass)},"checks":[""",
        ",\n", "]}")
    println(json)
    sys.env.get("SPARK_GRAFT_GATE_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
    if (checks.exists(!_.pass)) sys.exit(1)
  }
}
