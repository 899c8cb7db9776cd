package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the flagship composition:
  * quality scoring -> language ID -> duplicate-cluster removal (keep
  * the canonical doc of each near-dup cluster) -> within-doc
  * repetition gate -> benchmark-decontamination (the eval slice
  * itself AND every doc sharing a 5-gram with it are both excluded —
  * eval documents must never train) -> deterministic train split. The per-doc scores are computed in one
  * select over a single documents scan (shared Column builders with
  * the standalone oracle-verified queries); the dedup, repetition and
  * contamination branches join in — the whole thing is shuffle-
  * bounded by its dedup step.
  *
  * This is the query a user of the engine actually ships: "give me
  * the deduplicated, quality-filtered, decontaminated train shard of
  * this corpus."
  */
object Curate {

  private val MaxDupShingleFrac = 0.5

  /** [[curate]] body over an injectable keep-decision frame — the
    * seam [[Shared]] uses to feed a pre-computed pair graph's keep
    * decision into the pipeline instead of recomputing the whole
    * jaccard+CC branch; the registered query passes the fresh one.
    */
  private[operators] def curateFrom(
      s: org.apache.spark.sql.SparkSession, d: String,
      dupsIn: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      // All per-doc scores in ONE select over one documents scan
      // (shared Column builders, same expressions the standalone
      // queries verify); the branch pipelines join in.
      val scored = Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.predictedLangCol(col("text")).as("predicted_lang"),
        TextAnalysis.qualityScoreCol(col("text")).as("quality_score"),
        Sampling.splitCol(col("text")).as("split"))
      val dups = dupsIn
        .select(col("doc_id"), col("keep"))
      val rep = TextAnalysis.repetition.fn(s, d)
        .select(col("doc_id"), col("dup_shingle_frac"))
      // exclude only the realistic 5-gram leakage hits: the 3-gram
      // level over-flags common phrasing (see Contamination scaladoc).
      // contaminatedDocIds(5) is the membership-only screen — the full
      // decontaminate query would also pay the 3-gram join and the
      // overlap-count aggregates this pipeline discards.
      val contaminated = Contamination.contaminatedDocIds(s, d, 5)
      scored
        .join(dups, Seq("doc_id"), "left")
        .join(rep, Seq("doc_id"), "left")
        .join(contaminated, Seq("doc_id"), "left_anti")  // eval-leakage screen
        // the benchmark slice itself never trains — it IS the eval set
        .filter(col("doc_id") % Contamination.BenchMod =!= 0)
        .filter(col("keep").isNull || col("keep"))       // canonical docs only
        .filter(col("quality_score") >= 0.5)             // quality gate
        .filter(coalesce(col("dup_shingle_frac"), lit(0.0)) < MaxDupShingleFrac)
        .filter(col("split") === "train")                // train shard
        .select("doc_id", "predicted_lang", "quality_score")
  }

  val curate = QueryDef(
    "pipeline_curate",
    (s, d) => curateFrom(s, d, Dedup.clusterKeep.fn(s, d)),
    Some {
      // Compose the component oracles as subqueries — each is the
      // exact SQL already hash-verified on its own.
      val qualitySql = TextAnalysis.quality.oracle.get
      val langSql = TextAnalysis.langId.oracle.get
      val dupsSql = Dedup.clusterKeep.oracle.get
      val splitSql = Sampling.hashSplit.oracle.get
      val repSql = TextAnalysis.repetition.oracle.get
      val decontSql = Contamination.decontaminate.oracle.get
      s"""SELECT d.doc_id, l.predicted_lang, q.quality_score
    FROM documents d
    JOIN ($qualitySql) q ON q.doc_id = d.doc_id
    JOIN ($langSql) l ON l.doc_id = d.doc_id
    JOIN ($splitSql) sp ON sp.doc_id = d.doc_id
    LEFT JOIN ($dupsSql) dup ON dup.doc_id = d.doc_id
    LEFT JOIN ($repSql) r ON r.doc_id = d.doc_id
    LEFT JOIN ($decontSql) c ON c.doc_id = d.doc_id AND c.n5_shingles_shared > 0
    WHERE (dup.keep IS NULL OR dup.keep)
      AND q.quality_score >= 0.5
      AND COALESCE(r.dup_shingle_frac, 0.0) < $MaxDupShingleFrac
      AND c.doc_id IS NULL
      AND d.doc_id % ${Contamination.BenchMod} <> 0
      AND sp.split = 'train'
    ORDER BY d.doc_id"""
    })

  /** [[curate]] hardened with the model-based gate: the NB margin
    * ([[Select.nbClassify]]) must CONFIRM the rule-based quality
    * score — the fastText-filter composition every production corpus
    * pipeline runs (rules prune the obvious, the classifier prunes
    * what rules can't see). Keeps each surviving doc's margin so the
    * downstream mixer can weight by classifier confidence.
    *
    * Scale: one extra doc_id equi-join over [[curate]]'s plan; the NB
    * branch's model state is vocabulary-sized (see Select). The
    * composed oracle joins the two independently hash-verified
    * subquery oracles, so a drift in EITHER branch fails the gate.
    */
  /** [[curateNb]] body over an injectable keep-decision frame — the
    * [[Shared]] seam, exactly as [[curateFrom]].
    */
  private[operators] def curateNbFrom(
      s: org.apache.spark.sql.SparkSession, d: String,
      dupsIn: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val nb = Select.nbClassify.fn(s, d)
      .select(col("doc_id"), col("nb_margin"), col("nb_pred"))
    curateFrom(s, d, dupsIn)
      .join(nb, Seq("doc_id"))
      .filter(col("nb_pred"))
      .select("doc_id", "predicted_lang", "quality_score", "nb_margin")
  }

  val curateNb = QueryDef(
    "pipeline_curate_nb",
    (s, d) => curateNbFrom(s, d, Dedup.clusterKeep.fn(s, d)),
    Some {
      val curateSql = curate.oracle.get
      val nbSql = Select.nbClassify.oracle.get
      s"""SELECT c.doc_id, c.predicted_lang, c.quality_score, n.nb_margin
    FROM ($curateSql) c JOIN ($nbSql) n ON n.doc_id = c.doc_id
    WHERE n.nb_pred ORDER BY c.doc_id"""
    })

  /** [[curateEmb]] body over injectable component frames — the
    * [[Shared.EmbFamilySession]] seam (the session passes the blocked
    * stages over its cached corpus scan and the decontamination over
    * its cached pair stream); the registered query passes fresh ones.
    */
  private[operators] def curateEmbFrom(
      blockedIn: org.apache.spark.sql.DataFrame,
      deconIn: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val keep = blockedIn.filter(col("keep"))
      .select(col("vec_id"), col("cell"), col("cos_centroid"))
    deconIn.filter(!col("contaminated"))
      .select(col("vec_id"), col("label"))
      .join(keep, Seq("vec_id"))
      .select("vec_id", "label", "cell", "cos_centroid")
  }

  /** The EMBEDDING-side flagship composition — the counterpart of
    * [[curate]] for a vector corpus, closing the gap that the text
    * side had a composed end-to-end proof (D16) while the embedding
    * side's components (registered blocked dedup D5d, embedding
    * decontamination D66, SemDeDup prune — D5d's own stage 3) were
    * only verified separately: "give me the deduplicated,
    * decontaminated training slice of this embedding corpus."
    *
    * Gates, each the literal registered component:
    *  1. CANONICAL + PRUNED ([[Similarity.blockedStages]], the
    *     registered 100-TB default): survivor of in-cell near-dup
    *     first-copy-wins AND of the SemDeDup dominance prune
    *     (`keep`) — over the family's augmentedHi benchmark corpus,
    *     restricted back to raw train ids by the decontamination join.
    *  2. UNCONTAMINATED ([[Similarity.decontaminateEmbedding]]): in
    *     the train slice (never the benchmark slice itself) and no
    *     benchmark vector within SemTau in its label block.
    *
    * Output: surviving train vectors with their audit columns
    * (label, Lloyd cell, centroid cosine) — the mixer's input, like
    * [[curate]]'s (lang, quality) row. The composed oracle joins the
    * two independently hash-verified component oracles, so drift in
    * EITHER component breaks this gate too.
    *
    * Scale: one vec_id equi-join over the two component plans — both
    * 100x-proven; the composition adds no new shuffle class. NOT
    * name-routed by [[graft.GraftSession]]: its dominant branch is the
    * blocked path, whose session routing was built and measured SLOWER
    * (r10 ReuseBench — Lloyd assignment, not the scan, dominates); the
    * [[Shared.EmbFamilySession.curatedEmb]] seam stays available for
    * callers whose caches are already hot.
    */
  val curateEmb = QueryDef(
    "pipeline_curate_emb",
    (s, d) => curateEmbFrom(
      Similarity.blockedStages(s, d)._1,
      Similarity.decontaminateEmbedding.fn(s, d)),
    Some {
      val blockedSql = Similarity.dedupEmbeddingBlocked.oracle.get
      val deconSql = Similarity.decontaminateEmbedding.oracle.get
      s"""SELECT t.vec_id, t.label, b.cell, b.cos_centroid
    FROM ($deconSql) t JOIN ($blockedSql) b ON b.vec_id = t.vec_id
    WHERE NOT t.contaminated AND b.keep
    ORDER BY t.vec_id"""
    })

  val defs: Seq[QueryDef] = Seq(curate, curateNb, curateEmb)
}
