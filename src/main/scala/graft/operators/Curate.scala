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

  val defs: Seq[QueryDef] = Seq(curate, curateNb)
}
