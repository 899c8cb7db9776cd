package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the flagship composition:
  * quality scoring -> language ID -> duplicate-cluster removal (keep
  * the canonical doc of each near-dup cluster) -> deterministic
  * train split. The three per-doc scores are computed in one select
  * over a single documents scan (shared Column builders with the
  * standalone oracle-verified queries); the dedup branch is the
  * already-blocking pair pipeline — the whole thing is shuffle-
  * bounded by its dedup step.
  *
  * This is the query a user of the engine actually ships: "give me
  * the deduplicated, quality-filtered train shard of this corpus."
  */
object Curate {

  val curate = QueryDef(
    "pipeline_curate",
    (s, d) => {
      // All per-doc scores in ONE select over one documents scan
      // (shared Column builders, same expressions the standalone
      // queries verify); only the dedup branch joins in.
      val scored = Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.predictedLangCol(col("text")).as("predicted_lang"),
        TextAnalysis.qualityScoreCol(col("text")).as("quality_score"),
        Sampling.splitCol(col("text")).as("split"))
      val dups = Dedup.clusterKeep.fn(s, d)
        .select(col("doc_id"), col("keep"))
      scored
        .join(dups, Seq("doc_id"), "left")
        .filter(col("keep").isNull || col("keep"))       // canonical docs only
        .filter(col("quality_score") >= 0.5)             // quality gate
        .filter(col("split") === "train")                // train shard
        .select("doc_id", "predicted_lang", "quality_score")
    },
    Some {
      // Compose the component oracles as subqueries — each is the
      // exact SQL already hash-verified on its own.
      val qualitySql = TextAnalysis.quality.oracle.get
      val langSql = TextAnalysis.langId.oracle.get
      val dupsSql = Dedup.clusterKeep.oracle.get
      val splitSql = Sampling.hashSplit.oracle.get
      s"""SELECT d.doc_id, l.predicted_lang, q.quality_score
    FROM documents d
    JOIN ($qualitySql) q ON q.doc_id = d.doc_id
    JOIN ($langSql) l ON l.doc_id = d.doc_id
    JOIN ($splitSql) sp ON sp.doc_id = d.doc_id
    LEFT JOIN ($dupsSql) dup ON dup.doc_id = d.doc_id
    WHERE (dup.keep IS NULL OR dup.keep)
      AND q.quality_score >= 0.5
      AND sp.split = 'train'
    ORDER BY d.doc_id"""
    })

  val defs: Seq[QueryDef] = Seq(curate)
}
