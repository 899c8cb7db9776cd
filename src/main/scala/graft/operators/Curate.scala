package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the flagship composition:
  * quality scoring -> language ID -> duplicate-cluster removal (keep
  * the canonical doc of each near-dup cluster) -> deterministic
  * train split. One declarative plan: Catalyst fuses the per-doc
  * scoring into a single pass over documents, and the dedup branch is
  * the already-blocking pair pipeline — the whole thing is 100%
  * shuffle-bounded by its dedup step.
  *
  * This is the query a user of the engine actually ships: "give me
  * the deduplicated, quality-filtered train shard of this corpus."
  */
object Curate {

  val curate = QueryDef(
    "pipeline_curate",
    (s, d) => {
      val quality = TextAnalysis.quality.fn(s, d)
        .select("doc_id", "quality_score")
      val lang = TextAnalysis.langId.fn(s, d)
        .select("doc_id", "predicted_lang")
      val dups = Dedup.clusterKeep.fn(s, d)
        .select(col("doc_id"), col("keep"))
      val split = Sampling.hashSplit.fn(s, d)
        .select("doc_id", "split")
      Tables.documents(s, d).select("doc_id")
        .join(quality, "doc_id")
        .join(lang, "doc_id")
        .join(split, "doc_id")
        .join(broadcast(dups), Seq("doc_id"), "left")
        .filter(col("keep").isNull || col("keep"))       // canonical docs only
        .filter(col("quality_score") >= 0.5)             // quality gate
        .filter(col("split") === "train")                // train shard
        .select("doc_id", "predicted_lang", "quality_score")
        .orderBy("doc_id")
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
