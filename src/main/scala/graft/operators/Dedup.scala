package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication family over `documents`.
  *
  * Candidate generation NEVER cross-joins: every variant derives a
  * join key (content hash, shared shingle, LSH band, hamming bucket)
  * and pairs via equi-join, so at 100 TB the cost is one shuffle on
  * the key plus the (data-bounded) candidate pairs — the standard
  * distributed-dedup shape.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest doc_id.
    * At scale this is a single hash shuffle on a 128-bit key.
    */
  val exact = QueryDef(
    "dedup_exact",
    (s, d) => {
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("content_md5"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("content_md5")
    },
    Some("""SELECT md5(text) AS content_md5, min(doc_id) AS keep_id,
      COUNT(*) AS n_copies
    FROM documents GROUP BY 1 ORDER BY content_md5"""))

  /** Exact word-3-shingle Jaccard near-dup pairs (tau = 0.5).
    *
    * Distributed shape: explode distinct shingles, self-equi-join on
    * the shingle (blocking — only docs sharing a shingle ever meet),
    * count shared shingles per pair, then |A inter B| / |A union B|.
    * The (i < j) predicate halves the join output; the group-by is a
    * map-side-combinable count.
    */
  private val JaccardTau = 0.5

  /** Distinct word-3-shingles per doc as 64-bit keys, with per-doc
    * shingle-set size attached.
    *
    * Shape chosen after profiling: split once + posexplode + window
    * `lead` builds each shingle exactly once per position. The naive
    * `transform(sequence, i -> element_at(split(text), i))` form
    * re-evaluates `split` for every element access (CollapseProject
    * inlines it) and was ~6x slower end-to-end. Shingles are collapsed
    * to xxhash64 keys immediately so every downstream shuffle carries
    * 8-byte keys instead of ~30-char strings; the 64-bit collision
    * odds (~n_shingles^2 / 2^64) are negligible and any false merge
    * would surface in the oracle compare.
    */
  private def shingleKeys(s: org.apache.spark.sql.SparkSession, d: String) = {
    import org.apache.spark.sql.expressions.Window
    val wspec = Window.partitionBy("doc_id").orderBy("pos")
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .select(col("doc_id"),
        concat_ws(" ", col("w"), lead("w", 1).over(wspec), lead("w", 2).over(wspec)).as("g0"),
        lead("w", 2).over(wspec).as("guard"))
      .filter(col("guard").isNotNull)
      .select(col("doc_id"), xxhash64(col("g0")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("_c")).drop("_c")
      .withColumn("n_sh", count(lit(1)).over(Window.partitionBy("doc_id")))
  }

  val ngramJaccard = QueryDef(
    "dedup_ngram_jaccard",
    (s, d) => {
      // Blocking self-equi-join on the shingle key: only docs sharing
      // a shingle ever meet; |A inter B| falls out of the pair count,
      // so no array payloads cross the shuffle.
      val sh = shingleKeys(s, d)
      val a = sh.select(col("g"), col("doc_id").as("i"), col("n_sh").as("ni"))
      val b = sh.select(col("g"), col("doc_id").as("j"), col("n_sh").as("nj"))
      a.join(b, Seq("g")).filter(col("i") < col("j"))
        .groupBy("i", "j", "ni", "nj").agg(count(lit(1)).as("n_common"))
        .withColumn("jaccard",
          col("n_common").cast(DoubleType) / (col("ni") + col("nj") - col("n_common")))
        .filter(col("jaccard") >= JaccardTau)
        .select("i", "j", "n_common", "jaccard")
        .orderBy("i", "j")
    },
    Some(s"""WITH sh AS (
      SELECT doc_id, list_distinct(${TextAnalysis.shinglesSql("text")}) AS s
      FROM documents),
    ex AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle FROM sh),
    pairs AS (
      SELECT a.doc_id AS i, b.doc_id AS j, a.n_sh AS ni, b.n_sh AS nj,
             COUNT(*) AS n_common
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4)
    SELECT i, j, n_common,
      CAST(n_common AS DOUBLE) / (ni + nj - n_common) AS jaccard
    FROM pairs
    WHERE CAST(n_common AS DOUBLE) / (ni + nj - n_common) >= 0.5
    ORDER BY i, j"""))

  val defs: Seq[QueryDef] = Seq(exact, ngramJaccard)
}
