package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-level subplan sharing for pipelines that consume the same
  * expensive intermediate. The flagship case (SURVEY §8): the near-dup
  * PAIR GRAPH is the costliest branch of both `dedup_cluster_keep`
  * and `pipeline_curate` — a session running both should compute the
  * jaccard blocking join once, not twice.
  *
  * Deliberately an OPT-IN API rather than a hidden cache inside the
  * registered queries: the driver's Verify/Bench treat each query as
  * independent, and silently memoizing across queries would make the
  * second one benchmark as nearly free — the honest default stays
  * recompute-per-query, and a session that wants reuse says so:
  *
  * {{{
  *   val sh = Shared.pairGraph(spark, sfDir)
  *   try {
  *     val keep  = sh.clusterKeep     // CC over the cached pairs
  *     val train = sh.curated         // full curation, same cached pairs
  *   } finally sh.release()
  * }}}
  *
  * Persistence is MEMORY_AND_DISK: the pair graph after blocking is
  * tiny relative to the corpus (near-dup pairs only), so on a cluster
  * this is a few MB per executor, not a second copy of the data.
  *
  * WHEN TO HOIST (measured at sf0.1 AND on the 100x rehearsal tier,
  * SCALE100_r09.json): a session pays one materialization of the
  * shared artifact to save (consumers - 1) recomputes, so it wins
  * only when enough consumers share it. The full 7-member ngram
  * family saves 52% at sf0.1 and 86% at 100x (the materialization
  * amortizes better as recomputes get more expensive); a 2-member
  * slice of the same family is 22% SLOWER at 100x, and a single-
  * member "session" is pure overhead (up to 2.9x). Rule of thumb: 3+
  * consumers of the same cached artifact, never one.
  */
object Shared {

  final class PairGraphSession private[Shared] (
      spark: SparkSession, sfDir: String) {

    /** The near-dup pair graph (i < j), computed once and persisted on
      * first action.
      */
    val pairs: DataFrame = Dedup.ngramJaccard.fn(spark, sfDir)
      .select("i", "j")
      .persist(StorageLevel.MEMORY_AND_DISK)

    /** Canonical keep decision over the cached pairs — same result as
      * the registered `dedup_cluster_keep` (spec-asserted). A lazy
      * val, not a def: the CC driver loop is EAGER (it runs its
      * join+checkpoint rounds at first access), so re-deriving it per
      * consumer would re-run the whole loop — `curated` reuses this
      * instance's checkpointed result.
      */
    lazy val clusterKeep: DataFrame = Dedup.clusterKeepFrom(pairs)

    /** Full curation pipeline over the cached pairs — same result as
      * the registered `pipeline_curate` (spec-asserted).
      */
    def curated: DataFrame = Curate.curateFrom(spark, sfDir, clusterKeep)

    /** NB-gated curation over the cached pairs — same result as the
      * registered `pipeline_curate_nb` (spec-asserted).
      */
    def curatedNb: DataFrame = Curate.curateNbFrom(spark, sfDir, clusterKeep)

    /** Triangle cluster-quality diagnostic over the cached pairs —
      * same result as the registered `graph_triangles` (spec-asserted).
      */
    def triangles: DataFrame = Graph.trianglesFrom(pairs)

    /** Drop the cached pairs (idempotent). */
    def release(): Unit = pairs.unpersist()
  }

  /** Start a shared-pair-graph session over `sfDir`. */
  def pairGraph(spark: SparkSession, sfDir: String): PairGraphSession =
    new PairGraphSession(spark, sfDir)

  /** The embedding-space analogue of [[PairGraphSession]]: the
    * banded-LSH near-dup pair graph (`dedup_embedding`'s candidate
    * join + exact-cosine verify — the costliest embedding branch) is
    * computed once; the CC keep decision and any of the generic graph
    * diagnostics (triangles, PageRank, label propagation — all of
    * which accept an injectable pair frame) run over the cache.
    */
  final class EmbPairSession private[Shared] (
      spark: SparkSession, sfDir: String) {

    /** Verified near-dup pairs (i < j, cosine >= tau), persisted on
      * first action.
      */
    val pairs: DataFrame = Similarity.dedupEmbedding.fn(spark, sfDir)
      .persist(StorageLevel.MEMORY_AND_DISK)

    /** CC keep over the cached pairs — same result as the registered
      * `dedup_embedding_keep` (spec-asserted). Lazy for the same
      * reason as [[PairGraphSession.clusterKeep]]: the CC loop is
      * eager at first access.
      */
    lazy val keep: DataFrame = Similarity.embKeepFrom(pairs)

    /** Cluster-quality triangle census over the cached pairs. */
    def triangles: DataFrame = Graph.trianglesFrom(pairs)

    /** Authority ranking over the cached pairs. */
    def pageRank: DataFrame = Graph.pageRankFrom(pairs)

    /** Community detection over the cached pairs. */
    def labelProp: DataFrame = Graph.labelPropFrom(pairs)

    /** Drop the cached pairs (idempotent). */
    def release(): Unit = pairs.unpersist()
  }

  /** Start a shared embedding-pair-graph session over `sfDir`. */
  def embPairGraph(spark: SparkSession, sfDir: String): EmbPairSession =
    new EmbPairSession(spark, sfDir)

  /** The label-blocked embedding family's shared state: five
    * registered queries (`dedup_semantic_prune`, `emb_knn_graph`,
    * `mine_hard_negatives`, `knn_score_diffusion`,
    * `decontaminate_embedding`) each standalone re-derive the same
    * quantized corpus scan and the same within-cluster scored pair
    * stream (the O(b²)-per-cell label equi-join — their dominant
    * cost). A session computes both ONCE; every member is the exact
    * registered query body over the cache
    * ([[Similarity.labelPairsFrom]] is the single source of truth for
    * both paths, so parity is by construction and
    * GraftSessionSpec-asserted).
    */
  final class EmbFamilySession private[Shared] (
      spark: SparkSession, sfDir: String) {

    /** Quantized (vec_id, label, qa, na) — every member's base scan. */
    val emb: DataFrame = Similarity.quantized(spark, sfDir)
      .persist(StorageLevel.MEMORY_AND_DISK)

    /** The within-cluster scored pair stream, computed once. */
    val pairs: DataFrame = Similarity.labelPairsFrom(emb)
      .persist(StorageLevel.MEMORY_AND_DISK)

    /** Per-vector centroid cosines (only [[semanticPrune]] and
      * `emb_centroid` need them — lazy so the other members never pay
      * the centroid aggregate).
      */
    private var ccInit = false
    lazy val cc: DataFrame = {
      ccInit = true
      Similarity.centroidCosFrom(emb)
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

    /** Same rows as registered `dedup_semantic_prune`. */
    def semanticPrune: DataFrame = Similarity.semanticPruneFrom(cc, pairs)

    /** Same rows as registered `emb_centroid`. */
    def centroid: DataFrame = cc.select("vec_id", "label", "cos_centroid")

    /** Same rows as registered `mine_hard_negatives`. */
    def hardNegatives: DataFrame = Similarity.hardNegativesFrom(pairs)

    /** Same rows as registered `emb_knn_graph`. */
    def knn: DataFrame = Similarity.knnFrom(pairs)

    /** Same rows as registered `knn_score_diffusion`. */
    def diffusion: DataFrame = Similarity.diffusionFrom(spark, sfDir, knn)

    /** Same rows as registered `decontaminate_embedding`. */
    def decontaminate: DataFrame =
      Similarity.decontaminateEmbeddingFrom(emb, pairs)

    /** Same rows as registered `dedup_embedding_blocked`, fed from the
      * session's cached corpus scan (it shares only the scan, not the
      * label pair stream: its blocking is Lloyd cells, not labels).
      *
      * MEASURED SLOWER than the registered query and therefore NOT
      * name-routed by [[graft.GraftSession]] (r10 ReuseBench: 3.14 ->
      * 3.93 s at sf0.1, 374 -> 425 s at 100x): the blocked path's
      * dominant cost is Lloyd assignment + banding, not the scan, so
      * the cache saves nothing while InMemoryTableScan of array-typed
      * rows loses to the vectorized parquet re-read it replaces. Kept
      * as the measurement seam (ReuseBench `SPARK_GRAFT_REUSE_EMB_
      * FAMILY`) and for callers whose emb cache is already hot.
      */
    def blocked: DataFrame =
      Similarity.blockedStagesFrom(spark, sfDir,
        Similarity.augmentedHiFrom(emb))._1

    /** Drop every cache this session materialized (idempotent).
      * `cc` is only touched if it was ever forced: unconditionally
      * dereferencing the lazy val would BUILD the centroid frame just
      * to unpersist it — and a release() running after spark.stop()
      * (close in an outer finally) would throw mid-cleanup, skipping
      * emb.unpersist().
      */
    def release(): Unit = {
      pairs.unpersist()
      if (ccInit) cc.unpersist()
      emb.unpersist()
    }
  }

  /** Start a shared label-blocked embedding-family session. */
  def embFamily(spark: SparkSession, sfDir: String): EmbFamilySession =
    new EmbFamilySession(spark, sfDir)
}
