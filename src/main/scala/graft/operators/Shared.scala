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
}
