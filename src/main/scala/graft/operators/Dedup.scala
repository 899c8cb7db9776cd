package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
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

  /** Distinct word-n-gram STRINGS per doc: (doc_id, g0) rows — the
    * single n-gram builder every shingling consumer shares
    * (jaccard/minhash/simhash at n=3, decontamination at n=3/5).
    *
    * Shape (r17): a pure per-row projection — the token array is
    * materialized once per row (`ws`, its own Project; see the inline
    * comment), then `transform(sequence(1, len), i -> concat_ws(ws[i]
    * ... ws[i+n-1]))` builds the grams and (when `distinct`)
    * `array_distinct` dedups them BEFORE the explode. The r1-r16 form
    * (posexplode + window `lead`) built each n-gram once per position
    * but paid a FULL-CORPUS exchange + sort (hash by doc_id for the
    * window) plus a distinct aggregate before any consumer saw a row;
    * this form emits the same distinct (doc_id, g0) set with ZERO
    * exchanges — at 100 TB that removes one full shuffle+sort of the
    * exploded token stream from every shingle consumer (jaccard,
    * minhash x3, simhash x2, containment, fingerprint, overlap
    * sketch, decontamination). Measured same-JVM interleaved at sf0.1
    * (OPTIMIZATION_r17.md): the projection wins or ties every consumer
    * once `ws` is materialized (an inline split() re-evaluates its
    * regex per slice reference inside the interpreted higher-order
    * functions and lost ~1.2x) and the MIN-aggregate consumers skip
    * the distinct pass entirely ([[shingleStringsMulti]]).
    *
    * `shortDocFallback`: docs under n words contribute their whole
    * text as one pseudo-gram (the dedup-family convention, mirrored by
    * the oracles' ELSE branch); without it they contribute nothing
    * (the decontamination convention — a 2-word doc can't leak a
    * 5-gram).
    */
  private[operators] def ngramStrings(
      s: org.apache.spark.sql.SparkSession, d: String,
      n: Int, shortDocFallback: Boolean,
      distinct: Boolean = true): org.apache.spark.sql.DataFrame = {
    // `ws` is materialized ONCE per row in its own projection: the
    // gram builder below references it n+1 times, and an inline
    // split() would re-run the regex per reference (the n slices are
    // inside higher-order functions, which evaluate interpreted — no
    // codegen subexpression elimination). A non-cheap alias used more
    // than once survives CollapseProject (SPARK-36718).
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("ws"))
    val ws = col("ws")
    val len = size(ws) - (n - 1)
    val grams = transform(sequence(lit(1), len), i =>
      concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*))
    val long = docs.filter(size(ws) >= n)
      .select(col("doc_id"),
        explode(if (distinct) array_distinct(grams) else grams).as("g0"))
    if (shortDocFallback)
      long.unionByName(
        docs.filter(size(ws) < n).select(col("doc_id"), col("text").as("g0")))
    else long
  }

  /** The dedup family's word-3-shingles (with short-doc fallback). */
  private[operators] def shingleStrings(s: org.apache.spark.sql.SparkSession, d: String) =
    ngramStrings(s, d, 3, shortDocFallback = true)

  /** Word-3-shingles WITHOUT per-doc de-duplication — for consumers
    * whose downstream computation is multiset-invariant (a per-doc MIN
    * aggregate, or a later global dropDuplicates), where the
    * `array_distinct` pass is pure per-row CPU: min over the multiset
    * equals min over the distinct set. Used by [[minhashSigs]],
    * text_fingerprint and q_overlap_sketch (r17, measured ~1.1-1.3x
    * off those queries at sf0.1; outputs oracle-identical).
    */
  private[operators] def shingleStringsMulti(
      s: org.apache.spark.sql.SparkSession, d: String) =
    ngramStrings(s, d, 3, shortDocFallback = true, distinct = false)

  /** Document-frequency cap on join shingles: a shingle present in
    * more than this many documents is a boilerplate/stop-shingle — it
    * carries no near-dup signal, and at corpus scale it is THE skew
    * bomb (a shingle shared by 10^6 docs contributes 10^12/2 join
    * pairs on one key). Dropped from the shingle UNIVERSE, so Jaccard
    * is computed over the filtered sets on both engines identically.
    * 100 >> the max observed DF in the test corpora (7 at sf0.01, 25
    * at sf0.1), so small-scale results are unchanged; at corpus scale
    * the cap bounds per-key join fan-out to MaxShingleDf^2/2.
    */
  private[operators] val MaxShingleDf = 100

  /** Shingles collapsed to xxhash64 keys so downstream shuffles carry
    * 8-byte keys instead of ~30-char strings; 64-bit collision odds
    * (~n_shingles^2 / 2^64) are negligible and any false merge would
    * surface in the oracle compare. High-DF shingles are removed (see
    * [[MaxShingleDf]]) before the per-doc set size is counted. The
    * surviving shingle's document frequency is kept as `df` (the
    * prefix-filter variant orders by it; other consumers ignore it) —
    * ONE definition of the capped shingle universe, so the Jaccard
    * family cannot drift apart on it.
    */
  private def shingleKeys(s: org.apache.spark.sql.SparkSession, d: String) = {
    import org.apache.spark.sql.expressions.Window
    cappedShingles(s, d)
      .withColumn("n_sh", count(lit(1)).over(Window.partitionBy("doc_id")))
  }

  /** The df-capped (doc_id, g, df) stream WITHOUT the per-doc set-size
    * window — r17: [[ngramJaccard]] and [[containment]] used to carry
    * `n_sh` through their big self-join shuffle (via a full-stream
    * exchange+sort by doc_id just to attach it, then 8-16 extra bytes
    * per row through the join fan-out and the pair group-by keys);
    * both now join the per-doc sizes onto the CANDIDATE PAIRS instead
    * (guide §2.3/§8: move decisions' metadata onto the small frame,
    * keep the heavy shuffle narrow). Only [[prefixJaccard]] still
    * needs n_sh attached per shingle row (its prefix length and the
    * in-join length filter read it), through [[shingleKeys]] above.
    */
  private def cappedShingles(s: org.apache.spark.sql.SparkSession, d: String) = {
    import org.apache.spark.sql.expressions.Window
    shingleStrings(s, d)
      .select(col("doc_id"), xxhash64(col("g0")).as("g"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("g")))
      .filter(col("df") <= MaxShingleDf)
  }

  /** Materialized self-join base for the pair generators: the capped
    * (doc_id, g) stream — localCheckpoint'd once because three plan
    * branches read it (both join sides + the per-doc size aggregate;
    * the [[prefixJaccard]] `keyed` precedent) — plus the per-doc
    * post-cap set sizes as a SEPARATE narrow frame.
    */
  private def pairBase(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val sh = cappedShingles(s, d).select("doc_id", "g").localCheckpoint(true)
    (sh, sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh")))
  }


  /** Shared DuckDB CTE block: capped shingle extraction with per-doc
    * set sizes (`ex(doc_id, shingle, n_sh)`) — the SQL mirror of
    * [[shingleKeys]], used by both the Jaccard and containment
    * oracles so the two operators cannot drift apart on their common
    * universe.
    */
  private def shingleCtesSql: String =
    s"""sh0 AS (
      SELECT doc_id, unnest(list_distinct(${TextAnalysis.shinglesSql("text")})) AS shingle
      FROM documents),
    kept AS (
      SELECT doc_id, shingle FROM sh0
      QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= $MaxShingleDf),
    ex AS (
      SELECT doc_id, shingle,
             COUNT(*) OVER (PARTITION BY doc_id) AS n_sh
      FROM kept)"""

  val ngramJaccard = QueryDef(
    "dedup_ngram_jaccard",
    (s, d) => {
      // Blocking self-equi-join on the shingle key: only docs sharing
      // a shingle ever meet; |A inter B| falls out of the pair count,
      // so no array payloads cross the shuffle. The per-doc set sizes
      // join onto the CANDIDATE PAIRS (data-bounded), not onto every
      // shingle row — the join and pair group-by shuffle bare
      // (g, doc_id) / (i, j) keys only (r17, guide §2.3).
      val (sh, sizes) = pairBase(s, d)
      val a = sh.select(col("g"), col("doc_id").as("i"))
      val b = sh.select(col("g"), col("doc_id").as("j"))
      a.join(b, Seq("g")).filter(col("i") < col("j"))
        .groupBy("i", "j").agg(count(lit(1)).as("n_common"))
        .join(sizes.select(col("doc_id").as("i"), col("n_sh").as("ni")), "i")
        .join(sizes.select(col("doc_id").as("j"), col("n_sh").as("nj")), "j")
        .withColumn("jaccard",
          col("n_common").cast(DoubleType) / (col("ni") + col("nj") - col("n_common")))
        .filter(col("jaccard") >= JaccardTau)
        .select("i", "j", "n_common", "jaccard")
    },
    Some(s"""WITH $shingleCtesSql,
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

  /** Prefix-filtered set-similarity join (the PPJoin/SSJoin family) —
    * the OTHER web-scale Jaccard shape, complementing [[ngramJaccard]]'s
    * document-frequency cap: instead of dropping boilerplate shingles,
    * order each doc's shingles by global rarity (document frequency
    * ascending, hash tiebreak) and join only on each doc's PREFIX —
    * the first `n div 2 + 1` shingles for tau = 0.5 (per-side length
    * `|X| - ceil(tau*|X|) + 1`). The prefix-filter lemma makes this
    * LOSSLESS: if the two prefixes were disjoint, every common shingle
    * would exceed the smaller prefix's boundary value, capping the
    * overlap below `ceil(tau*|X|)` — which J >= tau requires. Hence
    * this query declares the SAME exact-Jaccard oracle as
    * `dedup_ngram_jaccard`, and the hash-match is the losslessness
    * proof, not an approximation waiver.
    *
    * Scale shape: candidate generation joins ~half of each doc's
    * shingles — and because prefixes hold each doc's RAREST shingles,
    * per-key fan-out concentrates on low-DF keys (bounded quadratic in
    * DF, which rarity makes tiny); the `2*min >= max` length filter
    * prunes size-incompatible pairs inside the join. Exact overlap
    * verification then touches only surviving candidates via two
    * equi-joins back to the full (df-capped) shingle sets.
    */
  val prefixJaccard = QueryDef(
    "dedup_jaccard_prefix",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // materialized ONCE (lineage-truncating): four consumers below
      // (both prefix join sides + both exact-verify sides) would
      // otherwise each re-run the corpus scan and all three windows —
      // at 100 TB that is 4 corpus scans instead of 1 shingle table
      val keyed = shingleKeys(s, d).localCheckpoint(true)
      val pfx = keyed
        .withColumn("p", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("df"), col("g"))))
        .filter(col("p") <= expr("n_sh div 2 + 1"))
      val a = pfx.select(col("g"), col("doc_id").as("i"), col("n_sh").as("ni"))
      val b = pfx.select(col("g"), col("doc_id").as("j"), col("n_sh").as("nj"))
      val cand = a.join(b, Seq("g"))
        .filter(col("i") < col("j") &&
          col("ni") * 2 >= col("nj") && col("nj") * 2 >= col("ni"))
        .select("i", "j", "ni", "nj").dropDuplicates("i", "j")
      val full = keyed.select("doc_id", "g")
      cand
        .join(full.select(col("doc_id").as("i"), col("g")), Seq("i"))
        .join(full.select(col("doc_id").as("j"), col("g")), Seq("j", "g"))
        .groupBy("i", "j", "ni", "nj").agg(count(lit(1)).as("n_common"))
        .withColumn("jaccard",
          col("n_common").cast(DoubleType) / (col("ni") + col("nj") - col("n_common")))
        .filter(col("jaccard") >= JaccardTau)
        .select("i", "j", "n_common", "jaccard")
    },
    // the exact all-pairs oracle — identical to dedup_ngram_jaccard's
    // by design (see Scaladoc: hash-match == losslessness proof)
    Some(s"""WITH $shingleCtesSql,
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

  // ---------------------------------------------------------------
  // MinHash + LSH
  // ---------------------------------------------------------------

  private val MinhashPerms = 16
  private val MinhashBands = 4
  private val MinhashRows = MinhashPerms / MinhashBands
  /** Prime > 2^32 for the permutation family (a*h + b) mod P. */
  private val P = 4294967311L

  /** md5-derived permutation constants, same values inlined into the
    * DuckDB oracle. a < 2^30 keeps a*h + b < 2^63 for 32-bit h.
    */
  lazy val minhashPerms: Array[(Long, Long)] = {
    def h60(tag: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tag.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    Array.tabulate(MinhashPerms)(k =>
      (h60(s"mh_a$k") % ((1L << 30) - 1) + 1, h60(s"mh_b$k") % P))
  }

  /** MinHash signatures: doc_id, m = array of [[MinhashPerms]] minima.
    * One shuffle, map-side-combinable MIN aggregates.
    */
  private def minhashSigs(s: org.apache.spark.sql.SparkSession, d: String) = {
    val h32 = TextAnalysis.hash32(col("g0"))
    // multiset shingles: every signature entry is a MIN aggregate, so
    // per-doc distinctness is semantics-free CPU here (r17). A pure
    // per-row signature (16 array_min-transform passes per row, zero
    // exchanges — the text_fingerprint r17 shape) was A/B-measured
    // SLOWER here (dedup_minhash_lsh 1.24 vs 1.11 s, dedup_minhash_error
    // 3.02 vs 2.49 s): one pass per permutation re-walks the gram-hash
    // array 16x, while this form hashes each gram once and folds all 16
    // mins map-side in one pass.
    shingleStringsMulti(s, d)
      .select(col("doc_id"), h32.as("h"))
      .groupBy("doc_id")
      .agg(
        min((col("h") * minhashPerms(0)._1 + minhashPerms(0)._2) % P).as("m0"),
        (1 until MinhashPerms).map(k =>
          min((col("h") * minhashPerms(k)._1 + minhashPerms(k)._2) % P).as(s"m$k")): _*)
      .select(col("doc_id"),
        array((0 until MinhashPerms).map(k => col(s"m$k")): _*).as("m"))
  }

  /** Band explode: one row per (doc, band) with the concatenated
    * band key — the LSH bucket id. NARROW (no signature payload): the
    * band self-join is the query's one skew-prone shuffle, and each
    * side lugging the 16-long signature through it (multiplied by
    * band fan-out and duplicate candidates) broke the family's
    * 8-byte-key discipline — consumers join signatures back onto the
    * DEDUPED candidate pairs instead, exactly as the oracle does.
    */
  private def bandedSigs(sig: org.apache.spark.sql.DataFrame) =
    sig.select(col("doc_id"), explode(bandKeysExpr(col("m"))).as("bb"))
      .select(col("doc_id"),
        col("bb.band_id").as("band_id"), col("bb.band_key").as("band_key"))

  /** Per-ROW minhash signature of a text column — the same 16 values
    * [[minhashSigs]] computes via explode+groupBy, but as a single
    * projection (min over a multiset equals min over the distinct
    * set). No shuffle, so it is usable on a STREAM row-by-row; the
    * batch path stays on the explode form, whose one map-combinable
    * aggregate beats per-element array evaluation on a full corpus
    * scan (see text_fingerprint's measurement).
    */
  def minhashSigExpr(text: Column): Column = {
    val hs = transform(TextAnalysis.shingles(text), g =>
      TextAnalysis.hash32(g))
    array((0 until MinhashPerms).map { k =>
      array_min(transform(hs, h =>
        (h * minhashPerms(k)._1 + minhashPerms(k)._2) % P))
    }: _*)
  }

  /** LSH band (band_id, band_key) structs of a signature array —
    * the bucket ids a document lands in; shared by the batch band
    * explode and the streaming index path.
    */
  def bandKeysExpr(m: Column): Column =
    array((0 until MinhashBands).map { b =>
      struct(lit(b).as("band_id"),
        concat_ws("_", (0 until MinhashRows).map(r =>
          m.getItem(b * MinhashRows + r)): _*).as("band_key"))
    }: _*)

  /** Shared oracle CTE text: shingle hashes -> signatures -> band rows
    * (`sig` and `bb` are the reusable relations).
    */
  private lazy val minhashCtesSql: String = {
    val permMins = minhashPerms.zipWithIndex.map { case ((a, b), _) =>
      s"min((h * $a + $b) % $P)"
    }.mkString("[", ", ", "]")
    val bandStructs = (0 until MinhashBands).map { b =>
      val key = (0 until MinhashRows)
        .map(r => s"CAST(m[${b * MinhashRows + r + 1}] AS VARCHAR)")
        .mkString(" || '_' || ")
      s"{'band_id': $b, 'band_key': $key}"
    }.mkString("[", ", ", "]")
    s"""sh AS (
      SELECT doc_id, unnest(list_distinct(${TextAnalysis.shinglesSql("text")})) AS g0
      FROM documents),
    h AS (SELECT doc_id, ('0x' || substr(md5(g0), 1, 8))::BIGINT AS h FROM sh),
    sig AS (SELECT doc_id, $permMins AS m FROM h GROUP BY doc_id),
    banded AS (SELECT doc_id, m, unnest($bandStructs) AS bb FROM sig),
    bb AS (SELECT doc_id, m, bb['band_id'] AS band_id, bb['band_key'] AS band_key FROM banded)"""
  }

  /** MinHash signatures (16 perms over 32-bit md5 shingle hashes) +
    * banded LSH (4 bands x 4 rows): docs agreeing on all 4 minhashes
    * of any band become candidate pairs; the signature overlap is the
    * Jaccard estimate. One shuffle to build signatures (map-side-
    * combinable MIN aggregates), one equi-join shuffle on the band
    * key — the standard web-scale near-dup shape.
    */
  val minhashLsh = QueryDef(
    "dedup_minhash_lsh",
    (s, d) => {
      // signatures materialized once: the band rows AND the two
      // pair-side joins below all read them (without the checkpoint
      // the shingle pipeline would run three times)
      val sig = minhashSigs(s, d).localCheckpoint(true)
      val banded = bandedSigs(sig)
      val a = banded.select(col("band_id"), col("band_key"), col("doc_id").as("i"))
      val b = banded.select(col("band_id"), col("band_key"), col("doc_id").as("j"))
      val cand = a.join(b, Seq("band_id", "band_key"))
        .filter(col("i") < col("j"))
        .select("i", "j").dropDuplicates("i", "j")
      cand
        .join(sig.select(col("doc_id").as("i"), col("m").as("mi")), "i")
        .join(sig.select(col("doc_id").as("j"), col("m").as("mj")), "j")
        .withColumn("est_jaccard",
          size(filter(zip_with(col("mi"), col("mj"), (x, y) => x === y), p => p))
            .cast(DoubleType) / MinhashPerms)
        .select("i", "j", "est_jaccard")
    },
    Some(s"""WITH $minhashCtesSql,
    cand AS (
      SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
      FROM bb a JOIN bb b ON a.band_id = b.band_id AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id)
    SELECT c.i, c.j,
      CAST(len(list_filter(range(1, ${MinhashPerms + 1}), k -> sa.m[k] = sb.m[k])) AS DOUBLE) / $MinhashPerms AS est_jaccard
    FROM cand c JOIN sig sa ON sa.doc_id = c.i JOIN sig sb ON sb.doc_id = c.j
    ORDER BY i, j"""))

  /** INCREMENTAL near-dup: dedup a newly-arrived shard against an
    * already-deduplicated corpus — the shape a live ingestion pipeline
    * runs daily. Re-running [[minhashLsh]] over corpus+shard would
    * re-pair the corpus against itself (quadratic in corpus, zero new
    * information); incremental dedup joins only shard-vs-corpus and
    * shard-vs-earlier-shard band buckets, so per-run cost scales with
    * the SHARD, not the corpus.
    *
    * At 100 TB the corpus side of the band join is a maintained
    * SIGNATURE INDEX table (doc_id, band_id, band_key, m) written once
    * at initial dedup and appended with each shard's survivors — the
    * corpus text is never re-shingled. This diagnostic derives both
    * sides from `documents` split by doc_id parity (corpus = even,
    * shard = odd) so the oracle can replicate the full computation.
    *
    * Output: one row per shard doc with at least one duplicate —
    * its minimum-id matching partner (corpus doc, or an earlier shard
    * doc: the copy that survives) and the signature-overlap estimate.
    */
  val incremental = QueryDef(
    "dedup_incremental",
    (s, d) => {
      val sig = minhashSigs(s, d).localCheckpoint(true)
      val banded = bandedSigs(sig)
      val shard = banded.filter(col("doc_id") % 2 === 1)
        .select(col("band_id"), col("band_key"), col("doc_id").as("i"))
      val corpus = banded.filter(col("doc_id") % 2 === 0)
        .select(col("band_id"), col("band_key"), col("doc_id").as("j"))
      val priorShard = banded.filter(col("doc_id") % 2 === 1)
        .select(col("band_id"), col("band_key"), col("doc_id").as("j"))
      val vsCorpus = shard.join(corpus, Seq("band_id", "band_key"))
      val vsPrior = shard.join(priorShard, Seq("band_id", "band_key"))
        .filter(col("j") < col("i"))
      // partner FIRST (min matching id per shard doc), then one
      // signature join per side for the partner's estimate only —
      // narrow band shuffles, no per-candidate signature compare
      vsCorpus.unionByName(vsPrior)
        .select("i", "j").dropDuplicates("i", "j")
        .groupBy(col("i")).agg(min(col("j")).as("partner_id"))
        .join(sig.select(col("doc_id").as("i"), col("m").as("mi")), "i")
        .join(sig.select(col("doc_id").as("partner_id"), col("m").as("mj")),
          "partner_id")
        .withColumn("est_jaccard",
          size(filter(zip_with(col("mi"), col("mj"), (x, y) => x === y), p => p))
            .cast(DoubleType) / MinhashPerms)
        .select(col("i").as("doc_id"), col("partner_id"), col("est_jaccard"))
    },
    Some(s"""WITH $minhashCtesSql,
    cand AS (
      SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
      FROM bb a JOIN bb b ON a.band_id = b.band_id AND a.band_key = b.band_key
      WHERE a.doc_id % 2 = 1
        AND (b.doc_id % 2 = 0 OR b.doc_id < a.doc_id)),
    sel AS (SELECT i, min(j) AS partner_id FROM cand GROUP BY i)
    SELECT s.i AS doc_id, s.partner_id,
      CAST(len(list_filter(range(1, ${MinhashPerms + 1}), k -> sa.m[k] = sb.m[k])) AS DOUBLE) / $MinhashPerms AS est_jaccard
    FROM sel s JOIN sig sa ON sa.doc_id = s.i JOIN sig sb ON sb.doc_id = s.partner_id
    ORDER BY doc_id"""))

  // ---------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------

  private val SimBits = 60
  private val SimBlocks = 4
  private val SimBlockBits = SimBits / SimBlocks // 15
  private val SimHammingMax = 3

  /** 60-bit SimHash fingerprints + pigeonhole blocking: a pair with
    * hamming distance <= 3 must agree exactly on at least one of the
    * 4 15-bit blocks, so candidates come from an equi-join on
    * (block_id, block_val) and are verified with bit_count(xor).
    * 60 bits (not 64) keeps the fingerprint in a signed BIGINT for
    * both engines.
    *
    * BASELINE — SUPERSEDED AT SCALE by [[simhashWide]]: a 15-bit
    * block has only 32k values, so candidate volume follows n²/2^15
    * (measured 79x at 10x data, SURVEY §5). Use `dedup_simhash_wide`
    * beyond ~100k documents; this variant stays registered as the
    * small-corpus/pedagogical baseline.
    */
  val simhash = QueryDef(
    "dedup_simhash",
    (s, d) => {
      val h60 = conv(substring(md5(col("g0")), 1, 15), 16, 10).cast(LongType)
      // One-pass sketch aggregate (see graft.functions.SimHashAgg) in
      // place of 60 separate sum(CASE) aggregation buffers.
      val fp = shingleStrings(s, d)
        .select(col("doc_id"), h60.as("h"))
        .groupBy("doc_id")
        .agg(graft.functions.SimHashAgg.simhash60(col("h")).as("fp"))
      val blocked = fp.select(col("doc_id"), col("fp"),
        explode(array((0 until SimBlocks).map(b =>
          struct(lit(b).as("block_id"),
            shiftright(col("fp"), b * SimBlockBits)
              .bitwiseAND((1L << SimBlockBits) - 1).as("block_val"))): _*)).as("bb"))
        .select(col("doc_id"), col("fp"),
          col("bb.block_id").as("block_id"), col("bb.block_val").as("block_val"))
      val a = blocked.select(col("block_id"), col("block_val"),
        col("doc_id").as("i"), col("fp").as("fpi"))
      val b = blocked.select(col("block_id"), col("block_val"),
        col("doc_id").as("j"), col("fp").as("fpj"))
      a.join(b, Seq("block_id", "block_val")).filter(col("i") < col("j"))
        .select("i", "j", "fpi", "fpj").dropDuplicates("i", "j")
        .withColumn("hamming",
          bit_count(col("fpi").bitwiseXOR(col("fpj"))).cast(LongType))
        .filter(col("hamming") <= SimHammingMax)
        .select("i", "j", "hamming")
    },
    Some {
      val sums = (0 until SimBits).map(bp =>
        s"SUM(CASE WHEN (h >> $bp) & 1 = 1 THEN 1 ELSE -1 END) AS s$bp")
        .mkString(",\n        ")
      val fpExpr = (0 until SimBits).map(bp =>
        s"(CASE WHEN s$bp > 0 THEN ${1L << bp} ELSE 0 END)").mkString(" + ")
      val blockStructs = (0 until SimBlocks).map(b =>
        s"{'block_id': $b, 'block_val': (fp >> ${b * SimBlockBits}) & ${(1L << SimBlockBits) - 1}}")
        .mkString("[", ", ", "]")
      s"""WITH sh AS (
      SELECT doc_id, unnest(list_distinct(${TextAnalysis.shinglesSql("text")})) AS g0
      FROM documents),
    h AS (SELECT doc_id, ('0x' || substr(md5(g0), 1, 15))::BIGINT AS h FROM sh),
    sums AS (SELECT doc_id,
        $sums
      FROM h GROUP BY doc_id),
    fp AS (SELECT doc_id, $fpExpr AS fp FROM sums),
    blocked AS (SELECT doc_id, fp, unnest($blockStructs) AS bb FROM fp),
    bb AS (SELECT doc_id, fp, bb['block_id'] AS block_id, bb['block_val'] AS block_val FROM blocked),
    cand AS (
      SELECT DISTINCT a.doc_id AS i, b.doc_id AS j, a.fp AS fpi, b.fp AS fpj
      FROM bb a JOIN bb b ON a.block_id = b.block_id AND a.block_val = b.block_val
      WHERE a.doc_id < b.doc_id)
    SELECT i, j, CAST(bit_count(xor(fpi, fpj)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(fpi, fpj)) <= $SimHammingMax
    ORDER BY i, j"""
    },
    supersededBy = Some("dedup_simhash_wide"))

  private val SimWideBlockBits = 30
  private val SimWideMask = (1L << SimWideBlockBits) - 1

  /** 120-bit SimHash with 30-bit pigeonhole blocks — the corpus-scale
    * fix for the candidate blow-up the 10x scale rehearsal measured in
    * [[simhash]] (SURVEY §5): a 15-bit block has only 32k values, so
    * block occupancy grows with n and the blocked equi-join's
    * candidate volume grows ~n^2/2^15 (20x shuffle at 10x data). The
    * fingerprint here is TWO independent 60-bit SimHashes (disjoint
    * md5 halves of the same shingle stream, each staying inside a
    * signed BIGINT for cross-engine exactness), giving 120 bits split
    * as 4 blocks of 30 — block space 2^30, occupancy <= 1 out to
    * ~1e9 documents, candidate volume ~n^2/2^30: linear in practice
    * through the 100-TB regime.
    *
    * Same pigeonhole soundness: hamming <= 3 over the 120 bits means
    * the 3 differing bits touch at most 3 of the 4 blocks, so every
    * true pair agrees exactly on some block. The wider fingerprint is
    * also a STRICTER similarity (3/120 vs 3/60 differing bits), which
    * is the direction a production near-dup screen wants.
    */
  /** The (doc_id, fpl, fph) 120-bit fingerprints [[simhashWide]]
    * blocks — also used by the spec's independent all-pairs recall
    * proof (the blocking must be EXACT by pigeonhole, and the spec
    * verifies that against a sweep that bypasses the blocks).
    */
  private[graft] def simhashWideFps(
      s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val lo = conv(substring(md5(col("g0")), 1, 15), 16, 10).cast(LongType)
    val hi = conv(substring(md5(col("g0")), 17, 15), 16, 10).cast(LongType)
    shingleStrings(s, d)
      .select(col("doc_id"), lo.as("hl"), hi.as("hh"))
      .groupBy("doc_id")
      .agg(graft.functions.SimHashAgg.simhash60(col("hl")).as("fpl"),
        graft.functions.SimHashAgg.simhash60(col("hh")).as("fph"))
  }

  val simhashWide = QueryDef(
    "dedup_simhash_wide",
    (s, d) => {
      val fp = simhashWideFps(s, d)
      val blocked = fp.select(col("doc_id"), col("fpl"), col("fph"),
        explode(array(
          struct(lit(0).as("block_id"),
            col("fpl").bitwiseAND(SimWideMask).as("block_val")),
          struct(lit(1).as("block_id"),
            shiftright(col("fpl"), SimWideBlockBits)
              .bitwiseAND(SimWideMask).as("block_val")),
          struct(lit(2).as("block_id"),
            col("fph").bitwiseAND(SimWideMask).as("block_val")),
          struct(lit(3).as("block_id"),
            shiftright(col("fph"), SimWideBlockBits)
              .bitwiseAND(SimWideMask).as("block_val")))).as("bb"))
        .select(col("doc_id"), col("fpl"), col("fph"),
          col("bb.block_id").as("block_id"), col("bb.block_val").as("block_val"))
      val a = blocked.select(col("block_id"), col("block_val"),
        col("doc_id").as("i"), col("fpl").as("fpli"), col("fph").as("fphi"))
      val b = blocked.select(col("block_id"), col("block_val"),
        col("doc_id").as("j"), col("fpl").as("fplj"), col("fph").as("fphj"))
      a.join(b, Seq("block_id", "block_val")).filter(col("i") < col("j"))
        .select("i", "j", "fpli", "fphi", "fplj", "fphj")
        .dropDuplicates("i", "j")
        .withColumn("hamming",
          (bit_count(col("fpli").bitwiseXOR(col("fplj"))) +
            bit_count(col("fphi").bitwiseXOR(col("fphj")))).cast(LongType))
        .filter(col("hamming") <= SimHammingMax)
        .select("i", "j", "hamming")
    },
    Some {
      val sums = (0 until SimBits).map(bp =>
        s"SUM(CASE WHEN (hl >> $bp) & 1 = 1 THEN 1 ELSE -1 END) AS l$bp," +
          s" SUM(CASE WHEN (hh >> $bp) & 1 = 1 THEN 1 ELSE -1 END) AS h$bp")
        .mkString(",\n        ")
      val fplExpr = (0 until SimBits).map(bp =>
        s"(CASE WHEN l$bp > 0 THEN ${1L << bp} ELSE 0 END)").mkString(" + ")
      val fphExpr = (0 until SimBits).map(bp =>
        s"(CASE WHEN h$bp > 0 THEN ${1L << bp} ELSE 0 END)").mkString(" + ")
      val blockStructs = Seq(
        s"{'block_id': 0, 'block_val': fpl & $SimWideMask}",
        s"{'block_id': 1, 'block_val': (fpl >> $SimWideBlockBits) & $SimWideMask}",
        s"{'block_id': 2, 'block_val': fph & $SimWideMask}",
        s"{'block_id': 3, 'block_val': (fph >> $SimWideBlockBits) & $SimWideMask}")
        .mkString("[", ", ", "]")
      s"""WITH sh AS (
      SELECT doc_id, unnest(list_distinct(${TextAnalysis.shinglesSql("text")})) AS g0
      FROM documents),
    h AS (SELECT doc_id,
        ('0x' || substr(md5(g0), 1, 15))::BIGINT AS hl,
        ('0x' || substr(md5(g0), 17, 15))::BIGINT AS hh
      FROM sh),
    sums AS (SELECT doc_id,
        $sums
      FROM h GROUP BY doc_id),
    fp AS (SELECT doc_id, $fplExpr AS fpl, $fphExpr AS fph FROM sums),
    blocked AS (SELECT doc_id, fpl, fph, unnest($blockStructs) AS bb FROM fp),
    bb AS (SELECT doc_id, fpl, fph, bb['block_id'] AS block_id, bb['block_val'] AS block_val FROM blocked),
    cand AS (
      SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
        a.fpl AS fpli, a.fph AS fphi, b.fpl AS fplj, b.fph AS fphj
      FROM bb a JOIN bb b ON a.block_id = b.block_id AND a.block_val = b.block_val
      WHERE a.doc_id < b.doc_id)
    SELECT i, j,
      CAST(bit_count(xor(fpli, fplj)) + bit_count(xor(fphi, fphj)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(fpli, fplj)) + bit_count(xor(fphi, fphj)) <= $SimHammingMax
    ORDER BY i, j"""
    })

  // ---------------------------------------------------------------
  // Duplicate-cluster canonicalization
  // ---------------------------------------------------------------

  /** Min-label connected components over an undirected edge list
    * (`src`/`dst`, both directions present) -> (node, label) with
    * label = the component's minimum node id.
    *
    * Each round interleaves one HOP of min-label propagation with one
    * POINTER JUMP (label <- label's label, through the previous
    * round's label map — see the stale-jump note in the loop). The
    * jump compounds the distance a minimum has travelled
    * (d_k >= d_{k-1} + d_{k-2}), so rounds scale with log(component
    * diameter), not diameter — a 1000-hop chain converges in ~15
    * rounds instead of 1000 (spec-verified on a 200-node path). `localCheckpoint` truncates lineage each round,
    * and the convergence count rides the checkpoint action itself as
    * an observed metric (`Dataset.observe` + [[org.apache.spark.sql.Observation]]),
    * so each round is exactly ONE Spark job — no separate
    * fixpoint-detection pass, even over cached data.
    */
  private[graft] def connectedComponents(
      edgesIn: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val edges = edgesIn.localCheckpoint(true)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    val MaxRounds = 64 // log-bounded: see the jump note below
    while (!converged && iter < MaxRounds) {
      // hop: the min label among each node's neighbours
      val neigh = edges.join(labels, col("src") === col("node"))
        .groupBy(col("dst")).agg(min(col("label")).as("nl"))
      val hopped = labels.join(neigh, col("node") === col("dst"), "left")
        .select(col("node"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
      // jump: follow the label pointer one step through the PREVIOUS
      // round's labels (stale pointers, r17). The r16 form jumped
      // through the CURRENT hopped map — a self-join that forced a
      // second eager checkpoint per round so the hop subtree would not
      // run twice; jumping through `labels` (already materialized last
      // round) keeps hop+jump in ONE job and ONE checkpoint per round
      // (measured same-JVM interleaved at sf0.1: dedup_cluster_keep
      // 2.45 -> 2.12 s, dedup_keep_rank 4.14 -> 3.90 s,
      // dedup_embedding_keep 2.22 -> 2.03 s; outputs hash-identical).
      // A stale jump still compounds the distance a minimum travels:
      // d_k >= d_{k-1} + d_{k-2} (hop extends by last round's reach,
      // the stale pointer adds the round-before's), so rounds stay
      // O(log diameter) and MaxRounds = 64 covers any graph below
      // ~phi^64 ~ 10^13 diameter; the FIXPOINT (component-min labels)
      // is unchanged — only intermediate label states differ.
      val ptrs = labels.select(col("node").as("pnode"), col("label").as("plabel"))
      val obs = org.apache.spark.sql.Observation(s"cc_round_$iter")
      val next = hopped.join(ptrs, hopped("label") === ptrs("pnode"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("plabel"), col("label"))).as("label"),
          (least(col("label"), coalesce(col("plabel"), col("label"))) < col("old_label")).as("chg"))
        // fused convergence check: CollectMetrics executes inside the
        // eager checkpoint's job, so obs.get costs no extra action
        .observe(obs, count(when(col("chg"), lit(1))).as("n_changed"))
        .localCheckpoint(true)
      converged = obs.get("n_changed").asInstanceOf[Long] == 0L
      labels = next.drop("chg")
      iter += 1
    }
    // Fail loudly rather than return wrong canonical ids.
    if (!converged) throw new IllegalStateException(
      s"connectedComponents: did not converge in $iter rounds")
    labels
  }

  /** Connected components over the near-dup pair graph -> canonical
    * keep decision per clustered doc (keep = the component's min
    * doc_id). Pairs say "these two are dups"; a pipeline needs "which
    * one row survives" — min-label propagation to fixpoint supplies
    * it deterministically even for transitive chains (A~B~C with A!~C).
    *
    * Pointer-jumping driver loop (log-diameter rounds; see
    * [[connectedComponents]]) over the CANDIDATE graph only — after
    * blocking, that graph is sparse at any scale. The oracle is a
    * DuckDB recursive CTE over the same pairs.
    */
  /** [[clusterKeep]] body over an injectable pair graph — the seam
    * that lets a session compute the (expensive) near-dup pairs ONCE
    * and feed both the keep decision and the curation pipeline (see
    * [[Shared]]); the registered query passes the fresh pairs.
    */
  private[operators] def clusterKeepFrom(
      pairs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // Materialize once: every loop iteration joins against edges,
    // and without the checkpoint each join would re-run the whole
    // jaccard pipeline.
    val edges = pairs.unionByName(
      pairs.select(col("j").as("i"), col("i").as("j")))
      .toDF("src", "dst")
    connectedComponents(edges)
      .select(col("node").as("doc_id"), col("label").as("canonical_id"))
      .withColumn("keep", col("doc_id") === col("canonical_id"))
  }

  val clusterKeep = QueryDef(
    "dedup_cluster_keep",
    (s, d) => clusterKeepFrom(ngramJaccard.fn(s, d).select("i", "j")),
    Some {
      // the ngram-jaccard pair query, stripped of its ORDER BY/cols
      val pairSql = ngramJaccard.oracle.get.replace("ORDER BY i, j", "")
      s"""WITH RECURSIVE pairs AS ($pairSql),
    edges AS (SELECT i AS src, j AS dst FROM pairs
              UNION ALL SELECT j, i FROM pairs),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach AS (
      SELECT node, node AS root FROM nodes
      UNION
      SELECT e.dst AS node, r.root FROM reach r JOIN edges e ON e.src = r.node)
    SELECT node AS doc_id, min(root) AS canonical_id,
           (node = min(root)) AS keep
    FROM reach GROUP BY node ORDER BY doc_id"""
    })

  /** [[dupProfile]] body over an injectable keep frame — the seam
    * that lets [[graft.GraftSession]] serve the profile from its
    * cached pair graph's CC result instead of recomputing it.
    */
  private[graft] def dupProfileFrom(
      s: org.apache.spark.sql.SparkSession, d: String,
      keep: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sizes = keep.groupBy("canonical_id")
      .agg(count(lit(1)).as("cluster_size"))
    val multi = sizes.groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))
    val total = Tables.documents(s, d).agg(count(lit(1)).as("t"))
    val clustered = keep.agg(count(lit(1)).as("c"))
    val singles = total.crossJoin(clustered)
      .select(lit(1L).as("cluster_size"),
        (col("t") - col("c")).as("n_clusters"),
        (col("t") - col("c")).as("n_docs"))
    multi.unionByName(singles)
  }

  /** Duplicate-multiplicity profile — the corpus-health report the
    * keep decision implies: for each near-dup cluster size, how many
    * clusters exist and how many documents they hold, with the
    * unclustered rest reported as the `cluster_size = 1` row (CC
    * components always have >= 2 nodes, so the singleton row cannot
    * collide with a computed size). The headline numbers a curation
    * run reads off this: duplicated-document fraction and the size of
    * the largest clone family (a spike there usually means template
    * text, not organic duplication).
    *
    * Scale shape: everything after the pair graph + CC (shared with
    * `dedup_cluster_keep`, and served from the session cache under
    * [[graft.GraftSession]]) is aggregation over cluster ids — output
    * is O(distinct sizes) rows; the two scalar counts broadcast into
    * a one-row cross join.
    */
  val dupProfile = QueryDef(
    "corpus_dup_profile",
    (s, d) => dupProfileFrom(s, d,
      clusterKeepFrom(ngramJaccard.fn(s, d).select("i", "j"))),
    Some {
      val pairSql = ngramJaccard.oracle.get.replace("ORDER BY i, j", "")
      s"""WITH RECURSIVE pairs AS ($pairSql),
    edges AS (SELECT i AS src, j AS dst FROM pairs
              UNION ALL SELECT j, i FROM pairs),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach AS (
      SELECT node, node AS root FROM nodes
      UNION
      SELECT e.dst AS node, r.root FROM reach r JOIN edges e ON e.src = r.node),
    keep AS (SELECT node AS doc_id, min(root) AS canonical_id
             FROM reach GROUP BY node),
    sizes AS (SELECT canonical_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
              FROM keep GROUP BY canonical_id),
    multi AS (SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
                CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
              FROM sizes GROUP BY cluster_size),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM documents),
    clus AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM keep)
    SELECT cluster_size, n_clusters, n_docs FROM multi
    UNION ALL
    SELECT CAST(1 AS BIGINT), t - c, t - c FROM tot, clus
    ORDER BY cluster_size"""
    })

  private val ContainTau = 0.8

  /** Asymmetric near-CONTAINMENT detection — the dedup case Jaccard
    * misses: a short document embedded verbatim inside a much longer
    * one (quoted articles, boilerplate-wrapped reposts) has tiny
    * Jaccard (|A∩B|/|A∪B| shrinks with the size gap) but containment
    * |A∩B|/|A| ≈ 1. Emits ORDERED pairs (contained_id, container_id)
    * with shingle-set containment ≥ [[ContainTau]]; mutually-
    * contained near-identical docs appear in both directions, which is
    * the honest semantic (each is removable in favor of the other).
    *
    * Same scale shape as [[ngramJaccard]] — the blocking self-equi-join
    * on capped shingle keys ([[MaxShingleDf]] guards the skew bomb);
    * only the final ratio differs (denominator = the contained side's
    * own set size instead of the union).
    */
  val containment = QueryDef(
    "dedup_containment",
    (s, d) => {
      // same pair-level size attach as ngramJaccard (r17): only the
      // contained side's size is needed, joined after the pair count
      val (sh, sizes) = pairBase(s, d)
      val a = sh.select(col("g"), col("doc_id").as("contained_id"))
      val b = sh.select(col("g"), col("doc_id").as("container_id"))
      a.join(b, Seq("g")).filter(col("contained_id") =!= col("container_id"))
        .groupBy("contained_id", "container_id")
        .agg(count(lit(1)).as("n_common"))
        .join(sizes.select(col("doc_id").as("contained_id"),
          col("n_sh").as("ni")), "contained_id")
        .withColumn("containment", col("n_common").cast(DoubleType) / col("ni"))
        .filter(col("containment") >= ContainTau)
        .select("contained_id", "container_id", "n_common", "containment")
    },
    Some(s"""WITH $shingleCtesSql,
    pairs AS (
      SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
             a.n_sh AS ni, COUNT(*) AS n_common
      FROM ex a JOIN ex b
        ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY 1, 2, 3)
    SELECT contained_id, container_id, n_common,
      CAST(n_common AS DOUBLE) / ni AS containment
    FROM pairs
    WHERE CAST(n_common AS DOUBLE) / ni >= $ContainTau
    ORDER BY contained_id, container_id"""))

  private val WinnowMinShared = 2

  /** Candidate near-dup pairs over the WINNOWED fingerprint universe —
    * the downstream consumer `text_winnow` exists for. Same blocking
    * equi-join shape as [[ngramJaccard]], but the join sees only the
    * ~2/(w+1) window-min fingerprints per document instead of every
    * gram — at corpus scale that is a ~3x smaller join input CARRYING
    * A GUARANTEE random sampling lacks: any two documents sharing a
    * contiguous run of >= w+2 tokens share a fingerprint (WinnowSpec),
    * so pairs with long verbatim overlaps are never lost to sampling.
    * [[WinnowMinShared]] >= 2 drops single-fingerprint coincidences;
    * the [[MaxShingleDf]] document-frequency cap kills boilerplate-
    * fingerprint skew exactly as in the Jaccard family. `containment`
    * is the shared fraction of the smaller winnowed set (the winnowed
    * estimate of [[containment]]'s exact ratio), floor-quantized to
    * 6dp under the cross-engine ratio rule.
    */
  val winnowPairs = QueryDef(
    "dedup_winnow",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // same pair-level size attach as ngramJaccard (r17): the df-cap
      // window stays on the fingerprint stream; the per-doc winnowed
      // set sizes join onto the candidate pairs instead of riding the
      // self-join shuffle and the pair group-by keys
      val fps = TextAnalysis.winnow.fn(s, d)
        .withColumn("df", count(lit(1)).over(Window.partitionBy("fp")))
        .filter(col("df") <= MaxShingleDf)
        .select("doc_id", "fp").localCheckpoint(true)
      val sizes = fps.groupBy("doc_id").agg(count(lit(1)).as("nf"))
      val a = fps.select(col("fp"), col("doc_id").as("i"))
      val b = fps.select(col("fp"), col("doc_id").as("j"))
      a.join(b, "fp").filter(col("i") < col("j"))
        .groupBy("i", "j")
        .agg(count(lit(1)).as("shared_fps"))
        .filter(col("shared_fps") >= WinnowMinShared)
        .join(sizes.select(col("doc_id").as("i"), col("nf").as("ni")), "i")
        .join(sizes.select(col("doc_id").as("j"), col("nf").as("nj")), "j")
        .select(col("i"), col("j"), col("shared_fps"),
          (floor(col("shared_fps").cast(DoubleType) /
            least(col("ni"), col("nj")) * 1e6) / 1e6).as("containment"))
    },
    Some {
      val wsql = TextAnalysis.winnow.oracle.get
      s"""WITH w AS ($wsql),
      kept AS (
        SELECT doc_id, fp FROM w
        QUALIFY COUNT(*) OVER (PARTITION BY fp) <= $MaxShingleDf),
      ex AS (
        SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY doc_id) AS nf
        FROM kept),
      pairs AS (
        SELECT a.doc_id AS i, b.doc_id AS j, a.nf AS ni, b.nf AS nj,
          COUNT(*) AS shared_fps
        FROM ex a JOIN ex b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4)
      SELECT i, j, CAST(shared_fps AS BIGINT) AS shared_fps,
        floor(CAST(shared_fps AS DOUBLE) / least(ni, nj) * 1e6) / 1e6 AS containment
      FROM pairs WHERE shared_fps >= $WinnowMinShared
      ORDER BY i, j"""
    })

  /** Sketch-calibration audit: MinHash signature-overlap estimate vs
    * the exact shingle Jaccard, per pair surfaced by BOTH detectors —
    * the measurement that justifies (or revokes) trusting the sketch
    * at a given permutation count before a 100-TB run commits to it.
    * |est − exact| across the matched pairs is the empirical
    * estimator error at [[MinhashPerms]] permutations (expected
    * ~1/sqrt(perms)); pairs only one side surfaces are the
    * recall/precision story told elsewhere (LSH banding analysis in
    * [[minhashLsh]]'s doc). Composes the two INDEPENDENTLY
    * hash-verified queries, so a drift in either breaks this gate
    * too. One equi-join of two pair tables on (i, j) — both sides
    * near-dup-sized, never corpus-sized.
    */
  val minhashError = QueryDef(
    "dedup_minhash_error",
    (s, d) => {
      import org.apache.spark.sql.types.DoubleType
      val est = minhashLsh.fn(s, d)
      val exact = ngramJaccard.fn(s, d).select(col("i"), col("j"), col("jaccard"))
      est.join(exact, Seq("i", "j"))
        .select(col("i"), col("j"), col("est_jaccard"), col("jaccard"),
          abs(col("est_jaccard") - col("jaccard")).cast(DoubleType).as("abs_err"))
    },
    Some {
      val estSql = minhashLsh.oracle.get.replace("ORDER BY i, j", "")
      val exactSql = ngramJaccard.oracle.get.replace("ORDER BY i, j", "")
      s"""WITH est AS ($estSql), ex AS ($exactSql)
    SELECT est.i, est.j, est.est_jaccard, ex.jaccard,
      CAST(abs(est.est_jaccard - ex.jaccard) AS DOUBLE) AS abs_err
    FROM est JOIN ex ON ex.i = est.i AND ex.j = est.j
    ORDER BY est.i, est.j"""
    })

  val defs: Seq[QueryDef] = Seq(exact, ngramJaccard, prefixJaccard, minhashLsh,
    incremental, simhash, simhashWide, clusterKeep, dupProfile, containment,
    winnowPairs, minhashError)
}
