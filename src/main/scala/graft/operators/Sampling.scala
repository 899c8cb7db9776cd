package graft.operators

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset-splitting / sampling operators for training pipelines.
  * Both are hash-deterministic — re-running on the same corpus yields
  * the same split (a hard requirement for reproducible training and
  * for leak-free train/test separation), and both are narrow
  * per-row/per-group operations that scale to any corpus size.
  */
object Sampling {

  /** 90/5/5 train/val/test assignment from a content-derived hash:
    * stable under re-partitioning, re-ordering and incremental
    * appends (the split of an existing doc never changes when new
    * docs arrive — unlike row_number-based splits).
    */
  /** The split's hash bucket — ONE definition of the salt and
    * modulus; [[splitCol]] and the registered query both derive from
    * it so the oracle-gated split can never drift from the split
    * curation/classifier consumers actually use.
    */
  def splitBucket(text: Column): Column =
    pmod(TextAnalysis.hash60(concat(lit("split:"), text)), lit(100L))

  private def splitOf(bucket: Column): Column =
    when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")

  /** Reusable column form of the split decision. */
  def splitCol(text: Column): Column = splitOf(splitBucket(text))

  val hashSplit = QueryDef(
    "sample_split_hash",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), splitBucket(col("text")).as("bucket"))
        .withColumn("split", splitOf(col("bucket")))
    },
    Some(s"""SELECT doc_id,
      ${TextAnalysis.hash60Sql("'split:' || text")} % 100 AS bucket,
      CASE WHEN ${TextAnalysis.hash60Sql("'split:' || text")} % 100 < 90 THEN 'train'
           WHEN ${TextAnalysis.hash60Sql("'split:' || text")} % 100 < 95 THEN 'val'
           ELSE 'test' END AS split
    FROM documents ORDER BY doc_id"""))

  /** Stratified sample: up to 20 docs per language, chosen by hash
    * order (deterministic, unbiased within stratum). One shuffle on
    * the stratum key; at 100 TB the quota bounds the output per
    * group regardless of stratum skew.
    */
  val stratified = QueryDef(
    "sample_stratified",
    (s, d) => {
      val w = Window.partitionBy("lang")
        .orderBy(TextAnalysis.hash60(concat(lit("strat:"), col("text"))), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"))
        .withColumn("pick_rank", row_number().over(w).cast(LongType))
        .filter(col("pick_rank") <= 20)
        .select("doc_id", "lang", "pick_rank")
    },
    Some(s"""WITH ranked AS (
      SELECT doc_id, lang,
        CAST(ROW_NUMBER() OVER (PARTITION BY lang
          ORDER BY ${TextAnalysis.hash60Sql("'strat:' || text")}, doc_id) AS BIGINT) AS pick_rank
      FROM documents)
    SELECT doc_id, lang, pick_rank FROM ranked WHERE pick_rank <= 20
    ORDER BY lang, pick_rank"""))

  /** Sequence packing (the concat-and-chunk dataloader shape): within
    * each language stream, documents are laid out in a deterministic
    * hash order and chunked into fixed token-budget bins; each doc
    * reports the bin its first token lands in plus its offset there.
    * Downstream, one bin = one training sequence (docs straddle bin
    * boundaries exactly as a real packed dataloader lets them).
    *
    * Scale shape: the running sum is two-phase over (lang, hash-top-8
    * shard) windows — the shard is the top bits of the ordering hash,
    * so shard-major order IS hash order and global cum = broadcast
    * shard-prefix offset + local cum; no window ever spans a whole
    * language (see [[tokenBudget]] for the full argument — identical
    * machinery, and the PlanSpec guard covers both). Token counts
    * reuse text_tokens' whitespace tokenizer.
    */
  /** Two-phase sharded running token total — THE prefix-sum machinery
    * shared by [[packSequences]] and [[tokenBudget]] (one body, so a
    * change to the shard width, frame bounds, or tie order cannot be
    * applied to one and missed in the other): adds `cum_tokens`, the
    * running `n_tokens` total per `key` in (h, doc_id) order, without
    * any window ever spanning a whole key's history — top-8-bit-of-h
    * shard local cumsums + a broadcast exclusive shard-offset join.
    * Input needs (key, doc_id, n_tokens, h).
    */
  private[operators] def shardedCumTokens(docs: org.apache.spark.sql.DataFrame,
      key: String): org.apache.spark.sql.DataFrame = {
    val withShard = docs.withColumn("shard", shiftright(col("h"), 52))
    val offsets = withShard.groupBy(key, "shard")
      .agg(sum("n_tokens").as("shard_tokens"))
      .withColumn("offset", coalesce(
        sum(col("shard_tokens")).over(
          Window.partitionBy(key).orderBy("shard")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(key, "shard", "offset")
    val wLocal = Window.partitionBy(key, "shard")
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withShard.withColumn("cum_local", sum(col("n_tokens")).over(wLocal))
      .join(broadcast(offsets), Seq(key, "shard"))
      .withColumn("cum_tokens", col("offset") + col("cum_local"))
  }

  val packSequences = QueryDef(
    "pack_sequences",
    (s, d) => {
      val BinTokens = 512L
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
          TextAnalysis.hash60(concat(lit("pack:"), col("text"))).as("h"))
      shardedCumTokens(docs, "lang")
        .withColumn("start_offset", (col("cum_tokens") - col("n_tokens")) % BinTokens)
        .withColumn("bin_id", expr(s"(cum_tokens - n_tokens) div $BinTokens"))
        .select("doc_id", "lang", "n_tokens", "bin_id", "start_offset")
    },
    Some(s"""WITH t AS (
      SELECT doc_id, lang,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
          PARTITION BY lang
          ORDER BY ${TextAnalysis.hash60Sql("'pack:' || text")}, doc_id
          ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM documents)
    SELECT doc_id, lang, n_tokens,
      CAST((cum_tokens - n_tokens) // 512 AS BIGINT) AS bin_id,
      CAST((cum_tokens - n_tokens) % 512 AS BIGINT) AS start_offset
    FROM t"""))

  /** Quality-weighted Bernoulli (Poisson) sampling: each doc is kept
    * with probability proportional to its weight — here length-capped
    * `n_chars`, the stand-in for any per-doc quality score — via an
    * EXACT integer threshold test on a content hash, so the sample is
    * deterministic, append-stable, and bit-identical cross-engine (no
    * float exp/log in the decision). `ht_weight` is the
    * Horvitz-Thompson inverse-inclusion-probability weight downstream
    * estimators need to stay unbiased over the sample.
    *
    * Scale shape: a narrow per-row filter on the scan — no shuffle,
    * no state; the standard importance-sampling first stage for
    * trillion-doc corpora.
    */
  val weighted = QueryDef(
    "sample_weighted",
    (s, d) => {
      val w = least(col("n_chars"), lit(4096L))
      val u = pmod(TextAnalysis.hash60(concat(lit("wsamp:"), col("text"))), lit(8192L))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
        .filter(u < w)
        .select(col("doc_id"), col("lang"), w.as("weight"),
          (lit(8192.0) / w).as("ht_weight"))
    },
    Some(s"""SELECT doc_id, lang,
      LEAST(n_chars, 4096) AS weight,
      8192.0 / LEAST(n_chars, 4096) AS ht_weight
    FROM documents
    WHERE ${TextAnalysis.hash60Sql("'wsamp:' || text")} % 8192 < LEAST(n_chars, 4096)"""))

  /** Multilingual mixture weights by temperature resampling
    * (alpha = 0.5): a language's sampling share is n^alpha
    * renormalized, flattening the head languages and boosting the
    * tail — the standard knob for balancing a multilingual training
    * mix. alpha = 0.5 is computed as IEEE sqrt (bit-identical in
    * both engines); the tiny cross-language normalizer uses the
    * Det decimal-sum rule so the double sum is order-independent.
    *
    * Scale shape: one partial+final count aggregate over the corpus,
    * then arithmetic on L rows (L = #languages) broadcast back —
    * nothing here grows with corpus size except the initial count.
    */
  val mixWeights = QueryDef(
    "mix_weights",
    (s, d) => {
      val targetTotal = 100000L
      val byLang = Tables.documents(s, d)
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
        .withColumn("w_raw", sqrt(col("n_docs").cast(DoubleType)))
      val denom = byLang.agg(Det.sumd(col("w_raw")).as("denom"))
      byLang.crossJoin(broadcast(denom))
        .select(col("lang"), col("n_docs"),
          (col("w_raw") / col("denom")).as("mix_share"),
          round(lit(targetTotal) * (col("w_raw") / col("denom")))
            .cast(LongType).as("target_docs"))
    },
    Some(s"""WITH counts AS (
      SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
    scored AS (
      SELECT lang, n_docs, SQRT(CAST(n_docs AS DOUBLE)) AS w_raw FROM counts),
    norm AS (
      SELECT ${Det.dsum("w_raw")} AS denom FROM scored)
    SELECT lang, n_docs,
      w_raw / denom AS mix_share,
      CAST(ROUND(100000 * (w_raw / denom)) AS BIGINT) AS target_docs
    FROM scored, norm"""))

  private[graft] val BfdCap = 512L
  private[graft] val BfdShards = 8

  /** Whole-document best-fit-decreasing packing — the NO-SPLIT
    * companion to [[packSequences]]: `pack_sequences` tiles the token
    * stream and cuts documents at bin boundaries (the GPT-style
    * concat-then-chunk); this keeps every document intact (the
    * packing used when cross-document attention is masked and a
    * split document would corrupt examples), minimizing padding by
    * BFD — sort docs by descending token count, place each in the
    * FULLEST bin it still fits (tie: lowest bin id), else open a new
    * bin. Docs longer than the bin cap are truncated to it and sit
    * alone. BFD guarantees ≤ (11/9)·OPT + 1 bins; PackBfdSpec
    * measures the fill rate against the ceil(total/cap) lower bound.
    *
    * Scale shape: bin packing is inherently sequential, so it runs
    * hierarchically — docs group by (lang, shard) where shard is a
    * content-hash bucket ([[BfdShards]] here; production sizes it so
    * one shard's (doc_id, n_tokens) pairs fit an executor), each
    * group packs independently in one `flatMapGroups` pass over only
    * the id+length pairs (text never enters the group), and bin ids
    * are globally unique as (shard, local bin). The cost of
    * hierarchy: per-shard BFD wastes at most one partial bin per
    * shard vs global BFD — bounded, measured in the spec.
    *
    * Oracle-hash-checked since r8 (formerly "a sequential fold is not
    * SQL-expressible"): BFD is a LEFT FOLD over the sorted (id, n)
    * list, and DuckDB's `list_reduce` is exactly that — the oracle
    * folds each (lang, shard) group with the packing state encoded as
    * ONE FLAT BIGINT[] (`[nbins, free_1..free_nbins, (id, bin, n)*]`,
    * elements as `[id, n]`). The flat encoding is load-bearing, not
    * style: DuckDB v1.0.0 silently drops LIST-typed FIELDS of a
    * STRUCT accumulator across list_reduce steps (scalar fields fold
    * fine, top-level lists fold fine — probed while building this),
    * so a struct-of-lists state loses its bins. PackBfdSpec remains
    * the algorithmic gate (capacity, conservation, fill bound,
    * determinism); the oracle adds the cross-engine bit-match of the
    * exact best-fit/tie-break/bin-id sequence.
    */
  val packBfd = QueryDef(
    "pack_bfd",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          least(size(split(col("text"), " ")).cast(LongType), lit(BfdCap))
            .as("n_tokens"),
          pmod(TextAnalysis.hash60(concat(lit("bfd:"), col("text"))),
            lit(BfdShards.toLong)).as("shard"))
        .as[(Long, String, Long, Long)]
        .groupByKey { case (_, lang, _, shard) => (lang, shard) }
        .flatMapGroups { (key: (String, Long), docs: Iterator[(Long, String, Long, Long)]) =>
          val (lang, shard) = key
          // BFD over (n_tokens DESC, doc_id) — deterministic total
          // order; bins as (id, free) with best-fit = min free that
          // still fits, tie lowest id.
          val sorted = docs.map { case (id, _, n, _) => (id, n) }
            .toIndexedSeq.sortBy { case (id, n) => (-n, id) }
          val free = scala.collection.mutable.ArrayBuffer[Long]()
          sorted.iterator.map { case (id, n) =>
            var best = -1
            var i = 0
            while (i < free.length) {
              if (free(i) >= n && (best == -1 || free(i) < free(best))) best = i
              i += 1
            }
            if (best == -1) { free += (BfdCap - n); best = free.length - 1 }
            else free(best) -= n
            (id, lang, shard, best.toLong, n)
          }
        }
        .toDF("doc_id", "lang", "shard", "bin_id", "n_tokens")
    },
    Some {
      // state = [nbins] || free(1..nbins) || (id, bin, n) triples;
      // element = [id, n]. free[i] lives at acc[i + 1].
      val elig = "list_filter(acc[2 : acc[1] + 1], f -> f >= x[2])"
      val best = s"list_min($elig)"
      val idx = s"list_position(acc[2 : acc[1] + 1], $best)" // 1-based in free
      val h60 = TextAnalysis.hash60Sql
      s"""WITH docs AS (
        SELECT doc_id, lang,
          LEAST(CAST(len(string_split(text, ' ')) AS BIGINT), $BfdCap) AS n,
          ${h60("'bfd:' || text")} % $BfdShards AS shard
        FROM documents),
      grouped AS (
        SELECT lang, shard, list([doc_id, n] ORDER BY n DESC, doc_id) AS ds
        FROM docs GROUP BY lang, shard),
      folded AS (
        SELECT lang, shard,
          list_reduce(
            list_prepend(CAST([0] AS BIGINT[]), ds),
            (acc, x) -> CASE
              WHEN len($elig) = 0 THEN
                list_concat(list_concat(list_concat(
                  [acc[1] + 1], acc[2 : acc[1] + 1]), [$BfdCap - x[2]]),
                  list_concat(acc[acc[1] + 2 :], [x[1], acc[1], x[2]]))
              ELSE
                list_concat(list_concat(list_concat(list_concat(
                  [acc[1]], acc[2 : $idx]), [$best - x[2]]),
                  acc[$idx + 2 : acc[1] + 1]),
                  list_concat(acc[acc[1] + 2 :], [x[1], $idx - 1, x[2]]))
            END) AS st
        FROM grouped)
      SELECT st[CAST(st[1] + 2 + 3 * t.k AS INT)] AS doc_id, lang, shard,
        st[CAST(st[1] + 3 + 3 * t.k AS INT)] AS bin_id,
        st[CAST(st[1] + 4 + 3 * t.k AS INT)] AS n_tokens
      FROM folded,
        LATERAL (SELECT unnest(range(0, (len(st) - st[1] - 1) // 3)) AS k) t
      ORDER BY doc_id"""
    })

  /** Mixture-drift KL audit — the QA number a mixing stage reports
    * after reweighting: KL(observed language distribution ‖ uniform)
    * in nats. Zero when perfectly flat ([[mixWeights]]' alpha→0
    * target), growing as one language dominates; tracked per
    * ingestion batch it is the drift alarm for the sampler upstream.
    *
    * Exact cross-engine arithmetic: with c_l docs of language l of N
    * total over L languages, KL = Σ (c_l/N)(ln c_l − ln N + ln L) —
    * every ln is the shared integer [[Select.ln9big]] (mantissa table
    * + bit-shift, 1e-9 fixed point). The weighted term c·Δln9 and its
    * sum run in DECIMAL (c as DECIMAL(18,0) × Δln9 as DECIMAL(20,0) →
    * exact DECIMAL(38,0) products and sum in BOTH engines — the
    * [[graft.Det]] rule applied to integers): a Long product would
    * wrap at c·ln(N)·1e9 ≈ 2^63 around 1e8-doc languages, far below
    * the 100-TB regime this audit targets, and Spark's non-ANSI Long
    * sum wraps silently while DuckDB promotes to HUGEINT. Headroom in
    * decimal: at N = 1e14 docs the largest |product| is ~3e24 and the
    * sum ≤ N·ln(L)·1e9 ≈ 4e23·L — 13 orders under DECIMAL(38,0).
    * Only the final /N/1e9 touches floating point (one fixed-shape
    * division on identical operands). One caveat: the DECIMAL(38,0)
    * → DOUBLE cast feeding that division is the single step whose
    * cross-engine bit-identity is EMPIRICAL (gate-checked), not
    * proven — Spark's BigDecimal.doubleValue rounds correctly, while
    * DuckDB's wide-decimal→double conversion is not documented as
    * correctly rounded, so a sum exceeding 2^63 (N ≳ 1e9 docs in one
    * language) could in principle differ by 1 ulp before the
    * division.
    *
    * Scale: one map-combinable lang count (languages-sized exchange),
    * a broadcast one-row total, one L-row reduce.
    */
  val mixKl = QueryDef(
    "mix_kl",
    (s, d) => {
      import graft.operators.Select.ln9big
      val counts = Tables.documents(s, d)
        .groupBy("lang").agg(count(lit(1)).as("c"))
      val tot = counts.agg(sum(col("c")).as("n"), count(lit(1)).as("l"))
      counts.crossJoin(broadcast(tot))
        .groupBy("n", "l")
        .agg(sum(col("c").cast(DecimalType(18, 0)) *
          (ln9big(col("c")) - ln9big(col("n")) + ln9big(col("l")))
            .cast(DecimalType(20, 0))).as("s9"))
        .select(col("l").as("n_langs"), col("n").as("n_docs"),
          (col("s9").cast(DoubleType) / col("n") / 1e9).as("kl_uniform_nats"))
    },
    Some {
      import graft.operators.Select.{ln9bigSql, lntCte}
      s"""WITH $lntCte,
    counts AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS l FROM counts)
    SELECT l AS n_langs, n AS n_docs,
      CAST(SUM(CAST(c AS DECIMAL(18,0))
        * CAST((${ln9bigSql("c")} - ${ln9bigSql("n")} + ${ln9bigSql("l")})
          AS DECIMAL(20,0)))
        AS DOUBLE) / n / 1e9 AS kl_uniform_nats
    FROM counts, tot, lnt GROUP BY n, l"""
    })

  /** Greedy token-budget fill per source at sampling temperature
    * alpha = 0.5 — the step that turns [[mixWeights]]' SHARES into an
    * actual document selection: a training run wants "the first T
    * tokens of each source, apportioned by the temperature mix", not
    * a per-document probability. Each source gets
    * budget_s = floor(T · sqrt(mass_s)/Σ sqrt(mass)), its documents
    * are ordered by a content-derived hash (stable under
    * re-partitioning and appends, like every sampler here), and the
    * greedy fill keeps documents until the budget is crossed — the
    * crossing document is kept, so every non-empty source reaches its
    * budget exactly once.
    *
    * Cross-engine exactness: sqrt is IEEE-bit-identical, the
    * L-row normalizer goes through [[Det]]'s order-independent
    * decimal sum, and everything after the one floor() is integer
    * window arithmetic.
    *
    * Scale shape — the running sum is TWO-PHASE, never a whole-source
    * window: source cardinality is a handful, so a plain
    * (source)-partitioned window would sort an entire source in one
    * task (the same trap text_ppl_bucket's per-language ranking
    * escaped in round 5). The hash h is uniform on [0, 2^60) and the
    * shard is its TOP 8 bits, so ordering by (shard, h, doc_id) IS
    * ordering by (h, doc_id): per-(source, shard) windows are bounded
    * at ~1/256 of a source at any corpus size, the per-shard token
    * totals aggregate to sources×256 tiny rows whose exclusive prefix
    * is the shard offset, and global cum = offset + local cum —
    * bit-identical to the naive single window (the oracle keeps the
    * naive SQL form). Production sizes the shard width to its
    * executors; the plan shape is unchanged.
    */
  /** (doc_id, source, n_tokens, h) from a (doc_id, source, text)
    * relation — the token/ordering-hash projection [[tokenBudget]] and
    * its streaming twin ([[graft.streaming.BudgetStream]]) share, so
    * the live path cannot drift from the batch oracle.
    */
  private[graft] def budgetTokenCols(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
      TextAnalysis.hash60(concat(lit("budget:"), col("text"))).as("h"))

  /** Per-source token budgets at temperature alpha = 0.5 over a
    * [[budgetTokenCols]] relation — shared with the streaming twin's
    * bootstrap (a stream cannot derive budgets from unseen mass, so a
    * deployment computes them on the bootstrap corpus or passes
    * explicit ones).
    */
  private[graft] def sourceBudgets(docs: DataFrame, T: Long): DataFrame = {
    val bySrc = docs.groupBy("source").agg(sum("n_tokens").as("mass"))
      .withColumn("w_raw", sqrt(col("mass").cast(DoubleType)))
    val denom = bySrc.agg(Det.sumd(col("w_raw")).as("denom"))
    bySrc.crossJoin(broadcast(denom))
      .select(col("source"),
        floor(lit(T) * (col("w_raw") / col("denom")))
          .cast(LongType).as("budget"))
  }

  val tokenBudget = QueryDef(
    "sample_token_budget",
    (s, d) => {
      val T = 10000L
      val docs = budgetTokenCols(Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text")))
      val budgets = sourceBudgets(docs, T)
      shardedCumTokens(docs, "source")
        .join(broadcast(budgets), "source")
        .filter(col("cum_tokens") - col("n_tokens") < col("budget"))
        .select("source", "doc_id", "n_tokens", "cum_tokens")
    },
    Some(s"""WITH docs AS (
      SELECT doc_id, source,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        ${TextAnalysis.hash60Sql("'budget:' || text")} AS h
      FROM documents),
    mass AS (SELECT source, SUM(n_tokens) AS mass FROM docs GROUP BY source),
    scored AS (SELECT source, SQRT(CAST(mass AS DOUBLE)) AS w_raw FROM mass),
    norm AS (SELECT ${Det.dsum("w_raw")} AS denom FROM scored),
    budgets AS (
      SELECT source, CAST(FLOOR(10000 * (w_raw / denom)) AS BIGINT) AS budget
      FROM scored, norm),
    cum AS (
      SELECT d.source, d.doc_id, d.n_tokens, b.budget,
        CAST(SUM(d.n_tokens) OVER (PARTITION BY d.source ORDER BY d.h, d.doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
      FROM docs d JOIN budgets b ON d.source = b.source)
    SELECT source, doc_id, n_tokens, cum_tokens
    FROM cum WHERE cum_tokens - n_tokens < budget
    ORDER BY source, doc_id"""))

  val defs: Seq[QueryDef] = Seq(hashSplit, stratified, packSequences, weighted,
    mixWeights, packBfd, mixKl, tokenBudget)
}
