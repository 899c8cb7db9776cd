package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-global text operators: transforms whose decision for one
  * document depends on statistics of the WHOLE corpus (unlike the
  * per-row TextAnalysis family). Both are standard LLM training-data
  * passes: cross-document segment dedup (the C4/RefinedWeb "remove
  * repeated spans" step) and vocabulary OOV-rate scoring (tokenizer
  * coverage QA).
  *
  * Scale posture: each operator is explode -> one map-combinable
  * global aggregate -> join back -> one per-doc aggregate. The wide
  * exchanges carry one row per distinct segment/token — corpus
  * vocabulary, not corpus size — and the per-doc reassembly shuffles
  * each token/segment exactly once on doc_id.
  */
object Corpus {

  private[graft] val SegWords = 8

  /** Cross-document segment dedup, the C4-family pass at the
    * granularity this corpus supports (texts are single-line word
    * streams, so "lines"/"sentences" are re-expressed as
    * NON-OVERLAPPING [[SegWords]]-word segments; the final short
    * remainder of each doc is its own segment).
    *
    * Policy: a segment whose exact text appears in more than one
    * document is boilerplate — removed from EVERY document (the
    * RefinedWeb drop-all variant; keep-one requires a per-segment
    * argmin pass that doubles the joins for little curation value).
    * Docs are reassembled from their surviving segments in order;
    * fully-boilerplate docs survive as empty text so downstream
    * length filters see them.
    *
    * Plan shape: segment explode (posexplode over an index sequence,
    * split() evaluated once per row) -> global df count on the
    * segment TEXT (partial/final, the exchange carries distinct
    * segments) -> broadcast-eligible join back -> groupBy doc_id with
    * an order-restoring array_sort (collect_list order is
    * partition-dependent; the sort key makes reassembly
    * deterministic).
    */
  val segmentDedup = QueryDef(
    "dedup_segments",
    (s, d) => {
      val ws = split(col("text"), " ")
      val nSegs = ceil(size(ws).cast(DoubleType) / SegWords).cast(IntegerType)
      val segs = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(transform(
          sequence(lit(0), nSegs - 1),
          i => concat_ws(" ", slice(ws, i * SegWords + 1, lit(SegWords)))))
          .as(Seq("seg_idx", "seg")))
      val dfCounts = segs.groupBy("seg")
        .agg(countDistinct(col("doc_id")).as("seg_df"))
      val kept = segs.join(dfCounts, "seg").filter(col("seg_df") === 1)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept_segs"),
          concat_ws(" ", transform(
            array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
            x => x("seg"))).as("clean_text"))
      Tables.documents(s, d)
        .select(col("doc_id"), (ceil(size(split(col("text"), " "))
          .cast(DoubleType) / SegWords)).cast(LongType).as("n_segs"))
        .join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_segs"),
          coalesce(col("n_kept_segs"), lit(0L)).as("n_kept_segs"),
          coalesce(col("clean_text"), lit("")).as("clean_text"))
    },
    Some(s"""WITH segs AS (
      SELECT doc_id, i AS seg_idx,
        array_to_string(string_split(text, ' ')[(i * $SegWords + 1):(i * $SegWords + $SegWords)], ' ') AS seg
      FROM documents,
        LATERAL (SELECT unnest(range(0, CAST(ceil(len(string_split(text, ' ')) / $SegWords.0) AS INT)))) t(i)),
    df AS (
      SELECT seg, COUNT(DISTINCT doc_id) AS seg_df FROM segs GROUP BY seg),
    kept AS (
      SELECT doc_id, COUNT(*) AS n_kept_segs,
        string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text
      FROM segs JOIN df USING (seg)
      WHERE seg_df = 1
      GROUP BY doc_id)
    SELECT d.doc_id,
      CAST(ceil(len(string_split(d.text, ' ')) / $SegWords.0) AS BIGINT) AS n_segs,
      COALESCE(k.n_kept_segs, 0) AS n_kept_segs,
      COALESCE(k.clean_text, '') AS clean_text
    FROM documents d LEFT JOIN kept k ON d.doc_id = k.doc_id
    ORDER BY d.doc_id"""))

  private val VocabK = 20

  /** Tokenizer-coverage QA: build the corpus top-[[VocabK]] token
    * vocabulary (count desc, token asc — deterministic at the rank
    * boundary), then score every document's out-of-vocabulary token
    * rate against it. High OOV flags encoding damage, wrong-language
    * slices, or domain drift before tokenizer training.
    *
    * The vocabulary aggregate's exchange carries one row per DISTINCT
    * token and the top-K is a TakeOrdered (per-partition heaps); the
    * K-row vocab then broadcasts into the token stream, so the only
    * data-sized shuffle is the per-doc count on doc_id.
    */
  val vocabOov = QueryDef(
    "vocab_oov",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok"))
        .limit(VocabK)
        .select(col("tok").as("v_tok"))
      toks.join(broadcast(vocab), col("tok") === col("v_tok"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("v_tok").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_rate",
          col("n_oov").cast(DoubleType) / col("n_tokens"))
    },
    Some(s"""WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    vocab AS (
      SELECT tok AS v_tok FROM (
        SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
        ORDER BY n DESC, tok LIMIT $VocabK))
    SELECT doc_id, COUNT(*) AS n_tokens,
      CAST(SUM(CASE WHEN v_tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      CAST(SUM(CASE WHEN v_tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS oov_rate
    FROM toks LEFT JOIN vocab ON tok = v_tok
    GROUP BY doc_id ORDER BY doc_id"""))

  /** Per-source corpus health report — the dashboard query a training
    * -data team runs per crawl/source before mixing: volume (docs,
    * chars), language spread, mean quality (Det-deterministic), and
    * how much of the source is exact-duplicate content.
    *
    * Shape: one scan feeds both the content-hash duplicate count
    * (exchange carries distinct md5s) and the per-source rollup; the
    * per-doc quality score reuses the single-pass column form of
    * [[TextAnalysis.quality]], so the report is consistent with the
    * standalone query by construction.
    */
  val corpusStats = QueryDef(
    "corpus_stats",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("lang"), col("text"),
          md5(col("text")).as("h"))
      val dupCounts = docs.groupBy("h").agg(count(lit(1)).as("h_cnt"))
      docs.join(dupCounts, "h")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(length(col("text"))).cast(LongType).as("total_chars"),
          // floor-quantized mean: floor(q*1e6) of bit-identical doubles
          // is bit-identical, and the integer sum is order-independent
          // — sidesteps the double->decimal cast whose last-ulp
          // rounding differs across engines on arbitrary score values
          (sum(floor(TextAnalysis.qualityScoreCol(col("text")) * 1e6))
            .cast(DoubleType) / 1e6 / count(lit(1))).as("avg_quality"),
          sum(when(col("h_cnt") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
    },
    Some {
      // the ONE SQL spelling of the quality formula (a hand copy here
      // would drift from text_quality's if the formula ever changes)
      val qualityExpr = TextAnalysis.qualityScoreSql
      s"""WITH dup AS (
      SELECT md5(text) AS h, COUNT(*) AS h_cnt FROM documents GROUP BY 1)
    SELECT source, COUNT(*) AS n_docs,
      COUNT(DISTINCT lang) AS n_langs,
      CAST(SUM(length(text)) AS BIGINT) AS total_chars,
      CAST(SUM(FLOOR(($qualityExpr) * 1e6)) AS DOUBLE) / 1e6 / COUNT(*) AS avg_quality,
      CAST(SUM(CASE WHEN h_cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
    FROM documents JOIN dup ON md5(text) = h
    GROUP BY source ORDER BY source"""
    })

  /** Corpus top tokens via graft's mergeable Misra-Gries sketch
    * ([[graft.functions.FreqSketchAgg]]) — the bounded-state answer to
    * "what are the heavy hitters" when the item domain dwarfs memory:
    * the exchange carries at most k counters per map partition instead
    * of one row per distinct item.
    *
    * Capacity k=64 exceeds this corpus's vocabulary, so the sketch
    * runs in its EXACT regime (no decrement ever fires, estimates are
    * true counts) — which is what makes the query deterministic and
    * fully oracle-checkable against a plain GROUP BY. The lossy
    * regime's guarantees (superset of true heavy hitters,
    * under-estimates within n/(k+1)) are property-tested on skewed
    * synthetic data in FreqSketchSpec.
    */
  val heavyHitters = QueryDef(
    "text_heavy_hitters",
    (s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .agg(graft.functions.FreqSketchAgg.topItems(col("tok"), 64).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.item").as("item"), col("e.est").as("est"))
        .orderBy(col("est").desc, col("item"))
        .limit(20)
    },
    Some("""SELECT tok AS item, COUNT(*) AS est
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY 1 ORDER BY est DESC, item LIMIT 20"""))

  /** Per-document TF-IDF top terms — the classic "what is this doc
    * about" signal (retrieval indexing, near-dup explanation, topic
    * drift QA). Smooth idf = ln((N+1)/(df+1)).
    *
    * Determinism note: idf needs ln over data-dependent ratios, and
    * engine libm implementations may differ in the final ulp. Both
    * RANKING and output therefore use the score rounded to 6 decimals
    * — a 1-ulp (~1e-16) discrepancy cannot move a 6-dp rounding
    * except on exact half-way ties, which the irrational ln products
    * cannot produce — and rank ties break on the token. (The entropy
    * operator's inlined-table trick is exact but needs a table entry
    * per possible df value = per corpus doc; at corpus scale that
    * literal outgrows the plan, so rounding is the honest scale-safe
    * choice here.)
    *
    * Shape: (doc, tok) counts -> df per token (exchange carries the
    * vocabulary) -> broadcast N -> per-doc top-3 via row_number over
    * the doc_id partitioning the counts already have.
    */
  val tfidf = QueryDef(
    "text_tfidf",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val counts = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .withColumn("n_doc", sum(col("c")).over(Window.partitionBy("doc_id")))
      val dfPerTok = counts.groupBy("tok")
        .agg(count(lit(1)).as("df"))
      val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_corpus"))
      val scored = counts
        .join(dfPerTok, "tok")
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf", round(
          (col("c").cast(DoubleType) / col("n_doc")) *
            log((col("n_corpus") + 1).cast(DoubleType) / (col("df") + 1)), 6))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tfidf").desc, col("tok"))
      scored.withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= 3)
        .select("doc_id", "rk", "tok", "c", "df", "tfidf")
    },
    Some("""WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    counts AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
    with_n AS (
      SELECT *, SUM(c) OVER (PARTITION BY doc_id) AS n_doc FROM counts),
    dfs AS (
      SELECT tok, COUNT(*) AS df FROM counts GROUP BY tok),
    scored AS (
      SELECT doc_id, tok, c, df,
        round((CAST(c AS DOUBLE) / n_doc)
          * ln(CAST((SELECT COUNT(*) FROM documents) + 1 AS DOUBLE) / (df + 1)), 6) AS tfidf
      FROM with_n JOIN dfs USING (tok)),
    ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY tfidf DESC, tok) AS BIGINT) AS rk
      FROM scored)
    SELECT doc_id, rk, tok, c, df, tfidf FROM ranked WHERE rk <= 3
    ORDER BY doc_id, rk"""))

  private val KmvK = 256
  private val KmvSpace = 1L << 48 // 48-bit hashes: exact under the double order key

  /** KMV (k-minimum-values) / theta-style overlap sketch between the
    * train (even doc_id) and validation (odd doc_id) halves of the
    * corpus — the train/val CONTAMINATION estimate at sketch cost.
    * This is the set operation HLL fundamentally cannot do: HLL
    * registers merge under union only; KMV keeps the k smallest
    * distinct hashes per side, which is simultaneously a distinct-
    * count estimator (est = (k-1)·2^48 / h_k) and a uniform SAMPLE,
    * so intersecting the samples below theta = min(theta_a, theta_b)
    * estimates the overlap (|matched| · 2^48 / theta).
    *
    * Scale shape: per-side k-minima run through [[graft.plans.GraftOps
    * .topKPerKey]] — the custom partial+final bounded-heap operator —
    * so every partition contributes at most k rows to the exchange
    * and the full shingle sets never shuffle; the sketch columns are
    * ~k rows total by the final stage. 48-bit md5-prefix hashes keep
    * the operator's double order key exact (2^48 < 2^53) and the
    * arithmetic bit-equal on both engines; a production deployment
    * would use xxhash64 and a larger k.
    *
    * Everything downstream of the k-minima is deterministic integer /
    * exact-double arithmetic, so the DuckDB oracle replicates the
    * ESTIMATES bit-for-bit — the hash-match proves the sketch, not
    * just the plumbing. Estimator error (~1/sqrt(k-2) relative) is
    * measured in OverlapSketchSpec against exact counts.
    */
  val overlapSketch = QueryDef(
    "q_overlap_sketch",
    (s, d) => {
      val h48 = conv(substring(md5(col("g0")), 1, 12), 16, 10).cast(LongType)
      // multiset shingles + the DISTINCT bounded heap (r17): KMV needs
      // the k smallest DISTINCT hashes per side, and the old
      // dropDuplicates paid a FULL-stream (side, h) exchange before
      // the heap ever saw a row — at corpus scale the query's largest
      // shuffle, for rows the sketch then discards. topKPerKeyDistinct
      // dedups inside the per-partition heap (each partition's k
      // distinct minima are a superset of its contribution to the
      // global k), so the exchange now carries <= k rows per partition.
      val hashes = Dedup.shingleStringsMulti(s, d)
        .select((col("doc_id") % 2).as("side"), h48.as("h"))
      val topk = graft.plans.GraftOps.topKPerKeyDistinct(
        hashes.withColumn("neg", -col("h")), Seq(col("side")), col("neg"), col("h"), KmvK)
        .select("side", "h")
      val th = topk.groupBy("side")
        .agg(max(col("h")).as("theta"), count(lit(1)).as("n"))
      def est(theta: Column, n: Column): Column =
        when(n < KmvK, n.cast(DoubleType))
          .otherwise(floor(lit((KmvK - 1).toDouble) * KmvSpace / theta))
          .cast(LongType)
      val ta = th.filter(col("side") === 0)
        .select(col("theta").as("th_a"), col("n").as("n_a"))
      val tb = th.filter(col("side") === 1)
        .select(col("theta").as("th_b"), col("n").as("n_b"))
      val tj = ta.crossJoin(tb).withColumn("th", least(col("th_a"), col("th_b")))
      val matched = topk.filter(col("side") === 0).select(col("h"))
        .join(topk.filter(col("side") === 1).select(col("h")), Seq("h"))
        .crossJoin(broadcast(tj.select(col("th").as("th_m"))))
        .filter(col("h") < col("th_m"))
        .agg(count(lit(1)).as("n_match"))
      tj.crossJoin(matched)
        .select(
          est(col("th_a"), col("n_a")).as("est_distinct_train"),
          est(col("th_b"), col("n_b")).as("est_distinct_valid"),
          floor(col("n_match").cast(DoubleType) * KmvSpace / col("th"))
            .cast(LongType).as("est_intersection"))
        .withColumn("est_jaccard",
          floor(col("est_intersection").cast(DoubleType) * 1e6 /
            (col("est_distinct_train") + col("est_distinct_valid") - col("est_intersection"))) / 1e6)
    },
    Some(s"""WITH sh AS (
      SELECT doc_id, unnest(list_distinct(${TextAnalysis.shinglesSql("text")})) AS g0
      FROM documents),
    dh AS (SELECT DISTINCT doc_id % 2 AS side,
             ('0x' || substr(md5(g0), 1, 12))::BIGINT AS h FROM sh),
    topk AS (SELECT side, h FROM (
        SELECT side, h, row_number() OVER (PARTITION BY side ORDER BY h) AS rk FROM dh)
      WHERE rk <= $KmvK),
    th AS (SELECT side, max(h) AS theta, count(*) AS n FROM topk GROUP BY side),
    tj AS (SELECT a.theta AS th_a, a.n AS n_a, b.theta AS th_b, b.n AS n_b,
                  least(a.theta, b.theta) AS th
           FROM th a, th b WHERE a.side = 0 AND b.side = 1),
    m AS (SELECT count(*) AS n_match
          FROM topk a JOIN topk b ON a.h = b.h AND a.side = 0 AND b.side = 1
          JOIN tj ON a.h < tj.th),
    e AS (SELECT
      CAST(CASE WHEN n_a < $KmvK THEN CAST(n_a AS DOUBLE)
                ELSE floor(${(KmvK - 1).toDouble} * $KmvSpace / th_a) END AS BIGINT) AS est_distinct_train,
      CAST(CASE WHEN n_b < $KmvK THEN CAST(n_b AS DOUBLE)
                ELSE floor(${(KmvK - 1).toDouble} * $KmvSpace / th_b) END AS BIGINT) AS est_distinct_valid,
      CAST(floor(CAST(n_match AS DOUBLE) * $KmvSpace / th) AS BIGINT) AS est_intersection
      FROM tj, m)
    SELECT est_distinct_train, est_distinct_valid, est_intersection,
      floor(CAST(est_intersection AS DOUBLE) * 1e6 /
        (est_distinct_train + est_distinct_valid - est_intersection)) / 1e6 AS est_jaccard
    FROM e"""))

  private val PmiMinPair = 5
  private val PmiTopK = 50

  /** Pointwise-mutual-information collocation mining — the phrase /
    * multi-word-expression discovery pass that feeds tokenizer-vocab
    * curation (which adjacent pairs deserve a single token) and
    * boilerplate diagnostics (template phrases surface as high-count
    * low-PMI pairs). For adjacent pair (a,b):
    *
    *   PMI = ln p(a,b) - ln p(a) - ln p(b)
    *       = ln c_ab - ln NB - ln c_a - ln c_b + 2 ln N
    *
    * with c from the unigram stream (N tokens) and c_ab from the
    * adjacent-pair stream (NB = N - n_docs pairs). Every ln input is
    * an integer count, so the whole score runs through [[Select
    * .ln9big]] — exact integer arithmetic end-to-end, hash-matched
    * against the DuckDB oracle computing the identical table lookup.
    * Pairs below [[PmiMinPair]] occurrences are dropped (classic MI
    * noise floor: hapax pairs otherwise dominate the ranking).
    *
    * Shape: two map-combined count aggregates (vocabulary- and
    * pair-vocabulary-sized exchanges — corpus-vocab, not corpus-size);
    * two equi-joins of the pair table against the unigram table; the
    * two global totals ride broadcast single-row cross joins; the
    * final top-k is TakeOrdered (per-partition heaps, no full sort).
    * Nothing in the plan scales with corpus row count except the two
    * initial scans.
    */
  val pmi = QueryDef(
    "text_pmi",
    (s, d) => {
      val ws = split(col("text"), " ")
      val docs = Tables.documents(s, d).select(ws.as("ws"))
      val uni = docs.select(explode(col("ws")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      val pairs = docs.select(explode(arrays_zip(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1))).as("p"))
        .select(col("p")("0").as("a"), col("p")("1").as("b"))
      val big0 = pairs.groupBy("a", "b").agg(count(lit(1)).as("cab"))
      val tot = uni.agg(sum(col("c")).as("n"))
      val btot = big0.agg(sum(col("cab")).as("nb"))
      import Select.ln9big
      big0.filter(col("cab") >= PmiMinPair)
        .join(uni.toDF("a", "ca"), "a")
        .join(uni.toDF("b", "cb"), "b")
        .crossJoin(broadcast(tot))
        .crossJoin(broadcast(btot))
        .withColumn("pmi_e9",
          ln9big(col("cab")) + lit(2L) * ln9big(col("n")) -
            ln9big(col("nb")) - ln9big(col("ca")) - ln9big(col("cb")))
        .select(concat_ws(" ", col("a"), col("b")).as("bigram"),
          col("cab").as("n_pair"), col("pmi_e9"))
        .orderBy(col("pmi_e9").desc, col("bigram"))
        .limit(PmiTopK)
    },
    Some {
      import Select.{ln9bigSql, lntCte}
      s"""WITH $lntCte,
      toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      uni AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
      pairs AS (
        SELECT ws[i] AS a, ws[i+1] AS b
        FROM (SELECT string_split(text, ' ') AS ws FROM documents),
             LATERAL (SELECT unnest(range(1, len(ws)))) t(i)),
      big0 AS (SELECT a, b, COUNT(*) AS cab FROM pairs GROUP BY a, b),
      tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
      btot AS (SELECT CAST(SUM(cab) AS BIGINT) AS nb FROM big0),
      scored AS (
        SELECT a || ' ' || b AS bigram, cab AS n_pair,
          ${ln9bigSql("cab")} + 2 * ${ln9bigSql("n")} - ${ln9bigSql("nb")}
            - ${ln9bigSql("ua.c")} - ${ln9bigSql("ub.c")} AS pmi_e9
        FROM big0
        JOIN uni ua ON ua.tok = a
        JOIN uni ub ON ub.tok = b
        CROSS JOIN tot CROSS JOIN btot CROSS JOIN lnt
        WHERE cab >= $PmiMinPair)
      SELECT bigram, n_pair, pmi_e9 FROM scored
      ORDER BY pmi_e9 DESC, bigram LIMIT $PmiTopK"""
    })

  /** Heaps-law vocabulary growth curve — the corpus-scaling
    * diagnostic behind "how much new data is still new": cumulative
    * distinct-word count at ten equal doc-count checkpoints. The
    * curve's flattening rate is the empirical Heaps exponent; a
    * corpus whose curve has plateaued yields mostly duplicate
    * vocabulary (and, by proxy, diminishing novel content) as it
    * grows.
    *
    * Single-pass shape — the naive formulation (distinct words per
    * prefix, ten times) rescans the corpus per checkpoint; instead
    * each word contributes ONE row at its FIRST appearance
    * (vocab-sized min-aggregate), first-appearances bucket by the
    * doc's decile rank, and one 10-row running sum yields every
    * checkpoint. The only corpus-sized exchange is the word
    * min-aggregate (map-combinable); the decile rank at 100 TB
    * comes from the ingest sequence id rather than the toy
    * row_number here (same integer bucketing either way).
    */
  val vocabGrowth = QueryDef(
    "corpus_vocab_growth",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val n = docs.count()
      val ranked = docs.select(col("doc_id"))
        .withColumn("rk", row_number().over(Window.orderBy("doc_id")))
        .withColumn("bucket", expr(s"((rk - 1) * 10) div $n") + 1)
      val firstSeen = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(min(col("doc_id")).as("fd"))
        .join(ranked.select(col("doc_id").as("fd"), col("bucket")), "fd")
        .groupBy("bucket").agg(count(lit(1)).as("nw"))
      val docCounts = ranked.groupBy("bucket").agg(count(lit(1)).as("nd"))
      val wCum = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docCounts.join(firstSeen, Seq("bucket"), "left")
        .select(col("bucket").cast(LongType).as("bucket"),
          col("nd"), coalesce(col("nw"), lit(0L)).as("nw"))
        .withColumn("docs_seen", sum(col("nd")).over(wCum))
        .withColumn("vocab_size", sum(col("nw")).over(wCum))
        .select("bucket", "docs_seen", "vocab_size")
    },
    Some("""WITH n AS (SELECT COUNT(*) AS n FROM documents),
    dr AS (
      SELECT doc_id,
        ((ROW_NUMBER() OVER (ORDER BY doc_id) - 1) * 10) // n.n + 1 AS bucket
      FROM documents CROSS JOIN n),
    fs AS (
      SELECT w, MIN(doc_id) AS fd FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w),
    wb AS (
      SELECT dr.bucket, COUNT(*) AS nw
      FROM fs JOIN dr ON dr.doc_id = fs.fd GROUP BY 1),
    db AS (SELECT bucket, COUNT(*) AS nd FROM dr GROUP BY 1)
    SELECT CAST(db.bucket AS BIGINT) AS bucket,
      CAST(SUM(db.nd) OVER (ORDER BY db.bucket
        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS docs_seen,
      CAST(SUM(COALESCE(wb.nw, 0)) OVER (ORDER BY db.bucket
        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
    FROM db LEFT JOIN wb ON wb.bucket = db.bucket
    ORDER BY bucket"""))

  val defs: Seq[QueryDef] = Seq(segmentDedup, vocabOov, corpusStats, heavyHitters,
    tfidf, overlapSketch, pmi, vocabGrowth)
}
