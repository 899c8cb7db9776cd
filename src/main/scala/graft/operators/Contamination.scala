package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents sharing word
  * n-grams with a held-out benchmark/eval set — the standard guard
  * against evaluation leakage in LLM training corpora.
  *
  * The benchmark side here is the deterministic pseudo-eval slice
  * `doc_id % BenchMod == 0` (the testdata ships no separate eval
  * table); swapping in a real benchmark table changes one line.
  *
  * Two n-gram lengths are reported per flagged doc: n=3 (high-recall,
  * over-flags on common phrases — the noisy screen) and n=5 (the
  * realistic decontamination length; 5-gram hits are near-certain
  * leakage). A shared 5-gram implies shared 3-grams, so the n=3 hit
  * set is a superset and the n=5 columns left-join onto it.
  *
  * Scale shape: candidate generation is an equi-join on the xxhash64'd
  * n-gram — one shuffle per level, no cross product; the benchmark
  * side of a real pipeline is small enough to broadcast. Production
  * corpora would also cap n-gram document frequency (as
  * [[Dedup.MaxShingleDf]] does for the jaccard join) — omitted here so
  * the flag means "shares ANY n-gram", the conservative screen.
  */
object Contamination {

  private[graft] val BenchMod = 53

  /** Distinct word n-grams per doc as (doc_id, g) hash rows — the
    * shared [[Dedup.ngramStrings]] builder without the short-doc
    * fallback (a 2-word doc cannot leak a 5-gram), hashed so the join
    * shuffles 8-byte keys.
    */
  private def ngramKeys(s: SparkSession, d: String, n: Int): DataFrame =
    Dedup.ngramStrings(s, d, n, shortDocFallback = false)
      .select(col("doc_id"), xxhash64(col("g0")).as("g"))

  /** Just the flagged training doc_ids at one n-gram level — the
    * yes/no screen a composition wants. Skips [[hitsAt]]'s two
    * countDistinct aggregates (whose multi-distinct Expand doubles the
    * joined-row fan-out) when only membership matters.
    *
    * Shape note: the "two" explosions are really 1.02 — the optimizer
    * pushes `%BenchMod = 0` below the bench-side explosion, so that
    * side scans and explodes only the eval slice (1/53 of docs), and
    * its distinct gram set broadcast-joins against the train grams
    * with ZERO train-side shuffle. A single-explosion window-flag
    * form was measured 30% slower end-to-end (it shuffles and sorts
    * the entire gram table by g) — the broadcast join is the shape
    * that holds at 100 TB, where the benchmark side is small by
    * construction.
    */
  private[operators] def contaminatedDocIds(s: SparkSession, d: String, n: Int): DataFrame = {
    val sh = ngramKeys(s, d, n)
    val bench = sh.filter(col("doc_id") % BenchMod === 0).select("g").distinct()
    sh.filter(col("doc_id") % BenchMod =!= 0)
      .join(broadcast(bench), "g")
      .select("doc_id").distinct()
  }

  /** Contamination hits at one n-gram level: (doc_id,
    * n{n}_shingles_shared, n{n}_benchmark_docs) for flagged training
    * docs.
    */
  private def hitsAt(s: SparkSession, d: String, n: Int): DataFrame = {
    val sh = ngramKeys(s, d, n)
    val bench = sh.filter(col("doc_id") % BenchMod === 0)
      .select(col("g"), col("doc_id").as("bench_id"))
    val train = sh.filter(col("doc_id") % BenchMod =!= 0)
    train.join(bench, "g")
      .groupBy("doc_id")
      .agg(countDistinct(col("g")).as(s"n${n}_shingles_shared"),
        countDistinct(col("bench_id")).as(s"n${n}_benchmark_docs"))
  }

  private def ngramListSql(n: Int): String = {
    val parts = (0 until n).map(k => s"w[i+$k]").mkString(" || ' ' || ")
    s"list_transform(range(1, len(w) - ${n - 2}), i -> $parts)"
  }

  private def hitsSql(n: Int): String =
    s"""sh$n AS (SELECT doc_id, unnest(list_distinct(${ngramListSql(n)})) AS g
             FROM sp WHERE len(w) >= $n),
    bench$n AS (SELECT DISTINCT g, doc_id AS bench_id FROM sh$n WHERE doc_id % $BenchMod = 0),
    hits$n AS (
      SELECT t.doc_id,
             CAST(COUNT(DISTINCT t.g) AS BIGINT) AS n${n}_shingles_shared,
             CAST(COUNT(DISTINCT b.bench_id) AS BIGINT) AS n${n}_benchmark_docs
      FROM sh$n t JOIN bench$n b ON t.g = b.g
      WHERE t.doc_id % $BenchMod <> 0
      GROUP BY t.doc_id)"""

  val decontaminate = QueryDef(
    "decontaminate_ngram",
    (s, d) => {
      hitsAt(s, d, 3).join(hitsAt(s, d, 5), Seq("doc_id"), "left")
        .na.fill(0L, Seq("n5_shingles_shared", "n5_benchmark_docs"))
    },
    Some(s"""WITH sp AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    ${hitsSql(3)},
    ${hitsSql(5)}
    SELECT h3.doc_id,
           h3.n3_shingles_shared, h3.n3_benchmark_docs,
           COALESCE(h5.n5_shingles_shared, 0) AS n5_shingles_shared,
           COALESCE(h5.n5_benchmark_docs, 0) AS n5_benchmark_docs
    FROM hits3 h3 LEFT JOIN hits5 h5 ON h3.doc_id = h5.doc_id"""))

  /** Exact-substring decontamination (the GPT-3 appendix-C shape):
    * report every MAXIMAL train-doc span of >= [[SubstrL]] consecutive
    * tokens that appears VERBATIM anywhere in the benchmark slice —
    * the precise check the n-gram screen above approximates (n-gram
    * flags say "shares a phrase"; this one returns the actual leaked
    * span boundaries, ready for span-level excision instead of
    * whole-doc dropping).
    *
    * Plan shape — deliberately NOT the suffix sort `dedup_substring`
    * uses: that operator finds repeats WITHIN one giant corpus
    * (symmetric, nothing broadcastable), so it range-sorts the whole
    * gram table. Here the comparison is ASYMMETRIC — benchmark grams
    * are small by construction — so candidate detection is a broadcast
    * semi-join of train positional grams against the distinct bench
    * gram set: ZERO train-side shuffle for detection, one doc_id
    * exchange for the span merge. Swapping in a real eval table
    * changes one line, exactly as for [[decontaminate]].
    *
    * L = 13 tokens (the GPT-3 decontamination convention); the eval
    * slice is doc_id % [[SubstrBenchMod]] = 0 — wider than the n-gram
    * screen's 1/53 so the diagnostic exercises at the test scales.
    */
  private[graft] val SubstrL = 13
  private[graft] val SubstrBenchMod = 11

  val decontaminateSubstring = QueryDef(
    "decontaminate_substring",
    (s, d) => {
      val n = SubstrL
      val grams = Substring.positionalGrams(s, d, n)
      val bench = grams.filter(col("doc_id") % SubstrBenchMod === 0)
        .select("h").distinct()
      val cov = grams.filter(col("doc_id") % SubstrBenchMod =!= 0)
        .join(broadcast(bench), "h")
        .select("doc_id", "pos")
      Substring.mergeSpans(cov, n)
    },
    Some {
      val n = SubstrL
      s"""WITH ${Substring.positionalGramsSql(n)},
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % $SubstrBenchMod = 0),
    cov AS (
      SELECT doc_id, pos FROM g
      WHERE doc_id % $SubstrBenchMod <> 0
        AND gram IN (SELECT gram FROM bench)),
    ${Substring.mergeSpansSql(n)}"""
    })

  /** Winnowing-fingerprint decontamination — the third point on the
    * precision/robustness axis the family spans: [[decontaminate]]
    * flags shared exact n-grams (cheap, whitespace-fragile),
    * [[decontaminateSubstring]] returns exact leaked spans (precise,
    * costliest), and this screen joins on WINNOWED fingerprints
    * ([[TextAnalysis.winnow]]'s MOSS scheme — same fingerprint
    * builder, so the screen cannot drift from the registered
    * `text_winnow`). The winnowing guarantee transfers directly: any
    * train doc sharing a contiguous token run of >= w + 2 tokens with
    * the benchmark slice shares at least one fingerprint and IS
    * flagged, while the join touches only ~2/(w+1) of the gram table —
    * the screen a 100-TB corpus runs continuously, with the substring
    * pass reserved for flagged docs.
    *
    * Scale shape mirrors [[contaminatedDocIds]]: the eval-slice filter
    * pushes below fingerprint extraction, the distinct bench
    * fingerprint set broadcasts, and the train side sees zero
    * pre-join shuffle; one doc_id exchange aggregates the hit counts.
    */
  /** Hit counts of (doc_id, fp) rows against a (fp, bench_id) bench
    * fingerprint table — the verdict aggregation SHARED by
    * [[decontaminateWinnow]] and the live screen
    * ([[graft.streaming.ScreenStream]]), so batch and streaming
    * counting semantics cannot drift. Returns flagged docs only; the
    * live screen left-joins it back to add explicit zeros.
    */
  private[graft] def winnowFpHits(
      trainFps: DataFrame, bench: DataFrame): DataFrame =
    trainFps.join(broadcast(bench), "fp")
      .groupBy("doc_id")
      .agg(countDistinct(col("fp")).as("fps_shared"),
        countDistinct(col("bench_id")).as("benchmark_docs"))

  val decontaminateWinnow = QueryDef(
    "decontaminate_winnow",
    (s, d) => {
      val fps = TextAnalysis.winnow.fn(s, d)
      val bench = fps.filter(col("doc_id") % BenchMod === 0)
        .select(col("fp"), col("doc_id").as("bench_id"))
      winnowFpHits(fps.filter(col("doc_id") % BenchMod =!= 0), bench)
    },
    Some {
      // text_winnow's oracle, stripped of its ORDER BY, as the
      // fingerprint CTE — the same reuse seam Dedup.clusterKeep uses
      val fpsSql = TextAnalysis.winnow.oracle.get
        .replace("ORDER BY doc_id, fp", "")
      s"""WITH fps0 AS ($fpsSql),
    bench AS (SELECT DISTINCT fp, doc_id AS bench_id FROM fps0
              WHERE doc_id % $BenchMod = 0)
    SELECT t.doc_id,
           CAST(COUNT(DISTINCT t.fp) AS BIGINT) AS fps_shared,
           CAST(COUNT(DISTINCT b.bench_id) AS BIGINT) AS benchmark_docs
    FROM fps0 t JOIN bench b ON t.fp = b.fp
    WHERE t.doc_id % $BenchMod <> 0
    GROUP BY t.doc_id
    ORDER BY t.doc_id"""
    })

  val defs: Seq[QueryDef] = Seq(decontaminate, decontaminateSubstring,
    decontaminateWinnow)
}
