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

  private[operators] val BenchMod = 53

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

  val defs: Seq[QueryDef] = Seq(decontaminate)
}
