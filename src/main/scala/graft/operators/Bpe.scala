package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE (byte-pair-encoding) tokenizer training — the
  * iterative merge loop every subword tokenizer pipeline runs over its
  * corpus before model training ([[TextAnalysis.bigrams]] is merge
  * step 1; this runs the full loop).
  *
  * Algorithm (classic word-frequency form): collapse the corpus to
  * DISTINCT words with occurrence counts — at 100 TB the state is
  * vocabulary-sized, not corpus-sized — split each word into
  * character symbols, then repeat [[NumMerges]] times: count adjacent
  * symbol pairs weighted by word frequency (one map-combinable
  * aggregate whose exchange carries distinct pairs), pick the most
  * frequent pair (ties broken lexicographically so the result is
  * deterministic), and merge it everywhere via a leftmost-greedy
  * `aggregate()` fold over each word's symbol array (codegen'd
  * higher-order function — no UDF).
  *
  * Driver involvement per round is ONE argmax row (the same bounded
  * probe pattern as the IVF coarse quantizer) plus a localCheckpoint
  * that truncates the lineage so round k's plan does not nest k folds.
  *
  * Oracle-hash-checked since r8 (formerly "no oracle by design"): the
  * data-dependent per-round argmax CAN be spelled in DuckDB after all
  * — each round's one-row argmax is LEFT JOINed (ON TRUE) into the
  * word state, so the merge lambda captures the pair as plain row
  * columns (lambdas cannot contain subqueries, but they CAN capture
  * join columns), and the leftmost-greedy fold is a `list_reduce`
  * over single-symbol lists with a list accumulator. The
  * [[NumMerges]] rounds unroll into a fixed CTE chain
  * ([[trainCtesSql]]); an exhausted round yields an empty argmax
  * whose NULL pair makes the fold a no-op, mirroring the loop's
  * early stop. BpeSpec's independent reference implementation remains
  * the algorithmic gate; the oracle adds the cross-engine bit-match.
  */
object Bpe {

  private[graft] val NumMerges = 10

  /** Distinct words split to character symbols, with occurrence
    * counts — the vocabulary-sized state the merge loop iterates on.
    */
  private def wordSymbols(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(split(col("word"), "").as("symbols"), col("freq"))

  /** Leftmost-greedy single-pass merge of adjacent (a, b) into a+b. */
  private def mergePair(symbols: Column, a: String, b: String): Column =
    aggregate(symbols, array().cast(ArrayType(StringType)),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === a && x === b,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Adjacent-pair counts over the current symbol state, weighted by
    * word frequency.
    */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("symbols")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), size(col("symbols")) - 1),
        i => struct(element_at(col("symbols"), i).as("a"),
          element_at(col("symbols"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Train [[NumMerges]] merges; returns (rank, left, right, cnt). */
  private[graft] def train(s: SparkSession, d: String): DataFrame = {
    import scala.collection.mutable.ListBuffer
    var words = wordSymbols(s, d).localCheckpoint(true)
    val merges = ListBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= NumMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) { exhausted = true }
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, a, b, cnt))
        val prev = words
        // eager checkpoint materializes the new state BEFORE the old
        // round's cached blocks are released — without the unpersist,
        // every round's snapshot would stay in the block manager
        words = words
          .select(mergePair(col("symbols"), a, b).as("symbols"), col("freq"))
          .localCheckpoint(true)
        prev.unpersist()
        rank += 1
      }
    }
    words.unpersist()
    import s.implicits._
    merges.toSeq.toDF("merge_rank", "left", "right", "cnt")
      .select(col("merge_rank").cast(LongType), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"), col("cnt"))
  }

  /** The unrolled [[NumMerges]]-round training chain as DuckDB CTEs:
    * w0 (char-split vocabulary with counts, `word` threaded through
    * for the tokenize oracle), then per round k: pair counts `pk`
    * over w(k-1), one-row argmax `tk` (cnt DESC, a, b — the loop's
    * exact tie-break), merged state `wk` via the captured-pair
    * leftmost-greedy fold.
    */
  private def trainCtesSql: String = {
    def pairCte(k: Int) =
      s"""p${k + 1} AS (
      SELECT p['a'] AS a, p['b'] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, unnest(list_transform(range(1, len(symbols)),
              i -> {'a': symbols[i], 'b': symbols[i+1]})) AS p
            FROM w$k WHERE len(symbols) >= 2)
      GROUP BY 1, 2)"""
    def topCte(k: Int) =
      s"t$k AS (SELECT a, b, cnt FROM p$k ORDER BY cnt DESC, a, b LIMIT 1)"
    def mergeCte(k: Int) =
      s"""w$k AS (
      SELECT word, list_reduce(
          list_prepend(CAST([] AS VARCHAR[]), list_transform(symbols, s -> CAST([s] AS VARCHAR[]))),
          (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = t.a AND x[1] = t.b
              THEN list_append(acc[:-2], t.a || t.b)
              ELSE list_append(acc, x[1]) END) AS symbols, freq
      FROM w${k - 1} LEFT JOIN t$k t ON TRUE)"""
    // Non-ASCII guard (the sibling rolling-hash/multimodal oracle
    // pattern): a tie in a round's pair counts is broken by (a, b)
    // string order, and Spark (UTF-16 code units) and DuckDB (UTF-8
    // bytes) collate supplementary-plane characters differently — a
    // non-ASCII corpus must make the oracle RAISE, not silently pick
    // a different merge and mis-verify every later round.
    val w0 =
      """w0 AS (
      SELECT word, CASE WHEN strlen(word) <> length(word)
          THEN error('bpe oracle: non-ASCII corpus — pair tie-break collation (UTF-16 code units vs UTF-8 bytes) could diverge between engines')
          ELSE list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)) END AS symbols,
        CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE length(word) > 0 GROUP BY word)"""
    (w0 +: (1 to NumMerges).flatMap(k =>
      Seq(pairCte(k - 1), topCte(k), mergeCte(k)))).mkString(",\n    ")
  }

  val bpeTrain = QueryDef("bpe_train", (s, d) => train(s, d),
    Some {
      val union = (1 to NumMerges).map(k =>
        s"""SELECT CAST($k AS BIGINT) AS merge_rank, a AS "left", b AS "right", a || b AS merged, cnt FROM t$k""")
        .mkString("\n      UNION ALL\n      ")
      s"""WITH $trainCtesSql
      SELECT * FROM (
      $union) ORDER BY merge_rank"""
    })

  /** Apply a learned merge list (in rank order) to a symbols column —
    * each merge is one codegen'd fold, chained; tokenizing with K
    * merges is K narrow passes fused into one projection.
    */
  private[graft] def applyMerges(
      symbols: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(symbols) { case (c, (a, b)) => mergePair(c, a, b) }

  /** Tokenize the corpus with the merges [[train]] learned — the apply
    * half of the tokenizer pipeline (train on a sample, tokenize
    * everything). Emits per-document char/word/BPE-token counts — the
    * statistic that feeds sequence packing and cost estimation.
    *
    * The merge folds run once per DISTINCT word (a word's tokenization
    * depends only on the word), then join back to the corpus stream —
    * the same vocabulary-not-corpus sizing as [[train]]; measured ~9x
    * cheaper than folding per occurrence at sf0.1, and the gap grows
    * with corpus size.
    *
    * Oracle-hash-checked since r8 (see [[bpeTrain]] — same unrolled
    * CTE chain; the final word state w[[NumMerges]] IS the tokenized
    * vocabulary, so the oracle just joins it back to the doc word
    * stream for the per-doc counts); BpeSpec still proves the
    * tokenization is a true partition of every word (symbols
    * concatenate back to the word) and that corpus token totals match
    * the reference implementation.
    */
  val bpeTokenize = QueryDef(
    "text_tokenize_bpe",
    (s, d) => {
      val merges = train(s, d).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val docWords = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
      val vocabToks = docWords.select("word").distinct()
        .select(col("word"), length(col("word")).as("n_chars"),
          size(applyMerges(split(col("word"), ""), merges)).as("n_toks"))
      docWords.join(vocabToks, "word")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_chars")).cast(LongType).as("n_word_chars"),
          sum(col("n_toks")).cast(LongType).as("n_bpe_tokens"))
    },
    Some(s"""WITH $trainCtesSql,
      docwords AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      SELECT d.doc_id, COUNT(*) AS n_words,
        CAST(SUM(length(d.word)) AS BIGINT) AS n_word_chars,
        CAST(SUM(len(w.symbols)) AS BIGINT) AS n_bpe_tokens
      FROM docwords d JOIN w$NumMerges w ON w.word = d.word
      WHERE length(d.word) > 0
      GROUP BY d.doc_id ORDER BY d.doc_id"""))

  val defs: Seq[QueryDef] = Seq(bpeTrain, bpeTokenize)
}
