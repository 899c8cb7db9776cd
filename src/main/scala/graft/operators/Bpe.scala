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
  * No DuckDB oracle BY DESIGN: the data-dependent per-round argmax
  * cannot be spelled inside DuckDB list lambdas (subqueries are not
  * allowed in them), so correctness is spec-verified instead against
  * an independent single-machine reference implementation on both a
  * hand-computable corpus and the real sf0.001 corpus (BpeSpec).
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

  val bpeTrain = QueryDef("bpe_train", (s, d) => train(s, d), None)

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
    * Rows-only like `bpe_train` (the merge table is data-dependent);
    * BpeSpec proves the tokenization is a true partition of every word
    * (symbols concatenate back to the word) and that corpus token
    * totals match the reference implementation.
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
    None)

  val defs: Seq[QueryDef] = Seq(bpeTrain, bpeTokenize)
}
