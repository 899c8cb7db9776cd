package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for LLM training-data pipelines over the
  * `documents` table: language ID, quality scoring, token counting,
  * fingerprinting. All pure `functions._` compositions (codegen'd, no
  * UDFs); every scalar is computed with integer/string ops or
  * double arithmetic in a fixed order so the DuckDB oracle is
  * bit-identical.
  *
  * Scale: every operator is a narrow per-row map over a parquet scan
  * (no shuffle at all until the final presentation ORDER BY) — at
  * 100 TB these run at scan speed and column-prune to `doc_id, text`.
  */
object TextAnalysis {

  private val words = split(col("text"), " ")

  /** Portable 60-bit hash: leading 15 hex chars of md5, identical in
    * DuckDB as ('0x' || substr(md5(x),1,15))::BIGINT.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  val hash60Sql: String => String =
    expr => s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  /** 32-bit md5-prefix hash — hash60's narrow sibling, used where the
    * value rides in fixed-width signature arrays (minhash
    * signatures, winnow fingerprints). ONE definition (plus its SQL
    * spelling) so the batch/stream signature contracts cannot drift —
    * an edit here changes every producer together.
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  val hash32Sql: String => String =
    expr => s"('0x' || substr(md5($expr), 1, 8))::BIGINT"

  /** Tiny stopword lexicons (public knowledge) for the heuristic
    * language ID. Priority order breaks score ties deterministically.
    */
  val Lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "et", "des", "une"))

  private def scoreOf(ws: Column, lex: Seq[String]): Column =
    lex.map(w => array_contains(ws, w).cast(IntegerType)).reduce(_ + _)

  private def score(lex: Seq[String]): Column = scoreOf(words, lex)

  /** THE language-ID tie-break cascade — one definition feeding both
    * [[predictedLangCol]] and [[langId]] (the splitBucket rule: a
    * priority edit applied to one copy but not the other would
    * silently desynchronize pipeline_curate's predicted_lang from
    * text_langid's while each still passes its own oracle).
    */
  private def langCascade(scores: Seq[Column]): Column = {
    val Seq(en, es, de, fr) = scores
    when(en >= es && en >= de && en >= fr && en > 0, "en")
      .when(es >= de && es >= fr && es > 0, "es")
      .when(de >= fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Reusable column form of the language-ID decision (same CASE
    * cascade as [[langId]]), for single-pass pipeline composition.
    */
  def predictedLangCol(text: Column): Column = {
    val ws = split(text, " ")
    langCascade(Lexicons.map { case (_, lex) => scoreOf(ws, lex) })
  }

  /** Reusable column form of the quality score (bit-identical to the
    * [[quality]] query's formula).
    */
  def qualityScoreCol(text: Column): Column = {
    val ws = split(text, " ")
    val nWords = size(ws)
    val uniqRatio = size(array_distinct(ws)).cast(DoubleType) / nWords
    val stopRatio = size(filter(ws, w => w === "the" || w === "a" || w === "of"))
      .cast(DoubleType) / nWords
    val avgWordLen = length(regexp_replace(text, "[ ]", "")).cast(DoubleType) / nWords
    uniqRatio * 0.5 + (lit(1.0) - stopRatio) * 0.3 +
      least(avgWordLen / 10.0, lit(1.0)) * 0.2
  }

  /** Inline SQL scalar of [[qualityScoreCol]] over the `text` column —
    * the one spelling shared with consumers that need the score as a
    * sub-expression (corpus_stats' floor-quantized mean) rather than
    * [[quality]]'s CTE form.
    */
  val qualityScoreSql: String = {
    val nw = "len(string_split(text, ' '))"
    s"""(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / $nw) * 0.5
        + (1.0 - CAST(len(list_filter(string_split(text, ' '), w -> w = 'the' OR w = 'a' OR w = 'of')) AS DOUBLE) / $nw) * 0.3
        + least((CAST(length(regexp_replace(text, '[ ]', '', 'g')) AS DOUBLE) / $nw) / 10.0, 1.0) * 0.2"""
  }

  private def scoreSql(lex: Seq[String]): String =
    lex.map(w => s"list_contains(string_split(text, ' '), '$w')::INT").mkString(" + ")

  val langId = QueryDef(
    "text_langid",
    (s, d) => {
      val scored = Tables.documents(s, d).select(
        col("doc_id") +: col("lang") +:
          Lexicons.map { case (l, lex) => score(lex).as(s"score_$l") }: _*)
      scored.withColumn("predicted_lang",
        langCascade(Lexicons.map { case (l, _) => col(s"score_$l") }))
    },
    Some {
      val scores = Lexicons.map { case (l, lex) => s"${scoreSql(lex)} AS score_$l" }
        .mkString(",\n        ")
      s"""WITH scored AS (
      SELECT doc_id, lang,
        $scores
      FROM documents)
    SELECT doc_id, lang, score_en, score_es, score_de, score_fr,
      CASE WHEN score_en >= score_es AND score_en >= score_de AND score_en >= score_fr AND score_en > 0 THEN 'en'
           WHEN score_es >= score_de AND score_es >= score_fr AND score_es > 0 THEN 'es'
           WHEN score_de >= score_fr AND score_de > 0 THEN 'de'
           WHEN score_fr > 0 THEN 'fr'
           ELSE 'und' END AS predicted_lang
    FROM scored ORDER BY doc_id"""
    })

  val quality = QueryDef(
    "text_quality",
    (s, d) => {
      val nWords = size(words)
      val nChars = length(col("text"))
      val uniq = size(array_distinct(words))
      val stopHits = size(filter(words, w => w === "the" || w === "a" || w === "of"))
      Tables.documents(s, d).select(
        col("doc_id"),
        nChars.cast(LongType).as("n_chars_actual"),
        nWords.cast(LongType).as("n_words"),
        uniq.cast(LongType).as("n_uniq_words"),
        (uniq.cast(DoubleType) / nWords).as("uniq_ratio"),
        (stopHits.cast(DoubleType) / nWords).as("stopword_ratio"),
        (length(regexp_replace(col("text"), "[ ]", "")).cast(DoubleType) / nWords)
          .as("avg_word_len"))
        .withColumn("quality_score",
          col("uniq_ratio") * 0.5 +
            (lit(1.0) - col("stopword_ratio")) * 0.3 +
            least(col("avg_word_len") / 10.0, lit(1.0)) * 0.2)
    },
    Some("""WITH m AS (
      SELECT doc_id,
        CAST(length(text) AS BIGINT) AS n_chars_actual,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq_words,
        CAST(len(list_filter(string_split(text, ' '), w -> w = 'the' OR w = 'a' OR w = 'of')) AS BIGINT) AS stop_hits,
        CAST(length(regexp_replace(text, '[ ]', '', 'g')) AS BIGINT) AS n_nonspace
      FROM documents)
    SELECT doc_id, n_chars_actual, n_words, n_uniq_words,
      CAST(n_uniq_words AS DOUBLE) / n_words AS uniq_ratio,
      CAST(stop_hits AS DOUBLE) / n_words AS stopword_ratio,
      CAST(n_nonspace AS DOUBLE) / n_words AS avg_word_len,
      (CAST(n_uniq_words AS DOUBLE) / n_words) * 0.5
        + (1.0 - CAST(stop_hits AS DOUBLE) / n_words) * 0.3
        + least((CAST(n_nonspace AS DOUBLE) / n_words) / 10.0, 1.0) * 0.2 AS quality_score
    FROM m ORDER BY doc_id"""))

  /** BPE-ish token pattern: letter runs, digit runs, single symbols.
    * Plain ASCII classes only — identical in Java regex and RE2.
    */
  private val TokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  val tokens = QueryDef(
    "text_tokens",
    (s, d) => {
      val nWs = size(words).cast(LongType)
      val nTok = regexp_count(col("text"), lit(TokenPattern)).cast(LongType)
      // explicit zero guard, BOTH engines -> NULL: an empty or
      // all-space doc has zero BPE tokens (space is in no token
      // class), where Spark's non-ANSI division yields NULL but
      // DuckDB's IEEE double division yields inf/nan — the one
      // unguarded division in this file would hash-diverge on the
      // first such doc
      Tables.documents(s, d).select(
        col("doc_id"),
        nWs.as("n_ws_tokens"),
        nTok.as("n_bpe_tokens"),
        when(nTok === 0, lit(null).cast(DoubleType))
          .otherwise(length(col("text")).cast(DoubleType) / nTok)
          .as("chars_per_token"))
    },
    Some(s"""SELECT doc_id,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
      CAST(len(regexp_extract_all(text, '$TokenPattern')) AS BIGINT) AS n_bpe_tokens,
      CASE WHEN len(regexp_extract_all(text, '$TokenPattern')) = 0 THEN NULL
           ELSE CAST(length(text) AS DOUBLE)
                / len(regexp_extract_all(text, '$TokenPattern')) END AS chars_per_token
    FROM documents ORDER BY doc_id"""))

  /** Word-3-shingles of a text column as an ARRAY (1-based positions,
    * guarded for short docs). NOTE: only suitable for per-doc array
    * consumers; hot paths use Dedup.shingleStrings (window-lead) —
    * this form re-evaluates split() per element access. Kept as the
    * executable specification the `shinglesSql` oracles mirror.
    */
  def shingles(text: Column): Column = {
    val ws = split(text, " ")
    when(size(ws) >= 3,
      transform(sequence(lit(1), size(ws) - 2), i =>
        concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))))
      .otherwise(array(text))
  }

  val shinglesSql: String => String = t =>
    s"""CASE WHEN len(string_split($t, ' ')) >= 3 THEN
      list_transform(range(1, len(string_split($t, ' ')) - 1),
        i -> string_split($t, ' ')[i] || ' ' || string_split($t, ' ')[i+1] || ' ' || string_split($t, ' ')[i+2])
      ELSE [$t] END"""

  val fingerprint = QueryDef(
    "text_fingerprint",
    (s, d) => {
      // Pure per-row projection (r17): min over the per-row gram-hash
      // array — ZERO exchanges, scan-speed at any corpus size. The
      // token array is materialized once per row (the Dedup.ngramStrings
      // discipline): the historical ~40x-slower array form re-evaluated
      // split() per element through CollapseProject inlining, which a
      // non-cheap multiply-referenced alias now prevents (SPARK-36718).
      // Same min as the old explode + per-doc MIN aggregate + join-back
      // form (min over multiset == min over distinct set), A/B-measured
      // 0.68 vs 1.03 s at sf0.1 and one full-corpus exchange cheaper at
      // scale; hash-identical vs the oracle.
      val ws = col("ws")
      val grams = when(size(ws) >= 3,
        transform(sequence(lit(1), size(ws) - 2), i =>
          hash60(concat_ws(" ", element_at(ws, i), element_at(ws, i + 1),
            element_at(ws, i + 2)))))
        .otherwise(array(hash60(col("text"))))
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), md5(col("text")).as("content_md5"),
          array_min(grams).as("shingle_min_hash"))
    },
    Some(s"""SELECT doc_id, md5(text) AS content_md5,
      list_aggregate(list_transform(${shinglesSql("text")}, sh -> ${hash60Sql("sh")}), 'min') AS shingle_min_hash
    FROM documents ORDER BY doc_id"""))

  /** True rolling-hash fingerprint via the native O(n) Rabin-Karp
    * expression ([[graft.functions.RollingMinHash]]).
    *
    * Oracle-hash-checked since r8 (formerly rows-only): the mod-P
    * polynomial min is re-derived in SQL by direct per-window
    * evaluation — `list_reduce(list_prepend(0, window_bytes),
    * (a, x) -> (a*B + x) % P)` minimized over start positions. The
    * rolling recurrence is an EVALUATION STRATEGY, not part of the
    * result contract, so the O(n·w) SQL form and the O(n) expression
    * agree exactly; RollingMinHashSpec still covers the native path
    * against a reference recompute. The SQL reads code points
    * (`ascii`) where the expression reads UTF-8 bytes — identical on
    * ASCII corpora; a non-ASCII document makes the oracle RAISE
    * (strlen != length guard) rather than silently mis-verify.
    */
  val rollingFingerprint = QueryDef(
    "text_rolling_hash",
    (s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        graft.functions.RollingMinHash.rollingMinHash(col("text"), 16)
          .as("rolling_min_hash_16"),
        graft.functions.RollingMinHash.rollingMinHash(col("text"), 64)
          .as("rolling_min_hash_64"))
    },
    Some {
      val P = 2147483647L
      val B = 131L
      def minSql(w: Int): String =
        s"""(SELECT MIN(list_reduce(
            list_prepend(CAST(0 AS BIGINT), list_slice(bs, s, s + LEAST($w, n) - 1)),
            (a, x) -> (a * $B + x) % $P))
          FROM (SELECT unnest(range(1, n - LEAST($w, n) + 2)) AS s))"""
      s"""WITH chars AS (
        SELECT doc_id,
          CASE WHEN strlen(text) <> length(text)
            THEN error('text_rolling_hash oracle: non-ASCII document — code-point hashing would diverge from the byte-level expression')
            ELSE list_transform(range(1, length(text) + 1),
              i -> ascii(substr(text, i, 1))) END AS bs,
          length(text) AS n
        FROM documents)
      SELECT doc_id,
        CASE WHEN n = 0 THEN 0 ELSE ${minSql(16)} END AS rolling_min_hash_16,
        CASE WHEN n = 0 THEN 0 ELSE ${minSql(64)} END AS rolling_min_hash_64
      FROM chars ORDER BY doc_id"""
    })

  /** Structural PII patterns (ASCII-only so Java regex and DuckDB's
    * RE2 agree byte-for-byte) and a denylist for dictionary scrubbing.
    */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  private val Ipv4Re = "\\b[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}\\b"
  private val DenyTerms = Seq("customer", "vector")
  private val DenyRe = DenyTerms.mkString("\\b(", "|", ")\\b")

  /** PII / denylist scrubbing — the redaction pass every training
    * pipeline runs before anything else sees the text. Two layers:
    * structural patterns (emails, IPv4s — regex, count + replace) and
    * a dictionary denylist (word-boundary alternation). Counts are
    * measured on the ORIGINAL text; the emitted `scrubbed` column has
    * structural matches replaced first, then denylist terms, so the
    * output is reproducible regardless of pattern overlap.
    *
    * Narrow per-row map over the pruned scan — scan-speed at 100 TB;
    * regexes are RE2-compatible (no backtracking blowups) and run
    * inside codegen.
    */
  val scrub = QueryDef(
    "text_scrub",
    (s, d) => {
      val redacted =
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), EmailRe, "[EMAIL]"),
            Ipv4Re, "[IP]"),
          DenyRe, "[TERM]")
      Tables.documents(s, d).select(
        col("doc_id"),
        regexp_count(col("text"), lit(EmailRe)).cast(LongType).as("n_emails"),
        regexp_count(col("text"), lit(Ipv4Re)).cast(LongType).as("n_ips"),
        regexp_count(col("text"), lit(DenyRe)).cast(LongType).as("n_denylist"),
        redacted.as("scrubbed"))
    },
    // NOTE: the Scala regex strings contain single backslashes (e.g.
    // \b) which DuckDB's single-quoted strings pass through verbatim,
    // so the same literal works in both engines' RE2-compatible space.
    Some(s"""SELECT doc_id,
      CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
      CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS BIGINT) AS n_ips,
      CAST(len(regexp_extract_all(text, '$DenyRe')) AS BIGINT) AS n_denylist,
      regexp_replace(
        regexp_replace(
          regexp_replace(text, '$EmailRe', '[EMAIL]', 'g'),
          '$Ipv4Re', '[IP]', 'g'),
        '$DenyRe', '[TERM]', 'g') AS scrubbed
    FROM documents"""))

  /** Within-document repetition score (the Gopher/MassiveText
    * repetition filter family): fraction of duplicated word-3-shingles
    * inside each doc. High values flag boilerplate/looping text that
    * an LLM pipeline drops or down-weights.
    *
    * Shape (r17): ONE scan, ZERO exchanges — a pure per-row
    * projection, exactly the oracle's own shape. The 3-gram set is
    * built per row by zipping three shifted `slice`s of the token
    * array (the text_bigrams form: split evaluates per slice argument,
    * never per element) and `size(array_distinct(...))` replaces the
    * old explode + window-lead + countDistinct pipeline, which paid a
    * full-corpus exchange + sort (window by doc_id) plus a distinct
    * aggregate for the same per-doc number. At 100 TB this is now
    * scan-speed; measured -0.3 s at sf0.1.
    */
  val repetition = QueryDef(
    "text_repetition",
    (s, d) => {
      val ws = split(col("text"), " ")
      val nw = size(ws)
      val len = nw - 2
      val zipped = arrays_zip(slice(ws, lit(1), len), slice(ws, lit(2), len),
        slice(ws, lit(3), len))
      val grams = transform(zipped, p =>
        concat_ws(" ", p("0"), p("1"), p("2")))
      Tables.documents(s, d)
        .select(col("doc_id"),
          when(nw >= 3, (nw - 2).cast(LongType)).otherwise(lit(1L))
            .as("n_shingles"),
          when(nw >= 3, size(array_distinct(grams)).cast(LongType))
            .otherwise(lit(1L)).as("n_distinct_shingles"))
        .withColumn("dup_shingle_frac",
          lit(1.0) - col("n_distinct_shingles").cast(DoubleType) / col("n_shingles"))
        .select("doc_id", "n_shingles", "n_distinct_shingles", "dup_shingle_frac")
    },
    Some(s"""WITH sh AS (
      SELECT doc_id,
        CASE WHEN len(string_split(text, ' ')) >= 3
             THEN CAST(len(string_split(text, ' ')) - 2 AS BIGINT)
             ELSE CAST(1 AS BIGINT) END AS n_shingles,
        CAST(len(list_distinct(${shinglesSql("text")})) AS BIGINT) AS n_distinct_shingles
      FROM documents)
    SELECT doc_id, n_shingles, n_distinct_shingles,
      1.0 - CAST(n_distinct_shingles AS DOUBLE) / n_shingles AS dup_shingle_frac
    FROM sh"""))

  /** Corpus-wide token-bigram counts, top 50 — the pair-statistics
    * pass that seeds BPE/WordPiece vocabulary training (merge step 1
    * counts exactly these adjacent-pair frequencies).
    *
    * Shape: bigrams come from `arrays_zip(slice(toks,1,n-1),
    * slice(toks,2,n-1))` — split() evaluates twice per ROW (two slice
    * arguments), not per element like the transform-over-sequence
    * form that cost text_fingerprint 40x — so the whole query is a
    * narrow projection + partial/final count aggregate + a
    * TakeOrdered top-50: no window, no doc_id shuffle, map-side
    * combinable. At 100 TB the only full-width exchange carries one
    * row per distinct bigram.
    */
  val bigrams = QueryDef(
    "text_bigrams",
    (s, d) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, d)
        .select(explode(arrays_zip(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1))).as("p"))
        .select(concat_ws(" ", col("p")("0"), col("p")("1")).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        // semantic top-k sort (deterministic tie-break), not presentation
        .orderBy(col("n").desc, col("bigram"))
        .limit(50)
    },
    Some("""WITH pairs AS (
      SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
        i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bigram
      FROM documents)
    SELECT bigram, COUNT(*) AS n FROM pairs
    GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50"""))

  /** Token-distribution Shannon entropy per document (nats) — low
    * entropy flags repetitive/templated text, near-max entropy flags
    * random noise; both are standard drop signals next to
    * [[repetition]].
    *
    * Cross-engine determinism: H = ln n - (1/n) * sum_c c*ln c needs
    * ln, and libm vs JVM Math.log can disagree in the last ulp. All
    * ln inputs here are INTEGER token counts, so a lookup table
    * L[i] = floor(ln(i) * 1e9) is computed ONCE in Scala at plan
    * build and inlined as a literal into BOTH plans (the hyperplane-
    * constants trick from the LSH family) — every engine-side
    * operation is then integer arithmetic plus two identical IEEE
    * divisions. Docs beyond [[EntropyMaxN]] tokens yield NULL (guard,
    * documented) rather than a silently-wrong clamp; the corpus max
    * is 100.
    *
    * Shape: one exchange on doc_id for the (doc, token) counts; the
    * per-doc reduce rides the same partitioning. Scan-speed at scale.
    */
  val entropy = {
    val EntropyMaxN = 1024
    // L[0] unused (ln 0 undefined); 1-based access via element_at(i+1)
    val lnTable: IndexedSeq[Long] = IndexedSeq.tabulate(EntropyMaxN + 1)(i =>
      if (i < 1) 0L else math.floor(math.log(i.toDouble) * 1e9).toLong)
    QueryDef(
      "text_entropy",
      (s, d) => {
        // NULL (not an ANSI INVALID_ARRAY_INDEX error) for docs
        // beyond the table bound; table in the Ln9 JVM-static cache,
        // not a per-call plan literal
        def ln9(c: Column): Column =
          graft.functions.Ln9.bounded(c, EntropyMaxN)
        val counts = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("doc_id", "tok")
          .agg(count(lit(1)).as("c"))
        counts.groupBy("doc_id")
          .agg(sum(col("c")).as("n_tokens"),
            count(lit(1)).as("n_distinct_tokens"),
            sum(col("c") * ln9(col("c"))).as("s9"))
          .select(col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
            ((ln9(col("n_tokens")).cast(DoubleType) -
              col("s9").cast(DoubleType) / col("n_tokens")) / 1e9)
              .as("token_entropy"))
      },
      Some {
        val lit = lnTable.mkString("[", ", ", "]")
        s"""WITH counts AS (
        SELECT doc_id, tok, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY doc_id, tok),
      agg AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
          COUNT(*) AS n_distinct_tokens,
          CAST(SUM(c * ($lit)[CAST(c + 1 AS INT)]) AS BIGINT) AS s9
        FROM counts GROUP BY doc_id)
      SELECT doc_id, n_tokens, n_distinct_tokens,
        (CAST(($lit)[CAST(n_tokens + 1 AS INT)] AS DOUBLE)
          - CAST(s9 AS DOUBLE) / n_tokens) / 1e9 AS token_entropy
      FROM agg ORDER BY doc_id"""
      })
  }

  private[graft] val ChunkW = 32
  private[graft] val ChunkS = 24

  /** Overlapping token-window chunking — the RAG / context-window
    * preprocessing step: each document becomes windows of [[ChunkW]]
    * tokens advancing by stride [[ChunkS]] (8-token overlap), the last
    * window keeping the remainder. A doc of n tokens yields
    * max(1, ceil((n-W)/S)+1) chunks, so every token lands in at least
    * one chunk and no chunk is empty.
    *
    * Scale: pure per-row explode (fan-out ~ n/S, bounded by doc
    * length) over a two-column pruned scan — no shuffle; chunk ids
    * are (doc_id, chunk_idx), stable under any partitioning.
    */
  val chunk = QueryDef(
    "text_chunk",
    (s, d) => {
      val ws = words
      val nChunks = when(size(ws) <= ChunkW, lit(1))
        .otherwise(ceil((size(ws) - lit(ChunkW)).cast(DoubleType) / ChunkS)
          .cast(IntegerType) + 1)
      Tables.documents(s, d)
        .select(col("doc_id"), posexplode(transform(
          sequence(lit(0), nChunks - 1),
          i => concat_ws(" ", slice(ws, i * ChunkS + 1, lit(ChunkW)))))
          .as(Seq("chunk_idx", "chunk_text")))
        .select(col("doc_id"), col("chunk_idx").cast(LongType).as("chunk_idx"),
          size(split(col("chunk_text"), " ")).cast(LongType).as("n_chunk_tokens"),
          col("chunk_text"))
    },
    Some(s"""WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS ws,
             len(string_split(text, ' ')) AS n
      FROM documents),
    idx AS (
      SELECT doc_id, ws, unnest(range(0, CASE WHEN n <= $ChunkW THEN 1
        ELSE CAST(ceil((n - $ChunkW) / $ChunkS.0) AS BIGINT) + 1 END)) AS chunk_idx
      FROM base)
    SELECT doc_id, chunk_idx,
      CAST(len(ws[(chunk_idx * $ChunkS + 1):(chunk_idx * $ChunkS + $ChunkW)]) AS BIGINT)
        AS n_chunk_tokens,
      array_to_string(ws[(chunk_idx * $ChunkS + 1):(chunk_idx * $ChunkS + $ChunkW)], ' ')
        AS chunk_text
    FROM idx ORDER BY doc_id, chunk_idx"""))

  /** Language-ID confusion matrix — declared `lang` label vs
    * [[langId]]'s detection, with the per-declared-language rate
    * (floor-quantized: the count ratio is a bit-identical IEEE
    * division in both engines, and floor(r*1e6)/1e6 of it is stable).
    * The QA readout that says WHERE the detector disagrees with the
    * source metadata — wrong-label slices and und-heavy sources jump
    * out of this table before they poison a training mix.
    */
  val langConfusion = QueryDef(
    "text_langid_confusion",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      langId.fn(s, d)
        .groupBy("lang", "predicted_lang")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("rate",
          floor(col("n_docs").cast(DoubleType)
            / sum(col("n_docs")).over(Window.partitionBy("lang")).cast(DoubleType)
            * 1e6) / 1e6)
    },
    Some {
      val inner = langId.oracle.get.replace("ORDER BY doc_id", "")
      s"""WITH pred AS ($inner),
    counts AS (
      SELECT lang, predicted_lang, COUNT(*) AS n_docs
      FROM pred GROUP BY 1, 2)
    SELECT lang, predicted_lang, n_docs,
      FLOOR(CAST(n_docs AS DOUBLE)
        / CAST(SUM(n_docs) OVER (PARTITION BY lang) AS DOUBLE) * 1e6) / 1e6 AS rate
    FROM counts ORDER BY lang, predicted_lang"""
    })

  private val HashDim = 8

  /** Hashing-trick featurization (bag-of-words -> fixed [[HashDim]]
    * dims): every token increments bucket hash(token) mod HashDim —
    * the constant-memory featurizer behind shallow quality/domain
    * classifiers when a learned vocabulary is impractical at corpus
    * scale. Buckets use the portable md5-derived [[hash60]] so both
    * engines assign identically; output is flattened to scalar h0..h7
    * columns (array cells break external row-sorting compares).
    *
    * Scale: one explode + ONE map-combinable aggregate on doc_id —
    * the per-bucket sums combine on the map side, so the exchange
    * carries HashDim longs per doc, not tokens.
    */
  val featHash = QueryDef(
    "text_feat_hash",
    (s, d) => {
      val bucket = pmod(hash60(col("tok")), lit(HashDim))
      Tables.documents(s, d)
        .select(col("doc_id"), explode(words).as("tok"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          (0 until HashDim).map(b =>
            sum(when(bucket === b, 1L).otherwise(0L)).as(s"h$b")): _*)
    },
    Some {
      val buckets = (0 until HashDim).map(b =>
        s"CAST(SUM(CASE WHEN ${hash60Sql("tok")} % $HashDim = $b THEN 1 ELSE 0 END) AS BIGINT) AS h$b")
        .mkString(",\n      ")
      s"""WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    SELECT doc_id, COUNT(*) AS n_tokens,
      $buckets
    FROM toks GROUP BY doc_id ORDER BY doc_id"""
    })

  /** Bigram-LM quality score (the CCNet shape: score every document
    * by its average log-probability under an n-gram language model;
    * outlier-low docs are gibberish/templated, outlier-high are
    * degenerate repetition). The model here is the corpus's own MLE
    * bigram LM — self-scoring, the standard bootstrap when no
    * external LM is available: p(w2|w1) = c(w1 w2) / c(w1·), with
    * history counts derived FROM the bigram table (sum of c12 over
    * w2), so probabilities sum to exactly 1 per history.
    *
    * Cross-engine determinism (the text_entropy trick, capped): all
    * ln inputs are integer counts, looked up in a floor(ln·1e9) table
    * inlined into both plans; counts cap at [[LmMaxC]] (ln saturates
    * for ultra-frequent tokens — a documented property of the score,
    * not an approximation of something else). Everything engine-side
    * is integer adds plus two identical IEEE divisions.
    *
    * Scale: bigram model state is bigram-vocabulary-sized (the
    * exchanges carry distinct bigrams, map-side combined); scoring is
    * one equi-join of the bigram stream against the model and one
    * doc_id reduce — the same two-shuffle shape as tf-idf. No exp():
    * perplexity is monotone in avg_logp, so filters threshold the
    * reported score directly.
    */
  val lmScore = {
    val LmMaxC = 4096
    val lnTable: IndexedSeq[Long] = IndexedSeq.tabulate(LmMaxC + 1)(i =>
      if (i < 1) 0L else math.floor(math.log(i.toDouble) * 1e9).toLong)
    QueryDef(
      "text_lm_score",
      (s, d) => {
        // saturating table ln via the Ln9 JVM-static cache, not a
        // per-call 4097-entry plan literal
        def ln9(c: Column): Column = graft.functions.Ln9.sat(c, LmMaxC)
        val toks = split(col("text"), " ")
        val bi = Tables.documents(s, d)
          .select(col("doc_id"), explode(arrays_zip(
            slice(toks, lit(1), size(toks) - 1),
            slice(toks, lit(2), size(toks) - 1))).as("p"))
          .select(col("doc_id"), col("p")("0").as("w1"), col("p")("1").as("w2"))
        val biCounts = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        val histCounts = biCounts.groupBy("w1").agg(sum(col("c12")).as("c1"))
        val model = biCounts.join(histCounts, "w1")
          .select(col("w1"), col("w2"),
            (ln9(col("c12")) - ln9(col("c1"))).as("lnp9"))
        bi.join(model, Seq("w1", "w2"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum(col("lnp9")).as("s9"))
          .select(col("doc_id"), col("n_bigrams"),
            (col("s9").cast(DoubleType) / col("n_bigrams") / 1e9).as("avg_logp"))
      },
      Some {
        val lit = lnTable.mkString("[", ", ", "]")
        s"""WITH lt AS (SELECT $lit AS v),
      b2 AS (
        SELECT doc_id, p['w1'] AS w1, p['w2'] AS w2 FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' '))),
            i -> {'w1': string_split(text, ' ')[i], 'w2': string_split(text, ' ')[i+1]})) AS p
          FROM documents)),
      bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM b2 GROUP BY w1, w2),
      hc AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bc GROUP BY w1),
      model AS (
        SELECT bc.w1, bc.w2,
          lt.v[CAST(least(c12, $LmMaxC) + 1 AS INT)]
            - lt.v[CAST(least(c1, $LmMaxC) + 1 AS INT)] AS lnp9
        FROM bc JOIN hc ON bc.w1 = hc.w1 CROSS JOIN lt),
      agg AS (
        SELECT doc_id, COUNT(*) AS n_bigrams, CAST(SUM(lnp9) AS BIGINT) AS s9
        FROM b2 JOIN model ON b2.w1 = model.w1 AND b2.w2 = model.w2
        GROUP BY doc_id)
      SELECT doc_id, n_bigrams, CAST(s9 AS DOUBLE) / n_bigrams / 1e9 AS avg_logp
      FROM agg ORDER BY doc_id"""
      })
  }

  /** Winnowing fingerprint selection (the MOSS scheme): slide a
    * window of [[WinnowW]] consecutive 3-gram hashes along each
    * document and keep each window's MINIMUM — the distinct kept
    * hashes are the document's fingerprint set. Selects ~2/(w+1) of
    * the hashes yet carries a GUARANTEE sampling schemes lack: any
    * two documents sharing a contiguous token run long enough to
    * contain one full window (>= w + 2 tokens here) share at least
    * one fingerprint — the window inside the common run has the same
    * hashes in both docs, hence the same min (WinnowSpec proves it).
    * The robust front-end for substring-level near-dup at corpus
    * scale: downstream joins see the winnowed table (|fps| rows per
    * doc), not every positional gram.
    *
    * Plan: positional grams via posexplode + window-lead (the
    * shingle-stream trick — split() runs once per row, not per array
    * element), then window-min over the SAME (doc_id, pos) sort, so
    * the whole query is one exchange + one sort; the final distinct
    * rides the doc_id partitioning (subset-clustering satisfies it,
    * no second exchange). Docs too short for a full window keep the
    * min of what they have; docs under 3 words fall back to the
    * whole-text hash, as everywhere in the dedup family.
    */
  /** Per-row COLUMN form of [[winnow]]'s fingerprint set (distinct
    * winnowed hashes as an array) — the oracle's list formulation as
    * a codegen'd higher-order-function chain, no window functions, so
    * a STREAMING consumer can fingerprint arriving documents row by
    * row ([[graft.streaming.ScreenStream]]). Shares [[shingles]] and
    * the same 32-bit md5 hash as the batch query, and
    * ScreenStreamSpec's parity test pins this expression to
    * `text_winnow`'s rows, so live and batch fingerprints cannot
    * drift.
    */
  private[graft] def winnowFpsExpr(text: Column): Column = {
    val h32 = hash32 _
    val hs = transform(shingles(text), g => h32(g))
    array_distinct(
      when(size(hs) >= 4,
        transform(sequence(lit(1), size(hs) - 3),
          i => array_min(slice(hs, i, lit(4)))))
        .otherwise(array(array_min(hs))))
  }

  val winnow = {
    val WinnowW = 4
    QueryDef(
      "text_winnow",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wspec = Window.partitionBy("doc_id").orderBy("pos")
        val h32 = hash32 _
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("text"), size(split(col("text"), " ")).as("nw"))
        val grams = docs.filter(col("nw") >= 3)
          .select(col("doc_id"), col("nw"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
          .select(col("doc_id"), col("nw"), col("pos"),
            h32(concat_ws(" ", col("w"),
              lead("w", 1).over(wspec), lead("w", 2).over(wspec))).as("h"),
            lead("w", 2).over(wspec).as("guard"))
          .filter(col("guard").isNotNull)
        // windows: min of h .. lead(h, W-1) over the SAME sort as the
        // gram window (one exchange for both). Complete windows keep
        // their guard; a doc with fewer than W grams keeps only its
        // pos-0 row, where least() skipping the null leads yields the
        // min of ALL its grams — the short-doc winnowing semantics
        // without a separate scan+aggregate branch.
        val windowed = grams
          .select(col("doc_id"), col("pos"),
            least(col("h") +: (1 until WinnowW).map(k =>
              lead("h", k).over(wspec)): _*).as("fp"),
            lead("h", WinnowW - 1).over(wspec).as("g2"))
          .filter(col("g2").isNotNull || col("pos") === 0)
          .select("doc_id", "fp")
        val tiny = docs.filter(col("nw") < 3)
          .select(col("doc_id"), h32(col("text")).as("fp"))
        windowed.unionByName(tiny)
          .dropDuplicates("doc_id", "fp")
      },
      Some(s"""WITH hs AS (
      SELECT doc_id,
        list_transform(${shinglesSql("text")},
          g -> ('0x' || substr(md5(g), 1, 8))::BIGINT) AS hs
      FROM documents),
    fps AS (
      SELECT doc_id, CASE WHEN len(hs) >= 4
        THEN list_transform(range(1, len(hs) - 2),
          i -> list_aggregate(hs[i:i+3], 'min'))
        ELSE [list_aggregate(hs, 'min')] END AS fps
      FROM hs)
    SELECT DISTINCT doc_id, fp
    FROM (SELECT doc_id, unnest(fps) AS fp FROM fps)
    ORDER BY doc_id, fp"""))
  }

  /** Held-out trigram LM scoring with stupid backoff (Brants et al.
    * 2007) — the KenLM-filter shape done honestly: [[lmScore]] scores
    * the corpus under its own model, where every n-gram is by
    * construction observed and no backoff can ever fire; here the
    * model trains on the hash-split TRAIN shard only
    * ([[Sampling.splitCol]], 90%) and scores the held-out 10%, so
    * unseen trigrams genuinely back off — trigram MLE, else
    * 0.4 · bigram MLE, else 0.4² · add-one unigram. The per-doc
    * backoff counts are part of the output contract (they are the
    * OOV-rate diagnostic a corpus report wants).
    *
    * All three model levels derive from the ONE trigram count table
    * (c23 = Σ_w1 c123, c3 = Σ_w2 c23), so each level's conditionals
    * sum to 1 over the observed support and the tables cannot drift.
    * Counts are unbounded integers through [[Select.ln9big]] — no
    * saturation cap — and the backoff constant is floor(ln 0.4·1e9),
    * so the whole score is exact integer arithmetic until the final
    * display division.
    *
    * Scale: model state is trigram-vocabulary-sized (map-side
    * combined); scoring is three vocabulary-key equi-joins (trigram,
    * bigram, unigram) feeding one doc_id reduce — the tf-idf shape
    * one join deeper. Held-out docs under 3 tokens have no trigram
    * stream and are absent from the output by definition.
    */
  val lm3Heldout = {
    val Ln04_9 = math.floor(math.log(0.4) * 1e9).toLong
    QueryDef(
      "text_lm3_heldout",
      (s, d) => {
        val ws = split(col("text"), " ")
        val n3 = greatest(size(col("ws")) - 2, lit(0))
        val docs = Tables.documents(s, d).select(col("doc_id"),
          (Sampling.splitCol(col("text")) === "train").as("is_train"),
          ws.as("ws"))
        val tri = docs.select(col("doc_id"), col("is_train"),
          explode(arrays_zip(
            slice(col("ws"), lit(1), n3),
            slice(col("ws"), lit(2), n3),
            slice(col("ws"), lit(3), n3))).as("p"))
          .select(col("doc_id"), col("is_train"),
            col("p")("0").as("w1"), col("p")("1").as("w2"), col("p")("2").as("w3"))
        val c123 = tri.filter(col("is_train"))
          .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c123"))
        val m123 = c123.join(
          c123.groupBy("w1", "w2").agg(sum(col("c123")).as("c12h")),
          Seq("w1", "w2"))
        val c23 = c123.groupBy("w2", "w3").agg(sum(col("c123")).as("c23"))
        val m23 = c23.join(
          c23.groupBy("w2").agg(sum(col("c23")).as("c2h")), Seq("w2"))
        val c3 = c23.groupBy("w3").agg(sum(col("c23")).as("c3"))
        val tot = c3.agg(sum(col("c3")).as("t"), count(lit(1)).as("v1"))
        val ln9 = Select.ln9big _
        tri.filter(!col("is_train"))
          .join(m123, Seq("w1", "w2", "w3"), "left")
          .join(m23, Seq("w2", "w3"), "left")
          .join(c3, Seq("w3"), "left")
          .crossJoin(broadcast(tot))
          .withColumn("lnp9",
            when(col("c123").isNotNull, ln9(col("c123")) - ln9(col("c12h")))
              .when(col("c23").isNotNull,
                lit(Ln04_9) + ln9(col("c23")) - ln9(col("c2h")))
              .otherwise(lit(2 * Ln04_9) +
                ln9(coalesce(col("c3"), lit(0L)) + 1) -
                ln9(col("t") + col("v1"))))
          .withColumn("bo",
            when(col("c123").isNotNull, 0).when(col("c23").isNotNull, 1)
              .otherwise(2))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_trigrams"),
            sum(when(col("bo") === 1, 1L).otherwise(0L)).as("n_backoff_bigram"),
            sum(when(col("bo") === 2, 1L).otherwise(0L)).as("n_backoff_unigram"),
            sum(col("lnp9")).as("s9"))
          .select(col("doc_id"), col("n_trigrams"),
            col("n_backoff_bigram"), col("n_backoff_unigram"),
            (col("s9").cast(DoubleType) / col("n_trigrams") / 1e9)
              .as("avg_logp"))
      },
      Some {
        val h60 = hash60Sql
        val ln9 = Select.ln9bigSql _
        s"""WITH ${Select.lntCte},
      docs AS (
        SELECT doc_id, ${h60("'split:' || text")} % 100 < 90 AS is_train,
          string_split(text, ' ') AS ws
        FROM documents),
      tri AS (
        SELECT doc_id, is_train, p['w1'] AS w1, p['w2'] AS w2, p['w3'] AS w3
        FROM (SELECT doc_id, is_train,
            unnest(list_transform(range(1, len(ws) - 1),
              i -> {'w1': ws[i], 'w2': ws[i+1], 'w3': ws[i+2]})) AS p
          FROM docs)),
      c123 AS (
        SELECT w1, w2, w3, COUNT(*) AS c123 FROM tri WHERE is_train
        GROUP BY 1, 2, 3),
      m123 AS (
        SELECT w1, w2, w3, c123, c12h FROM c123 JOIN (
          SELECT w1, w2, CAST(SUM(c123) AS BIGINT) AS c12h
          FROM c123 GROUP BY 1, 2) h USING (w1, w2)),
      c23 AS (
        SELECT w2, w3, CAST(SUM(c123) AS BIGINT) AS c23
        FROM c123 GROUP BY 1, 2),
      m23 AS (
        SELECT w2, w3, c23, c2h FROM c23 JOIN (
          SELECT w2, CAST(SUM(c23) AS BIGINT) AS c2h
          FROM c23 GROUP BY 1) h USING (w2)),
      c3 AS (
        SELECT w3, CAST(SUM(c23) AS BIGINT) AS c3 FROM c23 GROUP BY 1),
      tot AS (
        SELECT CAST(SUM(c3) AS BIGINT) AS t, COUNT(*) AS v1 FROM c3),
      sc AS (
        SELECT doc_id,
          CASE WHEN m123.c123 IS NOT NULL
                 THEN ${ln9("m123.c123")} - ${ln9("m123.c12h")}
               WHEN m23.c23 IS NOT NULL
                 THEN $Ln04_9 + ${ln9("m23.c23")} - ${ln9("m23.c2h")}
               ELSE ${2 * Ln04_9} + ${ln9("COALESCE(c3.c3, 0) + 1")}
                 - ${ln9("t + v1")} END AS lnp9,
          CASE WHEN m123.c123 IS NOT NULL THEN 0
               WHEN m23.c23 IS NOT NULL THEN 1 ELSE 2 END AS bo
        FROM tri
        LEFT JOIN m123 USING (w1, w2, w3)
        LEFT JOIN m23 USING (w2, w3)
        LEFT JOIN c3 USING (w3)
        CROSS JOIN tot CROSS JOIN lnt
        WHERE NOT is_train)
      SELECT doc_id, COUNT(*) AS n_trigrams,
        CAST(SUM(CASE WHEN bo = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff_bigram,
        CAST(SUM(CASE WHEN bo = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff_unigram,
        CAST(CAST(SUM(lnp9) AS BIGINT) AS DOUBLE) / COUNT(*) / 1e9 AS avg_logp
      FROM sc GROUP BY doc_id ORDER BY doc_id"""
      })
  }

  /** CCNet-style perplexity bucketing: within each language, rank
    * documents by their LM score ([[lmScore]]; higher avg log-prob =
    * lower perplexity) and cut the ranking into head / middle / tail
    * thirds — the standard quality-tier label used to build mixture
    * weights ("train mostly on head+middle") without a hard filter.
    *
    * Tie-break (avg_logp DESC, doc_id) is total, and avg_logp is
    * already bit-identical cross-engine (text_lm_score hash-passes),
    * so the bucket boundary is deterministic. The thirds use integer
    * algebra (3·rank vs n) — no float division at the cut.
    *
    * Scale shape: the rank is computed with q_decile's two-phase
    * distributed machinery, generalized to per-group ranking —
    * `repartitionByRange` on (lang, avg_logp DESC, doc_id) gives each
    * range partition a contiguous slice of the per-language order
    * (ONE exchange, local sorts; a dominant language spreads over
    * MANY range partitions instead of funnelling through one task);
    * the local rank within a (partition, lang) slice falls out of
    * `monotonically_increasing_id` minus the slice's first local row
    * number; the global per-language rank adds a broadcast offset =
    * running sum of earlier partitions' slice counts. The offsets
    * aggregate is P·|lang| rows (P = shuffle partitions, |lang| ~
    * tens), so the only window work is over that tiny table — no
    * whole-language single-partition sort anywhere (PlanSpec locks
    * this). Bit-identical to the per-lang ROW_NUMBER the oracle keeps
    * as the cross-engine proof.
    *
    * CORRECTNESS INVARIANT: the offsets branch and the final join both
    * reference the nondeterministic range-partitioned subtree; they
    * see identical partition assignments because the shuffle exchange
    * is REUSED at execution (one ShuffleExchange + a ReusedExchange —
    * PlanSpec's executedPlan check locks this, for q_decile too). If a
    * future edit de-canonicalizes the branches, persist the subtree.
    */
  val pplBucket = QueryDef(
    "text_ppl_bucket",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val nParts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val scored = lmScore.fn(s, d).select(col("doc_id"), col("avg_logp"))
      // persist: the ranked layout feeds TWO branches (offsets + the
      // final join) and its input arrives through the lmScore join, so
      // without one materialization the branches can range-sample
      // different bounds and silently mis-rank — the exact failure
      // classify_calibration exhibited at the 100x tier before r13
      // (see GraftOps.ntileByRange's note; exchange REUSE, the
      // previous invariant here, is best-effort and broke under AQE
      // there). The cached stream is the pruned (doc_id, lang,
      // avg_logp) projection plus the rank ids. Cache lifetime is the
      // caller's, as for GraftOps.ntileByRange (see its Scaladoc):
      // Bench clears per rep, Verify per query; a long-lived session
      // should clearCache between ranking queries.
      val local = Tables.documents(s, d).select(col("doc_id"), col("lang"))
        .join(scored, "doc_id")
        .repartitionByRange(nParts, col("lang"), col("avg_logp").desc, col("doc_id"))
        .sortWithinPartitions(col("lang"), col("avg_logp").desc, col("doc_id"))
        .withColumn("_mid", monotonically_increasing_id())
        .withColumn("_pid", shiftright(col("_mid"), 33))
        .withColumn("_lrn", col("_mid").bitwiseAND((1L << 33) - 1) + 1L)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // One row per (range partition, lang) slice: count + first local
      // row number. The windows below run over this P·|lang|-row
      // aggregate, never over the documents.
      val wLangCum = Window.partitionBy("lang").orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = local.groupBy("_pid", "lang")
        .agg(count(lit(1)).as("_c"), min(col("_lrn")).as("_first"))
        .withColumn("_offset", coalesce(sum("_c").over(wLangCum), lit(0L)))
        .withColumn("_n", sum("_c").over(Window.partitionBy("lang")))
        .select("_pid", "lang", "_first", "_offset", "_n")
      local.join(broadcast(offsets), Seq("_pid", "lang"))
        .withColumn("rk", col("_lrn") - col("_first") + 1L + col("_offset"))
        .select(col("doc_id"), col("lang"), col("avg_logp"),
          when(col("rk") * 3 <= col("_n"), "head")
            .when(col("rk") * 3 <= col("_n") * 2, "middle")
            .otherwise("tail").as("bucket"))
    },
    Some {
      val lmSql = lmScore.oracle.get.replace("ORDER BY doc_id", "")
      s"""WITH lm AS ($lmSql),
      ranked AS (
        SELECT d.doc_id, d.lang, lm.avg_logp,
          ROW_NUMBER() OVER (
            PARTITION BY d.lang ORDER BY lm.avg_logp DESC, d.doc_id) AS rk,
          COUNT(*) OVER (PARTITION BY d.lang) AS n
        FROM documents d JOIN lm ON lm.doc_id = d.doc_id)
    SELECT doc_id, lang, avg_logp,
      CASE WHEN rk * 3 <= n THEN 'head'
           WHEN rk * 3 <= n * 2 THEN 'middle'
           ELSE 'tail' END AS bucket
    FROM ranked ORDER BY doc_id"""
    })

  /** Normalization-then-exact-dedup — the canonicalization front line
    * every web pipeline runs before any fuzzy matching: lowercase,
    * strip non-alphanumerics (keeping spaces), collapse whitespace
    * runs, trim; duplicates are groups sharing the canonical form's
    * md5, survivor = min doc_id. Catches case/punctuation/spacing
    * variants that byte-exact dedup ([[Dedup.exact]]) misses, at the
    * same one-hash-shuffle cost — payloads never shuffle, only
    * (doc_id, hash). The regexes are shared-dialect ([a-z0-9 ] and
    * ' +' parse identically in Java regex and RE2/DuckDB).
    */
  val normExact = QueryDef(
    "dedup_norm_exact",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val canon = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
      val w = Window.partitionBy("canon_hash")
      Tables.documents(s, d)
        .select(col("doc_id"), md5(canon).as("canon_hash"))
        .withColumn("canonical_id", min(col("doc_id")).over(w))
        .withColumn("dup_count", count(lit(1)).over(w))
        .select(col("doc_id"), col("canon_hash"), col("canonical_id"),
          (col("doc_id") === col("canonical_id")).as("keep"),
          col("dup_count"))
    },
    Some("""WITH h AS (
      SELECT doc_id,
        md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                ' +', ' ', 'g'))) AS canon_hash
      FROM documents)
    SELECT doc_id, canon_hash,
      MIN(doc_id) OVER (PARTITION BY canon_hash) AS canonical_id,
      doc_id = MIN(doc_id) OVER (PARTITION BY canon_hash) AS keep,
      COUNT(*) OVER (PARTITION BY canon_hash) AS dup_count
    FROM h ORDER BY doc_id"""))

  val defs: Seq[QueryDef] = Seq(langId, quality, tokens, fingerprint,
    rollingFingerprint, scrub, repetition, bigrams, entropy, chunk,
    langConfusion, featHash, lmScore, winnow, lm3Heldout, pplBucket, normExact)
}
