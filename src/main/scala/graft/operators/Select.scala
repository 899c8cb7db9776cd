package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Model-based data selection — the two classifier/importance shapes a
  * training-data pipeline runs after the rule-based filters:
  *
  *  - `classify_nb`: a multinomial Naive Bayes quality classifier
  *    (the fastText-filter shape from the GPT-3 / CCNet pipelines)
  *    trained on the corpus's own rule-based quality gate and scoring
  *    every document with its log-odds margin.
  *  - `sample_dsir`: Data Selection via Importance Resampling (Xie et
  *    al. 2023): hashed-bigram importance weights of a target domain
  *    against the raw corpus, then a Gumbel top-k draw — the
  *    deterministic equivalent of sampling-without-replacement
  *    proportionally to the importance weights.
  *
  * == Deterministic unbounded ln ==
  *
  * Both operators need `ln` of integer counts with NO a-priori bound
  * (class totals grow with the corpus — a saturation cap like
  * `text_lm_score`'s would flatten exactly the global terms that
  * matter at 100 TB). The trick extends the `text_entropy` ln-table to
  * arbitrary magnitude via the float decomposition n = m·2^s with
  * mantissa m in [2048, 4095]:
  *
  *   ln9big(n) = L[m] + s · floor(ln 2 · 1e9),  m = n >> s
  *
  * where L[i] = floor(ln i · 1e9) is a 4096-entry table inlined into
  * both plans and s = max(bitlen(n) - 12, 0). Every step is integer
  * arithmetic on values both engines compute bit-identically
  * (`bin`/`length`/shift), so scores hash-match cross-engine; the
  * mantissa truncation costs < ln(1 + 1/2048) ≈ 4.9e-4 nats — three
  * orders below any decision threshold in use, and a documented
  * property of the score (not an approximation of something else).
  *
  * Scale shape (both queries): token/feature streams reduce to
  * VOCABULARY-sized model tables (map-side combined, one exchange);
  * scoring is one equi-join of the stream against the model and one
  * doc_id reduce — the tf-idf two-shuffle shape. Global totals ride a
  * broadcast single-row cross join. The DSIR draw itself is a global
  * top-k (TakeOrdered — per-partition heaps, no full sort).
  */
object Select {

  private val Ln2_9 = graft.functions.Ln9.Ln2_9
  private val lnTable: IndexedSeq[Long] =
    graft.functions.Ln9.table(graft.functions.Ln9.BigMaxC).toIndexedSeq

  /** floor-scaled ln of a positive integral column, any magnitude —
    * the [[graft.functions.Ln9Big]] codegen expression (table in a
    * JVM-static cache; the former per-call-site 4096-entry `typedlit`
    * put 270-530 KB of literals in every consumer plan, the exact
    * disease round 7 measured at 6x wall-clock on the embedding
    * family). Bit-identical to the literal chain on all n >= 0
    * (Ln9Spec).
    */
  private[graft] def ln9big(n: Column): Column = graft.functions.Ln9.big(n)

  /** DuckDB spelling of [[ln9big]]; expects a CTE `lnt(v)` holding the
    * table literal in scope (CROSS JOIN lnt).
    */
  private[graft] def ln9bigSql(e: String): String =
    s"""(lnt.v[CAST((CASE WHEN length(bin(CAST(($e) AS BIGINT))) > 12
        THEN CAST(($e) AS BIGINT) >> (length(bin(CAST(($e) AS BIGINT))) - 12)
        ELSE CAST(($e) AS BIGINT) END) + 1 AS INT)]
      + CAST(greatest(length(bin(CAST(($e) AS BIGINT))) - 12, 0) AS BIGINT) * $Ln2_9)"""

  private[graft] val lntCte =
    s"lnt AS (SELECT ${lnTable.mkString("[", ", ", "]")} AS v)"

  /** Multinomial NB with add-one smoothing, trained on the rule-based
    * quality score thresholded at the corpus MEDIAN (0.6 — stable
    * across scale factors; `pipeline_curate`'s 0.5 deployment gate
    * passes ~99% of docs, which would leave a 2-doc negative class
    * and nothing to learn) and applied back to every document:
    *
    *   margin(d) = ln P(pos)/P(neg)
    *             + Σ_tok ln p(tok|pos)/p(tok|neg)
    *   p(tok|c)  = (count(tok,c) + 1) / (T_c + V)
    *
    * This is the standard bootstrap when no labeled quality set
    * exists: distill the cheap rule gate into a token-level model
    * whose margin RANKS documents (the rule gives only a bit). The
    * self-training confusion (nb_pred vs quality_label) is part of
    * the output contract.
    *
    * Plan: per-(tok,class) counts are one vocabulary-sized exchange;
    * the per-token log-likelihood ratio is precomputed ON the model
    * (once per distinct token, not per occurrence); scoring joins the
    * token stream back and reduces per doc_id. Class totals and doc
    * priors are two single-row aggregates broadcast into the final
    * projection. Everything before the final /1e9 is exact integer
    * arithmetic — see the module note on ln9big.
    */
  private val NbLabelTau = 0.6

  val nbClassify = QueryDef(
    "classify_nb",
    (s, d) => {
      // ONE training/scoring definition for the batch query and the
      // streaming scorer: build the artifacts, score the corpus, join
      // the training label back for the confusion contract.
      val (model, consts) = nbArtifacts(s, d)
      nbScoreWith(Tables.documents(s, d).select("doc_id", "text"),
        model, consts)
        .join(nbLabeled(s, d)
          .select(col("doc_id"), col("pos").as("quality_label")), Seq("doc_id"))
        .select("doc_id", "quality_label", "n_toks", "nb_margin", "nb_pred")
    },
    Some(nbOracleSql(
      s"SELECT doc_id, quality_score >= $NbLabelTau AS pos " +
        s"FROM (${TextAnalysis.quality.oracle.get})",
      "quality_label")))

  /** DuckDB mirror of train-then-score NB for any label CTE producing
    * `(doc_id, pos)` — the single SQL definition behind both the
    * self-bootstrap ([[nbClassify]]) and external-label
    * ([[nbClassifyLang]]) oracles, so the two cannot drift on the
    * model arithmetic.
    */
  private def nbOracleSql(labSql: String, labelCol: String): String =
    s"""WITH $lntCte,
      lab AS ($labSql),
      toks AS (
        SELECT d.doc_id, lab.pos, unnest(string_split(d.text, ' ')) AS tok
        FROM documents d JOIN lab ON lab.doc_id = d.doc_id),
      model AS (
        SELECT tok,
          CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS cp,
          CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS cn
        FROM toks GROUP BY tok),
      model2 AS (
        SELECT tok, ${ln9bigSql("cp + 1")} - ${ln9bigSql("cn + 1")} AS llr9
        FROM model CROSS JOIN lnt),
      totals AS (
        SELECT CAST(SUM(cp) AS BIGINT) AS tp, CAST(SUM(cn) AS BIGINT) AS tn,
          COUNT(*) AS vsz
        FROM model),
      priors AS (
        SELECT CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS dp,
          CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS dn
        FROM lab),
      agg AS (
        SELECT doc_id, pos, COUNT(*) AS n_toks, CAST(SUM(llr9) AS BIGINT) AS s9
        FROM toks JOIN model2 USING (tok) GROUP BY doc_id, pos),
      fin AS (
        SELECT doc_id, pos AS $labelCol, n_toks,
          s9 + n_toks * (${ln9bigSql("tn + vsz")} - ${ln9bigSql("tp + vsz")})
            + (CASE WHEN dp > 0 AND dn > 0
                 THEN ${ln9bigSql("dp")} - ${ln9bigSql("dn")}
                 ELSE error('classify_nb: degenerate label split') END) AS score9
        FROM agg CROSS JOIN totals CROSS JOIN priors CROSS JOIN lnt)
      SELECT doc_id, $labelCol, CAST(n_toks AS BIGINT) AS n_toks,
        CAST(score9 AS DOUBLE) / 1e9 AS nb_margin, score9 > 0 AS nb_pred
      FROM fin ORDER BY doc_id"""

  /** The external-label NB (SURVEY §8's remaining selection
    * extension): identical train-then-score plan to [[nbClassify]],
    * but supervised by a CURATED label column — here `lang = 'en'`,
    * standing in for the production curated-quality table (wiki/books
    * positives in the CCNet/GPT-3 recipe). Only the label join
    * differs; the model arithmetic, the vocabulary-sized exchange, and
    * the OOV-via-corr9 scoring are shared code ([[nbArtifactsFor]] /
    * [[nbScoreWith]]), so a fix to either classifier reaches both.
    * The output keeps the training label alongside the prediction —
    * the confusion matrix is one GROUP BY downstream.
    */
  val nbClassifyLang = QueryDef(
    "classify_nb_labeled",
    (s, d) => {
      val labeled = Tables.documents(s, d).select(
        col("doc_id"), (col("lang") === "en").as("pos"),
        split(col("text"), " ").as("ws"))
      val (model, consts) = nbArtifactsFor(labeled)
      nbScoreWith(Tables.documents(s, d).select("doc_id", "text"),
        model, consts)
        .join(labeled.select(col("doc_id"), col("pos").as("lang_label")),
          Seq("doc_id"))
        .select("doc_id", "lang_label", "n_toks", "nb_margin", "nb_pred")
    },
    Some(nbOracleSql(
      "SELECT doc_id, lang = 'en' AS pos FROM documents", "lang_label")))

  /** Threshold CALIBRATION sweep of the external-label classifier —
    * the step a production quality pipeline runs between training the
    * filter and deploying it: "at each candidate threshold, what
    * fraction of the kept slice is truly positive (precision) and
    * what fraction of all positives survives (recall)?" The deployed
    * gate is then the knee of that curve, not a guessed constant.
    *
    * Contract: documents ranked by [[nbClassifyLang]]'s margin
    * (descending, doc_id tie-break) and cut into 10 rank deciles —
    * each decile boundary is a candidate threshold, reported as the
    * decile's minimum margin. Per decile: bucket size and positive
    * count, then CUMULATIVE kept-set stats from the top — cum_docs,
    * cum_pos, precision_cum (cum_pos/cum_docs), recall_cum
    * (cum_pos/total positives) and their F1. lang_label is the ground
    * truth, exactly as in the classifier's own confusion contract.
    *
    * Scale shape: scoring is the classifier's own 100-TB plan; the
    * global rank rides [[graft.plans.GraftOps.ntileByRange]] (range
    * partition + per-partition offsets — q_decile's discipline, one
    * shared definition, never a single-partition window over the
    * data); everything after is decile-sized (a 10-row running
    * window and scalar divisions). Doubles divide identically in both
    * engines on identical inputs (the margins are hash-proven
    * bit-equal by the classifier's own oracle), and F1 reuses the
    * computed precision/recall columns so the op sequence matches the
    * SQL exactly; cum_pos = 0 short-circuits F1 to 0.0 rather than
    * tripping 0/0 NaN cross-engine comparison.
    */
  val nbCalibration = QueryDef(
    "classify_calibration",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val scored = nbClassifyLang.fn(s, d)
        .select(col("doc_id"), col("lang_label"), col("nb_margin"))
      val ranked = graft.plans.GraftOps.ntileByRange(
        scored, Seq(col("nb_margin").desc, col("doc_id")), 10)
        .withColumnRenamed("bucket", "decile")
      val per = ranked.groupBy("decile").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("lang_label"), 1L).otherwise(0L)).as("n_pos"),
        min(col("nb_margin")).as("threshold_margin"))
      // 10-row frames (decile-sized, the aggregate-funnel exception)
      val w10 = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      per
        .withColumn("cum_docs", sum(col("n_docs")).over(w10))
        .withColumn("cum_pos", sum(col("n_pos")).over(w10))
        .withColumn("tot_pos", sum(col("n_pos")).over(wAll))
        .withColumn("precision_cum",
          col("cum_pos").cast(DoubleType) / col("cum_docs"))
        .withColumn("recall_cum",
          col("cum_pos").cast(DoubleType) / col("tot_pos"))
        .withColumn("f1_cum",
          when(col("cum_pos") > 0,
            lit(2.0) * col("precision_cum") * col("recall_cum") /
              (col("precision_cum") + col("recall_cum")))
            .otherwise(lit(0.0)))
        .select("decile", "threshold_margin", "n_docs", "n_pos",
          "cum_docs", "cum_pos", "precision_cum", "recall_cum", "f1_cum")
    },
    Some(s"""WITH scored AS (${nbClassifyLang.oracle.get}),
    ranked AS (
      SELECT doc_id, lang_label, nb_margin,
        CAST(NTILE(10) OVER (ORDER BY nb_margin DESC, doc_id) AS BIGINT) AS decile
      FROM scored),
    per AS (
      SELECT decile, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN lang_label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        MIN(nb_margin) AS threshold_margin
      FROM ranked GROUP BY decile),
    cum AS (
      SELECT decile, threshold_margin, n_docs, n_pos,
        CAST(SUM(n_docs) OVER w AS BIGINT) AS cum_docs,
        CAST(SUM(n_pos) OVER w AS BIGINT) AS cum_pos,
        CAST(SUM(n_pos) OVER wa AS BIGINT) AS tot_pos
      FROM per
      WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING),
             wa AS (ORDER BY decile
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
    pr AS (
      SELECT decile, threshold_margin, n_docs, n_pos, cum_docs, cum_pos,
        CAST(cum_pos AS DOUBLE) / cum_docs AS precision_cum,
        CAST(cum_pos AS DOUBLE) / tot_pos AS recall_cum
      FROM cum)
    SELECT decile, threshold_margin, CAST(n_docs AS BIGINT) AS n_docs,
      n_pos, cum_docs, cum_pos, precision_cum, recall_cum,
      CASE WHEN cum_pos > 0
           THEN 2.0 * precision_cum * recall_cum / (precision_cum + recall_cum)
           ELSE 0.0 END AS f1_cum
    FROM pr ORDER BY decile"""))

  private val DsirB = 1024 // hashed-feature buckets
  private val DsirK = 100 // resample size
  private val DsirM = 1 << 20 // uniform-draw granularity
  private val Ln1e9_9 = math.floor(math.log(1e9) * 1e9).toLong
  /** Target domain: the curated source slice the resampler steers
    * the mixture toward (4 of the 20 synthetic sources here; in
    * production, the high-trust domain — wiki/books).
    */
  private val DsirTargets = Seq("src0", "src1", "src2", "src3")

  /** DSIR: importance weight of each document under a hashed-bigram
    * unigram-of-features model of the TARGET domain vs the RAW corpus,
    *
    *   lw(d) = Σ_f [ ln (c_t(f)+1) - ln (c_r(f)+1) ]
    *         + n_f · [ ln (T_r+B) - ln (T_t+B) ]
    *
    * then a Gumbel top-k draw: key(d) = lw(d) + G(d) where
    * G = -ln(-ln u) and u is a per-doc uniform from the portable
    * 60-bit hash — equivalent to drawing K docs without replacement
    * with probability ∝ exp(lw), but fully deterministic and
    * rerun-stable (the Gumbel-max trick; no RNG state, no exp()).
    * Both ln layers go through ln9big, so the composed key is exact
    * integer arithmetic until the final /1e9 display cast.
    *
    * The draw hash is u ∈ [1, 2^20-1]: -ln u stays strictly positive
    * (scaled e9 ≥ 1), so the outer ln is always defined — no ±inf
    * path exists in either engine.
    */
  /** (doc_id, source, lw9) — the per-document scaled importance log-
    * weight, shared by the [[dsir]] draw and the [[mixDsir]] mixture
    * table so the two cannot drift apart on the model.
    */
  private def importanceFrame(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val isTarget = col("source").isin(DsirTargets: _*)
    val ws = split(col("text"), " ")
    val docs = Tables.documents(s, d).select(
      col("doc_id"), col("source"), isTarget.as("tgt"), ws.as("ws"))
    val bi = docs.select(col("doc_id"), col("tgt"),
      explode(arrays_zip(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1))).as("p"))
      .select(col("doc_id"), col("tgt"),
        (TextAnalysis.hash60(
          concat(col("p")("0"), lit(" "), col("p")("1"))) % DsirB).as("f"))
    // Materialized once (r17): `model` is bounded at DsirB (= 1024)
    // rows at ANY corpus size, and it feeds TWO consumers (the lr9
    // broadcast and the totals aggregate) — without the checkpoint the
    // totals path re-ran the full corpus bigram explode + aggregate a
    // third time per action.
    val model = bi.groupBy("f")
      .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))
      .withColumn("lr9", ln9big(col("ct") + 1) - ln9big(col("cr") + 1))
      .localCheckpoint(true)
    val totals = model.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    // r17: the model is bounded at DsirB (= 1024) hashed-feature rows
    // at ANY corpus size, so broadcasting it removes the full-corpus
    // bigram-stream exchange the equi-join otherwise pays (the f-side
    // shuffle of `bi` was the plan's largest exchange; the remaining
    // doc_id aggregate partial-aggregates map-side). Guide §3.1.
    val lw = bi.join(broadcast(model.select("f", "lr9")), "f")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nf"), sum(col("lr9")).as("s9"))
    docs.select(col("doc_id"), col("source"))
      .join(lw, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("nf"), lit(0L)).as("nf"),
        coalesce(col("s9"), lit(0L)).as("s9"))
      .crossJoin(broadcast(totals))
      .withColumn("lw9", col("s9") +
        col("nf") * (ln9big(col("tr") + DsirB) - ln9big(col("tt") + DsirB)))
      .select("doc_id", "source", "lw9")
  }

  val dsir = QueryDef(
    "sample_dsir",
    (s, d) => {
      val u = TextAnalysis.hash60(concat(lit("dsir:"), col("doc_id"))) %
        (DsirM - 1) + 1
      val e9 = lit(20L * Ln2_9) - ln9big(u)
      val g9 = lit(Ln1e9_9) - ln9big(e9)
      importanceFrame(s, d)
        .withColumn("key9", col("lw9") + g9)
        .orderBy(col("key9").desc, col("doc_id"))
        .limit(DsirK)
        .select(col("doc_id"),
          (col("lw9").cast(DoubleType) / 1e9).as("log_weight"),
          (col("key9").cast(DoubleType) / 1e9).as("sample_key"))
    },
    Some {
      val h60 = TextAnalysis.hash60Sql
      s"""WITH $dsirCtesSql,
      keyed AS (
        SELECT doc_id, lw9,
          ${Ln1e9_9} - ${ln9bigSql(
        s"${20L * Ln2_9} - ${ln9bigSql(s"${h60(s"'dsir:' || w.doc_id")} % ${DsirM - 1} + 1")}")} AS g9
        FROM w CROSS JOIN lnt)
      SELECT doc_id, CAST(lw9 AS DOUBLE) / 1e9 AS log_weight,
        CAST(lw9 + g9 AS DOUBLE) / 1e9 AS sample_key
      FROM keyed ORDER BY lw9 + g9 DESC, doc_id LIMIT $DsirK"""
    })

  /** Shared DuckDB CTE block ending in `w(doc_id, source, lw9)` — the
    * SQL mirror of [[importanceFrame]], used by both the sample_dsir
    * and mix_dsir oracles.
    */
  private lazy val dsirCtesSql: String = {
    val tgtList = DsirTargets.map(t => s"'$t'").mkString(", ")
    val h60 = TextAnalysis.hash60Sql
    s"""$lntCte,
      docs AS (
        SELECT doc_id, source, source IN ($tgtList) AS tgt,
          string_split(text, ' ') AS ws
        FROM documents),
      bi AS (
        SELECT doc_id, tgt,
          ${h60("ws[i] || ' ' || ws[i+1]")} % $DsirB AS f
        FROM docs, LATERAL (SELECT unnest(range(1, len(ws)))) t(i)),
      model AS (
        SELECT f,
          CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
          COUNT(*) AS cr
        FROM bi GROUP BY f),
      model2 AS (
        SELECT f, ${ln9bigSql("ct + 1")} - ${ln9bigSql("cr + 1")} AS lr9
        FROM model CROSS JOIN lnt),
      totals AS (
        SELECT CAST(SUM(ct) AS BIGINT) AS tt, CAST(SUM(cr) AS BIGINT) AS tr
        FROM model),
      lw AS (
        SELECT doc_id, COUNT(*) AS nf, CAST(SUM(lr9) AS BIGINT) AS s9
        FROM bi JOIN model2 USING (f) GROUP BY doc_id),
      w AS (
        SELECT d.doc_id, d.source,
          COALESCE(lw.s9, 0) + COALESCE(lw.nf, 0)
            * (${ln9bigSql(s"tr + $DsirB")} - ${ln9bigSql(s"tt + $DsirB")}) AS lw9
        FROM docs d LEFT JOIN lw ON lw.doc_id = d.doc_id
        CROSS JOIN totals CROSS JOIN lnt)"""
  }

  /** Domain-mixture reweighting table (the DoReMi-lite shape): the
    * per-SOURCE mean DSIR importance log-weight — how target-like each
    * domain's text is under the hashed-bigram model. The mixture
    * designer feeds these into its softmax/temperature downstream;
    * emitting the ln-domain means keeps the query exp()-free and
    * bit-deterministic (exact integer sums; one double division chain
    * per source, identical in both engines).
    *
    * Scale: rides [[importanceFrame]] (two vocabulary-sized shuffles)
    * plus one ~|sources|-row aggregate — nothing new materializes.
    */
  val mixDsir = QueryDef(
    "mix_dsir",
    (s, d) => importanceFrame(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        ((sum(col("lw9")).cast(DoubleType) / count(lit(1))) / 1e9)
          .as("mean_log_weight")),
    Some(s"""WITH $dsirCtesSql
      SELECT source, COUNT(*) AS n_docs,
        (CAST(SUM(lw9) AS DOUBLE) / COUNT(*)) / 1e9 AS mean_log_weight
      FROM w GROUP BY source ORDER BY source"""))

  /** (doc_id, pos, ws) — the labeled training frame; the ONE site
    * where the quality label is defined.
    */
  private def nbLabeled(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      (TextAnalysis.qualityScoreCol(col("text")) >= NbLabelTau).as("pos"),
      split(col("text"), " ").as("ws"))

  /** Batch-trained NB artifacts — the single training definition
    * behind [[nbClassify]] and the streaming scorer: the token model
    * `(tok, llr9)` and a one-row constants frame `(corr9, prior9)`
    * such that
    *
    *   margin9(doc) = Σ_tok llr9(tok) + n_toks · corr9 + prior9.
    *
    * An UNSEEN token's add-one contribution is
    * ln(1/(T_p+V)) - ln(1/(T_n+V)) = corr9 exactly, so scoring any
    * frame left-joins the model with llr9 defaulting to 0 and the
    * n_toks·corr9 term covers OOV for free.
    *
    * A degenerate label split (every doc on one side of the gate)
    * makes the prior ln(0) — rather than silently treating it as
    * ln(1), the constants row RAISES, in both engines (raise_error
    * here, error() in the oracle), surfacing the unlearnable split.
    */
  def nbArtifacts(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    nbArtifactsFor(nbLabeled(s, d))

  /** Train the NB artifacts from ANY labeled frame `(doc_id, pos,
    * ws)` — the label source (self-bootstrap gate, curated table,
    * lang column) is the caller's choice; the model arithmetic is not.
    */
  def nbArtifactsFor(docs: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    // NOT checkpointed (r17 measurement): the vocabulary-sized count
    // table feeds two consumers (model + totals), but a same-JVM
    // interleaved A/B of an eager materialization here measured a wash
    // (classify_nb 1.44 inline vs 1.51 ckpt; the totals branch's
    // re-aggregation reuses the exchange) — left on the simpler form.
    val counts = docs.select(col("pos"), explode(col("ws")).as("tok"))
      .groupBy("tok")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("cn"))
    val model = counts
      .withColumn("llr9", ln9big(col("cp") + 1) - ln9big(col("cn") + 1))
      .select("tok", "llr9")
    val totals = counts.agg(sum(col("cp")).as("tp"), sum(col("cn")).as("tn"),
      count(lit(1)).as("vsz"))
    val priors = docs.agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("dp"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("dn"))
    val consts = totals.crossJoin(priors).select(
      (ln9big(col("tn") + col("vsz")) - ln9big(col("tp") + col("vsz")))
        .as("corr9"),
      when(col("dp") > 0 && col("dn") > 0,
        ln9big(col("dp")) - ln9big(col("dn")))
        .otherwise(raise_error(
          lit("classify_nb: degenerate label split (one class is empty)"))
          .cast(LongType)).as("prior9"))
    (model, consts)
  }

  /** Score any (doc_id, text) frame with [[nbArtifacts]] — stateless
    * per row except the per-doc token reduce, so it runs unchanged on
    * a micro-batch inside foreachBatch. OOV tokens ride the corr9
    * term (see nbArtifacts).
    */
  def nbScoreWith(docs: org.apache.spark.sql.DataFrame,
      model: org.apache.spark.sql.DataFrame,
      consts: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val score9 = col("s9") + col("n_toks") * col("corr9") + col("prior9")
    toks.join(model, Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        sum(coalesce(col("llr9"), lit(0L))).as("s9"))
      .crossJoin(broadcast(consts))
      .select(col("doc_id"), col("n_toks"),
        (score9.cast(DoubleType) / 1e9).as("nb_margin"),
        (score9 > 0).as("nb_pred"))
  }

  val defs: Seq[QueryDef] = Seq(nbClassify, nbClassifyLang, nbCalibration,
    dsir, mixDsir)
}
