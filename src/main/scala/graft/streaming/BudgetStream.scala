package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Sampling

/** B28 — streaming token-budget sampling: the live twin of
  * `sample_token_budget` (D22b), closing the last batch↔stream
  * symmetry gap (D44b↔B27, D3b↔B18, D5↔B25, D49↔B22, C60↔B23 all
  * have twins; the packing/budget family had none).
  *
  * Semantics: documents stream in; per source, the greedy fill keeps
  * every document until the source's token budget is crossed — the
  * crossing document is KEPT (the batch operator's rule), everything
  * after it is dropped. The per-source cumulative token count carries
  * across micro-batches, so the threshold is integer-exact over the
  * whole stream, not per batch. Budgets are an input relation
  * (source, budget): a stream cannot derive temperature budgets from
  * mass it has not seen, so a deployment computes them on the
  * bootstrap corpus ([[Sampling.sourceBudgets]] — the SAME code the
  * batch operator runs) or passes explicit targets.
  *
  * Batch parity (BudgetStreamSpec-proven): within a batch, documents
  * are ordered by the SAME content hash the batch operator sorts by;
  * if the concatenation of micro-batches respects that global order,
  * the drained kept-set equals `sample_token_budget`'s output row for
  * row — same tokens, same cum_tokens, same crossing document —
  * because [[Sampling.budgetTokenCols]] is the shared projection.
  *
  * Exactly-once: verdict rows overwrite their own `batch=<id>`
  * partition (the [[ScoreStream]]/[[DocStream]] pattern), and the
  * carried state is SNAPSHOTTED per batch id — `processBatch(b)`
  * reads the latest state with id < b, so a replay of batch b reads
  * the identical pre-state and REPLACES both its verdicts and its
  * state snapshot instead of double-advancing the cumulative counts.
  *
  * Scale shape: the per-batch window partitions by source but a
  * micro-batch is bounded by the trigger, so no window ever spans a
  * whole source history; the carried state is EXACTLY |distinct
  * sources seen so far| rows (machine-checked in BudgetStreamSpec) —
  * read, driver-materialized, and broadcast per batch; the verdict
  * write is append-free partition overwrite. Nothing shuffles the
  * text payload — the projection drops it before the window.
  */
object BudgetStream {

  /** Latest persisted state snapshot with batch id < `batchId` —
    * (source, carried). Empty relation when none exists (bootstrap or
    * a replay of the very first batch). Snapshot partitions are listed
    * through the Hadoop FileSystem API (the same resolution the
    * parquet reads use), so the carried state survives on HDFS/S3
    * state dirs too — a local-only java.io listing would silently
    * return empty there and reset the cumulative every batch.
    */
  private def preState(
      spark: SparkSession, stateDir: String, batchId: Long): DataFrame = {
    val hconf = org.apache.spark.sql.graft.Bridge.newHadoopConf(spark)
    val base = new org.apache.hadoop.fs.Path(stateDir)
    val fs = base.getFileSystem(hconf)
    val prior =
      (if (fs.exists(base)) fs.listStatus(base).toSeq else Seq.empty)
        .flatMap { st =>
          val n = st.getPath.getName
          if (n.startsWith("batch=")) Some(n.stripPrefix("batch=").toLong)
          else None
        }
        .filter(_ < batchId)
    if (prior.isEmpty)
      spark.range(0).select(lit("").as("source"), lit(0L).as("carried")).limit(0)
    else spark.read.parquet(s"$stateDir/batch=${prior.max}")
  }

  /** One micro-batch of the budget fill (also usable directly on a
    * batch DataFrame of (doc_id, source, text)): verdict rows
    * (source, doc_id, n_tokens, cum_tokens, kept) overwrite
    * `verdictsDir/batch=<id>`; the post-batch per-source cumulative
    * snapshot overwrites `stateDir/batch=<id>`.
    */
  def processBatch(batch: DataFrame, budgets: DataFrame, stateDir: String,
      verdictsDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val docs = Sampling.budgetTokenCols(batch).persist()
    try {
      val pre = preState(spark, stateDir, batchId)
      // per-batch prefix sums in the batch operator's hash order; a
      // micro-batch is trigger-bounded, so the per-source window is
      // small by construction (the batch op's shard decomposition
      // exists for the unbounded whole-corpus case)
      val wLocal = Window.partitionBy("source")
        .orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val verdicts = docs
        .withColumn("cum_local", sum(col("n_tokens")).over(wLocal))
        .join(broadcast(pre), Seq("source"), "left_outer")
        .withColumn("cum_tokens",
          coalesce(col("carried"), lit(0L)) + col("cum_local"))
        // LEFT join: a source absent from the budgets relation gets an
        // explicit kept=false verdict for every document (budget 0),
        // not a silent drop while its tokens still advance the carried
        // state — every streamed document appears in the verdict log.
        .join(broadcast(budgets), Seq("source"), "left_outer")
        .select(col("source"), col("doc_id"), col("n_tokens"),
          col("cum_tokens"),
          (col("cum_tokens") - col("n_tokens") <
            coalesce(col("budget"), lit(0L))).as("kept"))
      verdicts.write.mode("overwrite").parquet(s"$verdictsDir/batch=$batchId")
      // post-state: carried + this batch's per-source totals (sources
      // absent from the batch keep their carried value)
      val batchTotals = docs.groupBy("source")
        .agg(sum("n_tokens").as("batch_tokens"))
      val post = pre.select(col("source"), col("carried"))
        .join(batchTotals, Seq("source"), "full_outer")
        .select(col("source"),
          (coalesce(col("carried"), lit(0L)) +
            coalesce(col("batch_tokens"), lit(0L))).as("carried"))
      // materialize before writing: post reads the previous snapshot
      // directory tree listing, never the one being written. The
      // collect is bounded by |distinct sources ever seen| — the
      // full_outer of two source-keyed relations — a few hundred rows
      // in any realistic mixture (BudgetStreamSpec asserts the bound).
      val rows = post.collect().toSeq
      import spark.implicits._
      rows.map(r => (r.getString(0), r.getLong(1)))
        .toDF("source", "carried")
        .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
      // Prune dead snapshots — without this a long-running stream
      // accumulates one tiny directory per trigger forever, and
      // preState's listing cost grows linearly. Reachability: a
      // replay of THIS batch reads the newest id < batchId (keep it),
      // a replay of the next batch reads batch=batchId (just
      // written); anything older than both can never be read again.
      val hconf = org.apache.spark.sql.graft.Bridge.newHadoopConf(spark)
      val base = new org.apache.hadoop.fs.Path(stateDir)
      val fs = base.getFileSystem(hconf)
      val ids = fs.listStatus(base).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("batch=")) Some(n.stripPrefix("batch=").toLong)
        else None
      }
      val keepFloor = ids.filter(_ < batchId).sorted.lastOption
        .getOrElse(Long.MinValue)
      ids.filter(_ < keepFloor).foreach(id =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/batch=$id"), true))
    } finally docs.unpersist()
  }

  /** Start the streaming budget fill. `docs` is a streaming DataFrame
    * of (doc_id LONG, source STRING, text STRING); `budgets` a static
    * (source, budget) relation.
    */
  def budgetStream(docs: DataFrame, budgets: DataFrame, stateDir: String,
      verdictsDir: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, budgets, stateDir, verdictsDir, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
