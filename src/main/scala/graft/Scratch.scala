package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only smoke harness (not part of the driver contract): drives
  * the library surface the way a user would.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    plans.GraftOps.install(spark)
    val d = "/root/testdata/sf0.001"

    // Formats surface: json + csv round trip of events
    val ev = Tables.events(spark, d)
      .selectExpr("event_id", "user_id", "event_type", "value", "props")
    val js = java.nio.file.Files.createTempDirectory("scratch_js").toString
    sources.Formats.writeJson(ev, js)
    val backJs = sources.Formats.readJson(spark, ev.schema, js)
    println(s"[scratch] json roundtrip: ${ev.count()} -> ${backJs.count()}")

    val cs = java.nio.file.Files.createTempDirectory("scratch_cs").toString
    sources.Formats.writeCsv(ev, cs)
    val backCs = sources.Formats.readCsv(spark, ev.schema, cs)
    println(s"[scratch] csv roundtrip:  ${ev.count()} -> ${backCs.count()}")

    // Custom operator surface
    val top = plans.GraftOps.topKPerKey(
      Tables.events(spark, d), Seq(col("event_type")), col("value"), col("event_id"), 2)
    println(s"[scratch] topKPerKey rows: ${top.count()} (5 types x 2)")

    val purchases = Tables.events(spark, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000000").as("ms"), col("event_id"))
    val clicks = Tables.events(spark, d)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), expr("ts div 1000000").as("c_ms"),
        col("event_id").as("click_id"))
    val asof = plans.GraftOps.asofJoin(purchases, clicks,
      Seq(col("user_id")), Seq(col("c_user")), col("ms"), col("c_ms"))
    println(s"[scratch] asofJoin rows: ${asof.count()}")

    val hll = Tables.events(spark, d)
      .agg(functions.HllSketchAgg.approxDistinct(col("user_id")).as("u"))
      .collect().head.getLong(0)
    println(s"[scratch] hll approx distinct users: $hll")

    println(s"[scratch] events skew ratio: ${plans.GraftOps.skewRatio(Tables.events(spark, d))}")

    // SQL function surface (graft_dot / graft_rolling_minhash /
    // graft_approx_distinct)
    functions.GraftFunctions.register(spark)
    Tables.events(spark, d).createOrReplaceTempView("scratch_events")
    val sqlHll = spark.sql(
      "SELECT graft_approx_distinct(user_id) AS u FROM scratch_events")
      .collect().head.getLong(0)
    println(s"[scratch] SQL hll distinct users: $sqlHll")

    // The top-k window idiom plans through the rewrite on this session
    val idiom = spark.sql(
      """SELECT * FROM (SELECT user_id, event_id,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) rn
        |FROM scratch_events) WHERE rn <= 3""".stripMargin)
    idiom.collect()
    val rewritten = idiom.queryExecution.executedPlan.toString.contains("TopKPerKey")
    println(s"[scratch] top-k idiom rewritten to TopKPerKey: $rewritten")
    require(rewritten, "InferTopKPerKey did not fire on the SQL idiom")

    // Round-2-continuation batch surface
    Seq("pack_sequences", "sample_weighted", "mix_weights",
      "text_bigrams", "q_corr_stats", "ts_fill_forward").foreach { q =>
      println(s"[scratch] $q rows: ${SparkEntry.queries(q)(spark, d).count()}")
    }

    // Session-4 surface: CEP patterns, bloom SQL pair, chunking,
    // layout keys, BPE train+apply
    Seq("q_funnel", "q_pattern_match", "q_range_join", "q_bloom_prune",
      "text_chunk", "q_zorder", "emb_dim_reduce", "dedup_containment",
      "multimodal_dedup", "q_agg_pushdown", "bpe_train",
      "text_tokenize_bpe", "q_retention", "q_mad", "q_profile",
      "q_range_frame", "graph_triangles", "text_langid_confusion",
      "ep_latest_state", "emb_quantize").foreach { q =>
      println(s"[scratch] $q rows: ${SparkEntry.queries(q)(spark, d).count()}")
    }
    val sqlBloom = spark.sql(
      """SELECT COUNT(*) FROM scratch_events
        |WHERE graft_bloom_contains(
        |  (SELECT graft_bloom_agg(user_id) FROM scratch_events WHERE event_type = 'purchase'),
        |  user_id)""".stripMargin).head().getLong(0)
    println(s"[scratch] SQL bloom-pruned rows: $sqlBloom")
    spark.stop()

    // Driver-parity smoke: entry() must work on a VANILLA session
    // (the driver creates its own, without graft's configs).
    val vanilla = SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    val entryRows = SparkEntry.entry(vanilla).count()
    println(s"[scratch] entry rows on vanilla session: $entryRows")
    vanilla.stop()
    require(entryRows > 0, "driver smoke would fail: entry() returned 0 rows")
  }
}
