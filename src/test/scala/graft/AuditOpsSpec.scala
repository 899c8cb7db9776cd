package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the round-4 audit/packing/bucketing operators
  * (their sf0.01 DuckDB hash compare is the cross-engine gate; these
  * pin intended behavior on properties the hash alone doesn't name).
  */
class AuditOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("watermark audit: drop counts are monotone non-increasing in the watermark") {
    val rows = SparkEntry.queries("q_watermark_audit")(spark, d)
      .orderBy("watermark_ms").collect()
    assert(rows.map(_.getAs[Long]("watermark_ms")).toSeq == Seq(0L, 60000L, 600000L))
    val late = rows.map(_.getAs[Long]("n_late"))
    assert(late.zip(late.tail).forall { case (a, b) => a >= b },
      s"a larger watermark can only drop fewer events: ${late.toSeq}")
    val totals = rows.map(_.getAs[Long]("n_total")).distinct
    assert(totals.length == 1, "every watermark row audits the same event count")
  }

  test("ppl buckets: per language, bucket sizes differ by at most one third-boundary") {
    val out = SparkEntry.queries("text_ppl_bucket")(spark, d)
    val sizes = out.groupBy("lang", "bucket").count()
      .groupBy("lang")
      .agg(max(col("count")).as("mx"), min(col("count")).as("mn"),
        countDistinct(col("bucket")).as("nb"))
      .collect()
    sizes.foreach { r =>
      assert(r.getAs[Long]("nb") == 3L, s"${r.getString(0)}: all three tiers present")
      assert(r.getAs[Long]("mx") - r.getAs[Long]("mn") <= 2L,
        s"${r.getString(0)}: thirds must be balanced")
    }
  }

  test("normalized dedup: case/punctuation/spacing variants collapse, distinct text does not") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello,   World!"),
      (2L, "hello world"),
      (3L, "HELLO  world."),
      (4L, "goodbye world")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("norm_probe")
    // reuse the operator's canonicalization via its registered query on
    // a synthetic dir is heavyweight; probe the exact expression shape
    val canon = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    val hashes = docs.select(col("doc_id"), md5(canon).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hashes(1L) == hashes(2L) && hashes(2L) == hashes(3L),
      "variants must share a canonical hash")
    assert(hashes(4L) != hashes(1L), "distinct content must not collapse")
    val _ = TextAnalysis.normExact // the expression above mirrors this operator
  }

  test("vocab growth: docs_seen and vocab_size are strictly positive and monotone") {
    val rows = SparkEntry.queries("corpus_vocab_growth")(spark, d)
      .orderBy("bucket").collect()
    assert(rows.length == 10)
    val docs = rows.map(_.getAs[Long]("docs_seen"))
    val vocab = rows.map(_.getAs[Long]("vocab_size"))
    assert(docs.zip(docs.tail).forall { case (a, b) => a < b })
    assert(vocab.zip(vocab.tail).forall { case (a, b) => a <= b },
      "vocabulary never shrinks as the corpus grows")
    assert(vocab.head > 0)
    // Heaps-law sanity: later deciles add fewer new words than the first
    assert(vocab.last - vocab(8) < vocab.head,
      "the final decile must add fewer new words than the first")
  }

  test("minhash error audit: errors are bounded and estimates calibrate") {
    val rows = SparkEntry.queries("dedup_minhash_error")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val err = r.getAs[Double]("abs_err")
      assert(err >= 0.0 && err <= 1.0)
      assert(r.getAs[Double]("est_jaccard") >= 0.0 &&
        r.getAs[Double]("est_jaccard") <= 1.0)
    }
    // 16 permutations -> expected |err| ~ 1/4; mean must sit well below
    // a coin flip (the sketch carries signal, not noise)
    val mean = rows.map(_.getAs[Double]("abs_err")).sum / rows.length
    assert(mean < 0.35, s"mean |est - exact| = $mean says the sketch is noise")
  }

  test("agg merge: weekly totals re-aggregate the daily partials losslessly") {
    import graft.Det._
    val weekly = SparkEntry.queries("q_agg_merge")(spark, d)
    val direct = Tables.events(spark, d)
      .groupBy(expr("ts div 86400000000000 div 7").as("week"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sumd(col("value")).as("sum_value"))
    assert(weekly.collect().map(_.toSeq).toSet ==
      direct.collect().map(_.toSeq).toSet)
  }
}
