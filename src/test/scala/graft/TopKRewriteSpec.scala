package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** InferTopKPerKey rewrite: the row_number-filter idiom must plan as
  * the bounded-heap TopKPerKey operator, with results identical to an
  * uninstalled (vanilla window) session across directions, order
  * types, and null placements.
  */
class TopKRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  // fresh session state, no graft strategies/optimizations installed
  private lazy val vanilla: SparkSession = {
    val s = TestSpark.spark.newSession()
    assert(!s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental.extraOptimizations.contains(plans.InferTopKPerKey),
      "newSession unexpectedly inherited the optimizer rule")
    s
  }
  private val d = TestSpark.sfDir

  private def docs(s: SparkSession): DataFrame =
    s.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "lang", "n_chars")

  private def optimized(df: DataFrame) =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.optimizedPlan

  private def fired(df: DataFrame): Boolean =
    optimized(df).collectFirst { case t: plans.TopKPerKey => t }.nonEmpty

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("desc top-3 per lang rewrites to TopKPerKey and drops the filter") {
    def q(s: SparkSession): DataFrame = {
      val w = Window.partitionBy("lang")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      docs(s).withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
    }
    val df = q(spark)
    assert(fired(df), s"rewrite did not fire:\n${optimized(df)}")
    val opt = optimized(df)
    assert(opt.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.isEmpty, s"vacuous rank filter survived:\n$opt")
    val phys = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.sparkPlan
    val execs = phys.collect { case e: plans.TopKPerKeyExec => e }
    assert(execs.map(_.partial).toSet == Set(true, false),
      s"expected partial+final TopKPerKeyExec:\n$phys")
    assert(rows(df) == rows(q(vanilla)))
    // rank values, not just membership: rn must still be 1..3
    val perLang = df.collect().groupBy(_.getAs[String]("lang"))
    perLang.values.foreach { g =>
      assert(g.map(_.getAs[Long]("rn")).sorted.toSeq == (1L to g.length).toSeq)
    }
  }

  test("asc long-hash order (the stratified-sample shape) stays exact") {
    def q(s: SparkSession): DataFrame = {
      val w = Window.partitionBy("lang")
        .orderBy(operators.TextAnalysis.hash60(concat(lit("s:"), col("doc_id"))), col("doc_id"))
      docs(s).withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") < 6)
    }
    assert(fired(q(spark)))
    assert(rows(q(spark)) == rows(q(vanilla)))
  }

  test("nullable asc order ranks nulls first, matching the window") {
    def q(s: SparkSession): DataFrame = {
      val base = docs(s).withColumn("score",
        when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("n_chars")))
      val w = Window.partitionBy("lang").orderBy(col("score").asc, col("doc_id"))
      base.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 4)
    }
    assert(fired(q(spark)))
    assert(rows(q(spark)) == rows(q(vanilla)))
  }

  test("nullable desc order ranks nulls last, matching the window") {
    def q(s: SparkSession): DataFrame = {
      val base = docs(s).withColumn("score",
        when(col("doc_id") % 3 === 0, lit(null))
          .otherwise(col("n_chars").cast("double")))
      val w = Window.partitionBy("lang").orderBy(col("score").desc, col("doc_id"))
      base.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") === 1)
    }
    assert(fired(q(spark)))
    assert(rows(q(spark)) == rows(q(vanilla)))
  }

  test("does not fire for rank(), non-unit equality, or global windows") {
    val w = Window.partitionBy("lang").orderBy(col("n_chars").desc, col("doc_id"))
    val rankQ = docs(spark).withColumn("rn", rank().over(w)).filter(col("rn") <= 3)
    assert(!fired(rankQ), "rank() keeps ties past k; must not rewrite")
    val eqQ = docs(spark).withColumn("rn", row_number().over(w)).filter(col("rn") === 3)
    assert(!fired(eqQ), "rn == 3 selects a middle rank; must not rewrite")
    val globalW = Window.orderBy(col("n_chars").desc, col("doc_id"))
    val globalQ = docs(spark).withColumn("rn", row_number().over(globalW))
      .filter(col("rn") <= 3)
    assert(!fired(globalQ), "global top-k has no partition keys; must not rewrite")
  }

  test("rewrite also fires on SQL-authored queries") {
    docs(spark).createOrReplaceTempView("tkr_docs")
    val df = spark.sql(
      """SELECT * FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM tkr_docs) WHERE rn <= 2""".stripMargin)
    assert(fired(df), s"SQL idiom did not rewrite:\n${optimized(df)}")
    val perLang = df.collect().groupBy(_.getAs[String]("lang"))
    assert(perLang.values.forall(_.length <= 2))
    assert(perLang.values.exists(_.length == 2))
  }
}
