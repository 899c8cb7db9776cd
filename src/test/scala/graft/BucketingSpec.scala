package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val d = TestSpark.sfDir
    Seq("graft_li_b", "graft_o_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // a previously-failed run can leave the managed location behind
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Bucketing.writeBucketed(
      Tables.lineitem(spark, d).select("l_orderkey", "l_quantity"),
      "graft_li_b", 4, Seq("l_orderkey"), Seq("l_orderkey"))
    Bucketing.writeBucketed(
      Tables.orders(spark, d).select("o_orderkey", "o_totalprice"),
      "graft_o_b", 4, Seq("o_orderkey"), Seq("o_orderkey"))
    // keep the join out of broadcast range so bucketing is what
    // saves the shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = try {
      val j = Bucketing.readTable(spark, "graft_li_b")
        .join(Bucketing.readTable(spark, "graft_o_b"),
          col("l_orderkey") === col("o_orderkey"))
      j.collect()
      j
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("Bucketed: true"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() ==
      Tables.lineitem(spark, d).join(Tables.orders(spark, d),
        col("l_orderkey") === col("o_orderkey")).count())
  }
}
