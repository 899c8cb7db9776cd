package graft

import graft.sources.Formats
import java.nio.file.Files
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class FormatsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private val created = scala.collection.mutable.ArrayBuffer.empty[String]

  private def tmp(): String = {
    val p = Files.createTempDirectory("graft_fmt").toString
    created += p
    p
  }

  override def afterAll(): Unit = {
    import scala.reflect.io.Directory
    created.foreach(p => new Directory(new java.io.File(p)).deleteRecursively())
  }

  test("parquet/json/csv/orc round-trip the events table losslessly") {
    val ev = Tables.events(spark, TestSpark.sfDir)
      .selectExpr("event_id", "user_id", "event_type", "value", "props")
    val n = ev.count()
    val schema = ev.schema

    val pq = tmp(); Formats.writeParquet(ev, pq)
    assert(Formats.readParquet(spark, pq).count() == n)

    val js = tmp(); Formats.writeJson(ev, js)
    assert(Formats.readJson(spark, schema, js).count() == n)

    val cs = tmp(); Formats.writeCsv(ev, cs)
    assert(Formats.readCsv(spark, schema, cs).count() == n)

    val orc = tmp(); Formats.writeOrc(ev, orc)
    assert(Formats.readOrc(spark, orc).count() == n)

    // value fidelity through the lossiest format (csv)
    val back = Formats.readCsv(spark, schema, cs)
      .orderBy("event_id").collect().map(_.toSeq)
    val orig = ev.orderBy("event_id").collect().map(_.toSeq)
    assert(back.toSeq == orig.toSeq)
  }

  test("partitioned parquet layout prunes partitions on read") {
    val ev = Tables.events(spark, TestSpark.sfDir)
      .selectExpr("event_id", "user_id", "event_type")
    val out = tmp()
    Formats.writeParquet(ev, out, partitionBy = Seq("event_type"))
    val clicks = Formats.readParquet(spark, out)
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
    clicks.collect()
    val scan = clicks.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"),
      s"expected partition pruning in:\n$scan")
  }
}
