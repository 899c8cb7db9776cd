package graft

import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Driver-run benchmark: every registered query on
  * SPARK_GRAFT_SF_DIR, one JSON contract line on stdout.
  *
  * Methodology: a global warmup (parquet reader + shuffle + codegen
  * paths) runs first so the first measured query doesn't absorb JVM
  * init; queries run in sorted-name order for stable attribution;
  * each query's time is the best of SPARK_GRAFT_BENCH_REPS (default
  * 3) full executions — per-query codegen compiles on rep 1, so later
  * reps approximate steady-state cluster behavior and the min damps
  * GC/JIT noise. Queries are materialized through the `noop` sink
  * (not `count()`, under which Catalyst would eliminate top-level
  * sorts and undertime sort-heavy queries). A query failing every rep
  * reports -1 in the per-query map and is EXCLUDED from `total`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Warmup: touch the parquet reader, a shuffle, a broadcast and the
    // codegen compiler once before any measurement.
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().collect()
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).flatMap { rep =>
        val t0 = System.nanoTime()
        try {
          // noop sink materializes every row (and keeps the plan's
          // sorts) without writing anywhere.
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case NonFatal(e) =>
            System.err.println(s"[bench] $name rep $rep failed: ${e.getMessage}")
            None
        }
      }
      name -> times.minOption.getOrElse(-1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // failures surfaced explicitly: a broken query must not read as a
    // smaller (better) total
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
