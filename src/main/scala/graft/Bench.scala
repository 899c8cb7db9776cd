package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query on
  * SPARK_GRAFT_SF_DIR, one JSON contract line on stdout.
  *
  * Methodology: a global warmup (parquet reader + shuffle + codegen
  * paths) runs first so the first measured query doesn't absorb JVM
  * init; queries run in sorted-name order for stable attribution;
  * each query's time is the best of SPARK_GRAFT_BENCH_REPS (default
  * 3) full executions — per-query codegen compiles on rep 1, so later
  * reps approximate steady-state cluster behavior and the min damps
  * GC/JIT noise.
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
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
        if (ok) (System.nanoTime() - t0) / 1e9 else Double.MaxValue
      }
      name -> (if (times.min == Double.MaxValue) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
