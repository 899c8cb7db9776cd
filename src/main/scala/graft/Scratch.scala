package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label%-28s rows=$n%-10d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // Variant A: window-lead shingling (split once, posexplode, lead)
    val words = Tables.documents(spark, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    import org.apache.spark.sql.expressions.Window
    val wspec = Window.partitionBy("doc_id").orderBy("pos")
    val sh = words
      .select(col("doc_id"),
        concat_ws(" ", col("w"), lead("w", 1).over(wspec), lead("w", 2).over(wspec)).as("g0"),
        lead("w", 2).over(wspec).as("guard"))
      .filter(col("guard").isNotNull)
      .select(col("doc_id"), xxhash64(col("g0")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("_cnt")).drop("_cnt")
      .withColumn("n_sh", count(lit(1)).over(Window.partitionBy("doc_id")))
    time("A: distinct shingle rows")(sh.count())
    val a = sh.select(col("g"), col("doc_id").as("i"), col("n_sh").as("ni"))
    val b = sh.select(col("g"), col("doc_id").as("j"), col("n_sh").as("nj"))
    val res = a.join(b, Seq("g")).filter(col("i") < col("j"))
      .groupBy("i", "j", "ni", "nj").agg(count(lit(1)).as("n_common"))
      .withColumn("jaccard",
        col("n_common").cast(DoubleType) / (col("ni") + col("nj") - col("n_common")))
      .filter(col("jaccard") >= 0.5)
    time("A: final")(res.count())
    time("A: final again")(res.count())

    // Variant B: like A but cache the shingle table before self-join
    val shc = sh.cache()
    time("B: materialize cache")(shc.count())
    val a2 = shc.select(col("g"), col("doc_id").as("i"), col("n_sh").as("ni"))
    val b2 = shc.select(col("g"), col("doc_id").as("j"), col("n_sh").as("nj"))
    val res2 = a2.join(b2, Seq("g")).filter(col("i") < col("j"))
      .groupBy("i", "j", "ni", "nj").agg(count(lit(1)).as("n_common"))
      .withColumn("jaccard",
        col("n_common").cast(DoubleType) / (col("ni") + col("nj") - col("n_common")))
      .filter(col("jaccard") >= 0.5)
    time("B: final from cache")(res2.count())
    time("B: final again")(res2.count())
    spark.stop()
  }
}
