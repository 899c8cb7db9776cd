package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface of the engine: every format a pipeline moving
  * 100 TB in and out needs, with the options that matter at scale
  * pinned (explicit schemas — no sampling-based inference on huge
  * inputs; compression; partitioned layout).
  *
  * The reference's only IO is Kafka+JSON strings
  * (EventProcessorJob.kt:57-76); this generalizes to the batch
  * formats Spark ships: parquet, json-lines, csv, orc.
  */
object Formats {

  /** Schema-first readers: never infer on large inputs. */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readJson(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  def readCsv(spark: SparkSession, schema: StructType, path: String,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Writers with scale defaults: snappy/zstd compression and an
    * optional partition layout (the on-disk analog of a pre-shuffled
    * key — downstream reads prune partitions instead of scanning).
    */
  def writer(df: DataFrame, partitionBy: Seq[String] = Nil): DataFrameWriter[Row] = {
    val w = df.write.mode("overwrite")
    if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
  }

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit =
    writer(df, partitionBy).option("compression", "snappy").parquet(path)

  def writeJson(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit =
    writer(df, partitionBy).option("compression", "gzip").json(path)

  def writeCsv(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit =
    writer(df, partitionBy).option("header", "true")
      .option("compression", "gzip").csv(path)

  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit =
    writer(df, partitionBy).option("compression", "zstd").orc(path)
}
