package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed access to the driver-generated parquet tables.
  *
  * All operators read through here so that column pruning / predicate
  * pushdown always start from a plain parquet scan (Catalyst pushes
  * the operator's own `select`/`filter` into the scan).
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Every operator assumes `events.ts` is Long nanoseconds since the
    * epoch, but the generator is free to encode the column as parquet
    * TIMESTAMP(NANOS) (read as Long via nanosAsLong), TIMESTAMP(MICROS)
    * isAdjustedToUTC=false (read as TIMESTAMP_NTZ), or
    * isAdjustedToUTC=true (read as TIMESTAMP). Normalize all three to
    * Long nanos here — one projection on top of the scan, so pruning
    * of the other columns still reaches parquet. NTZ wall-clock is
    * interpreted in the session timezone; every graft entry point pins
    * `spark.sql.session.timeZone=UTC`, matching the DuckDB oracle's
    * naive-UTC `CAST(ts AS TIMESTAMP)`.
    */
  private def tsToNanos(dt: DataType): Column = dt match {
    case LongType          => col("ts")
    case TimestampNTZType  => unix_micros(col("ts").cast(TimestampType)) * lit(1000L)
    case TimestampType     => unix_micros(col("ts")) * lit(1000L)
    case other => throw new IllegalStateException(
      s"events.ts: unsupported physical type $other")
  }

  def region(s: SparkSession, d: String): DataFrame = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame =
    dateishToNtz(read(s, d, "orders"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    dateishToNtz(read(s, d, "lineitem"), "l_shipdate")
  /** Same drift guard for the date-carrying dimension columns: the
    * generator currently writes them as TIMESTAMP(MICROS) NTZ, but
    * DATE (date32) and adjusted-to-UTC TIMESTAMP are equally legal
    * encodings of a day value. Normalize to TIMESTAMP_NTZ — what the
    * engine and every declared oracle output expect — so a regen
    * cannot break the TPC-H family the way round 3's ts regen broke
    * the events family (drill: date32 orders/lineitem flipped only
    * the two o_orderdate passthrough outputs; this repairs those and
    * keeps comparisons/year()/epoch-math identical).
    */
  private def dateishToNtz(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case TimestampNTZType => df
      case DateType | TimestampType =>
        df.withColumn(c, col(c).cast(TimestampNTZType))
      case other => throw new IllegalStateException(
        s"$c: unsupported physical type $other")
    }

  def events(s: SparkSession, d: String): DataFrame = {
    val raw = read(s, d, "events")
    raw.withColumn("ts", tsToNanos(raw.schema("ts").dataType))
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
