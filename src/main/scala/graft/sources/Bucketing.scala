package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: the on-disk co-location strategy for joins
  * that repeat on the same key (fact-to-fact joins at 100 TB).
  *
  * Writing both sides bucketed by the join key with the same bucket
  * count lets Spark plan the join with NO exchange on either side —
  * the shuffle is paid once at write time and amortized over every
  * subsequent join ([[graft.BucketingSpec]] asserts the
  * exchange-free plan).
  */
object Bucketing {

  /** Writes `df` as a bucketed managed table (overwrite). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "bucketing requires at least one key column")
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.format("parquet").saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
