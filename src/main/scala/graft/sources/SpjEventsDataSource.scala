package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Storage-partitioned-join (SPJ) variant of [[EventsDataSource]]: the
  * exchange-free fact-fact join for DataSource V2 layouts.
  *
  * [[Bucketing]] proves the V1 path (Hive-style bucketed tables); this
  * source proves the V2 path a lakehouse table format (Iceberg-style)
  * uses: each [[InputPartition]] owns exactly one `user_id` key group
  * and reports it via [[HasPartitionKey]], and the [[Scan]] declares
  * `KeyGroupedPartitioning(identity(user_id), buckets)` through
  * [[SupportsReportPartitioning]]. With
  * `spark.sql.sources.v2.bucketing.enabled=true`, Catalyst recognises
  * two scans with compatible key-grouped partitioning and plans the
  * equi-join on `user_id` with ZERO Exchange nodes — at 100 TB this is
  * the difference between a full dual-side shuffle of the fact tables
  * and a local per-partition sort-merge.
  *
  * Layout contract: bucket `u` holds exactly the rows with
  * `user_id == u` (row ids `u, u+buckets, u+2*buckets, ...`), a pure
  * function of (row id, buckets) — split-brain-safe under task
  * retries, no driver materialization, same properties as the parent
  * generator. Both join sides must use the same `buckets` so the
  * partition-value sets match exactly (no push-down of missing
  * partition values needed).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.SpjEventsDataSource")
  *     .option("rows", 4000).option("buckets", 8).load()
  * }}}
  */
class SpjEventsDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventsDataSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SpjEventsTable()
}

object SpjEventsDataSource {
  private val BaseMs = 1704067200000L // 2024-01-01T00:00:00Z

  /** Row i (bucketed layout) as column values, in schema order.
    * Pure function of (i, buckets); user_id == i % buckets so the
    * generator can enumerate one bucket as a stride sequence.
    */
  def row(i: Long, buckets: Int): (Long, Long, Long, String, Double) = {
    val h = (i * 0xC2B2AE3D27D4EB4FL) >>> 40
    (i, BaseMs + i * 500L, i % buckets,
      EventsDataSource.EventTypes((h % 5L).toInt),
      (h % 10000L).toDouble / 100.0)
  }
}

final class SpjEventsTable extends Table with SupportsRead {
  override def name(): String = "graft_events_spj"
  override def schema(): StructType = EventsDataSource.schema
  override def partitioning(): Array[Transform] =
    Array(Expressions.identity("user_id"))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SpjEventsScanBuilder(
      options.getLong("rows", 1000L),
      options.getInt("buckets", 8))
}

final class SpjEventsScanBuilder(rows: Long, buckets: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  require(rows >= 0, s"rows must be non-negative, got $rows")
  require(buckets > 0, s"buckets must be positive, got $buckets")

  private var required: StructType = EventsDataSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SpjEventsScan(rows, buckets, required)
}

final class SpjEventsScan(rows: Long, buckets: Int, required: StructType)
    extends Scan with Batch with SupportsReportPartitioning {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-events-spj rows=$rows buckets=$buckets " +
      s"readSchema=${required.fieldNames.mkString(",")}"

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("user_id")), buckets)

  override def planInputPartitions(): Array[InputPartition] =
    (0 until buckets)
      .map(u => SpjBucket(u, buckets, rows): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new SpjEventsReaderFactory(buckets, required)
}

/** One key group: all rows with user_id == bucket (ids bucket,
  * bucket+buckets, ...). partitionKey() is what lets Spark line this
  * partition up against the matching key group on the other join side.
  */
final case class SpjBucket(bucket: Int, buckets: Int, rows: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket.toLong)
}

final class SpjEventsReaderFactory(buckets: Int, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val b = partition.asInstanceOf[SpjBucket]
    val fieldIdx = required.fieldNames.map(EventsDataSource.schema.fieldIndex)
    new PartitionReader[InternalRow] {
      private var i = b.bucket.toLong - buckets // first next() lands on b.bucket
      override def next(): Boolean = { i += buckets; i < b.rows }
      override def get(): InternalRow = {
        val (id, ts, user, tpe, value) = SpjEventsDataSource.row(i, buckets)
        val full = Array[Any](id, ts, user, UTF8String.fromString(tpe), value)
        InternalRow.fromSeq(fieldIdx.map(full))
      }
      override def close(): Unit = ()
    }
  }
}
