package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 batch connector: a deterministic bounded
  * event generator (`spark.read.format("graft.sources.EventsDataSource")
  * .option("rows", n).option("partitions", p).load()`).
  *
  * The Kafka connector jar cannot ship into this container, so this
  * source is where graft proves the full V2 connector machinery a
  * cluster source needs, end-to-end and spec-tested:
  * TableProvider -> Table -> ScanBuilder -> Batch with PLANNED INPUT
  * PARTITIONS (each reader generates its own id range — no driver
  * materialization, arbitrary parallelism), plus COLUMN PRUNING via
  * SupportsPushDownRequiredColumns (a `select(user_id)` reads nothing
  * else — the V2 analog of parquet's ReadSchema pruning, visible in
  * the scan's readSchema).
  *
  * Rows are a pure function of the row id (split-brain-safe under
  * retries, the same property the parquet `producer_datagen` replica
  * has): user/type from multiplicative hashes, 500 ms event spacing.
  */
class EventsDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventsDataSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EventsTable()
}

object EventsDataSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val EventTypes: Array[String] =
    Array("click", "view", "purchase", "signup", "error")

  private val BaseMs = 1704067200000L // 2024-01-01T00:00:00Z

  /** Row i as column values, in schema order. Pure function of i. */
  def row(i: Long): (Long, Long, Long, String, Double) = {
    // Knuth multiplicative hashes — deterministic, well-spread, cheap
    val h1 = (i * 0x9E3779B97F4A7C15L) >>> 40
    val h2 = (i * 0xC2B2AE3D27D4EB4FL) >>> 40
    (i, BaseMs + i * 500L, h1 % 50L, EventTypes((h2 % 5L).toInt),
      (h2 % 10000L).toDouble / 100.0)
  }
}

final class EventsTable extends Table with SupportsRead {
  override def name(): String = "graft_events_generator"
  override def schema(): StructType = EventsDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EventsScanBuilder(
      options.getLong("rows", 1000L),
      options.getInt("partitions", 4))
}

final class EventsScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  require(rows >= 0, s"rows must be non-negative, got $rows")
  require(partitions > 0, s"partitions must be positive, got $partitions")

  private var required: StructType = EventsDataSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // Spark hands the pruned schema; empty projection (count(*)) is legal
    required = requiredSchema
  }

  override def build(): Scan = new EventsScan(rows, partitions, required)
}

final class EventsScan(rows: Long, partitions: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-events-generator rows=$rows partitions=$partitions " +
      s"readSchema=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0L until rows by per)
      .map(start => EventsRange(start, math.min(start + per, rows)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EventsReaderFactory(required)
}

final case class EventsRange(start: Long, end: Long) extends InputPartition

final class EventsReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[EventsRange]
    // precompute each required field's index in the full schema once
    val fieldIdx = required.fieldNames.map(EventsDataSource.schema.fieldIndex)
    new PartitionReader[InternalRow] {
      private var i = r.start - 1
      override def next(): Boolean = { i += 1; i < r.end }
      override def get(): InternalRow = {
        val (id, ts, user, tpe, value) = EventsDataSource.row(i)
        val full = Array[Any](id, ts, user, UTF8String.fromString(tpe), value)
        InternalRow.fromSeq(fieldIdx.map(full))
      }
      override def close(): Unit = ()
    }
  }
}
