package graft.sources

import java.util
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 BATCH WRITE connector — the write half of the
  * connector machinery ([[EventsDataSource]] proves the read half):
  * `df.write.format("graft.sources.JsonCommitSink").option("path", p)
  * .mode("append").save()`.
  *
  * What it actually demonstrates is the TWO-PHASE COMMIT PROTOCOL a
  * distributed sink must implement to be exactly-once under task
  * retries and speculation:
  *
  *  - each task's [[DataWriter]] writes to an INVISIBLE staging file
  *    `_temp/<task-uuid>.json` (underscore prefix = ignored by Spark's
  *    file index, so readers can never observe half-written output);
  *  - task `commit()` returns the staging name as its
  *    [[WriterCommitMessage]] — Spark's output commit coordinator
  *    guarantees at most ONE attempt per partition commits, so a
  *    speculative duplicate's file simply never reaches the driver;
  *  - driver [[BatchWrite.commit]] renames exactly the files named in
  *    the commit messages into the target directory — the only point
  *    where output becomes visible, and it is all-or-nothing per job;
  *  - task/driver `abort()` deletes staging files, so a failed job
  *    leaves NO visible rows (spec-proven).
  *
  * Rows are encoded as JSON lines via Catalyst's JacksonGenerator
  * (schema-complete: nested structs/arrays/maps round-trip), read
  * back with `spark.read.schema(s).json(path)`. A production sink
  * would write parquet; the encoding is orthogonal to the protocol
  * this source exists to prove.
  */
class JsonCommitSink extends TableProvider {
  // write-only source: the schema is whatever the written DataFrame
  // has — externalMetadata lets Spark hand it to getTable
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new JsonCommitTable(schema)
}

final class JsonCommitTable(schema: StructType) extends Table with SupportsWrite {
  override def name(): String = "graft_json_commit_sink"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val path = info.options.get("path")
    require(path != null && path.nonEmpty, "JsonCommitSink requires option 'path'")
    val poison = Option(info.options.get("poisonValue")).map(_.toLong)
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new JsonCommitBatchWrite(path, info.schema(), poison)
      }
    }
  }
}

/** Commit message: the staging file this task wrote (relative name). */
final case class StagedFile(name: String) extends WriterCommitMessage

final class JsonCommitBatchWrite(
    path: String, schema: StructType, poison: Option[Long])
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new JsonDataWriterFactory(path, schema, poison)

  /** Visibility point: rename exactly the task-committed staging files
    * into the target. Any staging file NOT in `messages` (a failed or
    * speculative attempt the coordinator rejected) is left in `_temp`
    * and swept below.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val target = new Path(path)
    val hconf = new org.apache.hadoop.conf.Configuration()
    val fs = target.getFileSystem(hconf)
    fs.mkdirs(target)
    messages.foreach { case StagedFile(name) =>
      val from = new Path(new Path(target, "_temp"), name)
      val to = new Path(target, name)
      if (!fs.rename(from, to)) {
        throw new java.io.IOException(s"JsonCommitSink: commit rename $from -> $to failed")
      }
    }
    fs.delete(new Path(target, "_temp"), true) // orphaned attempts
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val target = new Path(path)
    val fs = target.getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.delete(new Path(target, "_temp"), true)
  }
}

final class JsonDataWriterFactory(
    path: String, schema: StructType, poison: Option[Long])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new JsonDataWriter(path, schema, partitionId, taskId, poison)
}

final class JsonDataWriter(
    path: String, schema: StructType, partitionId: Int, taskId: Long,
    poison: Option[Long])
    extends DataWriter[InternalRow] {
  import org.apache.spark.sql.catalyst.json.{JSONOptions, JacksonGenerator}

  private val name = f"part-$partitionId%05d-$taskId.json"
  private val staged = new Path(new Path(new Path(path), "_temp"), name)
  private val fs = staged.getFileSystem(new org.apache.hadoop.conf.Configuration())
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(fs.create(staged, true), "UTF-8"))
  private val gen = new JacksonGenerator(
    schema, out, new JSONOptions(Map.empty[String, String], "UTC", ""))

  override def write(row: InternalRow): Unit = {
    // test hook: a poisoned row fails the task mid-write, driving the
    // abort path the spec asserts on
    poison.foreach { p =>
      if (!row.isNullAt(0) && row.getLong(0) == p) {
        throw new RuntimeException(s"JsonCommitSink: poison value $p")
      }
    }
    gen.write(row)
    gen.writeLineEnding()
  }

  override def commit(): WriterCommitMessage = {
    gen.flush(); out.close()
    StagedFile(name)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Exception => () }
    fs.delete(staged, false)
  }

  override def close(): Unit = ()
}
