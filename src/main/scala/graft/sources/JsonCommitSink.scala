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
  *    `_temp/<job-uuid>/part-*.json` (underscore prefix = ignored by
  *    Spark's file index, so readers can never observe half-written
  *    output; the per-job subdirectory means two jobs appending to the
  *    same target concurrently never touch each other's staging);
  *  - task `commit()` returns the staging name as its
  *    [[WriterCommitMessage]] — Spark's output commit coordinator
  *    guarantees at most ONE attempt per partition commits, so a
  *    speculative duplicate's file simply never reaches the driver;
  *  - driver [[BatchWrite.commit]] renames exactly the files named in
  *    the commit messages into the target directory — the only point
  *    where output becomes visible. Final names embed the job uuid, so
  *    a rename can never collide with an earlier append's output; if a
  *    rename still fails (transient FS error) the files already
  *    renamed by THIS job are deleted before the commit throws, so the
  *    job stays all-or-nothing;
  *  - task/driver `abort()` deletes this job's staging directory, so a
  *    failed job leaves NO visible rows (spec-proven).
  *
  * All filesystem access resolves through the Spark session's Hadoop
  * configuration (driver: `sessionState.newHadoopConf()`; executors: a
  * [[org.apache.spark.util.SerializableConfiguration]] captured in the
  * writer factory), so `spark.hadoop.*` settings — object-store
  * credentials, custom FS impls — apply exactly as they do to the
  * built-in sinks.
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

  // Driver-side construction: one uuid per job isolates this job's
  // staging subdir and final file names from every other job touching
  // the same target path (concurrent appends, earlier appends).
  private val jobId = java.util.UUID.randomUUID().toString
  private val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
    org.apache.spark.sql.graft.Bridge.newHadoopConf(
      org.apache.spark.sql.SparkSession.active))

  private def stagingDir(target: Path) = new Path(new Path(target, "_temp"), jobId)

  /** Remove this job's staging subdir, then the shared `_temp` parent
    * if this was the last job in it (non-recursive delete refuses a
    * non-empty dir, so a concurrent job's staging is never touched).
    */
  private def sweepStaging(fs: org.apache.hadoop.fs.FileSystem, target: Path): Unit = {
    fs.delete(stagingDir(target), true)
    try fs.delete(new Path(target, "_temp"), false) catch { case _: Exception => () }
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new JsonDataWriterFactory(path, schema, jobId, hadoopConf, poison)

  /** Visibility point: rename exactly the task-committed staging files
    * into the target. Any staging file NOT in `messages` (a failed or
    * speculative attempt the coordinator rejected) is left in this
    * job's `_temp/<jobId>` and swept below. Names embed the job uuid
    * (collision-free), so a rename failure is a transient FS fault —
    * roll back this job's already-visible files before rethrowing to
    * keep the job all-or-nothing.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val target = new Path(path)
    val fs = target.getFileSystem(hadoopConf.value)
    fs.mkdirs(target)
    val renamed = scala.collection.mutable.ArrayBuffer.empty[Path]
    messages.foreach { case StagedFile(name) =>
      val from = new Path(stagingDir(target), name)
      val to = new Path(target, name)
      if (!fs.rename(from, to)) {
        renamed.foreach(p => try fs.delete(p, false) catch { case _: Exception => () })
        throw new java.io.IOException(s"JsonCommitSink: commit rename $from -> $to failed" +
          s" (rolled back ${renamed.size} already-renamed files)")
      }
      renamed += to
    }
    sweepStaging(fs, target) // orphaned attempts of THIS job only
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val target = new Path(path)
    sweepStaging(target.getFileSystem(hadoopConf.value), target)
  }
}

final class JsonDataWriterFactory(
    path: String, schema: StructType, jobId: String,
    hadoopConf: org.apache.spark.util.SerializableConfiguration, poison: Option[Long])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new JsonDataWriter(path, schema, jobId, hadoopConf, partitionId, taskId, poison)
}

final class JsonDataWriter(
    path: String, schema: StructType, jobId: String,
    hadoopConf: org.apache.spark.util.SerializableConfiguration,
    partitionId: Int, taskId: Long, poison: Option[Long])
    extends DataWriter[InternalRow] {
  import org.apache.spark.sql.catalyst.json.{JSONOptions, JacksonGenerator}

  private val name = f"part-$partitionId%05d-$taskId-$jobId.json"
  private val staged = new Path(new Path(new Path(new Path(path), "_temp"), jobId), name)
  private val fs = staged.getFileSystem(hadoopConf.value)
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
