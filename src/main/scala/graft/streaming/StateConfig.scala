package graft.streaming

import org.apache.spark.sql.SparkSession

/** Production state-store configuration for the stateful streaming
  * operators ([[EventStream.patternDetect]], [[EventStream.intervalJoin]],
  * [[EventStream.upsertSink]], `enrich`, the windowed aggregates).
  *
  * The default HDFS-backed provider keeps every version of state on
  * the JVM heap: fine for tests, but at production rates (millions of
  * live keys — pattern prefixes, interval-join buffers) it competes
  * with execution memory and full-snapshots every checkpoint. The
  * RocksDB provider moves state off-heap onto local SSD, and CHANGELOG
  * CHECKPOINTING uploads only each batch's delta instead of a full
  * snapshot — flattening trigger-duration spikes and making recovery
  * time proportional to the changelog since the last snapshot, not to
  * total state size. This is the configuration a 1000-executor
  * deployment of these operators should run with.
  *
  * Usage: apply [[rocksdb]] to the session (or builder) BEFORE the
  * streaming query starts — the provider is fixed per query at start.
  * {{{
  *   StateConfig.rocksdb().foreach { case (k, v) => spark.conf.set(k, v) }
  *   // or scoped: StateConfig.withRocksDB(spark) { ...start + run query... }
  * }}}
  */
object StateConfig {
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val Prefix = "spark.sql.streaming.stateStore.rocksdb."

  /** Conf map for the RocksDB provider.
    *
    * @param changelogCheckpointing upload per-batch deltas instead of
    *   full snapshots (the recovery-time + trigger-latency win; needs
    *   no format migration — snapshots still land periodically in the
    *   background)
    * @param boundedMemoryMb cap TOTAL RocksDB memory (block cache +
    *   memtables, all state store instances on the executor) so state
    *   can't evict executor execution memory; None = RocksDB defaults
    * @param compression SST compression codec (`lz4` default — cheap
    *   CPU, ~2-3x disk; `zstd` for colder, bigger state)
    */
  def rocksdb(
      changelogCheckpointing: Boolean = true,
      boundedMemoryMb: Option[Long] = None,
      compression: String = "lz4"): Map[String, String] = {
    val base = Map(
      "spark.sql.streaming.stateStore.providerClass" -> RocksDbProvider,
      Prefix + "changelogCheckpointing.enabled" -> changelogCheckpointing.toString,
      Prefix + "compression" -> compression)
    boundedMemoryMb.fold(base) { mb =>
      base ++ Map(
        Prefix + "boundedMemoryUsage" -> "true",
        Prefix + "maxMemoryUsageMB" -> mb.toString)
    }
  }

  /** Run `body` with the RocksDB confs set on `spark`, restoring the
    * previous values after. Queries STARTED inside `body` use RocksDB
    * for their whole lifetime; already-running queries are unaffected.
    */
  def withRocksDB[A](
      spark: SparkSession,
      confs: Map[String, String] = rocksdb())(body: => A): A = {
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toSeq
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
