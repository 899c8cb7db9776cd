package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe (not part of the driver contract): the 1e9-vector
  * tier of `dedup_embedding_blocked` BY PLAN, not corpus (r9 verdict
  * item 3, folding in r8 task 8).
  *
  * At 1e9 raw vectors the blocked composition's stage-1 state is
  * k = ceil(2n/256) ≈ 7.8M Lloyd cells; the operator REFUSES that
  * tier loudly (`Similarity.requireBlockCells`, bound 2^16). This
  * probe measures exactly what the refusal protects against: it
  * builds the stage-2 cell-assignment plan (the `pqCells`
  * centroid-matrix + cell-id reference objects, plus the constant
  * 17x8 band plan) over SYNTHETIC centroid state at growing k and
  * times/sizes each piece, so the guard's bound is a measured line,
  * not a vibe:
  *
  *  - plan TEXT: must stay O(1) at every k — reference objects print
  *    as a JVM reference. This is the r10 fix (typedlit cell ids
  *    would have printed k longs);
  *  - payload: the plan BINARY ships k·(Dim+1)·8 bytes of trained
  *    state to every executor (measured by streaming Java
  *    serialization byte count, no buffer) — the flat path's real
  *    wall at extreme k, independent of plan text;
  *  - build+analyze time: must stay ms at every k (a reference
  *    hand-off, not a literal fold);
  *  - execute: a 4-row frame through the full codegen path, which in
  *    local mode still pays task-binary serialization of the payload
  *    — the per-stage ship cost a 1000-executor cluster pays once
  *    per executor.
  *
  * Usage: SPARK_DRIVER_MEM=24g sbt "runMain graft.BlockPlanProbe
  * [k ...]" (default ks: 4096 65536 1048576 4194304 — rehearsal tier,
  * the guard bound, and 16x/64x past it).
  */
object BlockPlanProbe {

  private val Dim = 64

  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.toSeq.map(_.toInt)
      else Seq(4096, 65536, 1 << 20, 1 << 22)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.GraftFunctions

    for (k <- ks) {
      val t0 = System.nanoTime()
      // deterministic synthetic state, the corpus distribution's
      // shape: k centroids of Dim longs on the quantization grid
      val cents = Array.tabulate(k)(i => Array.tabulate(Dim)(j =>
        ((i * 1315423911L + j * 2654435761L) % 1000001L) - 500000L))
      val ids = Array.tabulate(k)(i => i.toLong)
      val books = Array(cents)
      val tGen = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val base = spark.range(4).select(
        col("id").as("vec_id"),
        transform(sequence(lit(1), lit(Dim)),
          x => (x * (col("id") + 1L)).cast("long")).as("qa"))
      val planned = base
        .withColumn("cells", GraftFunctions.pqCells(col("qa"), books, ids, 2))
        .withColumn("bands",
          GraftFunctions.hyperplaneBands(col("qa"), 17, 8))
      val planText = planned.queryExecution.optimizedPlan.toString
      val tPlan = (System.nanoTime() - t1) / 1e9

      // plan-binary payload: stream-count the Java serialization of
      // the two reference objects (what rides the task binary)
      val t2 = System.nanoTime()
      val counter = new java.io.OutputStream {
        var n = 0L
        override def write(b: Int): Unit = n += 1
        override def write(b: Array[Byte], off: Int, len: Int): Unit = n += len
      }
      val oos = new java.io.ObjectOutputStream(
        new java.io.BufferedOutputStream(counter, 1 << 16))
      oos.writeObject(books); oos.writeObject(ids); oos.close()
      val tSer = (System.nanoTime() - t2) / 1e9

      // execution can legitimately FAIL at extreme k: the task binary
      // must serialize the payload, and past ~2 GB the JVM's array
      // limit makes that impossible (java.lang.OutOfMemoryError:
      // Required array length ... too large) — the measured hard wall
      // the requireBlockCells guard exists to keep users away from.
      // Capture it as a data point, not a probe crash.
      val t3 = System.nanoTime()
      val (rows, execErr) =
        try (planned.collect().length, "null")
        catch {
          case e: Throwable =>
            (-1, "\"" + (e.getClass.getSimpleName + ": " +
              String.valueOf(e.getMessage).replaceAll("[\"\\\\]", "'")
                .take(120)) + "\"")
        }
      val tExec = (System.nanoTime() - t3) / 1e9

      println(f"""{"probe":"block_plan","k":$k,"plan_text_bytes":${planText.length},"payload_bytes":${counter.n},"gen_sec":$tGen%.2f,"plan_sec":$tPlan%.3f,"ser_sec":$tSer%.2f,"exec4_sec":$tExec%.2f,"rows":$rows,"exec_error":$execErr}""")
    }
    spark.stop()
  }
}
