package graft

import graft.functions.RollingMinHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RollingMinHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Naive per-window recompute as the reference. */
  private def reference(s: String, w: Int): Long = {
    val bytes = s.getBytes("UTF-8")
    val p = 2147483647L
    val b = 131L
    val win = math.max(1, math.min(w, math.max(bytes.length, 1)))
    if (bytes.isEmpty) 0L
    else (0 to bytes.length - win).map { start =>
      bytes.slice(start, start + win).foldLeft(0L)((h, c) => (h * b + (c & 0xff)) % p)
    }.min
  }

  test("matches naive per-window recompute on real documents") {
    val rows = Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), col("text"),
        RollingMinHash.rollingMinHash(col("text"), 16).as("h"))
      .limit(50).collect()
    rows.foreach { r =>
      assert(r.getLong(2) == reference(r.getString(1), 16),
        s"doc ${r.getLong(0)} mismatch")
    }
  }

  test("a superstring's min-hash never exceeds the substring's") {
    import spark.implicits._
    val base = "abcdefghijklmnopqrstuvwxyz0123456789"
    val df = Seq(
      (1L, base),
      (2L, "XXXX" + base), // every window of doc 1 is a window of doc 2
      (3L, "completely different payload here!")).toDF("id", "t")
    val h = df.select(col("id"), RollingMinHash.rollingMinHash(col("t"), 16).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1) == reference(base, 16))
    // containment property: doc 2's window set is a superset of doc
    // 1's, so its min cannot be larger — a position-dependent hash
    // regression breaks this
    assert(h(2) <= h(1), s"superstring min ${h(2)} > substring min ${h(1)}")
    assert(h(3) != h(1))
  }

  test("short texts hash as a single window") {
    import spark.implicits._
    val df = Seq((1L, "ab")).toDF("id", "t")
    val got = df.select(RollingMinHash.rollingMinHash(col("t"), 16))
      .collect().head.getLong(0)
    assert(got == reference("ab", 16))
  }
}
