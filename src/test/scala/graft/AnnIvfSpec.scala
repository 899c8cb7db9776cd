package graft

import org.scalatest.funsuite.AnyFunSuite

class AnnIvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("IVF returns k ranked candidates per query with exact cosines") {
    val ivf = SparkEntry.queries("ann_ivf")(spark, d).collect()
    val byQ = ivf.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.foreach { case (_, rows) =>
      assert(rows.length <= 5, s"top-k bound violated: ${rows.length}")
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length))
      // ranked by descending cosine
      val cos = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // wherever IVF and brute force agree on a pair, the cosine is
    // identical (same exact quantized arithmetic)
    val bf = SparkEntry.queries("ann_bruteforce")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    ivf.foreach { r =>
      bf.get((r.getLong(0), r.getLong(2))).foreach { c =>
        assert(c == r.getDouble(3))
      }
    }
  }
}
