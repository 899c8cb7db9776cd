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

  test("recall-vs-nprobe curve on the sf0.01 corpus (the quality-cost knob)") {
    // Measures, rather than asserts, the IVF tuning tradeoff: recall@5
    // against exact brute force as nprobe sweeps 1 -> 8 of nlist=16
    // cells. Printed as a table so the knob's shape is in the test
    // output; assertions pin only what must hold (monotone
    // non-decreasing recall, a usable ceiling at nprobe=8).
    val d01 = "/root/testdata/sf0.01"
    val truth = SparkEntry.queries("ann_bruteforce")(spark, d01).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recalls = Seq(1, 2, 4, 8).map { np =>
      val got = graft.operators.Similarity.ivfTopK(spark, d01, nList = 16, nProbe = np)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val r = (got & truth).size.toDouble / truth.size
      info(f"nprobe=$np%d  probed=${np * 100.0 / 16}%5.1f%% of cells  recall@5=$r%.3f")
      np -> r
    }
    val rs = recalls.map(_._2)
    assert(rs.zip(rs.tail).forall { case (a, b) => b >= a },
      s"recall must not decrease with nprobe: $recalls")
    assert(rs.last >= 0.9, s"nprobe=8 recall too low: ${rs.last}")
  }
}
