package graft

import graft.plans.GraftOps
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

/** Property test: the distributed two-phase NTILE must agree with the
  * window-function definition on arbitrary inputs — duplicate order
  * values (tie-broken by id), any n-vs-buckets relation (n < b, n = b,
  * n >> b, uneven splits), and adversarial input partition layouts
  * (the data arrives unsorted and re-partitioned). The oracle gate
  * proves this against DuckDB's NTILE at corpus sizes; these walk the
  * space a fixed corpus never does.
  */
object NtileByRangeProps extends Properties("NtileByRange") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark

  private val caseGen = for {
    n <- Gen.choose(1, 120)
    buckets <- Gen.choose(1, 13)
    // values from a small range -> heavy ties, forcing the id
    // tie-break to carry the total order
    values <- Gen.listOfN(n, Gen.choose(0, 6))
    parts <- Gen.choose(1, 5)
  } yield (values.zipWithIndex.map { case (v, id) => (v.toLong, id.toLong) },
    buckets, parts)

  // no shrinking: the shrinker walks buckets/parts to 0 and trips the
  // helper's require, masking the real counterexample
  property("matches the NTILE definition under ties and any layout") =
    forAllNoShrink(caseGen) { case (rows, buckets, parts) =>
      import spark.implicits._
      // adversarial layout: the helper must establish the global order
      // itself regardless of how the input arrives
      val df = rows.toDF("v", "id").repartition(parts)
      val got = GraftOps.ntileByRange(
        df, Seq(col("v"), col("id")), buckets)
        .select("v", "id", "bucket").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // reference: rank rows by (v, id); NTILE hands the first
      // n % buckets buckets ceil(n/b) rows and the rest floor(n/b)
      val n = rows.size
      val q = n / buckets
      val r = n % buckets
      val want = rows.sortBy(identity).zipWithIndex.map { case (row, idx) =>
        val rank = idx + 1
        val bucket =
          if (rank <= r * (q + 1)) (rank - 1) / (q + 1) + 1
          else r + (rank - r * (q + 1) - 1) / (q max 1) + 1
        row -> bucket.toLong
      }.toMap
      val ok = got == want
      if (!ok) println(s"n=$n buckets=$buckets parts=$parts\n got=$got\nwant=$want")
      ok
    }
}
