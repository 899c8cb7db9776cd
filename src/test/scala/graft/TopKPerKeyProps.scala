package graft

import graft.plans.GraftOps
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

/** Property test: the custom bounded-heap operator must agree with a
  * plain Scala reference on arbitrary inputs — keys, scores with
  * heavy ties, and any k.
  */
object TopKPerKeyProps extends Properties("TopKPerKey") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = TestSpark.spark

  private val rowGen = for {
    key <- Gen.choose(0, 4)
    score <- Gen.choose(0, 3) // small range -> many ties
  } yield (key, score)

  private val caseGen = for {
    rows <- Gen.listOfN(60, rowGen)
    k <- Gen.choose(1, 4)
  } yield (rows.zipWithIndex.map { case ((key, score), id) =>
    (key, id.toLong, score.toDouble)
  }, k)

  // no shrinking: the default shrinker walks k to 0, which trips
  // topKPerKey's require(k > 0) and masks the real counterexample
  property("equals sort-based reference") = forAllNoShrink(caseGen) { case (rows, k) =>
    import spark.implicits._
    val df = rows.toDF("key", "id", "score")
    val got = GraftOps.topKPerKey(df, Seq(col("key")), col("score"), col("id"), k)
      .select("key", "id").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val want = rows.groupBy(_._1).flatMap { case (_, g) =>
      g.sortBy(r => (-r._3, r._2)).take(k)
    }.map(r => (r._1, r._2)).toSet
    got == want
  }
}
