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

  // The generalized ranking modes the InferTopKPerKey rewrite relies
  // on: either direction, Long or Double orders, and NULL orders
  // ranked Best/Worst — each must agree with the corresponding
  // window-sort reference on arbitrary ties and null placements.
  private val nullableRowGen = for {
    key <- Gen.choose(0, 3)
    score <- Gen.option(Gen.choose(0, 3))
  } yield (key, score)

  private val flaggedCaseGen = for {
    rows <- Gen.listOfN(50, nullableRowGen)
    k <- Gen.choose(1, 4)
    asc <- Gen.oneOf(true, false)
    asLong <- Gen.oneOf(true, false)
    nullsBest <- Gen.oneOf(true, false)
  } yield (rows.zipWithIndex.map { case ((key, score), id) =>
    (key, id.toLong, score.map(_.toLong))
  }, k, asc, asLong, nullsBest)

  property("flagged modes equal the window-sort reference") =
    forAllNoShrink(flaggedCaseGen) { case (rows, k, asc, asLong, nullsBest) =>
      import graft.plans.{TopKNullRank, TopKPerKey}
      import org.apache.spark.sql.graft.Bridge
      import spark.implicits._
      val df = rows.map { case (key, id, s) => (key, id, s.map(_.toString).orNull) }
        .toDF("key", "id", "s")
        .select(col("key"), col("id"),
          (if (asLong) col("s").cast("long") else col("s").cast("double")).as("score"))
      val node = TopKPerKey(
        Seq(Bridge.eagerExpression(col("key"))),
        Bridge.eagerExpression(col("score")),
        Bridge.eagerExpression(col("id")),
        k, Bridge.logicalPlan(df),
        ordAsc = asc, ordLong = asLong,
        nullRank = if (nullsBest) TopKNullRank.Best else TopKNullRank.Worst)
      val got = Bridge.ofRows(spark, node)
        .select("key", "id").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      // reference: total order (nulls Best/Worst, then score asc/desc, then id)
      val want = rows.groupBy(_._1).flatMap { case (_, g) =>
        g.sortBy { case (_, id, s) =>
          val nullKey = if (s.isEmpty) (if (nullsBest) 0 else 2) else 1
          val scoreKey = s.map(v => if (asc) v else -v).getOrElse(0L)
          (nullKey, scoreKey, id)
        }.take(k)
      }.map(r => (r._1, r._2)).toSet
      got == want
    }
}
