package graft

import graft.plans.GraftOps
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

/** Property test: the custom sort-merge as-of join must agree with a
  * plain Scala reference on arbitrary inputs — few keys, clustered
  * times (to force equal-timestamp and cross-key edges), arbitrary
  * side sizes including empty right sides.
  *
  * The right side is pre-collapsed per (key, time) — the operator's
  * documented uniqueness contract — by keeping the max value, mirroring
  * how q_asof_join_custom collapses clicks.
  */
object AsofJoinProps extends Properties("AsofJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = TestSpark.spark

  private val rowGen = for {
    key <- Gen.choose(0, 3)
    t <- Gen.choose(0L, 12L) // tight range -> many exact-time collisions
  } yield (key, t)

  private val caseGen = for {
    nl <- Gen.choose(0, 40)
    nr <- Gen.choose(0, 40)
    lrows <- Gen.listOfN(nl, rowGen)
    rrows <- Gen.listOfN(nr, rowGen)
  } yield (
    lrows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) },
    // collapse to unique (key, time), keep max value
    rrows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong + 1000) }
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toList)

  property("equals per-row scan reference") = forAllNoShrink(caseGen) { case (lrows, rrows) =>
    import spark.implicits._
    val l = lrows.toDF("k", "t", "lv")
    val r = rrows.toDF("rk", "rt", "rv")
    val gotRows = GraftOps.asofJoin(l, r, Seq(col("k")), Seq(col("rk")), col("t"), col("rt"))
      .select("lv", "rv").collect()
    val got = gotRows
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
    val want = lrows.map { case (k, t, lv) =>
      val candidates = rrows.filter(r => r._1 == k && r._2 <= t)
      lv -> (if (candidates.isEmpty) None
             else Some(candidates.maxBy(r => (r._2, r._3))._3))
    }.toMap
    // raw row count too: the Map collapse would hide duplicate
    // emissions of the same left row
    val ok = got == want && gotRows.length == lrows.size
    if (!ok) println(s"MISMATCH\n left=$lrows\n right=$rrows\n got=$got\n want=$want")
    ok
  }

  // Adversarial physical layouts (r13 verdict #2): the operator
  // co-partitions internally, so its output must be invariant to HOW
  // the inputs arrive — one partition, scattered by time (a key's
  // rows spread across every partition), hash-scattered by value, or
  // pre-sorted. A layout sensitivity here is exactly the class of bug
  // the oracle gate's corpus-shaped scans never exercise.
  private def layout(df: org.apache.spark.sql.DataFrame, mode: Int,
      timeCol: String): org.apache.spark.sql.DataFrame = mode match {
    case 0 => df
    case 1 => df.repartition(1)
    case 2 => df.repartition(7, col(timeCol))
    case 3 => df.sortWithinPartitions(col(timeCol).desc)
    case _ => df.repartition(5)
  }

  property("equals the tagged-union window formulation under adversarial layouts") =
    forAllNoShrink(caseGen, Gen.choose(0, 4), Gen.choose(0, 4)) {
      case ((lrows, rrows), lMode, rMode) =>
        import org.apache.spark.sql.expressions.Window
        import spark.implicits._
        val l = layout(lrows.toDF("k", "t", "lv"), lMode, "t")
        val r = layout(rrows.toDF("rk", "rt", "rv"), rMode, "rt")
        val gotRows = GraftOps.asofJoin(l, r,
          Seq(col("k")), Seq(col("rk")), col("t"), col("rt"))
          .select("lv", "rv").collect()
        val got = gotRows.map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
        // the tagged-union window formulation AsofJoin's Scaladoc
        // names as the alternative it was measured against: union the
        // sides with a tag ordering right rows BEFORE left rows at
        // equal time (<=' semantics), then carry the last non-null
        // right value forward per key. Two left rows tied on (k, t)
        // order arbitrarily between themselves, but both carry null
        // rv, so last(ignoreNulls) is order-invariant — the reference
        // is deterministic.
        val tagged = rrows.toDF("k", "t", "rv")
          .select(col("k"), col("t"), lit(null).cast("long").as("lv"),
            col("rv"), lit(0).as("tag"))
          .unionByName(lrows.toDF("k", "t", "lv")
            .select(col("k"), col("t"), col("lv"),
              lit(null).cast("long").as("rv"), lit(1).as("tag")))
        val w = Window.partitionBy("k").orderBy(col("t"), col("tag"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val want = tagged
          .withColumn("rvf", last(col("rv"), ignoreNulls = true).over(w))
          .filter(col("tag") === 1)
          .select("lv", "rvf").collect()
          .map(row => row.getLong(0) ->
            (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
        val ok = got == want && gotRows.length == lrows.size
        if (!ok) println(s"MISMATCH layouts=($lMode,$rMode)\n left=$lrows\n " +
          s"right=$rrows\n got=$got\n want=$want")
        ok
    }
}
