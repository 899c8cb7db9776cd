package graft

import org.scalatest.funsuite.AnyFunSuite

/** The global plan-shape regression net: every registered query's
  * prepared-plan (shuffle, broadcast, sort-aggregate, cartesian,
  * sort) node counts must equal the committed budget
  * (src/test/resources/plan_budget.tsv) — see [[PlanBudget]] for why
  * these five counters and why equality in both directions.
  *
  * Lesson this generalizes (r12): the SortAggregate argmin folds that
  * sort-spilled ~300 GB at hier's paying tier were invisible to every
  * small-SF correctness gate and were only found by a scale probe;
  * the plan SHAPE had been sitting in `explain` output all along.
  * PlanSpec pins that shape for the three queries the probe touched;
  * this net pins the counts for all of them, so the next silent
  * shuffle/sort/cartesian lands as a test diff in the same commit
  * that introduces it.
  */
class PlanBudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("budget file and registry agree on the query set") {
    val budget = PlanBudget.readCommitted()
    val registry = SparkEntry.queries.keySet
    assert(budget.keySet == registry,
      s"plan-budget / registry drift — unpinned queries (add a line: " +
        s"""sbt "Test/runMain graft.PlanBudget"): """ +
        s"${(registry -- budget.keySet).toSeq.sorted.mkString(", ")}; " +
        s"stale budget rows: " +
        s"${(budget.keySet -- registry).toSeq.sorted.mkString(", ")}")
  }

  test("every registered query's plan-shape counts match the budget") {
    val budget = PlanBudget.readCommitted()
    // An unpinned query FAILS here too (not only in the keyset test):
    // this test must stand alone — a filtered run that skips the
    // keyset test must not let a never-pinned query pass unmeasured.
    val drifted = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      budget.get(name) match {
        case None => Some(s"$name: not pinned in the budget file")
        case Some(want) =>
          val got = PlanBudget.measure(spark, d, name)
          if (got == want) None
          else Some(s"$name: committed (shuffle=${want.shuffle}, " +
            s"broadcast=${want.broadcast}, sortAgg=${want.sortAgg}, " +
            s"cartesian=${want.cartesian}, sorts=${want.sorts}) but plan " +
            s"has (shuffle=${got.shuffle}, broadcast=${got.broadcast}, " +
            s"sortAgg=${got.sortAgg}, cartesian=${got.cartesian}, " +
            s"sorts=${got.sorts})")
      }
    }
    assert(drifted.isEmpty,
      "plan-shape drift (if intended, regenerate the budget with " +
        "sbt \"Test/runMain graft.PlanBudget\" and review the diff):\n  " +
        drifted.mkString("\n  "))
  }
}
