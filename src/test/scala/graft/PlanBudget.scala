package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Plan-shape counters for the global budget net
  * ([[PlanBudgetSpec]]): for one registered query, the number of
  * shuffle exchanges, broadcast exchanges, sort-based aggregates,
  * cartesian products, and sorts in the prepared physical plan, main
  * tree plus physical subqueries.
  *
  * Why these five: each is a plan shape whose silent appearance is a
  * scale regression the small-SF row/hash gate cannot see — an extra
  * shuffle re-partitions the corpus, a broadcast that becomes a
  * shuffle loses the map-side join, a SortAggregate over a wide
  * payload is the r12 spill class (~300 GB at hier's paying tier,
  * HIERTIER_r12.json), a cartesian product is quadratic unless
  * deliberately bounded, and a Sort is the spill class in its raw
  * form (a join flipping broadcast→SMJ grows two of them; an
  * accidental global orderBy grows one over the whole stream).
  * PlanSpec pins these shapes for a handful of queries it names; the
  * budget pins the COUNT for every query, so a regression in any of
  * the other ~150 still fails a test instead of waiting for a probe
  * round to find it.
  *
  * Measured on `executedPlan` with AQE DISABLED for the build:
  * exchanges are inserted by EnsureRequirements during preparation
  * (`sparkPlan` predates them entirely), and under AQE the prepared
  * plan is a runtime-mutating AdaptiveSparkPlanExec whose counts
  * would depend on when they are read. AQE-off preparation is
  * deterministic for a fixed corpus and conf. The budget is a
  * fixed-SF (sf0.001) regression net: join selection that is
  * size-driven (broadcast thresholds) is part of the pinned fixture,
  * not an at-scale claim.
  *
  * Re-pin workflow: a count change — either direction — fails
  * [[PlanBudgetSpec]]. If the change is intended (a new stage, a
  * deliberate de-shuffle, a Spark upgrade), regenerate with
  * `sbt "Test/runMain graft.PlanBudget"` and review the diff of
  * `src/test/resources/plan_budget.tsv` in the commit; the diff IS
  * the plan-shape review.
  */
object PlanBudget {

  val BudgetPath = "src/test/resources/plan_budget.tsv"

  final case class Counts(
      shuffle: Int, broadcast: Int, sortAgg: Int, cartesian: Int,
      sorts: Int) {
    def tsv: String = s"$shuffle\t$broadcast\t$sortAgg\t$cartesian\t$sorts"
  }

  /** Count the five budgeted node classes in `name`'s prepared
    * physical plan (main tree + planned subqueries), built with AQE
    * off. Builds the query at `d` — eager builders (corpus counts,
    * Lloyd trains, fixed-point graph loops) run their build-time
    * jobs, exactly as OperatorSpec's execute-all test already does at
    * this SF.
    */
  def measure(spark: SparkSession, d: String, name: String): Counts = {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.aggregate.SortAggregateExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    var counts: Counts = null
    TestSpark.withConfs("spark.sql.adaptive.enabled" -> "false") {
      val plan = SparkEntry.queries(name)(spark, d)
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan
      val trees: Seq[SparkPlan] =
        (plan +: plan.subqueriesAll).collect { case p: SparkPlan => p }
      def count(pred: SparkPlan => Boolean): Int =
        trees.map(_.collect { case n if pred(n) => 1 }.size).sum
      counts = Counts(
        count(_.isInstanceOf[ShuffleExchangeExec]),
        count(_.isInstanceOf[BroadcastExchangeExec]),
        count(_.isInstanceOf[SortAggregateExec]),
        count(_.isInstanceOf[CartesianProductExec]),
        count(_.isInstanceOf[org.apache.spark.sql.execution.SortExec]))
    }
    counts
  }

  /** Parse the committed budget. Line format:
    * `name<TAB>shuffle<TAB>broadcast<TAB>sortAgg<TAB>cartesian<TAB>sorts`;
    * `#` comments and blank lines ignored.
    */
  def readCommitted(): Map[String, Counts] = {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(BudgetPath)), "UTF-8")
    src.linesIterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val parts = l.split('\t')
        require(parts.length == 6, s"malformed budget line: $l")
        parts(0) -> Counts(parts(1).toInt, parts(2).toInt,
          parts(3).toInt, parts(4).toInt, parts(5).toInt)
      }.toMap
  }

  /** Regenerate the committed budget from the current registry and
    * plans — run after an INTENDED plan change, then review the diff.
    */
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = TestSpark.sfDir
    val header =
      """# Strategy-level plan-shape budget - PlanBudgetSpec fails on any drift.
        |# Regenerate after an INTENDED plan change (sbt "Test/runMain graft.PlanBudget")
        |# and review the diff: it is the plan-shape review.
        |# name<TAB>shuffle_exchanges<TAB>broadcast_exchanges<TAB>sort_aggregates<TAB>cartesian_products<TAB>sorts
        |""".stripMargin
    val rows = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val c = measure(spark, d, name)
      System.err.println(s"[budget] $name ${c.tsv}")
      s"$name\t${c.tsv}"
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(BudgetPath),
      (header + rows.mkString("\n") + "\n").getBytes("UTF-8"))
    System.err.println(s"[budget] wrote ${rows.size} rows to $BudgetPath")
  }
}
