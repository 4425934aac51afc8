package graft.queries


import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTest, SparkEntry}

/** Physical-plan audits of the query inventory — the properties that
  * decide whether a plan survives a 100× scale-up, asserted so a
  * regression (a lost pushdown, a broadcast that degrades to a shuffle
  * join, a global sort sneaking into top-k) fails CI rather than
  * showing up as a 100 TB incident.
  */
class PlanSpec extends AnyFunSuite with SparkTest {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q02: filter and projection push into the parquet scan") {
    val p = planOf("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_discount)"),
      s"expected pushed filters in:\n$p")
    // column pruning: the scan schema carries only referenced columns
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_comment") && !read.contains("l_shipmode"),
      s"scan reads unreferenced columns: $read")
  }

  test("q03: dimension side broadcasts; top-k is TakeOrdered, not a global sort") {
    val p = planOf("q03_join_topk")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"no top-k operator in:\n$p")
  }

  test("q09: ORDER BY + LIMIT plans as TakeOrderedAndProject") {
    val p = planOf("q09_sort_limit")
    assert(p.contains("TakeOrderedAndProject") && !p.contains("GlobalLimit"),
      s"limit not fused into top-k:\n$p")
  }

  test("q01: aggregation is partial (map-side combine) before the shuffle") {
    // AQE wraps the plan, so assert on the printed tree: partial
    // aggregate functions render as partial_sum/partial_count
    val p = planOf("q01_agg_summary")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"no partial aggregate stage in:\n$p")
  }

  test("qt01: text-function pipeline is one scan with zero shuffles") {
    // orderBy adds exactly one exchange; the stats themselves add none
    val shuffles = countShuffles(planOf("qt01_token_stats"))
    assert(shuffles <= 1, s"expected <=1 shuffle, got $shuffles")
  }

  test("qe01: brute kNN broadcasts queries — no shuffle of the candidate side") {
    val df = SparkEntry.queries("qe01_knn_brute")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"query side not broadcast:\n$p")
  }

  test("q32: as-of join costs exactly one hash shuffle (union-and-window)") {
    // the operator's scale claim: |L|+|R| rows shuffle ONCE on the key —
    // no range cross-join, no per-key blow-up
    val p = planOf("q32_asof_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"cross-join in asof plan:\n$p")
    assert(p.contains("Window"), "no window operator in asof plan")
  }

  test("q35: dialect shims leave no UDF boundary in the plan") {
    val df = SparkEntry.queries("q35_dialect")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), p)
  }

  /** Shuffle exchanges in the printed tree (AQE hides children from a
    * node walk; broadcast exchanges are not shuffles).
    */
  private def countShuffles(plan: String): Int =
    plan.linesIterator.count(l =>
      l.contains("Exchange ") && !l.contains("BroadcastExchange"))
}
