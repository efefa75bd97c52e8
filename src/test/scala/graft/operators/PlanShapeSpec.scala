package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Physical-plan shape assertions for the headline queries: the point
  * of declaring plans to Catalyst is that pushdown/broadcast/top-k
  * shapes survive — these tests pin that, so a regression that silently
  * de-optimizes a plan (a lost filter pushdown, a window sneaking back
  * into the z-score, a sort-based top-k) fails CI rather than only
  * showing up at 100×.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def plan(q: String): String =
    graft.SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q02 pushes predicates and prunes columns at the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_shipdate"), "shipdate filter should reach the scan")
    // pruned read schema: none of the untouched lineitem columns
    assert(!p.contains("l_tax"), "untouched columns must not be read")
    assert(!p.contains("l_returnflag"))
  }

  test("q04 broadcasts the small dimension tables") {
    val p = plan("q04_join_nation_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
  }

  test("q08 top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan("q08_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("q16 z-score has no window exchange (grouped stats + broadcast join)") {
    val p = plan("q16_zscore")
    assert(!p.contains("Window"), "low-cardinality window is a scale-killer")
    assert(p.contains("BroadcastHashJoin"),
      "per-type stats should come back via broadcast join")
  }

  test("q01 aggregates partially before the shuffle (map-side combine)") {
    val p = plan("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expect partial + final hash aggregates")
  }

  test("q09 window rank intentionally keeps its window (high-cardinality key)") {
    assert(plan("q09_window_rank").contains("Window"))
  }

  test("q45 near-dup pairs never plan a cartesian/nested-loop join") {
    val p = plan("q45_neardup_pairs")
    assert(!p.contains("CartesianProduct"), p.take(500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(500))
  }

  test("q50 moving window plans ONE window over one exchange") {
    val p = plan("q50_moving_window")
    assert(p.linesIterator.count(_.trim.startsWith("Window")) <= 1,
      "both frame functions must share a single Window operator")
  }

  test("q54 top-k aggregate combines map-side, no window, no global sort") {
    val p = plan("q54_topk_agg")
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      "expect partial + final object hash aggregates")
    assert(!p.contains("Window"), p.take(500))
  }

  test("q69 degree profile runs the LSH pair subtree exactly once") {
    // q45 IS the pair set q69 profiles; a self-union over the pair
    // frame would double every candidate/verify join — the explode
    // form must plan the same number of joins as the pair query itself
    def joins(q: String): Int =
      plan(q).linesIterator.count(_.contains("Join"))
    assert(joins("q69_degree_stats") == joins("q45_neardup_pairs"),
      "q69 must not execute the pair subtree twice")
    assert(plan("q69_degree_stats").contains("Generate"),
      "endpoint expansion should be a generator, not a union")
  }

  test("q55 chunking stays generator + project (no join, no extra shuffle)") {
    val p = plan("q55_chunking")
    assert(p.contains("Generate"), p.take(500))
    assert(!p.contains("Join"), "chunking must not join")
  }

  test("q107 DSIR score joins the weight table broadcast, never " +
    "shuffled") {
    val p = plan("q107_dsir_score")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    // the gram stream must meet the O(buckets) weight table map-side:
    // shuffling every gram occurrence on its bucket id would be the
    // scale-killer (the docs-spine join on high-cardinality doc id is
    // allowed to sort-merge — that one is per-doc, not per-gram)
    assert(!p.contains("SortMergeJoin [__b"),
      "weight join must not shuffle the gram stream")
  }

  test("q108 temperature mix pays exactly one corpus aggregate") {
    val p = plan("q108_temperature_mix")
    // the close ran on the driver: the remaining plan is the collected
    // rows as a LocalTableScan — no window, no join, no second scan
    assert(p.contains("LocalTableScan"), p.take(500))
    assert(!p.contains("Window") && !p.contains("Join"), p.take(500))
  }

  test("q110 quant-recall ranks via the bounded top-k aggregate, " +
    "not a window sort") {
    val p = plan("q110_quant_recall")
    assert(!p.contains("Window"),
      "rankings must be the partial top-k aggregate, not row_number")
  }
}
