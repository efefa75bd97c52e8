package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-suite invariants over every registered query: no accidental
  * quadratic joins anywhere, and the oracle map stays consistent with
  * the query map. Catches a regression in ANY query's plan, not just
  * the headliners PlanShapeSpec pins.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Queries that intentionally use a nested-loop join: either a 1-row
    * broadcast query vector (cross join against a single embedding) or
    * the deliberately-exhaustive all-pairs baseline. */
  private val nestedLoopIntended = Set(
    "q31_cosine_topk", "q46_ann_exact", "q47_neardup_exact",
    "ann_lsh", "ann_ivf",
    "ann_ivfpq",        // 1-row broadcast query vector in the exact refine
    "q68_keyword_rank", // 1-row broadcast n_docs scalar against per-term df
    "q72_semdedup",     // 8-row broadcast centroid table (O(n·k) assignment)
    "q75_stats_merge",  // 1-row merged accumulators × 1-row exact-distinct
    "q90_token_shift",  // two 1-row broadcast corpus totals (q68 pattern)
    "q93_surprisal",    // 1-row broadcast total-token count (q68 pattern)
    "q96_coverage_curve", // 1-row totals + 4-row thresholds broadcasts
    "q102_bigram_surprisal", // 1-row broadcast total (q68 pattern)
    "q107_dsir_score",  // 1-row broadcast Laplace totals × bucket spine
    "q110_quant_recall", // 5-row broadcast query vectors (q31 pattern)
    "q114_bm25",        // 1-row broadcast corpus stats (q68 pattern)
    "q117_collocations", // 1-row broadcast totals (q68 pattern)
    "q118_surprisal_buckets", // inherits q93 surprisal's 1-row total
    "q125_hybrid_rrf",  // 1-row broadcast query vector (q31 pattern)
                        // + q114's 1-row stats on the lexical leg
    "q126_hybrid_served", // ann_ivf's 1-row broadcast query vector
    "q133_store_audit") // 1-row doc-side × 1-row postings-side verdict
                        // combine (q75 pattern)

  test("every oracle entry refers to a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("no query plans a cartesian product or an unintended nested loop") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, TestSpark.sf)
          .queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
          !nestedLoopIntended(name)
        if (cart) Some(s"$name: CartesianProduct")
        else if (bnlj) Some(s"$name: unintended BroadcastNestedLoopJoin")
        else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
