package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixtures = {
    val left = Seq(
      ("a", 20L, "L1"), ("a", 4L, "L2"), ("b", 10L, "L3"),
      ("c", 10L, "L4"), ("a", 15L, "L5"))
      .toDF("k", "t", "tag")
    val right = Seq(
      ("a", 5L, Some(1.0), "x"),
      ("a", 15L, None: Option[Double], "y"),
      ("b", 10L, Some(3.0), "z"))
      .toDF("k", "t", "v", "note")
    (left, right)
  }

  test("matches the latest right row at-or-before each left row") {
    val (left, right) = fixtures
    val out = AsOf.join(left, right, Seq("k"), "t", "t")
      .orderBy($"tag").collect()
      .map(r => (r.getAs[String]("tag"),
        if (r.isNullAt(r.fieldIndex("asof_t"))) -1L else r.getAs[Long]("asof_t"),
        r.getAs[String]("asof_note"))).toSeq
    assert(out === Seq(
      ("L1", 15L, "y"),  // latest of {5, 15}
      ("L2", -1L, null), // nothing at-or-before t=4
      ("L3", 10L, "z"),  // equal timestamps match (inclusive)
      ("L4", -1L, null), // no right rows for key c
      ("L5", 15L, "y"))) // equal-ts inclusive again
  }

  test("matched payload columns come from the SAME right row") {
    val (left, right) = fixtures
    val r = AsOf.join(left, right, Seq("k"), "t", "t")
      .filter($"tag" === "L1").head()
    // the matched row (t=15) has v=null; a per-column last() would have
    // leaked v=1.0 from the older t=5 row
    assert(r.isNullAt(r.fieldIndex("asof_v")))
    assert(r.getAs[String]("asof_note") === "y")
  }

  test("tolerance nulls out stale matches") {
    val (left, right) = fixtures
    val out = AsOf.join(left, right, Seq("k"), "t", "t",
        toleranceSec = Some(3.0))
      .orderBy($"tag").collect()
      .map(r => r.getAs[String]("tag") ->
        r.isNullAt(r.fieldIndex("asof_t"))).toMap
    assert(out("L1") === true)  // 20 - 15 = 5 > 3 → stale
    assert(out("L3") === false) // 10 - 10 = 0 ≤ 3
    assert(out("L5") === false) // 15 - 15 = 0 ≤ 3
  }

  test("NULL join keys never match (SQL semantics)") {
    val left = Seq(
      (Some("a"), 20L, "L1"), (None: Option[String], 20L, "LN"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (Some("a"), 5L, "x"), (None: Option[String], 10L, "rnull"))
      .toDF("k", "t", "note")
    val out = AsOf.join(left, right, Seq("k"), "t", "t")
    assert(out.count() === 2) // every left row survives
    val ln = out.filter($"tag" === "LN").head()
    // the null-keyed left row must NOT match the null-keyed right row
    assert(ln.isNullAt(ln.fieldIndex("asof_t")))
    assert(ln.isNullAt(ln.fieldIndex("asof_note")))
    val l1 = out.filter($"tag" === "L1").head()
    assert(l1.getAs[Long]("asof_t") === 5L)
  }

  test("null handling costs no second scan of either input") {
    val (left, right) = fixtures
    val plan = AsOf.join(left, right, Seq("k"), "t", "t")
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("LocalTableScan")) <= 2, plan)
  }

  test("output keeps every left row and column") {
    val (left, right) = fixtures
    val out = AsOf.join(left, right, Seq("k"), "t", "t")
    assert(out.count() === left.count())
    assert(out.columns.take(3).toSeq === Seq("k", "t", "tag"))
    assert(out.columns.toSeq.containsSlice(Seq("asof_t", "asof_v", "asof_note")))
  }
}
