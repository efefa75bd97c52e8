package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("snapshotDiff: all four verdicts, exact byte-level identity") {
    val a = Seq(1L -> "same", 2L -> "old text", 3L -> "gone",
      4L -> "ws  sensitive").toDF("doc_id", "text")
    val b = Seq(1L -> "same", 2L -> "new text", 5L -> "fresh",
      4L -> "ws sensitive").toDF("doc_id", "text")
    val got = Diff.snapshotDiff(a, b, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 5L -> "added",
      // whitespace-only edits are CHANGED — the diff is byte-exact,
      // canonicalization is the dedup tiers' job
      4L -> "changed"))
  }

  test("null text groups with empty text, not with a join miss") {
    val a = Seq((1L, null: String), (2L, "x")).toDF("doc_id", "text")
    val b = Seq((1L, ""), (2L, null: String)).toDF("doc_id", "text")
    val got = Diff.snapshotDiff(a, b, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("diffSummary over two empty snapshots is zeros, not nulls") {
    val e = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val s = Diff.diffSummary(Diff.snapshotDiff(e, e, "doc_id", "text"))
      .head()
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) ===
      ((0L, 0L, 0L, 0L)))
  }

  test("diffSummary counts reconcile with the per-id frame") {
    val a = Seq(1L -> "a", 2L -> "b", 3L -> "c").toDF("doc_id", "text")
    val b = Seq(2L -> "b", 3L -> "C", 4L -> "d").toDF("doc_id", "text")
    val d = Diff.snapshotDiff(a, b, "doc_id", "text")
    val s = Diff.diffSummary(d).head()
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) ===
      ((1L, 1L, 1L, 1L)))
    assert(d.count() === 4L)
  }
}
