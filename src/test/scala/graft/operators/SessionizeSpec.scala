package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessions split exactly when the gap exceeds gapSec") {
    val df = Seq(
      ("u1", ts("2024-01-01 10:00:00"), 1L),
      ("u1", ts("2024-01-01 10:20:00"), 2L), // 20 min — same session
      ("u1", ts("2024-01-01 10:50:00"), 3L), // exactly 30 min — same
      ("u1", ts("2024-01-01 11:20:01"), 4L), // 30 min + 1 s — new
      ("u2", ts("2024-01-01 10:00:00"), 5L)) // other key independent
      .toDF("user_id", "t", "event_id")
    val got = Sessionize.assign(df, "user_id", "t", gapSec = 1800L,
        tieCols = Seq("event_id"))
      .orderBy($"event_id")
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[Long]("session_id")).toSeq
    assert(got === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("one exchange and one sort serve both window functions") {
    val df = Seq(("u1", ts("2024-01-01 10:00:00"), 1L))
      .toDF("user_id", "t", "event_id")
    val plan = Sessionize.assign(df, "user_id", "t", 1800L, Seq("event_id"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 1, plan)
  }

  test("editDistanceNearDup finds planted fuzzy pairs, blocked") {
    val df = Seq(
      (1L, "small ring"), (2L, "small rinj"),   // dist 1, same block
      (3L, "small bolt"),                       // dist > 3 from ring
      (4L, "large ring"), (5L, "ring small"))   // different block
      .toDF("id", "nm")
    val got = Dedup.editDistanceNearDup(df, "id", "nm")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Int]("dist"))).toSet
    assert(got === Set((1L, 2L, 1)))
  }
}
