package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixtures = {
    val rnd = new java.util.Random(31L)
    val points = (1 to 400).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(10000).toLong, i))
      .toDF("k", "t", "pid")
    val intervals = (1 to 60).map { i =>
      val s = rnd.nextInt(9000).toLong
      (s"k${rnd.nextInt(5)}", s, s + 100 + rnd.nextInt(2500), i)
    }.toDF("k", "s", "e", "iid")
    (points, intervals)
  }

  test("bucketed range join equals the naive inequality join") {
    val (points, intervals) = fixtures
    val bucketed = RangeJoin.bucketed(points, intervals, Seq("k"),
        "t", "s", "e", bucketSec = 500L)
      .select($"pid", $"iid").collect().map(r => (r.getInt(0), r.getInt(1)))
      .toSet
    val naive = points.join(intervals,
        points("k") === intervals("k") &&
          points("t") >= intervals("s") && points("t") < intervals("e"))
      .select($"pid", $"iid").collect().map(r => (r.getInt(0), r.getInt(1)))
      .toSet
    assert(bucketed === naive)
    assert(naive.nonEmpty)
  }

  test("boundaries: start inclusive, end exclusive, empty dropped") {
    val points = Seq(("a", 100L, 1), ("a", 200L, 2), ("a", 199L, 3))
      .toDF("k", "t", "pid")
    val intervals = Seq(
      ("a", 100L, 200L, 10), // [100, 200)
      ("a", 300L, 300L, 11), // empty
      ("a", 400L, 300L, 12)) // negative
      .toDF("k", "s", "e", "iid")
    val out = RangeJoin.bucketed(points, intervals, Seq("k"),
        "t", "s", "e", bucketSec = 50L)
      .select($"pid", $"iid").collect().map(r => (r.getInt(0), r.getInt(1)))
      .toSet
    assert(out === Set((1, 10), (3, 10))) // t=200 excluded, t=100 included
  }

  test("timestamp columns join on exact integer micros") {
    val points = Seq(
      ("a", "2024-01-01 10:00:00", 1),
      ("a", "2024-01-01 11:00:00", 2)) // exactly the exclusive end
      .toDF("k", "ts", "pid")
      .withColumn("ts", to_timestamp($"ts"))
    val intervals = Seq(
      ("a", "2024-01-01 09:30:00", "2024-01-01 11:00:00", 10))
      .toDF("k", "s", "e", "iid")
      .withColumn("s", to_timestamp($"s"))
      .withColumn("e", to_timestamp($"e"))
    val out = RangeJoin.bucketed(points, intervals, Seq("k"),
        "ts", "s", "e", bucketSec = 3600L)
      .select($"pid").collect().map(_.getInt(0)).toSet
    // 10:00 ∈ [09:30, 11:00); 11:00 is excluded — and with hour buckets
    // the boundary-aligned end must not even produce an 11:00 candidate
    assert(out === Set(1))
  }

  test("the plan is an equi-join, not a nested loop") {
    val (points, intervals) = fixtures
    val plan = RangeJoin.bucketed(points, intervals, Seq("k"),
        "t", "s", "e", bucketSec = 500L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
    assert(plan.contains("Join") || plan.contains("HashJoin"), plan.take(400))
  }
}
