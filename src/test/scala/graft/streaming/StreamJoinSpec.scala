package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("clicks join impressions only within the attribution window") {
    implicit val sc = spark.sqlContext
    val impressions = MemoryStream[(String, Timestamp, String)]
    val clicks = MemoryStream[(String, Timestamp, String)]
    val joined = StreamJoin.within(
      impressions.toDS().toDF("user", "imp_ts", "imp_id"),
      clicks.toDS().toDF("user", "click_ts", "click_id"),
      "user", "imp_ts", "click_ts",
      withinSec = 600L, delay = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      impressions.addData(
        ("u1", ts("2024-01-01 10:00:00"), "i1"),
        ("u2", ts("2024-01-01 10:00:00"), "i2"))
      q.processAllAvailable()
      clicks.addData(
        ("u1", ts("2024-01-01 10:05:00"), "c1"),  // in window → match
        ("u2", ts("2024-01-01 10:20:00"), "c2"),  // 20 min late → no match
        ("u3", ts("2024-01-01 10:05:00"), "c3"))  // no impression
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select($"imp_id", $"click_id")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got === Set(("i1", "c1")))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS attrib")
    }
  }

  test("the join state is range-bounded (plan declares watermarks)") {
    implicit val sc = spark.sqlContext
    val impressions = MemoryStream[(String, Timestamp, String)]
    val clicks = MemoryStream[(String, Timestamp, String)]
    val joined = StreamJoin.within(
      impressions.toDS().toDF("user", "imp_ts", "imp_id"),
      clicks.toDS().toDF("user", "click_ts", "click_id"),
      "user", "imp_ts", "click_ts",
      withinSec = 600L, delay = "10 minutes")
    // both watermarks must survive into the analyzed plan — they are
    // what lets the state store evict
    val analyzed = joined.queryExecution.analyzed.toString
    assert(analyzed.contains("imp_ts") && analyzed.contains("click_ts"))
    assert(analyzed.toLowerCase.contains("watermark"), analyzed.take(400))
  }
}
