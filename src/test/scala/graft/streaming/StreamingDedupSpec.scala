package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("exact dedup state survives micro-batch boundaries") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val out = StreamingDedup.exactByFingerprint(
      stream.toDS().toDF("doc_id", "text"), "text")
    val q = out.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      stream.addData((1L, "alpha beta gamma"), (2L, "unrelated text here"))
      q.processAllAvailable()
      // batch 2: an exact dup, a shuffled dup (same fingerprint), a new doc
      stream.addData((3L, "alpha beta gamma"), (4L, "gamma alpha beta"),
        (5L, "fresh document"))
      q.processAllAvailable()
      val ids = spark.table("sdedup").select($"doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === Seq(1L, 2L, 5L),
        "cross-batch and in-batch duplicates must be dropped")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS sdedup")
    }
  }

  test("watermark-bounded dedup drops duplicates within the horizon") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingDedup.withinWatermark(
      stream.toDS().toDF("doc_id", "event_ts", "text"),
      "text", "event_ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("wdedup")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts("2024-01-01 10:00:00"), "alpha beta"))
      q.processAllAvailable()
      stream.addData((2L, ts("2024-01-01 10:05:00"), "alpha beta"),
        (3L, ts("2024-01-01 10:06:00"), "other doc"))
      q.processAllAvailable()
      val ids = spark.table("wdedup").select($"doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === Seq(1L, 3L))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS wdedup")
    }
  }

  test("streaming session_window emits merged sessions past the watermark") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(String, Timestamp)]
    val sessions = stream.toDS().toDF("user_id", "ets")
      .withWatermark("ets", "10 minutes")
      .groupBy($"user_id", session_window($"ets", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"n_events")
    val q = sessions.writeStream.format("memory").queryName("ssw")
      .outputMode("append").start()
    try {
      // two u1 events 10 min apart → one session
      stream.addData(("u1", ts("2024-01-01 10:00:00")),
        ("u1", ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      // push event time far enough that the watermark passes the
      // session end (10:40) and the session is finalized
      stream.addData(("u2", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      stream.addData(("u2", ts("2024-01-01 12:01:00")))
      q.processAllAvailable()
      val got = spark.table("ssw")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.get("u1") === Some(2L),
        "both u1 events must merge into one emitted session")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS ssw")
    }
  }
}
