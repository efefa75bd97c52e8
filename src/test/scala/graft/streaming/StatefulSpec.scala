package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StatefulSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("anomaly runs accumulate across micro-batches per key") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val runs = Stateful.anomalyRuns(
      stream.toDS().toDF("flow_id", "prediction"), "flow_id")
    val q = runs.writeStream.format("memory").queryName("runs")
      .outputMode("update").start()
    try {
      stream.addData(("f1", "anomaly"), ("f2", "normal"))
      q.processAllAvailable()
      stream.addData(("f1", "anomaly"), ("f2", "anomaly"))
      q.processAllAvailable()
      stream.addData(("f1", "normal"))
      q.processAllAvailable()
      val byBatchKey = spark.table("runs")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      // f1: run 1 → run 2 (state survived the batch boundary) → reset 0
      assert(byBatchKey.contains(("f1", 1, 1)))
      assert(byBatchKey.contains(("f1", 2, 2)))
      assert(byBatchKey.contains(("f1", 0, 2)), "reset keeps historical max")
      // f2: normal → 0, then its first anomaly → 1
      assert(byBatchKey.contains(("f2", 0, 0)))
      assert(byBatchKey.contains(("f2", 1, 1)))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS runs")
    }
  }
}
