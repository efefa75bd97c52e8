package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.score.Autoencoder

class WideFlowSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("declared schema: 71 fields, 66 doubles, 64 scoring features") {
    val s = WideFlowSchema.schema
    assert(s.fields.length === 71)
    assert(s.fields.count(_.dataType == DoubleType) === 66)
    assert(s.fields.count(_.dataType == StringType) === 5)
    assert(WideFlowSchema.featureColumns.length === 64)
    assert(!WideFlowSchema.featureColumns.contains("active_std"))
    assert(!WideFlowSchema.featureColumns.contains("idle_std"))
    // declared order preserved
    assert(s.fieldNames.take(4).toSeq ===
      Seq("event_id", "event_type", "timestamp", "flow_id"))
    assert(s.fieldNames.last === "label")
  }

  test("project resolves messy raw headers case/punctuation-insensitively") {
    val raw = Seq((" 123", "4.5", "BENIGN"))
      .toDF(" Flow Duration", "Flow Bytes/s", " Label")
    val out = WideFlowSchema.project(raw)
    assert(out.schema === WideFlowSchema.schema)
    val r = out.head()
    assert(r.getAs[Double]("flow_duration") === 123.0)
    assert(r.getAs[Double]("flow_bytes_s") === 4.5)
    assert(r.getAs[String]("label") === "BENIGN")
    // unmapped fields are typed nulls
    assert(r.isNullAt(r.fieldIndex("idle_min")))
  }

  test("project coalesces split spellings per row, first column wins") {
    val raw = Seq(
      (Some(1.0), Some(9.0)),
      (None: Option[Double], Some(7.0)),
      (None: Option[Double], None: Option[Double]))
      .toDF("Flow_Duration", "flow_duration")
    val vals = WideFlowSchema.project(raw)
      .select($"flow_duration").collect()
      .map(r => if (r.isNullAt(0)) Double.NaN else r.getDouble(0))
    assert(vals(0) === 1.0) // first spelling wins
    assert(vals(1) === 7.0) // falls back per row
    assert(vals(2).isNaN)
  }

  test("alias map: 'duration' feeds flow_duration") {
    val raw = Seq(42.0).toDF("duration")
    assert(WideFlowSchema.project(raw).head.getAs[Double]("flow_duration")
      === 42.0)
  }

  test("streaming e2e over the wide schema: parse → score → split") {
    implicit val sc = spark.sqlContext
    val weights = Autoencoder.seededWeights(Seq(64, 64, 16, 64, 64), 42L)
    def wideEvent(id: Int, dur: Double, label: String): String =
      s"""{"event_id":"e$id","event_type":"network_flow",
         |"timestamp":"2026-01-01T00:00:0$id","flow_id":"f$id",
         |"flow_duration":$dur,"total_fwd_packets":0.2,
         |"packet_length_mean":0.05,"idle_min":0.1,"label":"$label"}"""
        .stripMargin.replaceAll("\n", "")
    val stream = MemoryStream[String]
    val normal = new StreamPipeline.CollectingSink
    val anomaly = new StreamPipeline.CollectingSink
    val ckpt = java.nio.file.Files.createTempDirectory("graft_wide").toString
    val q = StreamPipeline.run(stream.toDF().toDF("value"), weights,
      threshold = 0.5, normal, anomaly, ckpt,
      schema = WideFlowSchema.schema,
      features = WideFlowSchema.featureColumns)
    try {
      stream.addData(wideEvent(1, 0.1, "BENIGN"), wideEvent(2, 9999.0, "DoS"))
      q.processAllAvailable()
      assert(normal.totalRows + anomaly.totalRows === 2)
      assert(anomaly.totalRows >= 1)
      val row = (normal.batches ++ anomaly.batches).flatten.head
      // the full wide envelope plus scorer columns rides to the sink
      assert(row.schema.fieldNames.contains("idle_min"))
      assert(row.schema.fieldNames.contains("anomaly_score"))
    } finally q.stop()
  }
}
