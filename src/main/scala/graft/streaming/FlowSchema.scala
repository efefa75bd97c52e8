package graft.streaming

import org.apache.spark.sql.types._

/** Typed event envelopes mirroring the reference's pydantic models
  * (reference common_kafka/topics.py:16-132) and the explicit streaming
  * StructType it declares (reference scripts/stream_anomaly_detector.py:75-171):
  * every field nullable, features deliberately double "for safety",
  * timestamp carried as an ISO-8601 string.
  *
  * The fixture schema is a compact stand-in: the reference's 64 flow
  * features are represented by a handful here; the pipeline code is
  * column-list-driven so widening to 64 is a config change, not a code
  * change.
  */
object FlowSchema {

  /** Scala-side typed surface (Dataset[FlowEvent]). */
  final case class FlowEvent(
      event_id: Option[String],
      event_type: Option[String],
      timestamp: Option[String],
      flow_id: Option[String],
      flow_duration: Option[Double],
      total_fwd_packets: Option[Double],
      flow_bytes_s: Option[Double],
      packet_length_mean: Option[Double],
      label: Option[String])

  /** Declared streaming schema (P1 parse target). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("event_type", StringType),
    StructField("timestamp", StringType),
    StructField("flow_id", StringType),
    StructField("flow_duration", DoubleType),
    StructField("total_fwd_packets", DoubleType),
    StructField("flow_bytes_s", DoubleType),
    StructField("packet_length_mean", DoubleType),
    StructField("label", StringType)))

  /** Feature columns fed to the scorer, in declared order (U4: ids/labels/
    * metadata excluded; reference stream_anomaly_detector.py:231). */
  val featureColumns: Seq[String] = Seq(
    "flow_duration", "total_fwd_packets", "flow_bytes_s",
    "packet_length_mean")
}
