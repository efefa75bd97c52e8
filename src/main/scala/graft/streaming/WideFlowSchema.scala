package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's full wide event schema and its multi-name fallback
  * projection (P14/F9):
  *
  *  - 4 string meta fields + 66 double features + label, the declared
  *    streaming StructType of the reference
  *    (reference scripts/stream_anomaly_detector.py:75-171);
  *  - raw-header variants (title-case with underscores, snake_case,
  *    original messy CSV headers per reference test.py:8-89) are mapped
  *    onto the declared schema by case/punctuation-insensitive name
  *    resolution, and ALL matching raw columns are combined per row with
  *    `coalesce(...)` then cast — the Column-expression form of the
  *    reference's `_get_float(row, "Flow_Duration", "flow_duration")`
  *    getter chain (reference scripts/simulate_network_traffic.py:64-184);
  *  - the whole mapping is ONE `select` of codegen-friendly expressions,
  *    not 69 chained withColumns.
  */
object WideFlowSchema {

  val metaFields: Seq[String] =
    Seq("event_id", "event_type", "timestamp", "flow_id")

  /** The 66 numeric features in the reference's declared order. */
  val featureNames: Seq[String] = Seq(
    "flow_duration", "total_fwd_packets", "total_length_of_fwd_packets",
    "fwd_packet_length_max", "fwd_packet_length_min",
    "fwd_packet_length_mean", "fwd_packet_length_std",
    "bwd_packet_length_max", "bwd_packet_length_min",
    "bwd_packet_length_mean", "bwd_packet_length_std",
    "flow_bytes_s", "flow_packets_s",
    "flow_iat_mean", "flow_iat_std", "flow_iat_max", "flow_iat_min",
    "fwd_iat_total", "fwd_iat_mean", "fwd_iat_std", "fwd_iat_max",
    "fwd_iat_min",
    "bwd_iat_total", "bwd_iat_mean", "bwd_iat_std", "bwd_iat_max",
    "bwd_iat_min",
    "bwd_psh_flags", "bwd_urg_flags",
    "fwd_header_length", "bwd_header_length",
    "fwd_packets_s", "bwd_packets_s",
    "min_packet_length", "max_packet_length",
    "packet_length_mean", "packet_length_std", "packet_length_variance",
    "fin_flag_count", "syn_flag_count", "psh_flag_count",
    "ack_flag_count", "cwe_flag_count",
    "average_packet_size", "fwd_header_length_1",
    "fwd_avg_bytes_bulk", "fwd_avg_packets_bulk", "fwd_avg_bulk_rate",
    "bwd_avg_bytes_bulk", "bwd_avg_packets_bulk", "bwd_avg_bulk_rate",
    "subflow_fwd_packets", "subflow_fwd_bytes", "subflow_bwd_packets",
    "init_win_bytes_forward", "init_win_bytes_backward",
    "act_data_pkt_fwd", "min_seg_size_forward",
    "active_mean", "active_std", "active_max", "active_min",
    "idle_mean", "idle_std", "idle_max", "idle_min")

  /** Declared streaming schema: every field nullable, features double
    * "for safety", timestamp as ISO string. */
  val schema: StructType = StructType(
    metaFields.map(StructField(_, StringType)) ++
      featureNames.map(StructField(_, DoubleType)) :+
      StructField("label", StringType))

  /** U4: feature columns fed to the scorer — ids/labels/meta plus the
    * reference's explicit active_std/idle_std exclusions removed
    * (reference stream_anomaly_detector.py:231), leaving the 64 model
    * inputs in declared order. */
  val featureColumns: Seq[String] =
    featureNames.filterNot(Set("active_std", "idle_std"))

  /** Extra accepted spellings beyond case/punctuation variants of the
    * target name itself (reference getter chains). */
  private val aliases: Map[String, Seq[String]] = Map(
    "flow_duration" -> Seq("duration"),
    "flow_id" -> Seq("flow id"))

  private def key(s: String): String =
    s.toLowerCase.replaceAll("[^0-9a-z]+", "")

  /** P14/F9: project arbitrary raw columns onto the declared schema. For
    * each declared field, every raw column whose normalized name matches
    * the field (or an alias) contributes to a per-row `coalesce`, then
    * the result is cast to the declared type; fields with no matching
    * raw column become typed nulls. Raw columns are taken in their
    * original order, so the reference's first-name-wins semantics hold. */
  def project(raw: DataFrame): DataFrame = {
    // Positional rename first: raw headers may collide case-insensitively
    // ("Flow_Duration" vs "flow_duration"), which Spark's resolver treats
    // as ambiguous. Unique positional names sidestep that while the
    // key-index below keeps the original spellings for matching.
    val uniq = raw.columns.indices.map(i => s"__graft_c$i")
    val renamed = raw.toDF(uniq: _*)
    val byKey: Map[String, Seq[Int]] =
      raw.columns.toSeq.zipWithIndex
        .groupBy { case (c, _) => key(c) }
        .map { case (k, cs) => k -> cs.map(_._2).sorted }
    def resolve(target: String): Seq[Int] =
      (target +: aliases.getOrElse(target, Nil))
        .flatMap(a => byKey.getOrElse(key(a), Nil)).distinct
    val cols = schema.fields.map { f =>
      resolve(f.name) match {
        case Seq() => lit(null).cast(f.dataType).as(f.name)
        case Seq(one) => col(uniq(one)).cast(f.dataType).as(f.name)
        case many =>
          coalesce(many.map(i => col(uniq(i))): _*).cast(f.dataType).as(f.name)
      }
    }
    renamed.select(cols.toSeq: _*)
  }
}
