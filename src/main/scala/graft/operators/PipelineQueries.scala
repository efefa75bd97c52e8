package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.ModelRegistry
import graft.score.Autoencoder

/** Pipeline-level query surface: multimodal plumbing, registry-lite
  * lookup, and the streaming dataflow in its batch-equivalent form.
  */
object PipelineQueries {

  private val registryFixture = Seq(
    ModelRegistry.ModelVersion("NetworkAnomalyDetector", 1, "Archived",
      "2026-01-01T00:00:00", 0.6724),
    ModelRegistry.ModelVersion("NetworkAnomalyDetector", 2, "Production",
      "2026-02-01T00:00:00", 0.6517),
    ModelRegistry.ModelVersion("NetworkAnomalyDetector", 3, "Staging",
      "2026-03-01T00:00:00", 0.7001),
    ModelRegistry.ModelVersion("OtherModel", 9, "Production",
      "2026-01-15T00:00:00", 0.1234))

  private val artifactFixture = Seq(
    ModelRegistry.Artifact("NetworkAnomalyDetector", 1, "models/nad/v1"),
    ModelRegistry.Artifact("NetworkAnomalyDetector", 2, "models/nad/v2"),
    ModelRegistry.Artifact("NetworkAnomalyDetector", 3, "models/nad/v3"),
    ModelRegistry.Artifact("OtherModel", 9, "models/other/v9"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Multimodal: binary payload + metadata projection (oracle-checkable
    // part: byte length + media-type routing)
    "q32_binary_meta" -> ((s, d) => {
      import s.implicits._
      Multimodal.withBinaryPayload(Tables.documents(s, d))
        .select($"doc_id", length($"payload").cast("long").as("n_bytes"),
          $"media_type")
        .orderBy($"doc_id")
    }),

    // Registry-lite: latest Production version lookup joined to its
    // weight artifact over an inline registry (T4/U9/S10)
    "q33_registry_latest" -> ((s, _) => {
      val reg = ModelRegistry.table(s, registryFixture)
      val art = ModelRegistry.artifactTable(s, artifactFixture)
      ModelRegistry.latestWithArtifact(reg, art,
          "NetworkAnomalyDetector", "Production")
        .select(col("model"), col("version"), col("stage"),
          col("created_at"), col("metrics_mse"), col("artifact_path"))
    }),

    // The streaming pipeline's batch-equivalent: classify each event,
    // then event-time tumbling-window counts per prediction — the
    // dashboard aggregation over the scorer's output (A7+A12)
    "q34_stream_batch" -> ((s, d) => {
      import s.implicits._
      val dev = ($"value" - 250.0) / 100.0
      Tables.events(s, d)
        .withColumn("prediction",
          Autoencoder.classify(dev * dev, threshold = 1.0))
        .groupBy(
          (floor(unix_timestamp($"ts") / 300) * 300).as("bucket_start"),
          $"prediction")
        .agg(count(lit(1)).as("n"))
        .orderBy($"bucket_start", $"prediction")
    }),

    // P14/F9: the wide-schema multi-name fallback projection over an
    // inline raw relation with messy CICIDS-style headers and split
    // spellings — coalesce picks the first non-null candidate per row,
    // absent fields become typed nulls (reference
    // simulate_network_traffic.py:64-184 getter chain).
    "q37_wide_projection" -> ((s, _) => {
      import s.implicits._
      val raw = Seq(
        ("f1", None: Option[Double], Some(100.0), "5", Some("BENIGN")),
        ("f2", Some(200.0), None: Option[Double], "6", Some("DoS Hulk")),
        ("f3", None: Option[Double], None: Option[Double], "7",
          None: Option[String]))
        .toDF("Flow ID", " Flow Duration", "flow_duration",
          "Total Fwd Packets", " Label")
      graft.streaming.WideFlowSchema.project(raw)
        .select($"flow_id", $"flow_duration", $"total_fwd_packets",
          $"label", $"fin_flag_count")
        .orderBy($"flow_id")
    }),

    // Multimodal frame sampling: every stride-th byte offset of the
    // video payloads stands in for a frame timestamp (stub decode, real
    // plumbing) — offset count and bounds are oracle-checkable.
    "q39_frame_sample" -> ((s, d) => {
      import s.implicits._
      Multimodal.sampleFrames(
          Multimodal.withBinaryPayload(Tables.documents(s, d)))
        .select(
          $"doc_id",
          size($"frame_offsets").as("n_frames"),
          element_at($"frame_offsets", -1).as("last_offset"))
        .orderBy($"doc_id")
    }),

    // Multimodal exact dedup: group identical binary payloads by md5 —
    // the content-hash tier of image/audio dedup (same hash-aggregate
    // shape as Dedup.exact, but over the BLOB, so it works for any
    // opaque media payload regardless of codec)
    "q56_mm_dedup" -> ((s, d) => {
      import s.implicits._
      Multimodal.withBinaryPayload(Tables.documents(s, d))
        .groupBy(md5($"payload").as("payload_md5"))
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
        .orderBy($"keep_id")
    }),

    // Multimodal resize: REAL header-decoded dims → bounded-box scaled
    // dims. Oracle-checked via the closed-form dims + plain double
    // scale math.
    "mm_resize" -> ((s, d) => {
      import s.implicits._
      Multimodal.resizeMeta(
          Multimodal.decodeMeta(
            Multimodal.synthImagePayload(Tables.documents(s, d))))
        .orderBy($"doc_id")
    }),

    // Multimodal decode: GENUINE PNG/JPEG headers synthesized with
    // closed-form dims (width = 1 + id mod 1021, height = 1 + 7·id
    // mod 997; every 13th payload deliberately malformed), then parsed
    // BACK by the real byte-level header decoder. The oracle replays
    // the closed form from doc_id alone — a parse bug (wrong offset,
    // endianness, marker walk) lands wrong dims and hash-mismatches;
    // malformed rows must land valid=false with zero dims.
    "mm_decode" -> ((s, d) => {
      import s.implicits._
      Multimodal.decodeMeta(
          Multimodal.synthImagePayload(Tables.documents(s, d)))
        .toDF()
        .orderBy($"doc_id")
    }),

    // Multimodal audio decode: GENUINE RIFF/WAVE headers synthesized
    // with closed-form geometry (sample rate / channels / bits /
    // frames from doc_id; every 13th payload truncated inside the fmt
    // chunk), then parsed BACK by the real chunk-walking WAV decoder.
    // The oracle replays the closed form from doc_id alone — a parse
    // bug (endianness, chunk walk, alignment, frame math) lands wrong
    // geometry and hash-mismatches.
    "mm_audio" -> ((s, d) => {
      import s.implicits._
      Multimodal.decodeAudioMeta(
          Multimodal.synthAudioPayload(Tables.documents(s, d)))
        .toDF()
        .orderBy($"doc_id")
    }),

    // Multimodal video decode: GENUINE MP4 (ISO BMFF) headers —
    // ftyp + moov/mvhd with closed-form timescale/duration from
    // doc_id (every 13th truncated inside moov) — parsed BACK by the
    // real box-walking decoder; duration_ms is exact long arithmetic.
    // The oracle replays the closed form from doc_id alone.
    "mm_video" -> ((s, d) => {
      import s.implicits._
      Multimodal.decodeVideoMeta(
          Multimodal.synthVideoPayload(Tables.documents(s, d)))
        .toDF()
        .orderBy($"doc_id")
    }),

    // Multimodal feature extraction: payload → pseudo-embedding, every
    // element milli-floored to integers. Oracle-checked: all 8 strided
    // rolling hashes replay in DuckDB (HUGEINT mod-2^64 + an explicit
    // float32 rounding step matching the Java (acc%1000)/1000.0f).
    "mm_features" -> ((s, d) => {
      import s.implicits._
      val milli = (k: Int) =>
        floor(element_at($"features", k + 1).cast("double") * 1000)
          .as(s"f${k}_milli")
      Multimodal.extractFeatures(
          Multimodal.withBinaryPayload(Tables.documents(s, d)))
        .select(($"doc_id" +: (0 until 8).map(milli)): _*)
        .orderBy($"doc_id")
    })
  )

  /** Shared DuckDB CTE for the real-header decode fixture: the
    * closed-form dims and payload sizes from doc_id alone (PNG synth =
    * 45 bytes, JPEG = 35, malformed = 10/22). Ends with a `dims`
    * relation (doc_id, media_type, n_bytes, width, height, valid). */
  private val decodeDimsCte: String =
    """WITH dims AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END
      |      AS media_type,
      |    CAST(CASE WHEN doc_id % 13 = 0 THEN
      |           CASE WHEN doc_id % 2 = 0 THEN 10 ELSE 22 END
      |         ELSE CASE WHEN doc_id % 2 = 0 THEN 45 ELSE 35 END
      |         END AS BIGINT) AS n_bytes,
      |    CAST(CASE WHEN doc_id % 13 = 0 THEN 0
      |         ELSE 1 + doc_id % 1021 END AS INT) AS width,
      |    CAST(CASE WHEN doc_id % 13 = 0 THEN 0
      |         ELSE 1 + (doc_id * 7) % 997 END AS INT) AS height,
      |    (doc_id % 13 <> 0) AS valid
      |  FROM documents)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q32_binary_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |      ELSE 'video' END AS media_type
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q33_registry_latest" ->
      """SELECT model, version, stage, created_at, metrics_mse,
        | artifact_path
        |FROM (VALUES
        | ('NetworkAnomalyDetector', 1, 'Archived', '2026-01-01T00:00:00', 0.6724),
        | ('NetworkAnomalyDetector', 2, 'Production', '2026-02-01T00:00:00', 0.6517),
        | ('NetworkAnomalyDetector', 3, 'Staging', '2026-03-01T00:00:00', 0.7001),
        | ('OtherModel', 9, 'Production', '2026-01-15T00:00:00', 0.1234))
        | AS t(model, version, stage, created_at, metrics_mse)
        |LEFT JOIN (VALUES
        | ('NetworkAnomalyDetector', 1, 'models/nad/v1'),
        | ('NetworkAnomalyDetector', 2, 'models/nad/v2'),
        | ('NetworkAnomalyDetector', 3, 'models/nad/v3'),
        | ('OtherModel', 9, 'models/other/v9'))
        | AS a(a_model, a_version, artifact_path)
        | ON model = a_model AND version = a_version
        |WHERE model = 'NetworkAnomalyDetector' AND stage = 'Production'
        |ORDER BY version DESC LIMIT 1""".stripMargin,
    "q39_frame_sample" ->
      """SELECT doc_id,
        | CAST(FLOOR((octet_length(encode(text)) - 1) / 100) + 1 AS INTEGER)
        |   AS n_frames,
        | CAST(FLOOR((octet_length(encode(text)) - 1) / 100) * 100 AS INTEGER)
        |   AS last_offset
        |FROM documents WHERE doc_id % 3 = 2
        |ORDER BY doc_id""".stripMargin,
    "q37_wide_projection" ->
      """SELECT flow_id, flow_duration, total_fwd_packets, label,
        | fin_flag_count
        |FROM (VALUES
        | ('f1', 100.0, 5.0, 'BENIGN', CAST(NULL AS DOUBLE)),
        | ('f2', 200.0, 6.0, 'DoS Hulk', CAST(NULL AS DOUBLE)),
        | ('f3', CAST(NULL AS DOUBLE), 7.0, CAST(NULL AS VARCHAR),
        |  CAST(NULL AS DOUBLE)))
        | AS t(flow_id, flow_duration, total_fwd_packets, label,
        |      fin_flag_count)
        |ORDER BY flow_id""".stripMargin,
    "q56_mm_dedup" ->
      """SELECT md5(text) AS payload_md5,
        | MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "q34_stream_batch" ->
      """SELECT CAST(FLOOR(epoch(ts)/300)*300 AS BIGINT) AS bucket_start,
        | CASE WHEN ((value-250.0)/100.0)*((value-250.0)/100.0) > 1.0
        |      THEN 'anomaly' ELSE 'normal' END AS prediction,
        | COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // The real header decode replayed from the closed form: the Spark
    // leg synthesizes genuine PNG/JPEG headers carrying these dims and
    // parses them back with byte-level IHDR/SOF reads — the oracle
    // needs only the arithmetic, so any parse defect (offset,
    // endianness, marker walk, malformed handling) hash-mismatches.
    "mm_decode" ->
      s"""$decodeDimsCte
        |SELECT doc_id, media_type, n_bytes, width, height, valid
        |FROM dims ORDER BY doc_id""".stripMargin,
    // Resize metadata derives entirely from the decoded dims: the same
    // CTE plus the aspect-preserving bound-box scale in plain double
    // math (identical IEEE semantics in both engines).
    "mm_resize" ->
      s"""$decodeDimsCte,
        |r AS (
        |  SELECT *, CASE WHEN NOT valid OR (width <= 256 AND height <= 256)
        |                 THEN 1.0 ELSE 256.0 / greatest(width, height)
        |            END AS scale
        |  FROM dims)
        |SELECT doc_id, media_type, width, height,
        |  CAST(floor(width * scale) AS INT) AS out_w,
        |  CAST(floor(height * scale) AS INT) AS out_h
        |FROM r ORDER BY doc_id""".stripMargin,
    // the WAV decode replayed from the closed form (geometry and the
    // 44 + frames·blockAlign byte count are pure doc_id arithmetic)
    "mm_audio" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    CAST(8000 + 100 * (doc_id % 441) AS INT) AS sr,
        |    CAST(1 + doc_id % 2 AS INT) AS ch,
        |    CAST(8 * (1 + doc_id % 3) AS INT) AS bi,
        |    CAST(doc_id % 50 AS BIGINT) AS fr,
        |    (doc_id % 13 <> 0) AS valid
        |  FROM documents)
        |SELECT doc_id, 'wav' AS format,
        |  CAST(CASE WHEN valid THEN 44 + fr * (ch * bi / 8)
        |       ELSE 20 END AS BIGINT) AS n_bytes,
        |  CASE WHEN valid THEN sr ELSE 0 END AS sample_rate,
        |  CASE WHEN valid THEN ch ELSE 0 END AS channels,
        |  CASE WHEN valid THEN bi ELSE 0 END AS bits,
        |  CAST(CASE WHEN valid THEN fr ELSE 0 END AS BIGINT) AS n_frames,
        |  valid
        |FROM g ORDER BY doc_id""".stripMargin,
    // the MP4 decode replayed from the closed form (the synthesized
    // header is 132 bytes; truncated = 40; duration_ms = exact
    // integer floor of duration*1000/timescale)
    "mm_video" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    CAST(1000 * (1 + doc_id % 5) AS INT) AS ts,
        |    CAST(doc_id * 37 % 100000 AS BIGINT) AS dur,
        |    (doc_id % 13 <> 0) AS valid
        |  FROM documents)
        |SELECT doc_id, 'mp4' AS format,
        |  CAST(CASE WHEN valid THEN 132 ELSE 40 END AS BIGINT) AS n_bytes,
        |  CASE WHEN valid THEN ts ELSE 0 END AS timescale,
        |  CAST(CASE WHEN valid THEN dur ELSE 0 END AS BIGINT) AS duration,
        |  CAST(CASE WHEN valid THEN (dur * 1000) // ts
        |       ELSE 0 END AS BIGINT) AS duration_ms,
        |  valid
        |FROM g ORDER BY doc_id""".stripMargin,
    // Same HUGEINT replay for the 8 strided feature hashes, plus an
    // explicit float32 rounding step: Java computes (acc%1000)/1000.0f
    // and Spark floors after a float→double widen — the CAST(... AS
    // FLOAT) reproduces exactly that rounding (a pure-double oracle is
    // off by one wherever the float repr crosses the floor boundary).
    "mm_features" -> {
      val hu = (0 until 8).map { k =>
        s"""list_reduce(list_prepend(CAST('1125899906842597' AS HUGEINT),
           |      list_transform(range(${k + 1}, length(text)+1, 8),
           |        i -> CAST(ord(substr(text, i, 1)) AS HUGEINT))),
           |    (acc, x) -> (acc * 31 + x)
           |      % CAST('18446744073709551616' AS HUGEINT)) AS hu$k"""
          .stripMargin
      }.mkString(",\n")
      val feats = (0 until 8).map { k =>
        s"""  CASE WHEN n_bytes = 0 THEN 0 ELSE CAST(floor(CAST(CAST(
           |    CAST((CASE WHEN hu$k >= CAST('9223372036854775808' AS HUGEINT)
           |               THEN hu$k - CAST('18446744073709551616' AS HUGEINT)
           |               ELSE hu$k END) % 1000 AS BIGINT) AS DOUBLE) / 1000.0
           |    AS FLOAT) * CAST(1000 AS DOUBLE)) AS BIGINT) END AS f${k}_milli"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH b AS (
         |  SELECT doc_id, text,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
         |  FROM documents),
         |h AS (SELECT doc_id, n_bytes,
         |$hu
         |FROM b)
         |SELECT doc_id,
         |$feats
         |FROM h ORDER BY doc_id""".stripMargin
    }
  )
}
