package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches on
  * the executors.
  *
  * The decode/feature-extraction kernels are STUBS (deterministic fakes
  * derived from the bytes) — the image/audio codec libraries are not in
  * this container. The Spark-side contract is real and tested: schema,
  * batch iteration shape (mapPartitions = one JVM-side batch per
  * partition, the Scala analogue of a pandas-UDF batch), partitioning
  * behavior, and null/empty payload handling. Swapping a stub for a real
  * codec changes only the function body, nothing in the plan.
  */
object Multimodal {

  /** Media metadata produced by the (stub) decoder. */
  final case class MediaMeta(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      valid: Boolean)

  /** Attach a fake binary payload + media type to the documents fixture
    * (the fixtures carry no real media; UTF-8 text bytes stand in as the
    * opaque payload). */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(
        typedlit(Seq("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"))

  /** STUB image decode: deterministic pseudo-dimensions from the payload
    * bytes. A real implementation would parse the codec header here; the
    * rest of the pipeline (batching, schema, null safety) is identical. */
  private def decodeStub(mediaType: String, payload: Array[Byte]): (Int, Int) =
    if (payload == null || payload.isEmpty) (0, 0)
    else {
      val h = payload.foldLeft(17L)((acc, b) => acc * 31 + (b & 0xff))
      val w = 64 + math.abs(h % 1024).toInt
      (w, 64 + math.abs((h / 1024) % 1024).toInt)
    }

  /** Decode metadata in executor-side batches (mapPartitions). Output is
    * a typed Dataset — downstream joins/aggregations stay columnar. */
  def decodeMeta(withPayload: DataFrame): Dataset[MediaMeta] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col("doc_id").cast("long"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mt, bytes) =>
          val (w, h) = decodeStub(mt, bytes)
          MediaMeta(id, mt, if (bytes == null) 0L else bytes.length.toLong,
            w, h, valid = bytes != null && bytes.nonEmpty)
        }
      }
  }

  /** STUB feature extraction: deterministic pseudo-embedding (dim 8) from
    * payload bytes — the plumbing for decode→embed→ANN over media. */
  def extractFeatures(withPayload: DataFrame, dim: Int = 8): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val vec = Array.tabulate(dim) { i =>
            if (bytes == null || bytes.isEmpty) 0.0f
            else {
              var acc = 1125899906842597L
              var j = i
              while (j < bytes.length) { acc = acc * 31 + bytes(j); j += dim }
              (acc % 1000) / 1000.0f
            }
          }
          (id, vec)
        }
      }
      .toDF("doc_id", "features")
  }

  /** STUB resize: recompute target dimensions preserving aspect ratio
    * against a bounding box — the metadata half of an image resize (a
    * real implementation would also re-encode the payload; the
    * dimension math, schema, and null handling are the Spark-side
    * contract). Output: doc_id, (w,h) → (out_w,out_h) scaled to fit
    * `maxSide`, never upscaled. */
  def resizeMeta(decoded: Dataset[MediaMeta], maxSide: Int = 256): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.toDF()
      .withColumn("scale",
        when(!col("valid") || (col("width") <= maxSide &&
            col("height") <= maxSide), lit(1.0))
          .otherwise(lit(maxSide.toDouble) /
            greatest(col("width"), col("height"))))
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        floor(col("width") * col("scale")).cast("int").as("out_w"),
        floor(col("height") * col("scale")).cast("int").as("out_h"))
  }

  /** STUB frame sampling for video payloads: every `stride`-th byte
    * offset stands in for a frame timestamp. */
  def sampleFrames(withPayload: DataFrame, stride: Int = 100): DataFrame =
    withPayload
      .filter(col("media_type") === "video")
      .select(col("doc_id"),
        sequence(lit(0), greatest(length(col("payload")) - 1, lit(0)),
          lit(stride)).as("frame_offsets"))
}
