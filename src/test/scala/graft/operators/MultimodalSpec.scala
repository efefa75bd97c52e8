package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.Tables
import graft.ops.ModelRegistry

class MultimodalSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sf

  test("binary payload preserves bytes; media type routes by id") {
    val out = Multimodal.withBinaryPayload(Tables.documents(spark, sf))
    val r = out.filter($"doc_id" === 0L).head()
    assert(r.getAs[String]("media_type") == "image")
    assert(out.filter($"doc_id" === 1L).head()
      .getAs[String]("media_type") == "audio")
    val docText = Tables.documents(spark, sf)
      .filter($"doc_id" === 0L).head().getAs[String]("text")
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == docText)
  }

  test("decodeMeta batches on executors and flags empty payloads") {
    val df = Seq(
      (1L, "x", "image"), (2L, "", "audio")).toDF("doc_id", "text", "mt")
      .select($"doc_id", encode($"text", "UTF-8").as("payload"),
        $"mt".as("media_type"))
    val metas = Multimodal.decodeMeta(df).collect().sortBy(_.doc_id)
    assert(metas(0).valid && metas(0).n_bytes == 1L)
    assert(!metas(1).valid && metas(1).width == 0)
  }

  test("decode + features are deterministic across runs") {
    val payload = Multimodal.withBinaryPayload(Tables.documents(spark, sf))
    def dims() = Multimodal.decodeMeta(payload).orderBy($"doc_id")
      .collect().map(m => (m.width, m.height)).toSeq
    assert(dims() == dims())
    def feats() = Multimodal.extractFeatures(payload).orderBy($"doc_id")
      .collect().map(_.getSeq[Float](1).toList).toSeq
    assert(feats() == feats())
  }

  test("resizeMeta scales into the bounding box, never upscales") {
    val metas = Seq(
      Multimodal.MediaMeta(1L, "image", 10L, 1024, 512, valid = true),
      Multimodal.MediaMeta(2L, "image", 10L, 100, 50, valid = true),
      Multimodal.MediaMeta(3L, "image", 0L, 0, 0, valid = false)).toDS()
    val out = Multimodal.resizeMeta(metas, maxSide = 256)
      .orderBy($"doc_id").collect()
    // downscale: long side → 256, aspect preserved
    assert(out(0).getAs[Int]("out_w") === 256)
    assert(out(0).getAs[Int]("out_h") === 128)
    // small images untouched
    assert(out(1).getAs[Int]("out_w") === 100)
    assert(out(1).getAs[Int]("out_h") === 50)
    // invalid rows pass through with zero dims
    assert(out(2).getAs[Int]("out_w") === 0)
  }

  test("frame sampling only touches video payloads") {
    val out = Multimodal.sampleFrames(
      Multimodal.withBinaryPayload(Tables.documents(spark, sf)))
    val ids = out.select($"doc_id").as[Long].collect()
    assert(ids.nonEmpty && ids.forall(_ % 3 == 2))
    val first = out.head()
    val offsets = first.getSeq[Int](first.fieldIndex("frame_offsets"))
    assert(offsets.head == 0 && offsets.forall(_ % 100 == 0))
  }
}

class ModelRegistrySpec extends AnyFunSuite {
  val spark = TestSpark.spark

  val fixture = Seq(
    ModelRegistry.ModelVersion("m", 1, "Production", "2026-01-01", 0.5),
    ModelRegistry.ModelVersion("m", 2, "Staging", "2026-02-01", 0.4))

  test("latest returns the highest version in the stage") {
    val reg = ModelRegistry.table(spark, fixture)
    val r = ModelRegistry.latest(reg, "m", "Production").head()
    assert(r.getAs[Int]("version") == 1)
  }

  test("transition promotes and archives the previous holder") {
    val reg = ModelRegistry.table(spark, fixture)
    val after = ModelRegistry.transition(reg, "m", 2, "Production")
    val stages = after.collect()
      .map(r => r.getAs[Int]("version") -> r.getAs[String]("stage")).toMap
    assert(stages(2) == "Production")
    assert(stages(1) == "Archived")
    val latest = ModelRegistry.latest(after, "m", "Production").head()
    assert(latest.getAs[Int]("version") == 2)
  }
}
