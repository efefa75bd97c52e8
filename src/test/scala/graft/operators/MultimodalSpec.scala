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

  test("decodeImage round-trips synthesized PNG and JPEG headers " +
    "across a dimension grid including the format limits") {
    for ((w, h) <- Seq((1, 1), (1, 65535), (65535, 1), (640, 480),
        (1021, 997), (256, 257))) {
      assert(Multimodal.decodeImage(Multimodal.pngPayload(w, h)) ===
        (("png", w, h, true)), s"png ${w}x$h")
      assert(Multimodal.decodeImage(Multimodal.jpegPayload(w, h)) ===
        (("jpeg", w, h, true)), s"jpeg ${w}x$h")
    }
    // PNG dims beyond the 2-byte JPEG limit exercise the 4-byte read
    assert(Multimodal.decodeImage(Multimodal.pngPayload(1 << 20, 3)) ===
      (("png", 1 << 20, 3, true)))
  }

  test("decodeImage finds the SOF through preceding segments and in " +
    "progressive (SOF2) streams") {
    val base = Multimodal.jpegPayload(800, 600)
    // splice a DQT segment (marker DB, 69 bytes) between APP0 and SOF0
    val dqt = Array(0xff, 0xdb, 0x00, 0x43).map(_.toByte) ++
      Array.fill(65)(0x01.toByte)
    val withDqt = base.take(20) ++ dqt ++ base.drop(20)
    assert(Multimodal.decodeImage(withDqt) === (("jpeg", 800, 600, true)))
    // progressive: same frame header under marker C2
    val sof2 = withDqt.clone()
    val sofAt = withDqt.indexOfSlice(Array(0xff.toByte, 0xc0.toByte), 2)
    sof2(sofAt + 1) = 0xc2.toByte
    assert(Multimodal.decodeImage(sof2) === (("jpeg", 800, 600, true)))
    // C4 (DHT) must NOT be mistaken for a SOF: replace the DQT marker
    // with DHT and the frame header still resolves from the later SOF0
    val withDht = withDqt.clone()
    withDht(21) = 0xc4.toByte
    assert(Multimodal.decodeImage(withDht) === (("jpeg", 800, 600, true)))
  }

  test("decodeImage lands valid=false on malformed payloads") {
    // truncated PNG (magic only), corrupt IHDR tag, JPEG without SOF,
    // truncated JPEG, wrong magic entirely, empty, null
    assert(Multimodal.decodeImage(Multimodal.pngPayload(9, 9).take(10)) ===
      (("png", 0, 0, false)))
    val badTag = Multimodal.pngPayload(9, 9).clone()
    badTag(12) = 'X'.toByte
    assert(Multimodal.decodeImage(badTag) === (("png", 0, 0, false)))
    val j = Multimodal.jpegPayload(9, 9)
    assert(Multimodal.decodeImage(j.take(20) ++ j.takeRight(2)) ===
      (("jpeg", 0, 0, false)))
    assert(Multimodal.decodeImage(j.take(24)) === (("jpeg", 0, 0, false)))
    assert(Multimodal.decodeImage("notanimage".getBytes("UTF-8")) ===
      (("unknown", 0, 0, false)))
    assert(Multimodal.decodeImage(Array.empty[Byte]) ===
      (("unknown", 0, 0, false)))
    assert(Multimodal.decodeImage(null) === (("unknown", 0, 0, false)))
  }

  test("decodeMeta parses the synthesized corpus: dims match the " +
    "closed form, every 13th payload is malformed") {
    val metas = Multimodal.decodeMeta(
        Multimodal.synthImagePayload(Tables.documents(spark, sf)))
      .collect().sortBy(_.doc_id)
    assert(metas.nonEmpty)
    metas.foreach { m =>
      val id = m.doc_id
      assert(m.media_type === (if (id % 2 == 0) "png" else "jpeg"), m)
      if (id % 13 == 0)
        assert(!m.valid && m.width === 0 && m.height === 0, m.toString)
      else
        assert(m.valid && m.width === (1 + id % 1021).toInt &&
          m.height === (1 + (id * 7) % 997).toInt, m.toString)
    }
  }

  test("decodeAudio round-trips synthesized WAV headers across a " +
    "geometry grid and walks extra RIFF chunks") {
    for ((sr, ch, bi, fr) <- Seq((8000, 1, 8, 0), (44100, 2, 16, 49),
        (52000, 1, 24, 1), (192000, 2, 32, 10))) {
      assert(Multimodal.decodeAudio(
        Multimodal.wavPayload(sr, ch, bi, fr)) ===
        (("wav", sr, ch, bi, fr.toLong, true)), s"$sr/$ch/$bi/$fr")
    }
    // a LIST chunk (odd length → word-aligned pad) before fmt must be
    // skipped, per RIFF
    val base = Multimodal.wavPayload(22050, 2, 16, 3)
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array.fill(5)('x'.toByte) ++
      Array[Byte](0) // pad byte for the odd length
    val withList = base.take(12) ++ list ++ base.drop(12)
    assert(Multimodal.decodeAudio(withList) ===
      (("wav", 22050, 2, 16, 3L, true)))
  }

  test("decodeAudio lands valid=false on malformed payloads") {
    val w = Multimodal.wavPayload(44100, 2, 16, 4)
    // truncated inside fmt; missing data chunk; data truncated; data
    // not a multiple of blockAlign; non-PCM format tag; wrong magic;
    // corrupt chunk length past the buffer; empty; null
    assert(Multimodal.decodeAudio(w.take(20)) ===
      (("wav", 0, 0, 0, 0L, false)))
    assert(Multimodal.decodeAudio(w.take(36)) ===
      (("wav", 0, 0, 0, 0L, false)))
    assert(Multimodal.decodeAudio(w.take(50)) ===
      (("wav", 0, 0, 0, 0L, false)))
    val oddData = w.clone(); oddData(40) = 3 // data len 3, align 4
    assert(Multimodal.decodeAudio(oddData) ===
      (("wav", 0, 0, 0, 0L, false)))
    val nonPcm = w.clone(); nonPcm(20) = 3 // IEEE float tag
    assert(Multimodal.decodeAudio(nonPcm) ===
      (("wav", 0, 0, 0, 0L, false)))
    assert(Multimodal.decodeAudio("RIFFxxxxAVI ".getBytes("US-ASCII")) ===
      (("unknown", 0, 0, 0, 0L, false)))
    val hugeLen = w.clone(); hugeLen(16) = 0xff.toByte
    hugeLen(17) = 0xff.toByte; hugeLen(18) = 0xff.toByte
    assert(Multimodal.decodeAudio(hugeLen) ===
      (("wav", 0, 0, 0, 0L, false)))
    assert(Multimodal.decodeAudio(Array.empty[Byte]) ===
      (("unknown", 0, 0, 0, 0L, false)))
    assert(Multimodal.decodeAudio(null) ===
      (("unknown", 0, 0, 0, 0L, false)))
  }

  test("decodeAudioMeta parses the synthesized corpus against the " +
    "closed form") {
    val metas = Multimodal.decodeAudioMeta(
        Multimodal.synthAudioPayload(Tables.documents(spark, sf)))
      .collect().sortBy(_.doc_id)
    assert(metas.nonEmpty)
    metas.foreach { m =>
      val id = m.doc_id
      if (id % 13 == 0) assert(!m.valid && m.sample_rate === 0, m.toString)
      else assert(m.valid &&
        m.sample_rate === (8000 + 100 * (id % 441)).toInt &&
        m.channels === (1 + id % 2).toInt &&
        m.bits === (8 * (1 + id % 3)).toInt &&
        m.n_frames === id % 50, m.toString)
    }
  }

  test("decodeVideo round-trips synthesized MP4 headers, follows " +
    "largesize boxes and the v1 mvhd layout") {
    for ((ts, dur) <- Seq((1000, 0L), (5000, 99999L), (600, 12345L),
        (48000, 0xfffffffeL)))
      assert(Multimodal.decodeVideo(Multimodal.mp4Payload(ts, dur)) ===
        (("mp4", ts, dur, true)), s"$ts/$dur")
    val base = Multimodal.mp4Payload(3000, 777L)
    // a free box between ftyp and moov is skipped
    val free = java.nio.ByteBuffer.allocate(12).putInt(12)
      .put("free".getBytes("US-ASCII")).putInt(0).array()
    val withFree = base.take(16) ++ free ++ base.drop(16)
    assert(Multimodal.decodeVideo(withFree) === (("mp4", 3000, 777L, true)))
    // moov as a 64-bit largesize box (size field 1 + BE64 largesize)
    val moovBody = base.slice(24, 132) // the mvhd box
    val big = java.nio.ByteBuffer.allocate(16 + moovBody.length)
    big.putInt(1).put("moov".getBytes("US-ASCII"))
      .putLong(16L + moovBody.length).put(moovBody)
    assert(Multimodal.decodeVideo(base.take(16) ++ big.array()) ===
      (("mp4", 3000, 777L, true)))
    // v1 mvhd: 64-bit times, timescale at +20, duration BE64 at +24
    val v1 = java.nio.ByteBuffer.allocate(16 + 8 + 8 + 120)
    v1.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0x200)
    v1.putInt(8 + 8 + 120).put("moov".getBytes("US-ASCII"))
    v1.putInt(8 + 120).put("mvhd".getBytes("US-ASCII"))
    v1.putInt(0x01000000)              // version 1
    v1.putLong(0L).putLong(0L)         // creation / modification
    v1.putInt(90000)                   // timescale
    v1.putLong(0x100000000L)           // duration past the 32-bit line
    assert(Multimodal.decodeVideo(v1.array()) ===
      (("mp4", 90000, 0x100000000L, true)))
  }

  test("decodeVideo lands valid=false on malformed payloads") {
    val m = Multimodal.mp4Payload(1000, 500L)
    // truncated inside moov; ftyp only (no moov); moov without mvhd;
    // zero timescale; corrupt box size; wrong magic; empty; null
    assert(Multimodal.decodeVideo(m.take(40)) === (("mp4", 0, 0L, false)))
    assert(Multimodal.decodeVideo(m.take(16)) === (("mp4", 0, 0L, false)))
    val noMvhd = m.clone()
    noMvhd(28) = 'f'; noMvhd(29) = 'r'; noMvhd(30) = 'e'; noMvhd(31) = 'e'
    assert(Multimodal.decodeVideo(noMvhd) === (("mp4", 0, 0L, false)))
    val zeroTs = Multimodal.mp4Payload(1, 500L)
    zeroTs(47) = 0 // timescale bytes 44..47 → 0
    assert(Multimodal.decodeVideo(zeroTs) === (("mp4", 0, 0L, false)))
    val badSize = m.clone(); badSize(16) = 0x7f.toByte // moov size huge
    assert(Multimodal.decodeVideo(badSize) === (("mp4", 0, 0L, false)))
    assert(Multimodal.decodeVideo("nothing like an mp4 here"
      .getBytes("UTF-8")) === (("unknown", 0, 0L, false)))
    assert(Multimodal.decodeVideo(Array.empty[Byte]) ===
      (("unknown", 0, 0L, false)))
    assert(Multimodal.decodeVideo(null) === (("unknown", 0, 0L, false)))
  }

  test("decodeVideoMeta parses the synthesized corpus against the " +
    "closed form") {
    val metas = Multimodal.decodeVideoMeta(
        Multimodal.synthVideoPayload(Tables.documents(spark, sf)))
      .collect().sortBy(_.doc_id)
    assert(metas.nonEmpty)
    metas.foreach { m =>
      val id = m.doc_id
      if (id % 13 == 0) assert(!m.valid && m.timescale === 0, m.toString)
      else {
        val ts = (1000 * (1 + id % 5)).toInt
        val dur = id * 37 % 100000
        assert(m.valid && m.timescale === ts && m.duration === dur &&
          m.duration_ms === dur * 1000L / ts, m.toString)
      }
    }
  }

  test("decode + features are deterministic across runs") {
    val payload = Multimodal.synthImagePayload(Tables.documents(spark, sf))
    def dims() = Multimodal.decodeMeta(payload).orderBy($"doc_id")
      .collect().map(m => (m.width, m.height)).toSeq
    assert(dims() == dims())
    val feats0 = Multimodal.extractFeatures(
      Multimodal.withBinaryPayload(Tables.documents(spark, sf)))
    def feats() = feats0.orderBy($"doc_id")
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
