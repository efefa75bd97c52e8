package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{Dedup, Similarity}

/** End-to-end ingest screening: a settled corpus persists its
  * signature index to parquet ONCE; micro-batches arriving on a stream
  * are screened against the STORED index inside foreachBatch. Pins
  * (a) cross-batch flagging against the settled corpus, (b) that novel
  * content passes unflagged, and (c) that the signature-parameter
  * metadata survives the parquet round trip (the stream would fail the
  * contract check otherwise). */
class StreamingIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("minhash ingest flags settled-corpus near-dups across micro-batches") {
    implicit val sc = spark.sqlContext
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "completely different settled document about spark shuffles"),
      (3L, "a third settled text with its own distinct token stream"))
      .toDF("doc_id", "text")
    val idxDir = tmp("ingest_sig")
    Dedup.minhashSignatures(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(idxDir)
    val corpusSig = spark.read.parquet(idxDir)

    val stream = MemoryStream[(Long, String)]
    val sink = new StreamPipeline.CollectingSink
    val q = StreamingIngest.nearDupIngest(
      stream.toDS().toDF("doc_id", "text"), "doc_id", "text",
      corpusSig, tmp("ingest_ckpt"), sink)
    try {
      // batch 1: one exact copy of doc 1 + one novel doc
      stream.addData(
        (100L, "the quick brown fox jumps over the lazy dog near the river"),
        (101L, "novel crawl content sharing no shingles with anything"))
      q.processAllAvailable()
      // batch 2: a copy of doc 2 — state-free screening must still
      // flag it against the same stored index
      stream.addData(
        (200L, "completely different settled document about spark shuffles"),
        (201L, "yet more genuinely new text arriving on the wire"))
      q.processAllAvailable()
    } finally q.stop()

    val flagged = sink.batches.synchronized {
      sink.batches.flatMap(_.map(r => (r.getLong(0), r.getLong(1)))).toSet
    }
    assert(flagged === Set((100L, 1L), (200L, 2L)),
      s"expected exactly the planted copies flagged, got $flagged")
  }

  test("ingest restart from checkpoint does not rescreen committed batches") {
    implicit val sc = spark.sqlContext
    val corpus = Seq(
      (1L, "a settled corpus document that the batch copies verbatim"),
      (2L, "other settled content"))
      .toDF("doc_id", "text")
    val idxDir = tmp("ingest_rs_sig")
    Dedup.minhashSignatures(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(idxDir)
    val corpusSig = spark.read.parquet(idxDir)
    val ckpt = tmp("ingest_rs_ckpt")
    val stream = MemoryStream[(Long, String)]
    val sink = new StreamPipeline.CollectingSink
    val q1 = StreamingIngest.nearDupIngest(
      stream.toDS().toDF("doc_id", "text"), "doc_id", "text",
      corpusSig, ckpt, sink)
    stream.addData(
      (100L, "a settled corpus document that the batch copies verbatim"))
    q1.processAllAvailable()
    q1.stop()
    val afterFirst = sink.totalRows
    assert(afterFirst === 1, "the planted copy must be flagged once")
    // restart on the SAME checkpoint + source: the committed batch must
    // not be rescreened (ST2/ST3 — offsets resume past it)
    val q2 = StreamingIngest.nearDupIngest(
      stream.toDS().toDF("doc_id", "text"), "doc_id", "text",
      corpusSig, ckpt, sink)
    q2.processAllAvailable()
    q2.stop()
    assert(sink.totalRows === afterFirst,
      "restart must not re-emit the committed batch's flagged pairs")
  }

  test("embedding ingest flags settled-corpus near-dups from the stored index") {
    implicit val sc = spark.sqlContext
    import graft.functions.VectorFunctions.asDouble
    val rnd = new java.util.Random(29L)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    val corpusRows = (0L until 40L).map(i => (i, vec()))
    val corpus = corpusRows.toDF("vec_id", "embedding")
    val sigDir = tmp("ingest_esig")
    val vecDir = tmp("ingest_evec")
    Similarity.embeddingSignatures(corpus, "vec_id", "embedding", dim = 16)
      .write.mode("overwrite").parquet(sigDir)
    corpus.select($"vec_id".cast("long").as("id"),
        asDouble($"embedding").as("vec"))
      .write.mode("overwrite").parquet(vecDir)
    val corpusSig = spark.read.parquet(sigDir)
    val corpusVecs = spark.read.parquet(vecDir)

    val stream = MemoryStream[(Long, Array[Float])]
    val sink = new StreamPipeline.CollectingSink
    val q = StreamingIngest.embeddingNearDupIngest(
      stream.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding",
      corpusSig, corpusVecs, threshold = 0.99, dim = 16,
      tmp("ingest_eckpt"), sink)
    try {
      // batch 1: a tiny perturbation of corpus vector 7 + a novel vector
      stream.addData(
        (100L, corpusRows(7)._2.map(x => (x + rnd.nextGaussian() * 0.003).toFloat)),
        (101L, vec()))
      q.processAllAvailable()
      // batch 2: a perturbation of corpus vector 21 + another novel one
      stream.addData(
        (200L, corpusRows(21)._2.map(x => (x + rnd.nextGaussian() * 0.003).toFloat)),
        (201L, vec()))
      q.processAllAvailable()
    } finally q.stop()

    val flagged = sink.batches.synchronized {
      sink.batches.flatMap(_.map(r => (r.getLong(0), r.getLong(1)))).toSet
    }
    assert(flagged === Set((100L, 7L), (200L, 21L)),
      s"expected exactly the planted near-copies flagged, got $flagged")
  }
}
