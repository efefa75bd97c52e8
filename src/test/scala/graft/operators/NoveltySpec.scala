package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class NoveltySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], n: Int = 3,
                  keyMode: String = "string"): Map[Long, (Long, Long, Long)] =
    Novelty.gramNovelty(rows.toDF("doc_id", "text"), "doc_id", "text",
        n, keyMode)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("hand-computed novelty: first carrier wins, repeats are seen") {
    val got = run(Seq(
      1L -> "a b c d",  // grams {a b c, b c d}: both first here
      2L -> "a b c x",  // {a b c (seen), b c x (new)}
      3L -> "a b c d",  // exact copy of 1: both grams seen
      4L -> "zz",       // under-n: one whole-text shingle, first
      5L -> "zz"))      // short repeat: seen
    assert(got(1L) === ((2L, 0L, 10000L)))
    assert(got(2L) === ((2L, 1L, 5000L)))
    assert(got(3L) === ((2L, 2L, 0L)))
    assert(got(4L) === ((1L, 0L, 10000L)))
    assert(got(5L) === ((1L, 1L, 0L)))
  }

  test("gram TYPES, not occurrences: in-doc repetition does not dilute") {
    // "a b a b a b" trigrams: {a b a, b a b} each appearing twice as
    // occurrences but once as a type
    val got = run(Seq(1L -> "a b a b a b"))
    assert(got(1L) === ((2L, 0L, 10000L)))
  }

  test("every input document gets a row (blank text included)") {
    val docs = Seq(1L -> "", 2L -> "x y z", 3L -> "   ")
    val got = run(docs)
    assert(got.keySet === Set(1L, 2L, 3L))
    // blank docs share the '' whole-text shingle: 1 first, 3 seen
    assert(got(1L)._3 === 10000L)
    assert(got(3L)._3 === 0L)
  }

  test("fingerprint tiers agree with the string baseline on the fixture") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val base = Novelty.gramNovelty(docs, "doc_id", "text", 3, "string")
    for (mode <- Seq("md5", "xxhash64")) {
      val t = Novelty.gramNovelty(docs, "doc_id", "text", 3, mode)
      assert(t.exceptAll(base).count() === 0L, s"$mode != string")
      assert(base.exceptAll(t).count() === 0L, s"string != $mode")
    }
  }

  test("incrementalNovelty: corpus hits and in-batch order both count as seen") {
    val corpus = Seq(1L -> "a b c d").toDF("doc_id", "text")
    val idx = Novelty.gramIndex(corpus, "doc_id", "text", n = 3,
      keyMode = "string")
    val batch = Seq(
      10L -> "a b c d",   // exact re-crawl: both grams in corpus → 0
      11L -> "x y z w",   // all new → 10000
      12L -> "x y z q")   // {x y z} seen via batch doc 11; {y z q} new
      .toDF("doc_id", "text")
    val got = Novelty.incrementalNovelty(batch, "doc_id", "text", idx,
        n = 3, keyMode = "string")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(10L) === ((2L, 2L, 0L)))
    assert(got(11L) === ((2L, 0L, 10000L)))
    assert(got(12L) === ((2L, 1L, 5000L)))
  }

  test("gram index round-trips metadata; mismatched probes fail loudly") {
    val corpus = Seq(1L -> "a b c d").toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("gram_idx").toString + "/idx"
    Novelty.gramIndex(corpus, "doc_id", "text", n = 3, keyMode = "md5")
      .write.parquet(dir)
    val loaded = spark.read.parquet(dir)
    val batch = Seq(2L -> "a b c d").toDF("doc_id", "text")
    // matching params probe cleanly through the parquet round trip
    val ok = Novelty.incrementalNovelty(batch, "doc_id", "text", loaded,
      n = 3, keyMode = "md5").head()
    assert(ok.getLong(3) === 0L)
    // a mismatched probe must refuse, not silently miss candidates
    val e = intercept[IllegalArgumentException] {
      Novelty.incrementalNovelty(batch, "doc_id", "text", loaded,
        n = 4, keyMode = "md5")
    }
    assert(e.getMessage.contains("rebuild"), e.getMessage)
    intercept[IllegalArgumentException] {
      Novelty.incrementalNovelty(batch, "doc_id", "text",
        loaded.select(($"gk" * 1).as("gk"), $"first_id"),
        n = 3, keyMode = "md5")
    }
  }

  test("rejects bad arguments loudly") {
    intercept[IllegalArgumentException] {
      run(Seq(1L -> "a"), n = 0)
    }
    intercept[IllegalArgumentException] {
      run(Seq(1L -> "a"), keyMode = "crc32")
    }
  }
}
