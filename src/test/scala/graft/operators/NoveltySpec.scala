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

  test("rejects bad arguments loudly") {
    intercept[IllegalArgumentException] {
      run(Seq(1L -> "a"), n = 0)
    }
    intercept[IllegalArgumentException] {
      run(Seq(1L -> "a"), keyMode = "crc32")
    }
  }
}
