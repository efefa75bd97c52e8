package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ParagraphDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = Seq(
    (1L, "intro text one\n\nBOILER\n\nunique a"),
    (2L, "BOILER\n\nunique b\n\nBOILER"),
    (3L, "   \n\nunique c"),
    (4L, "")
  ).toDF("doc_id", "text")

  private def run(keyMode: String = "xx") =
    Dedup.paragraphDedup(fixture, "doc_id", "text", keyMode = keyMode)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap

  test("shared boilerplate survives only in its first carrier; " +
    "in-doc repeats collapse; order is preserved") {
    val m = run()
    assert(m(1L) === (("intro text one\nBOILER\nunique a", 3L, 0L)))
    assert(m(2L) === (("unique b", 3L, 2L)))
  }

  test("removeRepeatedChunks: INTRA-doc first occurrence survives, " +
    "cross-doc repeats untouched, order preserved") {
    val docs = Seq(
      // chunks (k=2): [a b][c d][a b][e f] -> third drops
      (1L, "a b c d a b e f"),
      // the same chunk in ANOTHER doc is not intra-doc repetition
      (2L, "a b x y"),
      // short tail chunk equals nothing; doc untouched
      (3L, "p q r"),
      (4L, ""),
      // tail chunk [z] equals no full chunk [z z]
      (5L, "z z z")
    ).toDF("doc_id", "text")
    val m = Dedup.removeRepeatedChunks(docs, "doc_id", "text",
        chunkTokens = 2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(m(1L) === (("a b c d e f", 4L, 1L)))
    assert(m(2L) === (("a b x y", 2L, 0L)))
    assert(m(3L) === (("p q r", 2L, 0L)))
    assert(m(4L) === (("", 0L, 0L)))
    assert(m(5L) === (("z z z", 2L, 0L)))
  }

  test("removeRepeatedChunks: null text behaves as an empty doc; " +
    "chunkTokens < 1 refuses loudly") {
    val docs = Seq((1L, null: String), (2L, "a b"))
      .toDF("doc_id", "text")
    val m = Dedup.removeRepeatedChunks(docs, "doc_id", "text",
        chunkTokens = 2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(m(1L) === (("", 0L, 0L)), "the paragraphDedup empty contract")
    assert(m(2L) === (("a b", 1L, 0L)))
    val e = intercept[IllegalArgumentException] {
      Dedup.removeRepeatedChunks(docs, "doc_id", "text", chunkTokens = 0)
    }
    assert(e.getMessage.contains("chunkTokens"))
  }

  test("removeRepeatedChunks collapses a fully doubled doc to one copy " +
    "when chunks align") {
    val docs = Seq((1L, "w1 w2 w3 w4 w5 w6 w7 w8 " * 2)).toDF("doc_id", "text")
    val r = Dedup.removeRepeatedChunks(docs, "doc_id", "text",
      chunkTokens = 4).collect()(0)
    assert(r.getString(1) === "w1 w2 w3 w4 w5 w6 w7 w8")
    assert(r.getLong(2) === 4L && r.getLong(3) === 2L)
  }

  test("removeRepeatedChunks kernel == staged HOF twin on a randomized " +
    "corpus (bit-equal clean_text / n_chunks / n_removed)") {
    // small vocab + varied lengths force both repeat-heavy and
    // repeat-free docs through every chunk-boundary case
    val rnd = new scala.util.Random(20250815L)
    val docs = (1L to 120L).map { id =>
      val n = rnd.nextInt(40)
      val words = Seq.fill(n)(s"w${rnd.nextInt(6)}")
      (id, words.mkString(" "))
    }.toDF("doc_id", "text")
    for (k <- Seq(1, 2, 3, 5)) {
      val kernel = Dedup.removeRepeatedChunks(docs, "doc_id", "text", k)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      val staged = Dedup.removeRepeatedChunksStaged(docs, "doc_id", "text", k)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(kernel === staged, s"chunkTokens=$k")
    }
  }

  test("whitespace-only paragraphs are dropped before counting; " +
    "paragraph-less docs keep a row with empty text") {
    val m = run()
    assert(m(3L) === (("unique c", 1L, 0L)))
    assert(m(4L) === (("", 0L, 0L)))
  }

  test("md5 certification tier agrees with the xxhash64 production tier") {
    assert(run("md5") === run("xx"))
  }

  test("custom split regex and rejoin delimiter") {
    val df = Seq((1L, "a|b|a"), (2L, "b|c")).toDF("doc_id", "text")
    val m = Dedup.paragraphDedup(df, "doc_id", "text",
        splitRegex = "\\|", delim = "|").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(m(1L) === (("a|b", 3L, 1L)))
    assert(m(2L) === (("c", 2L, 1L)))
  }

  test("first-carrier runs as a partial-aggregating groupBy, not a " +
    "window (viral fingerprints reduce map-side; no group buffering)") {
    val plan = Dedup.paragraphDedup(fixture, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"first-carrier must be an aggregate, not a window:\n$plan")
    assert(!plan.contains("SinglePartition") || !plan.contains("Sort "),
      s"no global sort in the paragraph plan:\n$plan")
  }

  test("result is partition-invariant (first-carrier is a pure " +
    "function of (fingerprint, id, pos))") {
    val base = Dedup.paragraphDedup(fixture, "doc_id", "text")
      .collect().sortBy(_.getLong(0)).toSeq
    for (parts <- Seq(1, 3, 7)) {
      val re = Dedup.paragraphDedup(fixture.repartition(parts),
        "doc_id", "text").collect().sortBy(_.getLong(0)).toSeq
      assert(re === base, s"parts=$parts")
    }
  }

  test("non-numeric id refuses loudly") {
    val df = Seq(("x", "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.paragraphDedup(df, "doc_id", "text")
    }
  }
}
