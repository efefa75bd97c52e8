package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CollocationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // tokens: a=3 b=2 new=2 york=2 c=1 -> T1 = 10
  // bigrams: (a,b)=2 (b,a)=2 (new,york)=2 -> T2 = 6
  private def fixture = Seq(
    (1L, "a b a b a"),
    (2L, "new york"),
    (3L, "new york"),
    (4L, "c")
  ).toDF("doc_id", "text")

  /** Same double chain as the operator: ((c2/T2)·(T1/c1a))·(T1/c1b). */
  private def lift(c2: Long, c1a: Long, c1b: Long,
                   t1: Long, t2: Long): Long = {
    val v = ((c2.toDouble / t2.toDouble) * (t1.toDouble / c1a.toDouble)) *
      (t1.toDouble / c1b.toDouble)
    math.floor(v * 10000.0).toLong
  }

  test("planted collocation ranks first with the hand-computed lift") {
    val rows = Vocab.collocations(fixture, "text", minCount = 2L,
        topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.toSeq === Seq(
      ("new", "york", 2L, lift(2L, 2L, 2L, 10L, 6L)),
      ("a", "b", 2L, lift(2L, 3L, 2L, 10L, 6L)),
      ("b", "a", 2L, lift(2L, 2L, 3L, 10L, 6L))))
    // the dedicated-pair collocation beats the mixed-usage pairs
    assert(rows(0)._4 > rows(1)._4)
    // tie between (a,b) and (b,a) breaks on the (a, b) ordering
    assert(rows(1)._4 === rows(2)._4)
  }

  test("minCount prunes the rare-pair tail before scoring") {
    assert(Vocab.collocations(fixture, "text", minCount = 3L).count() === 0)
  }

  test("input validation") {
    intercept[IllegalArgumentException] {
      Vocab.collocations(fixture, "text", minCount = 0L)
    }
    intercept[IllegalArgumentException] {
      Vocab.collocations(fixture, "text", topK = 0)
    }
  }
}
