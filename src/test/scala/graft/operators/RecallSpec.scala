package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("recallAtK: hand-computed overlaps, zero-hit queries kept") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 20L), (2L, 21L), (3L, 30L)).toDF("q", "n")
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L),
      (2L, 77L), (2L, 78L)).toDF("q", "n")
    val got = Similarity.recallAtK(approx, exact, "q", "n")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((4L, 2L, 5000L)))
    assert(got(2L) === ((2L, 0L, 0L)))
    assert(got(3L) === ((1L, 0L, 0L)),
      "a query the approx tier never answered still reports")
  }

  test("quantRecallReport: lossless quantization gives recall 10000") {
    // vectors whose components are exact multiples of max/127 quantize
    // without error → both rankings identical
    val rnd = new java.util.Random(5L)
    val vecs = (0L until 40L).map { i =>
      val raw = Array.fill(8)((rnd.nextInt(255) - 127).toDouble)
      (i, raw.map(_ / 127.0 * 2.5))
    }.toDF("vec_id", "embedding")
    val got = Similarity.quantRecallReport(vecs, "vec_id", "embedding",
        queryIds = Seq(0L, 5L), k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(0L -> 10000L, 5L -> 10000L))
  }

  test("quantRecallReport: one row per query, recall in [0, 10000], " +
    "and heavy distortion is visible") {
    val rnd = new java.util.Random(11L)
    // a shared dominant component makes all cosines cluster tightly
    // (ranking decided by the noise tail), while the outlier coarsens
    // the int8 scale so that very tail quantizes to few levels —
    // distortion must reshuffle some top-10 membership
    val vecs = (0L until 60L).map { i =>
      val raw = Array.fill(16)(rnd.nextGaussian())
      raw(0) = 100.0
      (i, raw)
    }.toDF("vec_id", "embedding")
    val rows = Similarity.quantRecallReport(vecs, "vec_id", "embedding",
        queryIds = Seq(1L, 2L, 3L), k = 10).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 10000L)
      assert(r.getLong(1) === 10L)
    }
    assert(rows.exists(_.getLong(3) < 10000L),
      "coarse quantization must cost some recall here")
  }
}
