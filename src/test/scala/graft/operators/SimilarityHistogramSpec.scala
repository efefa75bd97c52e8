package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SimilarityHistogramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    1L -> "a b c d",  // {a b c, b c d}
    2L -> "a b c d",  // exact copy of 1 → jaccard 10000 vs 1
    3L -> "a b c x",  // {a b c, b c x} → 1/3 vs both → 3333
    4L -> "z z z q")  // {z z z, z z q} → shares nothing
    .toDF("doc_id", "text")

  private def hist(binBp: Int = 500, maxDf: Int = 1000)
      : Map[Long, (Long, Long)] =
    Dedup.similarityHistogram(docs, "doc_id", "text", shingleN = 3,
        binBp = binBp, maxDf = maxDf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("hand-computed bins and top-down cumulative") {
    // pairs: (1,2) jbp 10000 → top bin 9500; (1,3) and (2,3) jbp 3333
    // → bin 3000; doc 4 pairs with nobody
    val got = hist()
    assert(got === Map(9500L -> ((1L, 1L)), 3000L -> ((2L, 3L))))
  }

  test("exact duplicates land in the top bin, not a bin of their own") {
    val got = hist(binBp = 1000)
    assert(got.contains(9000L) && got(9000L)._1 === 1L)
    assert(!got.contains(10000L))
  }

  test("maxDf cap drops common-phrase blocks and dilutes, by design") {
    // 'a b c' has df 3 > 2 → its block vanishes: (1,3)/(2,3) lose
    // their only shared shingle (no pair at all), (1,2) keep 'b c d'
    // (df 2) but inter drops to 1 while sizes stay full → union
    // 2+2−1 = 3 → jbp 3333: the cap dilutes capped pairs DOWNWARD,
    // never up, so bins above the dilution floor stay trustworthy
    val got = hist(maxDf = 2)
    assert(got === Map(3000L -> ((1L, 1L))))
  }

  test("a corpus with no sharing yields an empty histogram") {
    val lonely = Seq(1L -> "p q r s", 2L -> "t u v w")
      .toDF("doc_id", "text")
    assert(Dedup.similarityHistogram(lonely, "doc_id", "text")
      .count() === 0L)
  }

  test("binBp must divide 10000") {
    intercept[IllegalArgumentException] {
      Dedup.similarityHistogram(docs, "doc_id", "text", binBp = 300)
    }
  }
}
