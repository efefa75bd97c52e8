package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sketch tier's contract is EXACTNESS of the final answer: the
  * sketch only prunes work, never changes results. */
class SketchesSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  test("heavy hitters equal the full groupBy answer") {
    val docs = (
      (1 to 300).map(i => (i.toLong, "alpha beta common")) ++
      (301 to 320).map(i => (i.toLong, s"rare$i beta gamma")) ++
      Seq((400L, ""), (401L, "   "))
    ).toDF("doc_id", "text")
    val threshold = 100L
    val got = Sketches.heavyHitterTokens(docs, "text", threshold)
      .orderBy($"tok").collect().map(r => (r.getString(0), r.getLong(1)))
    val expect = docs
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("n"))
      .filter($"n" >= threshold)
      .orderBy($"tok").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === expect.toSeq)
    assert(got.map(_._1).toSet === Set("alpha", "beta", "common"))
  }

  test("share-based threshold is ceil(phi * total tokens)") {
    val docs = (1 to 100).map(i =>
      (i.toLong, if (i <= 60) "hot word" else "cold")).toDF("doc_id", "text")
    // 160 tokens total; phi=0.3 -> threshold 48: only "hot"/"word" (60)
    val got = Sketches.heavyHitterTokensByShare(docs, "text", phi = 0.3)
      .orderBy($"tok").collect().map(_.getString(0))
    assert(got.toSeq === Seq("hot", "word"))
  }

  test("bloom join equals the plain join") {
    val big = (1L to 5000L).map(k => (k, s"v$k")).toDF("k", "payload")
    val small = (1L to 5000L by 7).map(k => (k, k * 2)).toDF("sk", "w")
    val got = Sketches.bloomJoin(big, small, "k", "sk", expectedKeys = 1000L)
      .select($"k", $"payload", $"w").orderBy($"k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = big.join(small, $"k" === $"sk")
      .select($"k", $"payload", $"w").orderBy($"k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === expect.toSeq)
    assert(got.nonEmpty)
  }

  test("bloom join dispatches on key type: string keys work too") {
    val big = (1 to 3000).map(i => (s"key$i", i)).toDF("k", "n")
    val small = (1 to 3000 by 11).map(i => (s"key$i", i * 10)).toDF("sk", "w")
    val got = Sketches.bloomJoin(big, small, "k", "sk", expectedKeys = 500L)
      .select($"k", $"n", $"w").orderBy($"n")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    val expect = big.join(small, $"k" === $"sk")
      .select($"k", $"n", $"w").orderBy($"n")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(got.toSeq === expect.toSeq)
    assert(got.nonEmpty)
    // int keys cast through the long probe
    val bigI = (1 to 500).map(i => (i, s"p$i")).toDF("k", "p")
    val smallI = (1 to 500 by 9).map(i => (i, i)).toDF("sk", "w")
    assert(Sketches.bloomJoin(bigI, smallI, "k", "sk", 100L).count() ===
      bigI.join(smallI, $"k" === $"sk").count())
    // unsupported types fail loudly, not by pruning every row
    val bigD = Seq((1.5, "x")).toDF("k", "p")
    assertThrows[IllegalArgumentException] {
      Sketches.bloomJoin(bigD, smallI, "k", "sk", 10L)
    }
  }

  test("bloom prefilter passes every true key (no false negatives)") {
    val keys = (1L to 2000L by 3).toArray
    val small = keys.toSeq.toDF("sk")
    val bf = small.stat.bloomFilter("sk", 1000L, 0.01)
    keys.foreach(k => assert(bf.mightContainLong(k)))
  }
}
