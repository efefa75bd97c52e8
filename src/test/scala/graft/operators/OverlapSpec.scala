package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class OverlapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // srcA: trigrams {a b c, b c d}; srcB shares exactly {b c d} (plus
  // {c d e}); srcC shares nothing with either.
  private def docs = Seq(
    (1L, "srcA", "a b c d"),
    (2L, "srcB", "b c d e"),
    (3L, "srcC", "p q r s")
  ).toDF("doc_id", "source", "text")

  test("overlap matrix: shared trigram types, jaccard_bp, sparse pairs") {
    val out = Overlap.sourceOverlap(docs, "source", "text", n = 3)
      .orderBy($"source_a", $"source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // A∩B = {b c d}: 1 shared of (2+2-1)=3 union types → 3333 bp;
    // pairs with srcC share nothing and are absent
    assert(out.toSeq == Seq(("srcA", "srcB", 1L, 2L, 2L, 3333L)))
  }

  test("repeated shingles within a source count once (type semantics)") {
    val rep = Seq(
      (1L, "s1", "a b c"),
      (2L, "s1", "a b c"),   // same trigram again in s1
      (3L, "s2", "a b c")
    ).toDF("doc_id", "source", "text")
    val out = Overlap.sourceOverlap(rep, "source", "text", n = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(5)))
    assert(out.toSeq == Seq(("s1", "s2", 1L, 10000L)))
  }

  test("fingerprinted keys (xxhash64 AND md5) reproduce the string matrix") {
    val docs = graft.core.Tables.documents(spark, graft.TestSpark.sf)
    val exact = Overlap.sourceOverlap(docs, "source", "text", n = 3,
        keyMode = "string")
      .orderBy($"source_a", $"source_b").collect().toSeq
    val xx = Overlap.sourceOverlap(docs, "source", "text", n = 3,
        keyMode = "xxhash64")
      .orderBy($"source_a", $"source_b").collect().toSeq
    val md = Overlap.sourceOverlap(docs, "source", "text", n = 3,
        keyMode = "md5")
      .orderBy($"source_a", $"source_b").collect().toSeq
    assert(xx === exact && md === exact && exact.nonEmpty)
  }
}
