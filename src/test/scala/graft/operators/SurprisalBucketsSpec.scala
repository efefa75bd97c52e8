package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SurprisalBucketsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("common-token docs land in the head, rare-token docs in the tail") {
    val docs = ((1L to 6L).map(i => (i, "common words common words", "s")) :+
      (7L, "zyx qwv unique rare", "s") :+
      (8L, "common words common words", "s") :+
      (9L, "common rare words common", "s"))
      .toDF("doc_id", "text", "source")
    val buckets = Curate.surprisalBuckets(docs, "doc_id", "text", "source")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(buckets(7L) === "tail", "the all-rare doc must be tail")
    assert(buckets(1L) === "head", "lowest-surprisal lowest-id doc is head")
    // floor quotas at n = 9: head 2 (floor 2.9997), head+middle 6
    val counts = buckets.values.groupBy(identity).view.mapValues(_.size)
    assert(counts("head") === 2 && counts("middle") === 4 &&
      counts("tail") === 3, counts.toMap)
  }

  test("bucket assignment equals the per-source ROW_NUMBER replay on a " +
    "randomized corpus") {
    val rnd = new scala.util.Random(7)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (1L to 60L).map { i =>
      val n = 3 + rnd.nextInt(6)
      (i, Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "),
        if (i % 2 == 0) "even" else "odd")
    }.toDF("doc_id", "text", "source")
    val got = Curate.surprisalBuckets(docs, "doc_id", "text", "source")
    // independent replay: rank per source by (surprisal asc, id asc)
    val sur = Vocab.surprisal(docs, "doc_id", "text")
      .join(docs.select($"doc_id".as("id"), $"source"), Seq("id"))
    val w = Window.partitionBy($"source")
      .orderBy($"surprisal_cb", $"id")
    val exp = sur
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"source")))
      .select($"id", $"source", $"surprisal_cb",
        when($"rn" <= $"n" * 3333L / 10000L, "head")
          .when($"rn" <= $"n" * 6667L / 10000L, "middle")
          .otherwise("tail").as("bucket"))
    assert(got.collect().sortBy(_.getLong(0)).toSeq ===
      exp.collect().sortBy(_.getLong(0)).toSeq)
  }
}
