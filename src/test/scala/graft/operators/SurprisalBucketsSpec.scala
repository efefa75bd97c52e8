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

  test("stored-LM surprisal: batch scores against the FIXED corpus " +
    "model, unseen tokens at count floor 1") {
    val corpus = Seq((1L, "common common common rare"),
      (2L, "common common")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lm_spec")
      .toString + "/lm"
    Vocab.writeLm(corpus, "text", dir)
    // LM: common = 5, rare = 1, total = 6 -> bits(6) = 3
    val batch = Seq((10L, "common common"),     // sb = (3-3)*2 -> 0 cb
      (11L, "rare"),                            // sb = 3-1 = 2 -> 200 cb
      (12L, "alien"),                           // unseen -> cnt 1 -> 200 cb
      (13L, "")).toDF("doc_id", "text")
    val got = Vocab.surprisalFromLm(batch, "doc_id", "text", dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got(10L) === ((2L, 0L)))
    assert(got(11L) === ((1L, 200L)))
    assert(got(12L) === ((1L, 200L)), "unseen scores at count floor 1")
    assert(got(13L) === ((0L, 0L)), "blank doc zero-fills")
    // the store is FIXED: scoring must not depend on the batch itself
    val alone = Vocab.surprisalFromLm(
      batch.filter($"doc_id" === 11L), "doc_id", "text", dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(alone === Seq((11L, 200L)))
  }

  test("appendLm merge law: append(writeLm(A), B) == writeLm(A ∪ B)") {
    val a = Seq((1L, "common common rare"), (2L, "common"))
      .toDF("doc_id", "text")
    val b = Seq((3L, "common fresh fresh"), (4L, "")).toDF("doc_id", "text")
    val incDir = java.nio.file.Files.createTempDirectory("lm_inc")
      .toString + "/lm"
    val fullDir = java.nio.file.Files.createTempDirectory("lm_full")
      .toString + "/lm"
    Vocab.writeLm(a, "text", incDir)
    Vocab.appendLm(b, "text", incDir)
    Vocab.writeLm(a.unionByName(b), "text", fullDir)
    val (incLm, incTotal) = Vocab.readLm(spark, incDir)
    val (fullLm, fullTotal) = Vocab.readLm(spark, fullDir)
    assert(incTotal === fullTotal)
    assert(incLm.collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).toSeq ===
      fullLm.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq)
    // probing through the appended store equals the from-scratch one
    val probe = Seq((9L, "fresh rare alien")).toDF("doc_id", "text")
    assert(Vocab.surprisalFromLm(probe, "doc_id", "text", incDir)
      .collect().toSeq ===
      Vocab.surprisalFromLm(probe, "doc_id", "text", fullDir)
        .collect().toSeq)
  }

  test("removeFromLm inverse law: remove(append(writeLm(A), B), B) == " +
    "writeLm(A); uncontained batches refuse") {
    val a = Seq((1L, "common common rare"), (2L, "common"))
      .toDF("doc_id", "text")
    val b = Seq((3L, "common fresh fresh"), (4L, "")).toDF("doc_id", "text")
    val incDir = java.nio.file.Files.createTempDirectory("lm_rm")
      .toString + "/lm"
    val refDir = java.nio.file.Files.createTempDirectory("lm_rm_ref")
      .toString + "/lm"
    Vocab.writeLm(a, "text", incDir)
    Vocab.appendLm(b, "text", incDir)
    Vocab.removeFromLm(b, "text", incDir)
    Vocab.writeLm(a, "text", refDir)
    val (incLm, incTotal) = Vocab.readLm(spark, incDir)
    val (refLm, refTotal) = Vocab.readLm(spark, refDir)
    assert(incTotal === refTotal)
    assert(incLm.collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).toSeq ===
      refLm.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq)
    // "fresh" fell to zero and must be GONE, not a zero row
    assert(incLm.filter($"token" === "fresh").count() === 0L)
    // probes agree, including on a now-unseen token (count floor 1)
    val probe = Seq((9L, "fresh rare common")).toDF("doc_id", "text")
    assert(Vocab.surprisalFromLm(probe, "doc_id", "text", incDir)
      .collect().toSeq ===
      Vocab.surprisalFromLm(probe, "doc_id", "text", refDir)
        .collect().toSeq)
    // a batch the store never absorbed refuses before mutating
    val before = Vocab.readLm(spark, incDir)._1.collect().toSet
    val e = intercept[IllegalArgumentException] {
      Vocab.removeFromLm(
        Seq((5L, "rare rare rare rare")).toDF("doc_id", "text"),
        "text", incDir)
    }
    assert(e.getMessage.contains("not (fully) contained"))
    assert(Vocab.readLm(spark, incDir)._1.collect().toSet === before)
  }

  test("stored-LM contract: metadata-less or foreign-smoothing stores " +
    "refuse loudly") {
    val dir = java.nio.file.Files.createTempDirectory("lm_bad")
      .toString + "/lm"
    Seq(("common", 5L)).toDF("token", "cnt")
      .write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Vocab.surprisalFromLm(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", dir)
    }
    assert(e.getMessage.contains("build-params metadata"))
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
