package graft.ml

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // disjoint vocabularies so separation is learnable at tiny scale
  private val target = (1L to 30L).map(i =>
    i -> s"spark scala catalyst tungsten t${i % 5}").toDF("doc_id", "text")
  private val raw = (31L to 60L).map(i =>
    i -> s"cobol fortran basic pascal r${i % 5}").toDF("doc_id", "text")

  private lazy val model =
    QualityClassifier.train(target, raw, "text", dim = 64)

  test("planted separation: held-out target vocab scores high, raw low") {
    val probes = Seq(
      100L -> "spark catalyst scala",
      101L -> "tungsten spark scala catalyst",
      200L -> "cobol basic fortran",
      201L -> "pascal fortran cobol basic").toDF("doc_id", "text")
    val got = QualityClassifier.score(probes, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(100L) > 0.8 && got(101L) > 0.8,
      s"target-vocab probes must score high, got $got")
    assert(got(200L) < 0.2 && got(201L) < 0.2,
      s"raw-vocab probes must score low, got $got")
  }

  test("zero-token doc gets the intercept-only prior, not NaN") {
    val got = QualityClassifier.score(
        Seq(1L -> "   ").toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().head.getDouble(1)
    assert(!got.isNaN && got >= 0.0 && got <= 1.0)
    assert(math.abs(got -
      1.0 / (1.0 + math.exp(-model.intercept))) < 1e-12)
  }

  test("model carries its feature dim: scoring rehashes with it") {
    assert(model.dim === 64)
    assert(model.weights.length === 64)
  }

  test("pareto keep is deterministic and leans on the score") {
    val pool = ((1L to 50L).map(i => (i, s"spark scala catalyst s$i")) ++
      (51L to 100L).map(i => (i, s"cobol fortran basic r$i")))
      .toDF("doc_id", "text")
    val scored = QualityClassifier.score(pool, "doc_id", "text", model)
    val kept = QualityClassifier.keepPareto(scored, "doc_id", alpha = 9.0)
    val ids = kept.select($"doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = QualityClassifier.keepPareto(
        scored.repartition(7), "doc_id", alpha = 9.0)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === ids2, "keep verdicts must not depend on partitioning")
    // closed-form survival (2 − s)^-α at α = 9: s ≈ 0.95 → ~0.64,
    // s ≈ 0.05 → ~0.002 — the filter keeps most good docs and a thin
    // tail of bad ones, by design (not a hard threshold)
    val hi = ids.count(_ <= 50L)
    val lo = ids.count(_ > 50L)
    assert(hi >= 25, s"high-score docs keep at the ~0.64 closed-form " +
      s"rate, got $hi/50")
    assert(lo <= 5, s"low-score docs survive at the ~0.002 rate, " +
      s"got $lo/50")
  }

  test("save/load round-trips a model exactly; score from the loaded " +
    "model is monotone in the cert digest") {
    val dir = java.nio.file.Files.createTempDirectory("qc_store").toString
    QualityClassifier.save(spark, model, dir)
    val back = QualityClassifier.load(spark, dir)
    assert(back.dim === model.dim &&
      back.intercept === model.intercept &&
      back.weights.toSeq === model.weights.toSeq,
      "store round trip must be bit-exact")

    // the oracle-checked cert twin ranks by the quantized logit digest;
    // the production score() (float fold + sigmoid) must order docs the
    // same way given the SAME model — sigmoid is monotone, and 1e-9
    // quantization cannot flip an ordering unless two logits are closer
    // than any fixture pair gets
    import org.apache.spark.sql.functions._
    val docs = ((1L to 20L).map(i => (i, s"spark scala s$i catalyst")) ++
      (21L to 40L).map(i => (i, s"cobol r$i fortran basic pascal")))
      .toDF("doc_id", "text")
    val probs = QualityClassifier.score(docs, "doc_id", "text", back)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val digests = graft.operators.Featurize
      .hashedEmbedding(docs, "doc_id", "text", back.dim)
      .select($"doc_id",
        aggregate(zip_with($"embedding", typedlit(back.weights.toSeq),
            (v, w) => floor(v * w * lit(1e9)).cast("long")),
          lit(0L), (a, x) => a + x).as("dg"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byProb = probs.toSeq.sortBy { case (id, p) => (p, id) }.map(_._1)
    val byDigest = digests.toSeq.sortBy { case (id, g) => (g, id) }.map(_._1)
    assert(byProb === byDigest,
      "production score order must match the certified digest order")
  }

  test("load fails loudly on a store missing the dim metadata") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("qc_bad").toString
    (0L to 64L).map(i => (i - 1L, 0.5)).toDF("idx", "w")
      .write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.load(spark, dir)
    }
    assert(e.getMessage.contains("dim metadata"))
  }

  test("pareto keep survival matches the closed form (2 - s)^-alpha " +
    "in expectation at s = 0") {
    // score-0 docs survive with P = 2^-alpha; at alpha = 1 that is 1/2
    val scored = (1L to 2000L).map(i => (i, 0.0))
      .toDF("doc_id", "quality_prob")
    val kept = QualityClassifier.keepPareto(scored, "doc_id", alpha = 1.0)
      .count()
    assert(math.abs(kept / 2000.0 - 0.5) < 0.05,
      s"expected ~1000 of 2000 at alpha=1, s=0; got $kept")
  }
}
