package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class MixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("plan computes the max achievable mixture") {
    // 1000 web, 100 code; targets 0.8/0.2 → T = min(1250, 500) = 500
    // → web samples 400/1000 = 0.4, code samples 100/100 = 1.0
    val fracs = Mix.plan(Map("web" -> 1000L, "code" -> 100L),
      Map("web" -> 0.8, "code" -> 0.2))
    assert(math.abs(fracs("web") - 0.4) < 1e-12)
    assert(math.abs(fracs("code") - 1.0) < 1e-12)
  }

  test("bySource realizes target proportions within binomial noise") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val mixed = Mix.bySource(docs, "source",
      Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25), seed = 42L)
    val got = mixed.groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // equal 25-row sources with 0.5/0.25/0.25 targets → T = 50:
    // src0 keeps all 25, src1/src2 sample half
    assert(got("src0") === 25L)
    assert(got.getOrElse("src1", 0L) >= 5L && got("src1") <= 20L)
    assert(got.getOrElse("src2", 0L) >= 5L && got("src2") <= 20L)
    assert(got.keySet === Set("src0", "src1", "src2"),
      "unlisted sources must be dropped")
    // deterministic for a fixed seed
    val again = Mix.bySource(docs, "source",
      Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25), seed = 42L)
    assert(mixed.exceptAll(again).count() === 0L)
  }

  test("epochPlan: hand-computed repeat factors, cap and deficit") {
    // A: 10 tokens over 2 docs; B: 2 tokens over 1 doc
    val docs = Seq(
      ("A", "t t t t t"), ("A", "u u u u u"), ("B", "v w")
    ).toDF("source", "text")
    val got = Mix.epochPlan(docs, "source", "text",
        weightsBp = Map("A" -> 6000, "B" -> 4000),
        budgetTokens = 100L, maxEpochsBp = 30000L)
      .collect()
      .map(r => r.getString(0) -> r).toMap
    // A: target 60 → epochs 60000 bp → capped 30000 → planned 30
    val a = got("A")
    assert((a.getLong(1), a.getLong(2)) === ((2L, 10L)))
    assert(a.getInt(3) === 6000)
    assert((a.getLong(4), a.getLong(5), a.getLong(6)) ===
      ((60L, 60000L, 30000L)))
    assert((a.getLong(7), a.getLong(8)) === ((30L, 30L)))
    // B: target 40 → epochs 200000 bp → capped → planned 6, deficit 34
    val b = got("B")
    assert((b.getLong(4), b.getLong(5), b.getLong(6)) ===
      ((40L, 200000L, 30000L)))
    assert((b.getLong(7), b.getLong(8)) === ((6L, 34L)))
  }

  test("epochPlan: under-cap source has zero deficit; unlisted dropped") {
    val docs = Seq(
      ("A", "t t t t t t t t t t"), ("B", "v w"), ("C", "x")
    ).toDF("source", "text")
    val got = Mix.epochPlan(docs, "source", "text",
        weightsBp = Map("A" -> 9000, "B" -> 1000),
        budgetTokens = 10L, maxEpochsBp = 30000L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet === Set("A", "B"), "unweighted sources are not planned")
    // A: target 9 of 10 tokens → 9000 bp, planned 9, no deficit
    assert((got("A").getLong(5), got("A").getLong(7),
      got("A").getLong(8)) === ((9000L, 9L, 0L)))
  }

  test("epochPlan keeps a weighted source absent from the corpus visible") {
    // a typo'd source name must NOT vanish from the plan — it gets its
    // row with zero counts and NULL epochs/planned/deficit
    val docs = Seq(("A", "t t t t t t t t t t")).toDF("source", "text")
    val got = Mix.epochPlan(docs, "source", "text",
        weightsBp = Map("A" -> 6000, "TYPO" -> 4000),
        budgetTokens = 10L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet === Set("A", "TYPO"))
    val t = got("TYPO")
    assert((t.getLong(1), t.getLong(2)) === ((0L, 0L)))
    assert(t.getLong(4) === 4L, "target still allocated")
    assert(t.isNullAt(5) && t.isNullAt(6) && t.isNullAt(7) && t.isNullAt(8),
      "epochs/capped/planned/deficit must be NULL, not fabricated")
  }

  private def corpus(aTokens: Int, bTokens: Int) = Seq(
    "a" -> Seq.fill(aTokens)("w").mkString(" "),
    "b" -> Seq.fill(bTokens)("w").mkString(" ")).toDF("source", "text")

  test("temperatureWeights: hand-computed sqrt path with " +
    "largest-remainder close") {
    // tokens 100/400 → sqrt 10/20 → q = 10·2^20, 20·2^20, T = 30·2^20
    // base = 3333, 6666 (floor); deficit 1 goes to the larger
    // remainder (b) → 3333/6667
    val got = Mix.temperatureWeights(corpus(100, 400), "source", "text")
      .orderBy($"source").collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got === Map("a" -> 3333L, "b" -> 6667L))
  }

  test("temperatureWeights: alpha = 1 is exactly proportional, " +
    "smaller alpha compresses the ratio, sums always 10000") {
    for (alphaBp <- Seq(10000, 5000, 3000, 1000)) {
      val w = Mix.temperatureWeights(corpus(100, 400), "source", "text",
          alphaBp)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      assert(w.values.sum === 10000L, s"alpha=$alphaBp must close to " +
        s"10000 bp, got $w")
      if (alphaBp == 10000) assert(w === Map("a" -> 2000L, "b" -> 8000L))
    }
    val ratios = Seq(10000, 5000, 1000).map { a =>
      val w = Mix.temperatureWeights(corpus(100, 400), "source", "text", a)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      w("b").toDouble / w("a")
    }
    assert(ratios === ratios.sorted.reverse,
      s"smaller alpha must compress the b:a ratio, got $ratios")
  }

  test("temperatureWeights composes with epochPlan unchanged") {
    val docs = corpus(100, 400)
    val w = Mix.temperatureWeights(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getLong(3).toInt)
      .filter(_._2 > 0).toMap
    val plan = Mix.epochPlan(docs, "source", "text", w,
        budgetTokens = 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(plan("a") === 333L && plan("b") === 666L)
  }

  test("temperatureClose: 10^13-token sources close exactly (the Long-" +
    "overflow regression) at alpha = 1 and 1/2") {
    for (alphaBp <- Seq(10000, 5000)) {
      val got = Mix.temperatureClose(Seq(
        ("web", 1L, 10000000000000L),     // 10^13 tokens
        ("code", 1L, 2500000000000L),     // 2.5 * 10^12
        ("tiny", 1L, 1000L)), alphaBp)
      val w = got.map(t => t._1 -> t._4).toMap
      assert(w.values.sum === 10000L, s"alpha=$alphaBp: $w")
      assert(w.values.forall(v => v >= 0L && v <= 10000L), w)
      assert(w("web") > w("code") && w("code") > w("tiny"), w)
      if (alphaBp == 10000)
        // α=1 is proportional: 10^13 : 2.5·10^12 : 10^3 → 8000/2000/0
        assert(w === Map("web" -> 8000L, "code" -> 2000L, "tiny" -> 0L))
      else
        // α=1/2 compresses: sqrt ratio 2·10^6 : 10^6·... : 31.6...
        assert(w("web").toDouble / w("code") < 4.0)
    }
  }

  test("mixDrift: deviation over the union of sources, missing and " +
    "unplanned sources count fully") {
    // batch: a=60 tokens (7500 bp), b=20 (2500); target a=5000, b=3000,
    // c=2000 → devs a=2500, b=500, c=2000 → worst a, drifted at 1000
    val batch = Seq(
      ("a", Seq.fill(60)("w").mkString(" ")),
      ("b", Seq.fill(20)("w").mkString(" "))).toDF("source", "text")
    val target = Map("a" -> 5000L, "b" -> 3000L, "c" -> 2000L)
    val d = Mix.mixDrift(batch, "source", "text", target, marginBp = 1000L)
    assert(d === Mix.MixDrift("a", 2500L, true))
    val ok = Mix.mixDrift(batch, "source", "text",
      Map("a" -> 7300L, "b" -> 2700L), marginBp = 1000L)
    assert(!ok.drifted && ok.maxDevBp === 200L)
    // an unplanned source deviates by its full share
    val alien = Mix.mixDrift(batch, "source", "text",
      Map("z" -> 10000L), marginBp = 1000L)
    assert(alien === Mix.MixDrift("z", 10000L, true))
    // a NULL source is an unplanned source, not a crash
    val withNull = Seq(
      (Option("a"), Seq.fill(10)("w").mkString(" ")),
      (Option.empty[String], Seq.fill(10)("w").mkString(" ")))
      .toDF("source", "text")
    val d2 = Mix.mixDrift(withNull, "source", "text",
      Map("a" -> 10000L), marginBp = 1000L)
    assert(d2.maxDevBp === 5000L && d2.drifted,
      s"null-source tokens must count as deviation, got $d2")
  }

  test("temperatureWeights fails loudly on an all-empty corpus") {
    val docs = Seq("a" -> "   ", "b" -> "").toDF("source", "text")
    val e = intercept[IllegalArgumentException] {
      Mix.temperatureWeights(docs, "source", "text")
    }
    assert(e.getMessage.contains("no tokens"))
  }

  test("epochPlan rejects malformed weights loudly") {
    val docs = Seq(("A", "t")).toDF("source", "text")
    intercept[IllegalArgumentException] {
      Mix.epochPlan(docs, "source", "text", Map("A" -> 9999), 10L)
    }
    intercept[IllegalArgumentException] {
      Mix.epochPlan(docs, "source", "text",
        Map("A" -> 10001, "B" -> -1), 10L)
    }
    intercept[IllegalArgumentException] {
      Mix.epochPlan(docs, "source", "text", Map("A" -> 10000), 0L)
    }
  }

  test("bySourceDeterministic: exact keep thresholds, partition " +
    "invariant, unmapped sources dropped") {
    val docs = (0 until 600).map(i =>
      (i.toLong, s"doc body $i", s"s${i % 3}"))
      .toDF("doc_id", "text", "source")
    val rates = Map("s0" -> 10000, "s1" -> 5000)
    def run(df: org.apache.spark.sql.DataFrame) =
      Mix.bySourceDeterministic(df, "source", "doc_id", rates)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = run(docs)
    // keep_bp 10000 keeps the whole source; unmapped s2 is dropped
    assert((0 until 600).filter(_ % 3 == 0).forall(i => kept(i.toLong)))
    assert(!(0 until 600).filter(_ % 3 == 2).exists(i => kept(i.toLong)))
    // s1 keeps roughly half (200 docs, exact-threshold Bernoulli)
    val s1 = kept.count(_ % 3 == 1)
    assert(s1 > 60 && s1 < 140, s"s1 kept $s1 of 200 at 5000 bp")
    // the verdict is a pure function of (salt, id): any partitioning
    // reproduces it
    assert(run(docs.repartition(13)) === kept)
    assert(run(docs.coalesce(1)) === kept)
    // contract: rates outside [0, 10000] bp refused
    intercept[IllegalArgumentException] {
      Mix.bySourceDeterministic(docs, "source", "doc_id",
        Map("s0" -> 10001))
    }
  }
}
