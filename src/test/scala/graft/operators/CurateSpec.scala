package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions.{qualityBpTokens, tokens}

/** Curate's contract: the histogram → cutoff → boundary-prefix
  * implementation returns EXACTLY the rows of the direct selection rule
  * (per-source window cumsum over (quality DESC, id), keep cum ≤
  * budget) — the rule the DuckDB oracle (q77) also runs.
  */
class CurateSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  // docs across 3 sources with varied quality/length; source c gets a
  // pathological giant doc to exercise the overflow-prefix rule
  private def corpus: DataFrame = (
    (1 to 30).map(i => (i.toLong, "a", ("alpha beta gamma delta " * (1 + i % 5)).trim + s" tail$i")) ++
    (31 to 60).map(i => (i.toLong, "b", ("the quick brown fox and some words " * (1 + i % 3)).trim + s" t$i")) ++
    Seq((61L, "c", ("huge " * 500).trim),
        (62L, "c", "small doc after the giant one"),
        (63L, "c", "another small one"))
  ).toDF("doc_id", "src", "text")

  /** The selection rule run directly (small-data reference). */
  private def directRule(df: DataFrame, budget: Long): DataFrame = {
    val t = tokens($"text")
    val scored = df.select($"doc_id".cast("long").as("id"), $"src".as("source"),
      size(t).cast("long").as("n_tokens"), qualityBpTokens(t).as("quality_bp"))
    val w = Window.partitionBy($"source")
      .orderBy($"quality_bp".desc, $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.withColumn("cum", sum($"n_tokens").over(w))
      .filter($"cum" <= budget).drop("cum")
  }

  private def asSet(df: DataFrame): Set[(Long, String, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.getLong(3))).toSet

  test("matches the direct window rule across budgets") {
    for (budget <- Seq(1L, 25L, 80L, 200L, 100000L)) {
      val got = asSet(Curate.tokenBudgetPerSource(
        corpus, "doc_id", "text", "src", budget))
      val want = asSet(directRule(corpus, budget))
      assert(got === want, s"budget=$budget")
    }
  }

  test("budget larger than any source keeps everything, no boundary pass") {
    val got = Curate.tokenBudgetPerSource(corpus, "doc_id", "text", "src",
      1000000L)
    assert(got.count() === corpus.count())
  }

  test("non-positive budget keeps nothing") {
    assert(Curate.tokenBudgetPerSource(corpus, "doc_id", "text", "src", 0L)
      .count() === 0L)
    assert(Curate.tokenBudgetPerSource(corpus, "doc_id", "text", "src", -5L)
      .count() === 0L)
  }

  test("plan: one boundary-tier window only, cuts broadcast-joined") {
    val plan = Curate.tokenBudgetPerSource(corpus, "doc_id", "text", "src", 80L)
      .queryExecution.executedPlan.toString
    // the scale claim: the full corpus is NEVER window-sorted — the
    // only Window in the plan is the boundary-tier prefix cumsum
    val windows = "(?m)^\\s*[+:\\-* ]*Window ".r.findAllIn(plan).size
    assert(windows === 1, s"expected exactly 1 Window operator:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      s"cuts table must broadcast, not shuffle:\n${plan.take(1500)}")
  }

  test("an overflowing doc blocks everything after it in its tier order") {
    // source c: if the giant doc ranks first in its tier order, nothing
    // later in the ordering survives — prefix semantics, not skip-and-
    // continue. Verified by equivalence with the direct rule at a
    // budget smaller than the giant doc.
    val got = asSet(Curate.tokenBudgetPerSource(
      corpus, "doc_id", "text", "src", 100L))
    val want = asSet(directRule(corpus, 100L))
    assert(got === want)
  }

  /** The percentile rule run directly (small-data reference). */
  private def directGate(df: DataFrame, keepBp: Int): DataFrame = {
    val t = tokens($"text")
    val scored = df.select($"doc_id".cast("long").as("id"), $"src".as("source"),
      size(t).cast("long").as("n_tokens"), qualityBpTokens(t).as("quality_bp"))
    val w = Window.partitionBy($"source").orderBy($"quality_bp".desc, $"id")
    val n = Window.partitionBy($"source")
    scored.withColumn("rn", row_number().over(w))
      .withColumn("quota",
        floor(lit(keepBp.toLong) * count(lit(1)).over(n) / 10000))
      .filter($"rn" <= $"quota").drop("rn", "quota")
  }

  test("qualityPercentileGate matches the direct rank rule across levels") {
    for (keep <- Seq(1000, 3000, 5000, 9999)) {
      val got = asSet(Curate.qualityPercentileGate(
        corpus, "doc_id", "text", "src", keep))
      assert(got === asSet(directGate(corpus, keep)), s"keepBp=$keep")
    }
  }

  test("qualityPercentileGate edges: 0 keeps nothing, 10000 keeps all") {
    assert(Curate.qualityPercentileGate(
      corpus, "doc_id", "text", "src", 0).count() === 0L)
    assert(Curate.qualityPercentileGate(
      corpus, "doc_id", "text", "src", 10000).count() === corpus.count())
    intercept[IllegalArgumentException] {
      Curate.qualityPercentileGate(corpus, "doc_id", "text", "src", 10001)
    }
  }

  test("capPerSource matches the direct per-source ROW_NUMBER <= cap " +
    "rule; under-cap sources pass whole; ties break by id") {
    def directCap(df: DataFrame, cap: Long): DataFrame = {
      val t = tokens($"text")
      val scored = df.select($"doc_id".cast("long").as("id"),
        $"src".as("source"), size(t).cast("long").as("n_tokens"),
        qualityBpTokens(t).as("quality_bp"))
      val w = Window.partitionBy($"source")
        .orderBy($"quality_bp".desc, $"id")
      scored.withColumn("rn", row_number().over(w))
        .filter($"rn" <= cap).drop("rn")
    }
    for (cap <- Seq(1L, 2L, 3L, 100L)) {
      val got = asSet(Curate.capPerSource(
        corpus, "doc_id", "text", "src", cap))
      assert(got === asSet(directCap(corpus, cap)), s"cap=$cap")
    }
    // a cap above every source's count keeps everything
    assert(Curate.capPerSource(corpus, "doc_id", "text", "src", 100L)
      .count() === corpus.count())
    // zero keeps nothing; negative refuses
    assert(Curate.capPerSource(corpus, "doc_id", "text", "src", 0L)
      .count() === 0L)
    intercept[IllegalArgumentException] {
      Curate.capPerSource(corpus, "doc_id", "text", "src", -1L)
    }
    // tie tier: four identical docs, cap 2 → lowest two ids
    val ties = Seq((1L, "s", "same text here"), (2L, "s", "same text here"),
      (3L, "s", "same text here"), (4L, "s", "same text here"))
      .toDF("doc_id", "src", "text")
    assert(Curate.capPerSource(ties, "doc_id", "text", "src", 2L)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("qualityPercentileGate boundary tier breaks ties by id ascending") {
    // four docs with IDENTICAL text (one quality tier) in one source:
    // keep 50% → quota 2 → ids 1,2 survive
    val ties = Seq((1L, "s", "same text here"), (2L, "s", "same text here"),
      (3L, "s", "same text here"), (4L, "s", "same text here"))
      .toDF("doc_id", "src", "text")
    val got = Curate.qualityPercentileGate(ties, "doc_id", "text", "src", 5000)
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
  }

  test("blocklistGate: whole-token case-insensitive hits, no substring " +
    "false positives, zero-token docs keep") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean text about nothing bad at all"),
      (2L, "BadWord appears badword twice here"),   // 2 hits, 1 type
      (3L, "badword and alsobad once each"),        // 2 hits, 2 types
      (4L, "embadworded is not a hit"),             // substring ≠ hit
      (5L, "   "))
      .toDF("doc_id", "text")
    val got = Curate.blocklistGate(docs, "doc_id", "text",
        words = Seq("BADWORD", "alsobad"), maxHits = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L) === ((0L, 0L, true)))
    assert(got(2L) === ((2L, 1L, false)))
    assert(got(3L) === ((2L, 2L, false)))
    assert(got(4L) === ((0L, 0L, true)),
      "substring matches must not fire (the 'class'/'ass' trap)")
    assert(got(5L) === ((0L, 0L, true)))
  }
}
