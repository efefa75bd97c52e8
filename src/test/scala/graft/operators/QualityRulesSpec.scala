package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class QualityRulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def reportOf(rows: (Long, String)*) =
    QualityRules.report(rows.toDF("doc_id", "text"), "doc_id", "text",
        minWords = 3, maxWords = 10, minMeanLenBp = 30000L,
        maxMeanLenBp = 80000L, maxSymbolBp = 1000L,
        minAlphaWordBp = 8000L, minStopKinds = 2,
        maxRepetitionBp = 5000L)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap

  test("each rule trips on its own pathology, clean doc passes all") {
    val r = reportOf(
      (1L, "the cat and dog ran home"),             // clean: passes
      (2L, "the cat"),                              // too short (2 < 3)
      (3L, "the of extraordinarily incomprehensible antidisestablishment"), // mean len > 8.0
      (4L, "the and ### ## #### pound signs here"), // symbol ratio
      (5L, "the of 123 456 789 000 111 222"),       // alpha words < 80%
      (6L, "cat dog bird fish lizard"),             // no stopword kinds
      (7L, "the the the the and buffalo"))          // repetition > 50%
    assert(r(1L).getAs[Boolean]("pass"))
    assert(!r(2L).getAs[Boolean]("r_word_count") &&
      r(2L).getAs[Long]("n_words") === 2L)
    assert(!r(3L).getAs[Boolean]("r_mean_word_len"))
    assert(!r(4L).getAs[Boolean]("r_symbol_ratio"))
    assert(!r(5L).getAs[Boolean]("r_alpha_words") &&
      r(5L).getAs[Long]("alpha_word_bp") === 2500L) // 2 of 8 words
    assert(!r(6L).getAs[Boolean]("r_stopwords") &&
      r(6L).getAs[Long]("n_stop_kinds") === 0L)
    assert(!r(7L).getAs[Boolean]("r_repetition") &&
      r(7L).getAs[Long]("repetition_bp") === 6666L) // 4 of 6 tokens
    // every failing doc fails overall
    (2L to 7L).foreach(id => assert(!r(id).getAs[Boolean]("pass"), id))
  }

  test("metrics: hand-computed bp values and the ellipsis symbol form") {
    val r = reportOf((1L, "the cat... ran # home…"))
    // 5 tokens; chars = 3+6+3+1+5 = 18 -> floor(18*10000/5) = 36000
    assert(r(1L).getAs[Long]("mean_word_len_bp") === 36000L)
    // symbols: one '#', one '...', one '…' -> floor(3*10000/5) = 6000
    assert(r(1L).getAs[Long]("symbol_bp") === 6000L)
  }

  test("empty and blank docs: zero metrics, killed by word count only") {
    val r = reportOf((1L, ""), (2L, "   "))
    Seq(1L, 2L).foreach { id =>
      assert(r(id).getAs[Long]("n_words") === 0L)
      assert(r(id).getAs[Long]("mean_word_len_bp") === 0L)
      assert(r(id).getAs[Long]("repetition_bp") === 0L)
      assert(!r(id).getAs[Boolean]("pass"))
    }
  }

  test("keep() preserves schema and exactly the passing rows") {
    val docs = Seq(
      (1L, "the cat and dog ran home today", "s1"),
      (2L, "x", "s2")).toDF("doc_id", "text", "src")
    val kept = QualityRules.keep(docs, "doc_id", "text", minWords = 3)
    assert(kept.columns.toSeq === Seq("doc_id", "text", "src"))
    assert(kept.select("doc_id").as[Long].collect().toSeq === Seq(1L))
  }

  test("killReport attributes kills per rule over the fixture") {
    val docs = graft.core.Tables.documents(spark, graft.TestSpark.sf)
    val rep = QualityRules.report(docs, "doc_id", "text",
      minWords = 25, minMeanLenBp = 40000L)
    val kills = QualityRules.killReport(rep).head()
    val n = kills.getAs[Long]("n_docs")
    assert(n === docs.count())
    // thresholds are fixture-tuned so word count, mean length and
    // stopword witnesses all have mixed verdicts
    assert(kills.getAs[Long]("kill_word_count") > 0)
    assert(kills.getAs[Long]("kill_stopwords") > 0)
    assert(kills.getAs[Long]("n_killed") < n)
    // kill attribution is an upper bound decomposition: every killed
    // doc is killed by >= 1 rule
    val ruleSum = Seq("kill_word_count", "kill_mean_word_len",
      "kill_symbol_ratio", "kill_alpha_words", "kill_stopwords",
      "kill_repetition").map(kills.getAs[Long]).sum
    assert(ruleSum >= kills.getAs[Long]("n_killed"))
  }

  test("plan shape: one projection, no exchange before the caller's agg") {
    val docs = Seq((1L, "the cat and dog")).toDF("doc_id", "text")
    val plan = QualityRules.report(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"per-doc rule report must be narrow (no shuffle):\n${plan.take(600)}")
  }
}
