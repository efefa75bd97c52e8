package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Gopher-style document-quality rule bundle (Rae et al., "Scaling
  * Language Models: Methods, Analysis & Insights from Training
  * Gopher", 2021, Appendix A1.1 — the publicly documented heuristic
  * filter most large-corpus pipelines start from; the reference system
  * has no corpus-quality tier at all).
  *
  * Each rule is a PURE column expression over one tokenize pass —
  * integer/bp arithmetic only (`floor`, long counts) so the DuckDB
  * oracle replays every verdict bit-for-bit (the q27 rule: never
  * round a small-denominator ratio). One narrow projection per
  * document: no explode, no shuffle, no UDF — at 100 TB this runs at
  * scan speed inside WholeStageCodegen and the only shuffle in a
  * filtering job is whatever the caller aggregates afterwards.
  *
  * Rules (doc passes when ALL hold):
  *  - `r_word_count`:    minWords ≤ n_words ≤ maxWords
  *  - `r_mean_word_len`: mean word length in [minMeanLen, maxMeanLen]
  *    (compared in bp via cross-multiplication — no division)
  *  - `r_symbol_ratio`:  (# + … occurrences) / n_words ≤ 10%
  *  - `r_alpha_words`:   ≥ 80% of words contain ≥ 1 [a-z] character
  *  - `r_stopwords`:     ≥ minStopHits distinct common stopwords occur
  *  - `r_repetition`:    most-repeated-token share ≤ maxRepetitionBp
  *    (the Gopher duplication family collapsed to the tokenize-once
  *    repetition metric already certified by q64)
  *
  * Output: (id, n_words, mean_word_len_bp, symbol_bp, alpha_word_bp,
  * n_stop_kinds, repetition_bp, r_* booleans, pass).
  */
object QualityRules {

  /** The distinct-stopword witness list — deliberately tiny and fixed
    * (the Gopher rule asks for ≥ 2 of a small common-word list; a
    * broadcast vocabulary is overkill for a presence test). */
  val StopWitness: Seq[String] =
    Seq("the", "a", "be", "to", "of", "and", "that", "have")

  def report(df: DataFrame, idCol: String, textCol: String,
             minWords: Int = 50, maxWords: Int = 100000,
             minMeanLenBp: Long = 30000L, maxMeanLenBp: Long = 100000L,
             maxSymbolBp: Long = 1000L, minAlphaWordBp: Long = 8000L,
             minStopKinds: Int = 2,
             maxRepetitionBp: Long = 2000L): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val base = df.select(col(idCol).cast("long").as("id"),
      col(textCol).as("__text"), toks.as("__toks"))

    val nw = size(col("__toks")).cast("long")
    // total word chars via one aggregate over token lengths
    val chars = aggregate(col("__toks"), lit(0L),
      (a, t) => a + length(t).cast("long"))
    // mean word length in bp-of-a-char (len*10000/n) — floor'd integer
    val meanLenBp = when(nw === 0, lit(0L))
      .otherwise(floor(chars * 10000L / nw).cast("long"))
    // symbol occurrences: '#' and the '...' / '…' ellipsis forms,
    // counted on the RAW text (they are what tokenization destroys)
    val nSymbols =
      ((length(col("__text")) -
        length(regexp_replace(col("__text"), "#", ""))).cast("long") +
        (length(regexp_replace(col("__text"), "\\.{3}|…", "@")) -
          length(regexp_replace(col("__text"), "\\.{3}|…", ""))).cast("long"))
    val symbolBp = when(nw === 0, lit(0L))
      .otherwise(floor(nSymbols * 10000L / nw).cast("long"))
    // words containing at least one ASCII letter (tokens() keeps case)
    val nAlpha = size(filter(col("__toks"),
      t => t.rlike("[A-Za-z]"))).cast("long")
    val alphaBp = when(nw === 0, lit(0L))
      .otherwise(floor(nAlpha * 10000L / nw).cast("long"))
    val nStopKinds = size(array_intersect(
      array_distinct(col("__toks")),
      array(StopWitness.map(lit): _*))).cast("long")
    val repBp = TextFunctions.repetitionBpTokens(col("__toks"))

    base.select(col("id"),
        nw.as("n_words"), meanLenBp.as("mean_word_len_bp"),
        symbolBp.as("symbol_bp"), alphaBp.as("alpha_word_bp"),
        nStopKinds.as("n_stop_kinds"), repBp.as("repetition_bp"))
      .withColumn("r_word_count",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("r_mean_word_len",
        col("mean_word_len_bp") >= minMeanLenBp &&
          col("mean_word_len_bp") <= maxMeanLenBp)
      .withColumn("r_symbol_ratio", col("symbol_bp") <= maxSymbolBp)
      .withColumn("r_alpha_words", col("alpha_word_bp") >= minAlphaWordBp)
      .withColumn("r_stopwords", col("n_stop_kinds") >= minStopKinds)
      .withColumn("r_repetition", col("repetition_bp") <= maxRepetitionBp)
      .withColumn("pass",
        col("r_word_count") && col("r_mean_word_len") &&
          col("r_symbol_ratio") && col("r_alpha_words") &&
          col("r_stopwords") && col("r_repetition"))
  }

  /** The filtering form: keep passing docs, original schema. */
  def keep(df: DataFrame, idCol: String, textCol: String,
           minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val verdicts = report(df, idCol, textCol,
      minWords = minWords, maxWords = maxWords)
      .filter(col("pass")).select(col("id"))
    df.join(verdicts,
      df(idCol).cast("long") === verdicts("id"), "leftsemi")
  }

  /** Per-rule kill counts — the corpus-curation report that says WHICH
    * rule is doing the filtering (a rule killing 90% of a source is a
    * rule to re-examine, not a corpus to delete). One aggregate row. */
  def killReport(report: DataFrame): DataFrame =
    report.agg(
      count(lit(1)).as("n_docs"),
      sum(when(!col("pass"), 1L).otherwise(0L)).as("n_killed"),
      sum(when(!col("r_word_count"), 1L).otherwise(0L)).as("kill_word_count"),
      sum(when(!col("r_mean_word_len"), 1L).otherwise(0L)).as("kill_mean_word_len"),
      sum(when(!col("r_symbol_ratio"), 1L).otherwise(0L)).as("kill_symbol_ratio"),
      sum(when(!col("r_alpha_words"), 1L).otherwise(0L)).as("kill_alpha_words"),
      sum(when(!col("r_stopwords"), 1L).otherwise(0L)).as("kill_stopwords"),
      sum(when(!col("r_repetition"), 1L).otherwise(0L)).as("kill_repetition"))
}
