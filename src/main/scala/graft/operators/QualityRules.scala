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

  // ------------------------------------------------------------------
  // Full Gopher repetition family (Rae et al. 2021, Appendix A1.1) —
  // the r_repetition rule above keeps the cheap collapsed metric; this
  // report carries the complete published set: duplicate line /
  // paragraph fractions (count- and character-weighted), top n-gram
  // character coverage (n = 2..4), and duplicate n-gram character
  // coverage (n = 5..10, overlap-aware — each character counted once).
  //
  // The corpus is a flat token stream (no newlines), so "lines" and
  // "paragraphs" are the derived disjoint k-token chunk views (the
  // q115 paragraph convention): lineTokens = 4, paraTokens = 12.
  //
  // Scale shape: ONE tokenize pass, then pure per-row array
  // expressions — no explode, no shuffle, no UDF. Intermediates
  // (positional grams, sorted copies, duplicate sets, coverage flags)
  // are STAGED as named projection columns referenced ≥ 2 times each,
  // so CollapseProject never re-inlines a computed subtree into a
  // lambda (higher-order functions evaluate with no CSE — the
  // Ivf.quantizeCells rule). Per-row cost is O(G log G) in gram count
  // via the sort + adjacency dup scan, not the O(G²) nested count.
  // ------------------------------------------------------------------

  /** Gopher A1.1 thresholds, in basis points. */
  val GopherTopGramBp: Map[Int, Long] =
    Map(2 -> 2000L, 3 -> 1800L, 4 -> 1600L)
  val GopherDupGramBp: Map[Int, Long] =
    Map(5 -> 1500L, 6 -> 1400L, 7 -> 1300L, 8 -> 1200L,
        9 -> 1100L, 10 -> 1000L)

  def repetitionReport(df: DataFrame, idCol: String, textCol: String,
                       lineTokens: Int = 4, paraTokens: Int = 12,
                       maxDupLineBp: Long = 3000L,
                       maxDupParaBp: Long = 3000L,
                       maxDupLineCharBp: Long = 2000L,
                       maxDupParaCharBp: Long = 2000L,
                       topGramBp: Map[Int, Long] = GopherTopGramBp,
                       dupGramBp: Map[Int, Long] = GopherDupGramBp)
      : DataFrame = {
    val topNs = topGramBp.keys.toSeq.sorted
    val dupNs = dupGramBp.keys.toSeq.sorted
    // the native kernel computes all metrics in one JVM pass per row
    // (graft.sql.RepetitionMetrics — two orders of magnitude under the
    // staged-HOF form it replaced on the hot path; the staged form
    // remains below as the spec-pinned certification twin)
    val s0 = df.select(col(idCol).cast("long").as("id"),
      TextFunctions.tokens(col(textCol)).as("__toks"))
    val kernel = org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.sql.RepetitionMetrics(
        org.apache.spark.sql.GraftSqlBridge.toExpression(col("__toks")),
        lineTokens, paraTokens, topNs, dupNs))
    val names = Seq("dup_line_bp", "dup_line_char_bp", "dup_para_bp",
      "dup_para_char_bp") ++
      topNs.map(n => s"top_${n}gram_bp") ++
      dupNs.map(n => s"dup_${n}gram_bp")
    val s5 = s0.select(col("id"), kernel.as("__m"))
      .select(col("id") +: names.map(nm => col(s"__m.$nm").as(nm)): _*)
    withRepetitionRules(s5, maxDupLineBp, maxDupParaBp, maxDupLineCharBp,
      maxDupParaCharBp, topGramBp, dupGramBp)
  }

  /** The pure-Column staged form of the repetition metrics — the
    * certification twin of the kernel path (RepetitionSpec pins
    * kernel == staged on randomized corpora; the q122/q123 oracles
    * replay the same integers in DuckDB). Kept OFF the hot path:
    * higher-order functions evaluate interpreted per element, so this
    * form costs ~100× the kernel (measured 20.7 s vs sub-second for
    * q122 at sf0.1). Intermediates are staged as projection columns
    * referenced ≥ 2 times each so CollapseProject never re-inlines a
    * computed subtree into a lambda (the Ivf.quantizeCells rule). */
  private[graft] def repetitionReportStaged(
      df: DataFrame, idCol: String, textCol: String,
      lineTokens: Int = 4, paraTokens: Int = 12,
      maxDupLineBp: Long = 3000L,
      maxDupParaBp: Long = 3000L,
      maxDupLineCharBp: Long = 2000L,
      maxDupParaCharBp: Long = 2000L,
      topGramBp: Map[Int, Long] = GopherTopGramBp,
      dupGramBp: Map[Int, Long] = GopherDupGramBp)
      : DataFrame = {
    import TextFunctions._
    val topNs = topGramBp.keys.toSeq.sorted
    val dupNs = dupGramBp.keys.toSeq.sorted
    require(topNs.forall(_ >= 2) && dupNs.forall(_ >= 2),
      "n-gram orders must be >= 2")

    val s0 = df.select(col(idCol).cast("long").as("id"),
      tokens(col(textCol)).as("__toks"))
    // stage 1: char total, chunk views, positional grams per order
    val s1 = s0.select(Seq(col("id"), col("__toks"),
      tokenCharsTokens(col("__toks")).as("__chars"),
      chunksTokens(col("__toks"), lineTokens).as("__ckl"),
      chunksTokens(col("__toks"), paraTokens).as("__ckp")) ++
      (topNs ++ dupNs).map(n =>
        gramsTokensPos(col("__toks"), n).as(s"__g$n")): _*)
    // stage 2: sorted copies (identity for < 2 entries — the
    // double-reference that also skips the trivial sort)
    def sortedOf(c: String): Column =
      when(size(col(c)) < 2, col(c)).otherwise(array_sort(col(c)))
        .as(s"__s$c")
    val sortBases = Seq("__ckl", "__ckp") ++ (topNs ++ dupNs).map("__g" + _)
    val s2 = s1.select(col("*") +: sortBases.map(sortedOf): _*)
    // stage 3: duplicate-value sets (chunks + dup orders), run starts
    // (top orders)
    val s3 = s2.select(col("*") +:
      ((Seq("__ckl", "__ckp") ++ dupNs.map("__g" + _)).map(c =>
        dupValuesSorted(col(s"__s$c")).as(s"__d$c")) ++
        topNs.map(n =>
          runStartsSorted(col(s"__s__g$n")).as(s"__st$n"))): _*)
    // stage 4: per-position duplicate flags for the dup orders
    val s4 = s3.select(col("*") +: dupNs.map(n =>
      dupFlagsGrams(col(s"__g$n"), col(s"__d__g$n")).as(s"__f$n")): _*)
    // stage 5: the metrics
    val metrics: Seq[Column] = Seq(
      dupChunkBp(col("__ckl"), col("__d__ckl")).as("dup_line_bp"),
      dupChunkCharBp(col("__toks"), col("__ckl"), col("__d__ckl"),
        lineTokens, col("__chars")).as("dup_line_char_bp"),
      dupChunkBp(col("__ckp"), col("__d__ckp")).as("dup_para_bp"),
      dupChunkCharBp(col("__toks"), col("__ckp"), col("__d__ckp"),
        paraTokens, col("__chars")).as("dup_para_char_bp")) ++
      topNs.map(n => topCoverageBp(col(s"__s__g$n"), col(s"__st$n"),
        n - 1, col("__chars")).as(s"top_${n}gram_bp")) ++
      dupNs.map(n => dupCoverageBp(col("__toks"), col(s"__f$n"), n,
        col("__chars")).as(s"dup_${n}gram_bp"))
    val s5 = s4.select(col("id") +: metrics: _*)
    withRepetitionRules(s5, maxDupLineBp, maxDupParaBp, maxDupLineCharBp,
      maxDupParaCharBp, topGramBp, dupGramBp)
  }

  /** Append the per-rule verdicts + pass to a metric frame. */
  private def withRepetitionRules(s5: DataFrame,
      maxDupLineBp: Long, maxDupParaBp: Long,
      maxDupLineCharBp: Long, maxDupParaCharBp: Long,
      topGramBp: Map[Int, Long], dupGramBp: Map[Int, Long]): DataFrame = {
    val rules: Seq[(String, Column)] = Seq(
      "r_dup_line" -> (col("dup_line_bp") <= maxDupLineBp),
      "r_dup_line_char" -> (col("dup_line_char_bp") <= maxDupLineCharBp),
      "r_dup_para" -> (col("dup_para_bp") <= maxDupParaBp),
      "r_dup_para_char" -> (col("dup_para_char_bp") <= maxDupParaCharBp)) ++
      topGramBp.toSeq.sorted.map { case (n, t) =>
        s"r_top_${n}gram" -> (col(s"top_${n}gram_bp") <= t)
      } ++
      dupGramBp.toSeq.sorted.map { case (n, t) =>
        s"r_dup_${n}gram" -> (col(s"dup_${n}gram_bp") <= t)
      }
    val flagged = rules.foldLeft(s5) { case (acc, (nm, c)) =>
      acc.withColumn(nm, c)
    }
    flagged.withColumn("pass",
      rules.map(r => col(r._1)).reduce(_ && _))
  }

  /** The filtering form of the repetition family: keep docs passing
    * every Gopher repetition rule, original schema. */
  def keepRepetition(df: DataFrame, idCol: String, textCol: String,
                     lineTokens: Int = 4, paraTokens: Int = 12)
      : DataFrame = {
    val verdicts = repetitionReport(df, idCol, textCol,
      lineTokens = lineTokens, paraTokens = paraTokens)
      .filter(col("pass")).select(col("id"))
    df.join(verdicts,
      df(idCol).cast("long") === verdicts("id"), "leftsemi")
  }

  /** Per-rule kill counts of the repetition family — one aggregate
    * row, same role as [[killReport]]. */
  def repetitionKillReport(report: DataFrame): DataFrame = {
    val ruleCols = report.columns.filter(_.startsWith("r_")).toSeq
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n_docs"),
        sum(when(!col("pass"), 1L).otherwise(0L)).as("n_killed")) ++
        ruleCols.map(r => sum(when(!col(r), 1L).otherwise(0L))
          .as("kill_" + r.stripPrefix("r_")))
    report.agg(aggs.head, aggs.tail: _*)
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
