package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.shingles

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation/benchmark set — the standard leakage
  * check before training on a scraped corpus (the GPT-3/PaLM-style
  * "13-gram overlap" rule, with n a parameter because fixture documents
  * are short).
  *
  * Scale shape: the eval set is SMALL by definition (benchmarks are
  * thousands of documents, the corpus is billions), so its distinct
  * n-gram set is collected into a broadcast hash join — the corpus-side
  * n-gram stream is generated inside the scan projection, joined
  * map-side with no shuffle of corpus data, and only matching (doc,
  * gram) rows reach the per-document aggregate. Nothing here is
  * proportional to |corpus| × |eval|. For an eval set too big to
  * broadcast, drop the `broadcast` hint and the same plan degrades
  * gracefully to a shuffle join on the gram key.
  */
object Decontaminate {

  /** Per-document contamination hits: (docId, n_hits) for every
    * training document sharing ≥ 1 distinct word n-gram with `evalDf`.
    * Documents shorter than n tokens participate as a single whole-text
    * gram (see TextFunctions.shingles), so short eval items still
    * match their verbatim copies. */
  def ngramHits(trainDf: DataFrame, evalDf: DataFrame,
                idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val evalGrams = evalDf
      .select(explode(shingles(col(textCol), n)).as("gram"))
      .distinct()
    trainDf
      .select(col(idCol), explode(shingles(col(textCol), n)).as("gram"))
      .join(broadcast(evalGrams), "gram")
      // shingles() is distinct per document, so this count IS the size
      // of the per-document gram-set intersection with the eval set
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }
}
