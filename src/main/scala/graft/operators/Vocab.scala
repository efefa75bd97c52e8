package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** Corpus vocabulary construction and out-of-vocabulary filtering — the
  * vocabulary-coverage quality gate of an LLM training pipeline (docs
  * dominated by tokens the tokenizer/vocab has never seen are noise:
  * boilerplate, foreign scripts, binary spill). Reference scope: the
  * text-analysis tier of the corpus pipeline (SURVEY §2 text analysis;
  * reference has no corpus surface — this extends it as the prompt
  * directs).
  *
  * Scale shape: the vocabulary itself is DRIVER-BOUNDED by construction
  * (top-K by corpus frequency), so the per-document membership check is
  * a broadcast hash join against the corpus token stream — the corpus is
  * read once, never shuffled by token for the membership pass. The only
  * token-keyed shuffle is the one count aggregate that builds the
  * vocabulary, with map-side partial counts doing the heavy lifting
  * (31 distinct tokens on the fixture; bounded by |vocab| ≪ |corpus| in
  * general).
  */
object Vocab {

  /** Corpus token frequencies: one generator-in-scan explode + one
    * hash aggregate shuffled on token. */
  def tokenCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** The top-K vocabulary by corpus frequency, ties broken by token
    * text ascending so the vocabulary is deterministic across engines
    * and partitionings. `limit` after `orderBy` plans as takeOrdered —
    * a bounded per-partition top-K merge, not a global sort. */
  def topVocab(docs: DataFrame, textCol: String, k: Int): DataFrame =
    tokenCounts(docs, textCol)
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** Per-document OOV stats against the top-K vocabulary: token count,
    * OOV token count, and OOV rate in integer basis points
    * (floor(10000·oov/tokens) — the suite's hash-stable exact-integer
    * ratio form). Documents with zero tokens survive with all-zero
    * stats. */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              topK: Int): DataFrame = {
    val vocab = F.broadcast(
      topVocab(docs, textCol, topK)
        .select(col("token"), lit(1).as("__inv")))
    val tok = docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val per = tok.join(vocab, Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__inv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_bp", floor(col("n_oov") * 10000 / col("n_tokens")))
    docs.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .na.fill(0L, Seq("n_tokens", "n_oov", "oov_bp"))
  }
}
