package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Curate, Dedup, Dsir, QualityRules}

/** Fluent Scala facade over the corpus-curation operators — the
  * library-API twin of the CLI `settle`/`select` commands, for users
  * driving the pipeline from code instead of the shell:
  *
  * {{{
  * val out = CorpusPipeline(docs, "doc_id", "text")
  *   .quality(minWords = 50)
  *   .blocklist(Seq("spamword"))
  *   .dedupExact()
  *   .select(col("source") === "wiki", keepBp = 3000)
  *   .run()
  * out.corpus        // the surviving rows, original schema
  * out.funnel        // Seq(stage -> rows surviving after it)
  * }}}
  *
  * Each stage is the corresponding operator verbatim (same semantics,
  * same scale shape); the facade threads the surviving-id set through,
  * persisting each stage's output so the per-stage audit count doubles
  * as its materialization (downstream stages read the cache, never a
  * re-run of the upstream chain). Stages run in the order declared;
  * see run() for the cache lifecycle. */
final class CorpusPipeline private (
    df: DataFrame, idCol: String, textCol: String,
    stages: Vector[(String, DataFrame => DataFrame)]) {

  private def add(name: String, f: DataFrame => DataFrame) =
    new CorpusPipeline(df, idCol, textCol, stages :+ (name -> f))

  /** Gopher-rule quality gate (QualityRules.keep verbatim). */
  def quality(minWords: Int = 50, maxWords: Int = 100000): CorpusPipeline =
    add("quality",
      d => QualityRules.keep(d, idCol, textCol, minWords, maxWords))

  /** Intra-document repeated-chunk removal (Dedup.removeRepeatedChunks,
    * the RefinedWeb within-page line dedup): rewrites the text column
    * in place — repeated k-token chunks collapse to their first
    * occurrence; no document is dropped (n_chunks ≥ 1 docs keep at
    * least their first chunk, empty docs pass through empty). */
  def dedupChunk(chunkTokens: Int = 4): CorpusPipeline =
    add("dedup_chunk", d => Dedup.rewriteText(d, idCol, textCol,
      Dedup.removeRepeatedChunks(d, idCol, textCol,
        chunkTokens = chunkTokens)))

  /** Suffix-array-class long-match rewrite (Dedup.longMatchRemove):
    * maximal duplicated runs of ≥ minLen tokens are cut from every
    * carrier except the corpus-wide first (Lee et al. 2022's keep-one
    * contract); text column rewritten in place, no docs dropped. */
  def dedupLongMatch(minLen: Int = 50, maxDf: Int = 1000): CorpusPipeline =
    add("dedup_longmatch", d => Dedup.rewriteText(d, idCol, textCol,
      Dedup.longMatchRemove(d, idCol, textCol,
        minLen = minLen, maxDf = maxDf)))

  /** Full Gopher repetition-family gate (QualityRules.keepRepetition):
    * duplicate line/paragraph fractions, top- and duplicate-n-gram
    * character coverage, at the published thresholds. */
  def repetition(lineTokens: Int = 4, paraTokens: Int = 12): CorpusPipeline =
    add("repetition",
      d => QualityRules.keepRepetition(d, idCol, textCol,
        lineTokens = lineTokens, paraTokens = paraTokens))

  /** Wordlist gate (Curate.blocklistGate keep verdicts). */
  def blocklist(words: Seq[String], maxHits: Long = 1L): CorpusPipeline =
    add("blocklist", d => d.join(
      Curate.blocklistGate(d, idCol, textCol, words, maxHits)
        .filter(col("keep")).select(col("id").as("__keep_id")),
      d(idCol).cast("long") === col("__keep_id"), "left_semi"))

  /** Exact text dedup, min-id representative per group. */
  def dedupExact(): CorpusPipeline =
    add("dedup_exact", d => d.join(
      Dedup.exact(d, idCol, Seq(textCol))
        .select(col("keep_id").as("__keep_id")),
      d(idCol).cast("long") === col("__keep_id"), "left_semi"))

  /** MinHash near-dup collapse at jaccard ≥ threshold: connected
    * components over candidate pairs, keep each cluster's root. */
  def dedupNear(threshold: Double = 0.8): CorpusPipeline =
    add("dedup_near", { d =>
      val dropped = Dedup.connectedComponents(
          Dedup.minhashNearDup(d, idCol, textCol, threshold = threshold),
          "id_a", "id_b")
        .filter(col("id") =!= col("root"))
        .select(col("id").as("__drop_id"))
      d.join(dropped, d(idCol).cast("long") === col("__drop_id"),
        "left_anti")
    })

  /** Paragraph-level dedup (Dedup.paragraphDedup — the CCNet recipe):
    * each paragraph survives only in its corpus-wide first carrier,
    * the document's text is REPLACED by its surviving paragraphs
    * (column order preserved), and documents left with no paragraphs
    * drop out of the pipeline — so downstream stages see boilerplate-
    * free text, the standard stacking order. */
  def dedupParagraph(splitRegex: String = "\\n{2,}",
                     delim: String = "\n"): CorpusPipeline =
    add("dedup_paragraph", { d =>
      // aliased working name: a corpus whose text column is ITSELF
      // "clean_text" (re-curating a settle output) would otherwise
      // make the post-join reference ambiguous
      val cleaned = Dedup.paragraphDedup(d, idCol, textCol, splitRegex,
          delim)
        .filter(col("clean_text") =!= "")
        .select(col("id").as("__pd_id"), col("clean_text").as("__pd_text"))
      d.join(cleaned, d(idCol).cast("long") === col("__pd_id"))
        .select(d.columns.map(c =>
          if (c == textCol) col("__pd_text").as(textCol) else d(c)): _*)
    })

  /** CCNet perplexity-bucket keep (Curate.surprisalBuckets): label
    * each source's docs head/middle/tail by surprisal terciles and
    * keep the named buckets — CCNet trains on head+middle, the
    * default here. */
  def keepBuckets(sourceCol: String,
                  keep: Set[String] = Set("head", "middle"))
      : CorpusPipeline = {
    require(keep.nonEmpty && keep.subsetOf(Set("head", "middle", "tail")),
      s"keep must be a non-empty subset of head/middle/tail, got $keep")
    add("buckets", d => d.join(
      graft.operators.Curate
        .surprisalBuckets(d, idCol, textCol, sourceCol)
        .filter(col("bucket").isin(keep.toSeq: _*))
        .select(col("id").as("__bk_id")),
      d(idCol).cast("long") === col("__bk_id"), "left_semi"))
  }

  /** BM25 relevance keep (Rank.bm25): score the pool against probe
    * terms — the pool itself is the background model — and keep docs
    * at score ≥ `minScoreE4`. The retrieval-shaped curation gate for
    * "docs about X" without a labeled target corpus. */
  def relevance(terms: Seq[String], minScoreE4: Long): CorpusPipeline =
    add("relevance", d => d.join(
      graft.operators.Rank.bm25(d, idCol, textCol, terms)
        .filter(col("score_e4") >= minScoreE4)
        .select(col("id").as("__rel_id")),
      d(idCol).cast("long") === col("__rel_id"), "left_semi"))

  /** DSIR target-shaped subsample: one-pass self fit+score against the
    * rows matching `isTarget`, then the exact PPS keep at `keepBp`. */
  def select(isTarget: Column, keepBp: Int, buckets: Int = 4096)
      : CorpusPipeline =
    add("select", { d =>
      val scored = graft.core.Caching.persistTracked(
        Dsir.scoreSelf(d, isTarget, idCol, textCol, buckets))
      // the min is null exactly when an earlier stage emptied the pool
      // — keep the (empty) frame rather than NPE on the aggregate
      val minRow = scored.agg(min(col("dsir_cb"))).head()
      val keptIds =
        (if (minRow.isNullAt(0) || keepBp >= 10000) scored
         else graft.etl.Preprocess.weightedSample(
           scored.withColumn("__w",
             col("dsir_cb") - minRow.getLong(0) + 1L),
           "id", "__w", keepBp))
          .select(col("id").as("__keep_id"))
      d.join(keptIds, d(idCol).cast("long") === col("__keep_id"),
        "left_semi")
    })

  /** Per-source token budget (Curate.tokenBudgetPerSource keep set). */
  def budget(sourceCol: String, tokensPerSource: Long): CorpusPipeline =
    add("budget", d => d.join(
      Curate.tokenBudgetPerSource(d, idCol, textCol, sourceCol,
          tokensPerSource)
        .select(col("id").as("__keep_id")),
      d(idCol).cast("long") === col("__keep_id"), "left_semi"))

  /** Run the declared stages in order; the funnel records the row
    * count entering the pipeline and surviving each stage. Each
    * stage's output is persisted before its count (the audit count
    * doubles as the materialization, so later stages read the cache
    * instead of re-running the whole upstream chain), the previous
    * stage's cache is dropped once the next is materialized, and every
    * operator-internal tracked persist is released per stage
    * (`Caching.scopedRelease`). The FINAL corpus stays persisted for
    * the caller — drop it with `Result.release()` when done. */
  def run(): CorpusPipeline.Result = {
    val funnel = Vector.newBuilder[(String, Long)]
    funnel += ("input" -> df.count())
    var prev: Option[DataFrame] = None
    val out = stages.foldLeft(df) { case (d, (name, f)) =>
      val next = graft.core.Caching.scopedRelease {
        val n = f(d).persist()
        funnel += (name -> n.count())
        n
      }
      prev.foreach { p => p.unpersist(); () }
      prev = Some(next)
      next
    }
    CorpusPipeline.Result(out, funnel.result())
  }
}

object CorpusPipeline {
  final case class Result(corpus: DataFrame, funnel: Seq[(String, Long)]) {
    /** Drop the final corpus's cache (run() leaves it pinned for the
      * caller); unpersist on a never-persisted frame is a no-op. */
    def release(): Unit = { corpus.unpersist(); () }
  }

  def apply(df: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): CorpusPipeline = {
    require(Seq(idCol, textCol).forall(df.columns.contains),
      s"corpus needs columns '$idCol' and '$textCol'")
    // the stages key on LONG ids (cast internally): a string id would
    // cast to null and silently empty every semi-join — refuse loudly,
    // the CLI's requireIntegralId contract
    import org.apache.spark.sql.types._
    val ok = df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(ok, s"id column '$idCol' must be an integral type (stages " +
      s"key on long ids); got ${df.schema(idCol).dataType.simpleString}")
    new CorpusPipeline(df, idCol, textCol, Vector.empty)
  }
}
