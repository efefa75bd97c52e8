package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{qualityBpTokens, tokens}

/** Token-budgeted, quality-ranked corpus curation: from each source,
  * keep the highest-quality documents until that source's token budget
  * is spent (the curation step that precedes mixture sampling —
  * [[Mix]] balances PROPORTIONS, this caps per-source VOLUME).
  *
  * Selection rule (the contract the oracle pins): order each source's
  * docs by (quality_bp DESC, id ASC) and keep the maximal prefix whose
  * cumulative token count stays ≤ budget. Because the running sum is
  * monotone, "rows whose cumulative sum ≤ budget" IS that prefix, so
  * the rule is expressible as a plain window cumsum — which is exactly
  * what the DuckDB oracle runs (q77).
  *
  * The implementation does NOT run that window: `sourceCol` is
  * low-cardinality (tens of sources over billions of docs), so a
  * per-source sort would serialize each source through one reducer —
  * the README's no-low-cardinality-window rule. Instead, threshold
  * selection in three scale-shaped steps:
  *
  *  1. histogram: one shuffle on (source, quality_bp) — quality_bp is
  *     bounded (0..~10120 basis points), so the aggregate is at most
  *     sources × ~10k rows: driver-sized by construction, like a
  *     codebook collect.
  *  2. per-source cutoff on the driver: walk tiers from the top until
  *     the next tier would overflow the budget → (cut_bp, tokens kept
  *     above the cut, remainder for the cut tier).
  *  3. one broadcast join of the cuts against the slim scored
  *     projection: docs ABOVE the cut pass with no sort anywhere;
  *     docs AT the cut run the prefix window over the boundary tier
  *     only — one quality tier of one source, a sliver of the corpus.
  *     (Degenerate corpora where most docs share one quality_bp push
  *     that sliver wide; such corpora defeat any quality ranking.)
  *
  * Tokenizes once: n_tokens and quality_bp both derive from the same
  * token-array projection.
  */
object Curate {

  /** Kept docs as (id, source, n_tokens, quality_bp). Docs from every
    * source are curated; a budget ≤ 0 keeps nothing. */
  def tokenBudgetPerSource(df: DataFrame, idCol: String, textCol: String,
                           sourceCol: String, budgetTokens: Long)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val toks = tokens(col(textCol))
    // persisted: the tokenize+quality scan is the dominant per-row cost
    // and THREE consumers read this projection (the histogram collect,
    // the above-cut branch, the boundary branch) — unpersisted, each
    // re-reads and re-tokenizes the full text column (guide §5:
    // reused AND expensive to recompute). The cached frame is slim
    // (id, source, two longs), never the text.
    val scored = graft.core.Caching.persistTracked(df.select(
      col(idCol).cast("long").as("id"),
      col(sourceCol).as("source"),
      size(toks).cast("long").as("n_tokens"),
      qualityBpTokens(toks).as("quality_bp")))

    if (budgetTokens <= 0L) return scored.limit(0)

    // 1. bounded histogram: tokens per (source, quality tier)
    val hist = scored.groupBy($"source", $"quality_bp")
      .agg(sum($"n_tokens").as("tier_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // 2. driver-side cutoffs: keep whole tiers from the top while they
    // fit; the first tier that does not fit becomes the boundary tier,
    // with `rem` tokens of budget left for its doc-id-ordered prefix.
    // cut = Long.MinValue means every tier fits (no boundary pass).
    val cuts = hist.groupBy(_._1).map { case (src, tiers) =>
      var rem = budgetTokens
      var cut = Long.MinValue
      for ((_, bp, t) <- tiers.sortBy(-_._2) if cut == Long.MinValue) {
        if (t <= rem) rem -= t
        else cut = bp
      }
      (src, cut, if (cut == Long.MinValue) 0L else rem)
    }.toSeq.toDF("source", "cut_bp", "rem_tokens")

    // 3. broadcast cuts; whole kept tiers need no sort at all
    val joined = scored.join(broadcast(cuts), Seq("source"))
    val above = joined.filter($"quality_bp" > $"cut_bp")
    // prefix window over the boundary tier only (id-ordered, per the
    // selection rule); rowsBetween makes the inclusive cumsum explicit
    val w = Window.partitionBy($"source").orderBy($"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = joined.filter($"quality_bp" === $"cut_bp")
      .withColumn("cum", sum($"n_tokens").over(w))
      .filter($"cum" <= $"rem_tokens")
      .drop("cum")

    above.unionByName(boundary)
      .select($"id", $"source", $"n_tokens", $"quality_bp")
  }

  /** Quality-percentile gate: from each source keep the top `keepBp`
    * basis points of DOCUMENTS by quality — the rank-based sibling of
    * [[tokenBudgetPerSource]] (that caps token VOLUME; this trims a
    * fixed quality QUANTILE, the "drop the worst 70% of this crawl"
    * move). Selection rule: per source, order by (quality_bp DESC,
    * id ASC) and keep the first floor(keepBp · n_docs / 10000) — the
    * exact rule the oracle replays as one ROW_NUMBER (q100).
    *
    * Same three scale-shaped steps as the token budget — bounded
    * (source × quality-tier) doc-count histogram, driver-side tier
    * walk, broadcast cuts — so no per-source window ever touches more
    * than the boundary tier. */
  def qualityPercentileGate(df: DataFrame, idCol: String, textCol: String,
                            sourceCol: String, keepBp: Int): DataFrame = {
    require(keepBp >= 0 && keepBp <= 10000,
      s"keepBp must be in [0, 10000], got $keepBp")
    val spark = df.sparkSession
    import spark.implicits._

    val toks = tokens(col(textCol))
    val scored = df.select(
      col(idCol).cast("long").as("id"),
      col(sourceCol).as("source"),
      size(toks).cast("long").as("n_tokens"),
      qualityBpTokens(toks).as("quality_bp"))

    percentileCut(scored, "quality_bp", keepBp)
  }

  /** Shared per-source percentile machinery (the q77/q100 shape): keep
    * the top `keepBp` of each source's rows by (`scoreCol` desc, id
    * asc), WITHOUT ever sorting a source's rows globally — a bounded
    * (source, score) histogram collects to the driver, per-source
    * cutoffs broadcast back, whole above-cut tiers pass unsorted, and
    * only the boundary tier (rows AT the cutoff score) pays a
    * row_number. All input columns pass through. `scoreCol` must be a
    * long (exact-integer scores are what make the histogram bounded
    * and the cut replayable). */
  private[operators] def percentileCut(scored: DataFrame,
                                       scoreCol: String,
                                       keepBp: Int): DataFrame = {
    require(keepBp >= 0 && keepBp <= 10000,
      s"keepBp must be in [0, 10000], got $keepBp")
    if (keepBp == 0) scored.limit(0)
    else quotaCut(scored, scoreCol, n => keepBp.toLong * n / 10000L)
  }

  /** Per-source document CAP (the RefinedWeb "no source dominates"
    * move): keep at most `maxDocs` documents per source, the BEST by
    * (quality_bp DESC, id ASC) — the count-quota sibling of
    * [[qualityPercentileGate]] (a fixed quantile) and
    * [[tokenBudgetPerSource]] (a token budget). Sources under the cap
    * pass whole. Selection rule ≡ one per-source ROW_NUMBER ≤ maxDocs
    * (the oracle's replay, q132); the plan is the shared
    * bounded-histogram / broadcast-cutoff / boundary-tier-only-window
    * shape — a source with a billion documents never pays a global
    * per-source sort, only its cutoff quality tier ranks. */
  def capPerSource(df: DataFrame, idCol: String, textCol: String,
                   sourceCol: String, maxDocs: Long): DataFrame = {
    require(maxDocs >= 0, s"maxDocs must be >= 0, got $maxDocs")
    val toks = tokens(col(textCol))
    val scored = df.select(
      col(idCol).cast("long").as("id"),
      col(sourceCol).as("source"),
      size(toks).cast("long").as("n_tokens"),
      qualityBpTokens(toks).as("quality_bp"))
    if (maxDocs == 0) scored.limit(0)
    else quotaCut(scored, "quality_bp", n => math.min(n, maxDocs))
  }

  /** Shared per-source quota machinery behind [[percentileCut]] and
    * [[capPerSource]]: keep the top `quotaOf(sourceDocs)` rows of each
    * source by (`scoreCol` desc, id asc) without ever sorting a
    * source's rows globally. */
  private def quotaCut(scored0: DataFrame, scoreCol: String,
                       quotaOf: Long => Long): DataFrame = {
    val spark = scored0.sparkSession
    import spark.implicits._

    // persisted for the same three-consumer reason as
    // tokenBudgetPerSource: histogram + above + boundary each read it,
    // and the caller's projection is the expensive tokenize pass
    val scored = graft.core.Caching.persistTracked(scored0)

    // 1. bounded histogram: docs per (source, score tier)
    val hist = scored.groupBy($"source", col(scoreCol))
      .agg(count(lit(1)).as("tier_docs"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // 2. per-source quota + cutoffs on the driver
    val cuts = hist.groupBy(_._1).map { case (src, tiers) =>
      val n = tiers.map(_._3).sum
      var rem = quotaOf(n)
      var cut = Long.MinValue
      for ((_, sc, c) <- tiers.sortBy(-_._2) if cut == Long.MinValue) {
        if (c <= rem) rem -= c
        else cut = sc
      }
      (src, cut, if (cut == Long.MinValue) 0L else rem)
    }.toSeq.toDF("source", "__cut_sc", "__rem_docs")

    // 3. whole kept tiers pass unsorted; the boundary tier ranks by id
    val joined = scored.join(broadcast(cuts), Seq("source"))
    val above = joined.filter(col(scoreCol) > $"__cut_sc")
    val w = Window.partitionBy($"source").orderBy($"id")
    val boundary = joined.filter(col(scoreCol) === $"__cut_sc")
      .withColumn("__rn", row_number().over(w))
      .filter($"__rn" <= $"__rem_docs")
      .drop("__rn")

    above.unionByName(boundary)
      .select(scored.columns.map(col): _*)
  }

  /** CCNet-style perplexity buckets (Wenzek et al., LREC 2020: CCNet
    * splits each language's corpus into head/middle/tail THIRDS by
    * language-model perplexity and trains preferentially on the head):
    * per source, documents are labeled by unigram-surprisal terciles —
    * surprisal is the suite's model-free perplexity proxy, LOWER =
    * closer to the corpus distribution = head.
    *
    * Built on [[percentileCut]] twice (top 3333 bp = head, top 6667 bp
    * = head+middle; negated surprisal so "top" means lowest), so the
    * tercile boundaries use the same bounded-histogram / broadcast-
    * cutoff / boundary-tier-only-window plan the token-budget and
    * percentile gates certify — never a per-source global sort. The
    * surprisal scan runs ONCE (persisted) and both cuts read the
    * cache. Equivalent ranking: ROW_NUMBER per source ordered by
    * (surprisal_cb asc, id asc) against floor(n·3333/10^4) and
    * floor(n·6667/10^4) quotas — the oracle's replay.
    *
    * Zero-token docs surprisal-zero-fill to the head (the score()
    * convention: the caller's length/quality gate decides, and it runs
    * BEFORE bucketing in the settle order).
    *
    * Output: id, source, surprisal_cb, bucket ∈ {head, middle, tail}. */
  def surprisalBuckets(docs: DataFrame, idCol: String, textCol: String,
                       sourceCol: String): DataFrame =
    surprisalBucketsWith(docs, idCol, textCol, sourceCol,
      d => graft.operators.Vocab.surprisal(d, idCol, textCol))

  /** The TRUE CCNet form: terciles by surprisal against a STORED
    * reference LM (`Vocab.surprisalFromLm`) instead of a self-fit —
    * CCNet scores each crawl against a fixed Wikipedia-trained model,
    * so bucket boundaries move with the batch but the MODEL does not,
    * and two slices bucket comparably. */
  def surprisalBucketsFromLm(docs: DataFrame, idCol: String,
                             textCol: String, sourceCol: String,
                             lmPath: String): DataFrame =
    surprisalBucketsWith(docs, idCol, textCol, sourceCol,
      d => graft.operators.Vocab.surprisalFromLm(d, idCol, textCol,
        lmPath))

  private def surprisalBucketsWith(docs: DataFrame, idCol: String,
                                   textCol: String, sourceCol: String,
                                   score: DataFrame => DataFrame)
      : DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val scored = graft.core.Caching.persistTracked(
      score(docs)
        .join(docs.select(col(idCol).cast("long").as("id"),
          col(sourceCol).as("source")), Seq("id"))
        .select($"id", $"source", $"surprisal_cb",
          (-$"surprisal_cb").as("__neg_cb")))

    // ONE bounded (source, score) histogram serves BOTH tercile cuts,
    // and the bucket label is assigned directly from the broadcast
    // cutoffs — the previous form ran percentileCut twice (two
    // histogram collect jobs, two above∪boundary unions) and then
    // re-joined the corpus against both kept-id sets (two more joins on
    // id). Selection rule unchanged and exact: per source, head = top
    // floor(n·3333/10⁴) by (__neg_cb desc, id asc), head+middle = top
    // floor(n·6667/10⁴) — above-cut tiers pass with no sort anywhere,
    // and only rows AT a cutoff tier pay a row_number over that one
    // tier. (Guide §2.4 — remove shuffles/joins outright.)
    val hist = scored.groupBy($"source", $"__neg_cb")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    val cuts = hist.groupBy(_._1).map { case (src, tiers) =>
      val n = tiers.map(_._3).sum
      val desc = tiers.sortBy(-_._2)
      // same tier walk as quotaCut: keep whole tiers from the top while
      // they fit; the first tier that does not fit is the boundary,
      // with `rem` rows of quota left for its id-ordered prefix
      def cutFor(keepBp: Int): (Long, Long) = {
        var rem = keepBp.toLong * n / 10000L
        var cut = Long.MinValue
        for ((_, sc, c) <- desc if cut == Long.MinValue) {
          if (c <= rem) rem -= c
          else cut = sc
        }
        (cut, if (cut == Long.MinValue) 0L else rem)
      }
      val (cutH, remH) = cutFor(3333)
      val (cutHm, remHm) = cutFor(6667)
      (src, cutH, remH, cutHm, remHm)
    }.toSeq.toDF("source", "__cut_h", "__rem_h", "__cut_hm", "__rem_hm")

    val joined = scored.join(broadcast(cuts), Seq("source"))
    val isBoundary =
      $"__neg_cb" === $"__cut_h" || $"__neg_cb" === $"__cut_hm"
    // head+middle quota ≥ head quota ⇒ cut_hm ≤ cut_h, so the two
    // when-chains below are exhaustive and mutually consistent; for a
    // shared boundary tier (cut_h == cut_hm) the same rn serves both
    // prefixes (rem_hm ≥ rem_h by the same quota monotonicity)
    def bucketOf(rn: Column): Column =
      when($"__neg_cb" > $"__cut_h" ||
        ($"__neg_cb" === $"__cut_h" && rn <= $"__rem_h"), "head")
        .when($"__neg_cb" > $"__cut_hm" ||
          ($"__neg_cb" === $"__cut_hm" && rn <= $"__rem_hm"), "middle")
        .otherwise("tail")
    val w = Window.partitionBy($"source", $"__neg_cb").orderBy($"id")
    val outCols = Seq($"id", $"source", $"surprisal_cb")
    val plain = joined.filter(!isBoundary)
      .select(outCols :+ bucketOf(lit(Long.MaxValue)).as("bucket"): _*)
    val boundary = joined.filter(isBoundary)
      .withColumn("__rn", row_number().over(w))
      .select(outCols :+ bucketOf($"__rn").as("bucket"): _*)
    plain.unionByName(boundary)
  }

  /** Blocklist gate — the wordlist filter every public-web pipeline
    * runs (toxicity / NSFW / spam term lists): per doc, the number of
    * blocklisted token OCCURRENCES, the number of distinct blocklisted
    * types hit, and the keep verdict (fewer than `maxHits`
    * occurrences). The list is normalized to lowercase and matching is
    * case-insensitive whole-token (substring matching bans "class" for
    * "ass" — the classic wordlist false-positive; phrase-level lists
    * go through the decontamination n-gram tiers instead).
    *
    * Scale shape: ONE tokenize pass; the list (driver-bounded — these
    * lists are thousands of words, the vocab-broadcast argument) meets
    * the token stream as a broadcast semi-ish join, then one per-doc
    * aggregate. Zero-token docs keep (nothing to match). */
  def blocklistGate(df: DataFrame, idCol: String, textCol: String,
                    words: Seq[String], maxHits: Long = 1L): DataFrame = {
    require(words.nonEmpty, "need a non-empty blocklist")
    require(maxHits >= 1, s"maxHits must be >= 1, got $maxHits")
    val spark = df.sparkSession
    import spark.implicits._
    val list = broadcast(words.map(_.toLowerCase).distinct.toDF("__w"))
    val hits = df
      .select(col(idCol).cast("long").as("id"),
        explode(graft.functions.TextFunctions.tokens(col(textCol)))
          .as("__t"))
      .select($"id", lower($"__t").as("__t"))
      .join(list, $"__t" === $"__w")
      .groupBy($"id")
      .agg(count(lit(1)).as("n_hits"),
        size(collect_set($"__t")).cast("long").as("n_hit_types"))
    df.select(col(idCol).cast("long").as("id"))
      .join(hits, Seq("id"), "left")
      .na.fill(0L, Seq("n_hits", "n_hit_types"))
      .withColumn("keep", col("n_hits") < maxHits)
  }
}
