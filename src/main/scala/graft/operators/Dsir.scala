package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** DSIR-style importance scoring for training-data selection (Xie et
  * al., "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023 — public method, no reference-repo counterpart): fit
  * hashed bag-of-n-gram models over a small TARGET corpus (the domain
  * you want more of) and the RAW pool, then score every raw document by
  * its log-likelihood ratio under the two models. High scores = "looks
  * like the target"; feeding the scores into a weighted or top-fraction
  * sample yields a target-shaped subset of the pool.
  *
  * Exactness adaptation: per-bucket log-probabilities use integer BITS
  * (bit length, the `Vocab.surprisal` convention) instead of float
  * log2, so every score is exact integer arithmetic until one final
  * floor division. Features are unigram + bigram OCCURRENCES (bag
  * semantics, as in the paper) hashed into `buckets` cells — by native
  * xxhash64 in the production tier, or by the md5-prefix trick both
  * engines compute identically in the certified tier (keyMode = "md5",
  * DuckDB replays every score bit-for-bit; the Novelty/Overlap
  * two-tier convention).
  *
  * Scale shape (100 TB posture): the gram stream never shuffles on a
  * string — each side collapses to a `buckets`-row count table (map-side
  * partial aggregation bounds the shuffle at O(partitions × buckets)),
  * the λ table is O(buckets) and BROADCAST, and scoring is one
  * map-side join plus one per-doc aggregate. The target corpus is
  * typically tiny (a curated domain sample); the raw pool is the 100 TB
  * side and is touched exactly twice, each time scan→aggregate.
  */
object Dsir {

  /** Gram bucket in [0, buckets) — "xxhash64" is the production tier
    * (native, codegen'd, cheapest per occurrence); "md5" buckets via
    * the 60-bit md5-prefix long both engines compute identically (the
    * Novelty.gramKey family), making the whole score oracle-replayable.
    * The two tiers differ only in WHICH bucket a gram lands in. */
  private def bucket(g: Column, buckets: Int, keyMode: String): Column =
    keyMode match {
      case "xxhash64" => pmod(xxhash64(g), lit(buckets.toLong))
      case "md5" => pmod(conv(substring(md5(g), 1, 15), 16, 10)
        .cast("long"), lit(buckets.toLong))
      case other => throw new IllegalArgumentException(
        s"unknown keyMode '$other' (xxhash64 | md5)")
    }

  /** Occurrence-level unigram + bigram stream: one row per gram
    * occurrence, carrying (id, bucket). ONE tokenize, ONE explode: the
    * bigram occurrences are concatenated onto the token array in the
    * same staged projection (tokenize-once discipline — see the
    * TextFunctions.shingles perf note). */
  private def gramBuckets(docs: DataFrame, idCol: String, textCol: String,
                          buckets: Int, keyMode: String): DataFrame =
    occurrences(docs.select(col(idCol).cast("long").as("id"),
      col(textCol)), textCol, buckets, keyMode)
      .select(col("id"), col("__b"))

  /** Occurrence-level gram-bucket stream over ANY carried columns:
    * one row per unigram/bigram occurrence with its bucket in `__b`,
    * every non-text input column passed through. ONE tokenize, ONE
    * explode (tokenize-once discipline). */
  private def occurrences(df: DataFrame, textCol: String, buckets: Int,
                          keyMode: String): DataFrame = {
    val carried = df.columns.filterNot(_ == textCol).map(col).toSeq
    val staged = df
      .withColumn("__tk", tokens(col(textCol)))
      .withColumn("__bi",
        when(size(col("__tk")) >= 2,
          transform(sequence(lit(0), size(col("__tk")) - 2),
            i => concat_ws(" ", slice(col("__tk"), i + 1, lit(2)))))
          .otherwise(array().cast("array<string>")))
    staged
      .select(carried :+
        explode(concat(col("__tk"), col("__bi"))).as("__g"): _*)
      .select(carried :+ bucket(col("__g"), buckets, keyMode).as("__b"): _*)
  }

  /** integer bit length (floor(log2 x) + 1 for x > 0) — exact on both
    * engines via the base-2 string, never a float log. */
  private def bits(c: Column): Column = length(conv(c, 10, 2)).cast("long")

  /** Fit the per-bucket importance weights: for each hash bucket b,
    *
    *   w[b] = [bits(ct[b]+1) − bits(Nt+B)] − [bits(cr[b]+1) − bits(Nr+B)]
    *
    * ≈ log2 p̂_target(b) − log2 p̂_raw(b) with add-one smoothing (the
    * +1/+B terms are exactly Laplace smoothing, so buckets unseen in
    * either corpus get a finite, consistent weight). Output is ONE
    * small frame of `buckets` rows — (bucket, w_bits, ct, cr) — meant
    * to be broadcast by [[score]]; persist it to parquet to reuse
    * across scoring runs. */
  def bucketWeights(target: DataFrame, raw: DataFrame, textCol: String,
                    buckets: Int = 4096,
                    keyMode: String = "xxhash64"): DataFrame = {
    def side(df: DataFrame, cnt: String): DataFrame =
      gramBuckets(df.select(lit(0L).as("__id0"), col(textCol)), "__id0",
          textCol, buckets, keyMode)
        .groupBy(col("__b").as("bucket"))
        .agg(count(lit(1)).as(cnt))
    val t = side(target, "ct")
    val r = side(raw, "cr")
    // full outer + zero fill: a bucket empty on one side still needs its
    // smoothed weight (that asymmetry IS the signal)
    finishWeights(t.join(r, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("ct", "cr")), buckets, keyMode)
  }

  /** One-pass weight fit for the common case where target and raw are
    * SLICES OF THE SAME POOL (e.g. "docs from the wiki source vs the
    * rest"): each gram occurrence is tagged with its side and both
    * count columns aggregate in a single corpus scan — half the IO of
    * [[bucketWeights]] over two full-pool slices. Rows where
    * `isTarget` is NULL belong to neither side (excluded, the SQL
    * three-valued convention). */
  def bucketWeightsSplit(pool: DataFrame, isTarget: Column,
                         textCol: String, buckets: Int = 4096,
                         keyMode: String = "xxhash64"): DataFrame = {
    val g = gramBuckets(
      pool.select(isTarget.cast("long").as("__side"), col(textCol)),
      "__side", textCol, buckets, keyMode)
    finishWeights(
      g.groupBy(col("__b").as("bucket"))
        .agg(sum(when(col("id") === 1L, 1L).otherwise(0L)).as("ct"),
          sum(when(col("id") === 0L, 1L).otherwise(0L)).as("cr")),
      buckets, keyMode)
  }

  /** One-pass fit-and-score for the SELF-selection case — score a pool
    * against weights fitted on a slice of that same pool (the q107 /
    * `select --mode dsir` shape). The gram stream collapses ONCE to a
    * cached per-(id, side, bucket) count frame; the weight table, the
    * Laplace totals and every per-doc score all derive from that frame,
    * so the corpus text is read exactly once (the two-call form reads
    * it twice: fit + score). Output and semantics are identical to
    * `score(pool, …, bucketWeightsSplit(pool, …))` — spec-pinned. */
  def scoreSelf(pool: DataFrame, isTarget: Column, idCol: String,
                textCol: String, buckets: Int = 4096,
                keyMode: String = "xxhash64"): DataFrame = {
    val spark = pool.sparkSession
    import spark.implicits._
    val pib = graft.core.Caching.persistTracked(
      occurrences(pool.select(col(idCol).cast("long").as("id"),
          isTarget.cast("long").as("__side"), col(textCol)),
          textCol, buckets, keyMode)
        .groupBy(col("id"), col("__side"), col("__b"))
        .agg(count(lit(1)).as("__c")))
    val weights = finishWeights(
      pib.groupBy(col("__b").as("bucket"))
        .agg(sum(when(col("__side") === 1L, col("__c")).otherwise(0L))
          .as("ct"),
          sum(when(col("__side") === 0L, col("__c")).otherwise(0L))
            .as("cr")),
      buckets, keyMode)
    val w = broadcast(weights
      .select(col("bucket"), col("w_bits"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .toDF("__b", "w_bits"))
    val per = pib.join(w, Seq("__b"))
      .groupBy(col("id"))
      .agg(sum(col("__c")).as("n_grams"),
        sum(col("__c") * col("w_bits")).as("sum_bits"))
      .withColumn("dsir_cb", floor(col("sum_bits") * 100 / col("n_grams")))
    pool.select(col(idCol).cast("long").as("id"))
      .join(per, Seq("id"), "left")
      .na.fill(0L, Seq("n_grams", "sum_bits", "dsir_cb"))
  }

  /** Merge two weight tables fitted with IDENTICAL build params: the
    * per-bucket counts add and the weights recompute from the merged
    * totals, so `merge(fit(A), fit(B)) == fit(A ∪ B)` exactly
    * (spec-pinned — gram occurrences partition over the split). This
    * is the ingest path for a STORED selection model: update with each
    * batch's delta table in O(batch + buckets), never refit history.
    * Mismatched build params refuse loudly (a differently-hashed table
    * would silently corrupt every bucket). */
  def mergeWeights(a: DataFrame, b: DataFrame): DataFrame = {
    def params(df: DataFrame, tag: String): (Long, String) = {
      val md = df.schema("bucket").metadata
      require(md.contains("buckets") && md.contains("key_mode"),
        s"$tag table carries no build metadata — fit it with " +
          "Dsir.bucketWeights")
      (md.getLong("buckets"), md.getString("key_mode"))
    }
    val (ba, ka) = params(a, "left")
    val (bb, kb) = params(b, "right")
    require(ba == bb && ka == kb,
      s"weight tables were fitted with different params (buckets " +
        s"$ba/$bb, key_mode $ka/$kb) — counts from different hash " +
        "spaces must never merge")
    finishWeights(
      a.select(col("bucket"), col("ct"), col("cr"))
        .unionByName(b.select(col("bucket"), col("ct"), col("cr")))
        .groupBy(col("bucket"))
        .agg(sum(col("ct")).as("ct"), sum(col("cr")).as("cr")),
      ba.toInt, ka)
  }

  /** Shared tail of the two fit forms: all-buckets spine, Laplace
    * totals, integer-bits weights, build-params metadata. */
  private def finishWeights(joined0: DataFrame, buckets: Int,
                            keyMode: String): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 20),
      s"buckets must be in [1, 2^20] (the table is broadcast), got $buckets")
    // the counts frame is consumed TWICE (Laplace totals + the spine
    // join); without a persist each consumer would re-run the whole
    // corpus gram pass underneath — the frame is ≤ buckets rows, so
    // pinning it is free and saves a full scan
    val joined = graft.core.Caching.persistTracked(joined0)
    // coalesced totals: an empty corpus fits an all-zero-weight table
    // (every bucket bits(1)−bits(1+B) on both sides) instead of null
    // weights — and the DuckDB twin already coalesces its totals
    val totals = joined.agg(
      coalesce(sum(col("ct")), lit(0L)).as("__nt"),
      coalesce(sum(col("cr")), lit(0L)).as("__nr"))
    // all-buckets spine so even never-hit buckets carry a row (the
    // score join is a left join, but a complete table is replayable
    // and self-describing)
    val spine = joined.sparkSession.range(buckets)
      .select(col("id").as("bucket"))
    // build params ride as field metadata (the Novelty.gramIndex
    // contract): a probe against a table fitted with different buckets
    // would silently mis-bucket every gram, so score() refuses instead
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("buckets", buckets.toLong)
      .putString("key_mode", keyMode).build()
    spine.join(joined, Seq("bucket"), "left")
      .na.fill(0L, Seq("ct", "cr"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"), col("ct"), col("cr"),
        ((bits(col("ct") + 1) - bits(col("__nt") + buckets)) -
          (bits(col("cr") + 1) - bits(col("__nr") + buckets))).as("w_bits"))
      .withMetadata("bucket", md)
  }

  /** Score documents against a fitted weight table: per doc,
    * n_grams (unigram+bigram occurrences), sum_bits = Σ w[bucket(g)],
    * and dsir_cb = floor(sum_bits · 100 / n_grams) — the
    * length-normalized score in centibits (positive ⇒ target-like).
    * Zero-gram docs survive with all-zero stats (the caller's length
    * gate decides their fate — the dedup-tier contract). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            weights: DataFrame): DataFrame = {
    val md = weights.schema("bucket").metadata
    require(md.contains("buckets") && md.contains("key_mode"),
      "weights table carries no buckets/key_mode build metadata — fit " +
        "it with Dsir.bucketWeights (a table hashed with different " +
        "parameters would silently mis-bucket every gram)")
    val buckets = md.getLong("buckets").toInt
    val keyMode = md.getString("key_mode")
    // snapshot the weight table to a local relation before the join:
    // it is O(buckets) by contract (driver-bounded, the vocab-broadcast
    // argument), and leaving its fit lineage inside this plan would
    // re-run the fit's corpus pass once per broadcast build
    val spark = docs.sparkSession
    import spark.implicits._
    val w = broadcast(weights
      .select(col("bucket").cast("long"), col("w_bits").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .toDF("__b", "w_bits"))
    val per = gramBuckets(docs, idCol, textCol, buckets, keyMode)
      .join(w, Seq("__b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("w_bits")).as("sum_bits"))
      .withColumn("dsir_cb", floor(col("sum_bits") * 100 / col("n_grams")))
    docs.select(col(idCol).cast("long").as("id"))
      .join(per, Seq("id"), "left")
      .na.fill(0L, Seq("n_grams", "sum_bits", "dsir_cb"))
  }
}
