package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus mixing — sample a multi-source corpus so the OUTPUT follows
  * target proportions (the "data mixture" step of training-data prep:
  * 70% web / 20% code / 10% books, re-weighting domains, ablation
  * mixes).
  *
  * Math: with per-source counts n_s and target fractions f_s (summing
  * to 1), the largest achievable mixture without replacement is
  * T = min_s(n_s / f_s) total rows; each source then samples
  * fraction f_s · T / n_s of itself. Two passes: one count aggregate
  * (tiny — one row per source), one seeded `sampleBy` scan. Bernoulli
  * sampling makes proportions exact in expectation, ±binomial noise
  * in realization — the at-scale trade (exact-count sampling needs a
  * per-source sort or windowed row_number; at 100 TB the noise at any
  * realistic n is far below mixture-design tolerance).
  *
  * Sources absent from `targetFrac` are dropped. Deterministic for a
  * fixed seed and input partitioning.
  */
object Mix {

  /** The achievable total and per-source sampling fractions. */
  def plan(counts: Map[String, Long], targetFrac: Map[String, Double])
      : Map[String, Double] = {
    require(targetFrac.nonEmpty, "need at least one target source")
    targetFrac.keys.foreach(s => require(counts.getOrElse(s, 0L) > 0L,
      s"source '$s' has no rows"))
    val total = targetFrac.map { case (s, f) => counts(s) / f }.min
    targetFrac.map { case (s, f) =>
      s -> math.min(1.0, f * total / counts(s))
    }
  }

  /** Token-budget epoch planner: given target mixture weights (integer
    * basis points summing to 10000) and a total training-token budget,
    * how many EPOCHS (repeat factor, in bp — 10000 = one full pass) of
    * each source does the run consume, and where does an epoch cap
    * leave a deficit? This is the data-recipe arithmetic of an LLM
    * training run (web/code/books weights × budget → per-source repeat
    * factors), with the standard repeat ceiling — repeating a small
    * source too many times hurts more than undershooting its weight —
    * surfaced as an explicit per-source deficit instead of silently
    * rebalanced.
    *
    * Exact integer arithmetic throughout (long DIV — budgets at 100 TB
    * scale exceed double precision): target_tokens =
    * weight·budget DIV 10000, epochs_bp = target·10000 DIV n_tokens,
    * planned_tokens = min(epochs_bp, cap)·n_tokens DIV 10000.
    *
    * Scale shape: ONE count/sum aggregate over the corpus (map-side
    * combinable, shuffled on the low-cardinality source key), then
    * broadcast-joined against the driver-small weights table; output is
    * one row per WEIGHTED source (corpus sources without a weight are
    * excluded — the recipe IS the weights table). Misconfigurations
    * surface instead of vanishing: a weighted source with zero corpus
    * tokens — or absent from the corpus entirely, e.g. a typo'd name —
    * still gets its row, with zero counts and NULL epochs/planned
    * columns rather than a division error or a silent drop. */
  def epochPlan(docs: DataFrame, sourceCol: String, textCol: String,
                weightsBp: Map[String, Int], budgetTokens: Long,
                maxEpochsBp: Long = 40000L): DataFrame = {
    require(weightsBp.nonEmpty, "need at least one weighted source")
    require(weightsBp.values.forall(_ > 0),
      s"weights must be positive bp, got $weightsBp")
    require(weightsBp.values.sum == 10000,
      s"weights must sum to 10000 bp, got ${weightsBp.values.sum}")
    require(budgetTokens > 0, s"budget must be positive, got $budgetTokens")
    require(maxEpochsBp > 0, s"epoch cap must be positive, got $maxEpochsBp")
    val spark = docs.sparkSession
    import spark.implicits._
    val perSource = docs
      .select(col(sourceCol).as("source"),
        size(graft.functions.TextFunctions.tokens(col(textCol)))
          .cast("long").as("__nt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"))
    val w = broadcast(
      weightsBp.toSeq.sorted.toDF("source", "weight_bp"))
    // RIGHT join: the weights table drives the output, so a weighted
    // source missing from the corpus keeps its row (zero counts)
    perSource.join(w, Seq("source"), "right")
      .withColumn("n_docs", coalesce(col("n_docs"), lit(0L)))
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
      .withColumn("target_tokens",
        expr(s"CAST(weight_bp AS BIGINT) * ${budgetTokens}L DIV 10000"))
      .withColumn("epochs_bp",
        when(col("n_tokens") > 0,
          expr("target_tokens * 10000 DIV n_tokens")))
      // Spark's least() SKIPS nulls, which would silently report a
      // zero-token source as "capped" — keep the null explicit
      .withColumn("capped_bp",
        when(col("epochs_bp").isNull, lit(null))
          .otherwise(least(col("epochs_bp"), lit(maxEpochsBp))))
      .withColumn("planned_tokens",
        expr("capped_bp * n_tokens DIV 10000"))
      .withColumn("deficit_tokens",
        col("target_tokens") - col("planned_tokens"))
  }

  /** Sample `df` so sources follow `targetFrac` proportions. */
  /** Temperature-smoothed mixture weights (the multilingual-training
    * rebalance, Conneau & Lample 2019 §3.1 / mBERT's exponential
    * smoothing — public method): source s gets weight ∝ tokens_s^α,
    * with α ∈ (0, 1] interpolating between the natural distribution
    * (α = 1, big sources dominate) and uniform (α → 0, every source
    * equal). The output sums to EXACTLY 10000 bp via largest-remainder
    * rounding, so it feeds [[epochPlan]] unchanged.
    *
    * Exactness: x^α is irrational in general, so the certified path
    * quantizes it to floor(x^α · 2^20) BEFORE any sum (multiplying a
    * double by a power of two is exact, and integer sums are
    * order-independent — the centroid-drift trick). At α = 1/2 the
    * power is IEEE `sqrt`, correctly rounded on every engine, so the
    * whole weight table is oracle-replayable bit-for-bit; other α use
    * libm `pow` (deterministic per engine, spec-checked).
    *
    * Scale shape: ONE corpus-scale token-count aggregate; the close
    * then runs in BigInt on the driver over the per-source rows (one
    * per source — driver-bounded, the epochPlan weights-Map / Mix.plan
    * counts-Map precedent), so `tokens^α · 10^4` can never overflow a
    * Long no matter the corpus size. */
  def temperatureWeights(docs: DataFrame, sourceCol: String,
                         textCol: String, alphaBp: Int = 5000)
      : DataFrame = {
    require(alphaBp > 0 && alphaBp <= 10000,
      s"alphaBp must be in (0, 10000] basis points, got $alphaBp")
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE corpus-scale aggregate; the per-source frame is then
    // driver-bounded (one row per source — the epochPlan weights-Map /
    // Mix.plan counts-Map precedent), so the largest-remainder close
    // runs in BigInt on the driver: x^α·2^20 for a 10^13-token source
    // is ~10^19 and `q·10000` ~10^23 — past Long, trivially inside
    // BigInt. sqrt/pow stay IEEE doubles (sqrt correctly rounded on
    // every engine; ·2^20 is an exact exponent shift), so the α = 1/2
    // path remains oracle-replayable bit-for-bit (DuckDB HUGEINT).
    val per = docs
      .select(col(sourceCol).as("source"),
        size(graft.functions.TextFunctions.tokens(col(textCol)))
          .cast("long").as("__nt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2)))
      .toSeq
    temperatureClose(per, alphaBp)
      .toDF("source", "n_docs", "n_tokens", "weight_bp")
  }

  /** Verdict of one batch's realized source mix against a stored
    * target (see [[temperatureWeights]] / the epoch-plan weights):
    * worst-deviating source, its absolute deviation in bp, and the
    * drift flag. */
  final case class MixDrift(worstSource: String, maxDevBp: Long,
                            drifted: Boolean)

  /** Compare a batch's per-source TOKEN shares against target weights
    * (bp, summing to ≤ 10000): deviation is |share − weight| per
    * source over the UNION of sources (a target source missing from
    * the batch deviates by its full weight; an unplanned source by its
    * full share). One aggregate over the batch; everything after is
    * driver arithmetic on the per-source rows. */
  def mixDrift(batch: DataFrame, sourceCol: String, textCol: String,
               targetBp: Map[String, Long], marginBp: Long): MixDrift = {
    require(targetBp.nonEmpty, "need a non-empty target mix")
    val per = batch
      // a null source is an UNPLANNED source, not a crash: label it so
      // its share shows up as deviation like any other alien source
      .select(coalesce(col(sourceCol).cast("string"), lit("(null)"))
          .as("source"),
        size(graft.functions.TextFunctions.tokens(col(textCol)))
          .cast("long").as("__nt"))
      .groupBy(col("source"))
      .agg(sum(col("__nt")).as("n_tokens"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) 0L else r.getLong(1))).toMap
    val total = per.values.sum
    val share: String => Long =
      s => if (total > 0) per.getOrElse(s, 0L) * 10000 / total else 0L
    val devs = (per.keySet ++ targetBp.keySet).toSeq.sorted.map(s =>
      s -> math.abs(share(s) - targetBp.getOrElse(s, 0L)))
    val (worst, dev) = devs.maxBy { case (s, d) => (d, s) }
    MixDrift(worst, dev, dev > marginBp)
  }

  /** The pure largest-remainder close over (source, n_docs, n_tokens)
    * rows — package-visible so the overflow regression (10^13-token
    * sources, unreachable through fixture text) exercises it
    * directly. */
  private[operators] def temperatureClose(
      per: Seq[(String, Long, Long)], alphaBp: Int)
      : Seq[(String, Long, Long, Long)] = {
    val alpha = alphaBp / 10000.0
    def q(n: Long): BigInt = {
      val p = if (alphaBp == 5000) math.sqrt(n.toDouble)
              else math.pow(n.toDouble, alpha)
      // via BigDecimal, NOT toLong: n^α·2^20 exceeds Long for big
      // sources at α near 1 (the overflow this driver-side form fixes)
      BigDecimal(math.floor(p * 1048576.0)).toBigInt
    }
    val rows = per.map { case (s, d, n) => (s, d, n, q(n)) }
    val total = rows.map(_._4).sum
    require(total > 0,
      "corpus has no tokens in any source — temperature weights are " +
        "undefined (every x^alpha quantizes to 0)")
    val based = rows.map { case (s, d, n, qi) =>
      (s, d, n, (qi * 10000 / total).toLong, qi * 10000 % total)
    }
    val deficit = (10000L - based.map(_._4).sum).toInt
    based
      .sortBy { case (s, _, _, _, rem) => (rem, s) }(
        Ordering.Tuple2(Ordering[BigInt].reverse, Ordering[String]))
      .zipWithIndex
      .map { case ((s, d, n, base, _), i) =>
        (s, d, n, base + (if (i < deficit) 1L else 0L))
      }
  }

  def bySource(df: DataFrame, sourceCol: String,
               targetFrac: Map[String, Double],
               seed: Long = 42L): DataFrame = {
    val counts = df.groupBy(col(sourceCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    df.stat.sampleBy(sourceCol, plan(counts, targetFrac), seed)
  }

  /** Deterministic per-source downsampling at explicit keep rates (in
    * basis points): a row is kept iff its salted-md5 uniform over
    * [0, 2⁶⁰) is below floor(keep_bp·2⁶⁰/10⁴) for its source — the
    * `sampleBy` twin under the weightedSample/hashSplit exactness
    * contract. The verdict depends only on (salt, id), so it is
    * reproducible across runs, partitionings and ENGINES (the
    * mix_sources oracle replays it bit-for-bit), where `bySource`'s
    * seeded Bernoulli is partitioning-dependent. Sources absent from
    * the map are dropped (rate 0), matching sampleBy; keep_bp 10000
    * keeps a source whole. Pure per-row projection — no aggregate, no
    * shuffle, one scan at any corpus size. */
  def bySourceDeterministic(df: DataFrame, sourceCol: String,
                            idCol: String, keepBp: Map[String, Int],
                            salt: String = "mix"): DataFrame = {
    require(keepBp.nonEmpty, "need a non-empty keep-rate map")
    keepBp.foreach { case (s, bp) =>
      require(bp >= 0 && bp <= 10000,
        s"keep rate for '$s' must be in [0, 10000] bp, got $bp")
    }
    val u = conv(substring(md5(concat(lit(salt), lit(":"),
      col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("decimal(38,0)")
    // exact integer thresholds: bp·2⁶⁰/10⁴ ≤ 2⁶⁰ fits a long
    val thr = keepBp.toSeq.sortBy(_._1)
      .foldLeft(lit(0L).cast("decimal(38,0)")) { case (acc, (s, bp)) =>
        when(col(sourceCol) === s,
          lit(((BigInt(bp) << 60) / 10000).toLong).cast("decimal(38,0)"))
          .otherwise(acc)
      }
    df.filter(u < thr)
  }
}
