package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The sketch tier — sublinear summaries for questions that are
  * prohibitively expensive to answer exactly at 100 TB, used here in the
  * EXACT-ANSWER pattern: a cheap sketch pass finds a small candidate
  * set, a targeted exact pass verifies it. The output is exact (oracle-
  * checkable against plain SQL); the sketch only bounds how much data
  * the exact pass must touch.
  *
  *  - Heavy hitters: Count-Min-Sketch prefilter + exact count verify.
  *    A full `groupBy(token)` shuffles EVERY distinct token; the CMS
  *    pass is map-side only (mergeable sketches, driver merge is
  *    `width × depth` counters regardless of data size), and only rows
  *    whose sketch estimate clears the threshold enter the exact
  *    aggregation — CMS never underestimates, so no true heavy hitter
  *    can be lost.
  *  - Bloom-join pruning: membership sketch of the small side's keys,
  *    broadcast as a scan filter on the big side BEFORE its shuffle —
  *    the manual form of runtime filter pushdown. False positives are
  *    removed by the real join; false negatives are impossible, so the
  *    result equals the unfiltered join exactly.
  *
  * Both sketches come from Spark's own `DataFrameStatFunctions`
  * (org.apache.spark.util.sketch) with fixed seeds.
  */
object Sketches {

  /** Exact heavy-hitter tokens: every token occurring ≥ `threshold`
    * times in `textCol` across the corpus, with exact counts. The CMS
    * prefilter touches each row once map-side; the exact groupBy sees
    * only candidate-token rows (≤ threshold⁻¹ of the stream + εN
    * overcount collisions).
    *
    * Guarantee: CMS estimate ≥ true count always, so the candidate set
    * is a superset of the true heavy hitters and the exact verify makes
    * the result equal to the full groupBy — certified by the oracle.
    */
  def heavyHitterTokens(df: DataFrame, textCol: String, threshold: Long,
                        eps: Double = 1e-4, confidence: Double = 0.999,
                        seed: Int = 42): DataFrame =
    heavyHitterImpl(df, textCol, _ => threshold, eps, confidence, seed)

  /** Heavy hitters by SHARE: tokens carrying ≥ `phi` of all token
    * occurrences (threshold = ⌈phi · N⌉). N comes from the sketch's own
    * totalCount — no extra counting pass. The φN form is the one that
    * stays meaningful across corpus sizes. */
  def heavyHitterTokensByShare(df: DataFrame, textCol: String,
                               phi: Double, eps: Double = 1e-4,
                               confidence: Double = 0.999,
                               seed: Int = 42): DataFrame =
    heavyHitterImpl(df, textCol,
      cms => math.ceil(phi * cms.totalCount()).toLong, eps, confidence, seed)

  private def heavyHitterImpl(
      df: DataFrame, textCol: String,
      thresholdOf: org.apache.spark.util.sketch.CountMinSketch => Long,
      eps: Double, confidence: Double, seed: Int): DataFrame = {
    val spark = df.sparkSession
    val toks = df.select(
      explode(graft.functions.TextFunctions.tokens(col(textCol))).as("tok"))
    val cms = toks.stat.countMinSketch(
      "tok", eps = eps, confidence = confidence, seed = seed)
    val threshold = thresholdOf(cms)
    val bc = spark.sparkContext.broadcast(cms)
    val maybeHeavy = udf((t: String) =>
      t != null && bc.value.estimateCount(t) >= threshold)
    toks.filter(maybeHeavy(col("tok")))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }

  /** Bloom-pruned equi-join: `big ⋈ small` where the big side is
    * prefiltered by a Bloom sketch of the small side's keys before any
    * shuffle. `expectedKeys`/`fpp` size the sketch (bits ≈ -n·ln(fpp)/
    * ln2²; 1M keys at 1% ≈ 1.2 MB — broadcastable at any corpus size).
    * Exact: the join itself removes the fpp false positives. */
  def bloomJoin(big: DataFrame, small: DataFrame, bigKey: String,
                smallKey: String, expectedKeys: Long,
                fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    val spark = big.sparkSession
    val bf = small.stat.bloomFilter(smallKey, expectedKeys, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    // probe dispatches on the key's type, mirroring what
    // DataFrameStatFunctions.bloomFilter put in: integral types hash as
    // long, strings as their bytes — a mismatch (probing a string key
    // through mightContainLong) would analyze but prune EVERY row
    val probe = big.schema(bigKey).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val f = udf((k: Long) => bc.value.mightContainLong(k))
        f(col(bigKey).cast("long"))
      case StringType =>
        val f = udf((k: String) => bc.value.mightContainString(k))
        f(col(bigKey))
      case dt => throw new IllegalArgumentException(
        s"bloomJoin key '$bigKey' has unsupported type $dt — " +
          "Bloom sketches cover integral and string keys only")
    }
    big.filter(col(bigKey).isNotNull && probe)
      .join(small, col(bigKey) === col(smallKey))
  }
}
