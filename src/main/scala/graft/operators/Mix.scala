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

  /** Sample `df` so sources follow `targetFrac` proportions. */
  def bySource(df: DataFrame, sourceCol: String,
               targetFrac: Map[String, Double],
               seed: Long = 42L): DataFrame = {
    val counts = df.groupBy(col(sourceCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    df.stat.sampleBy(sourceCol, plan(counts, targetFrac), seed)
  }
}
