package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Streaming document dedup — the firehose form of the batch dedup
  * tiers: an incoming document stream is deduplicated against ALL
  * previously-seen documents via keyed streaming state on the
  * canonical fingerprint (md5 of the sorted distinct token set, same
  * kernel as Dedup.canonical, so shuffled near-copies collapse too).
  *
  * Two state regimes:
  *  - `exactByFingerprint`: unbounded state — every fingerprint ever
  *    seen is remembered. Correct global dedup; state grows O(distinct
  *    docs). Right for bounded backfills.
  *  - `withinWatermark`: `dropDuplicatesWithinWatermark` + an event-
  *    time watermark bounds state to the watermark horizon — the
  *    corpus-scale configuration (a duplicate arriving later than the
  *    delay re-emits, the standard at-scale trade).
  *
  * Both are single-shuffle stateful operators: rows hash-partition by
  * fingerprint, state lives in the state store per partition — the
  * streaming analogue of the batch hash-aggregate dedup.
  */
object StreamingDedup {

  /** Exact cross-batch dedup on the canonical fingerprint (unbounded
    * state). Emits the FIRST occurrence of each fingerprint. */
  def exactByFingerprint(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("fp", TextFunctions.fingerprint(col(textCol)))
      .dropDuplicates("fp")

  /** Watermark-bounded dedup: duplicates within `delay` of each other
    * are dropped; state older than the watermark is evicted. `tsCol`
    * must be an event-time timestamp column. */
  def withinWatermark(docs: DataFrame, textCol: String, tsCol: String,
                      delay: String): DataFrame =
    docs.withColumn("fp", TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")
}
