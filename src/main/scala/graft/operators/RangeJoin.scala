package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval containment) join — `l.ts ∈ [r.start, r.end)` on
  * shared keys. Declared naively as an inequality join condition, Spark
  * plans a BroadcastNestedLoopJoin (quadratic, or OOM when neither side
  * broadcasts); the scale-safe shape is BUCKETED: quantize time into
  * fixed-width buckets, explode each interval onto the buckets it
  * covers, equi-join on (keys, bucket) — a plain shuffled hash join —
  * then filter exact containment. Each left row has exactly one bucket,
  * so a (row, interval) pair can meet in at most one bucket and no
  * dedup pass is needed.
  *
  * `bucketSec` tunes the replication factor: an interval spanning B
  * buckets contributes B join rows. Pick the bucket near the median
  * interval length (replication ≈ 2) — too-small buckets blow up the
  * right side, too-large buckets degrade the equi-join's selectivity
  * back toward all-pairs-within-key.
  */
object RangeJoin {

  /** Inner range join: left rows × right intervals with
    * `left.leftTs ∈ [right.startCol, right.endCol)` and equal `keys`.
    * Timestamps compare as epoch seconds (cast to double), so both
    * timestamp and numeric columns work. Empty/negative intervals are
    * dropped. */
  def bucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, startCol: String, endCol: String,
               bucketSec: Long = 3600L): DataFrame = {
    require(keys.nonEmpty, "range join requires at least one key column")
    val lb = left.withColumn("__b",
      floor(col(leftTs).cast("double") / bucketSec))
    val rb = right
      .filter(col(endCol).cast("double") > col(startCol).cast("double"))
      .withColumn("__b", explode(sequence(
        floor(col(startCol).cast("double") / bucketSec),
        // end is EXCLUSIVE: an interval ending exactly on a bucket
        // boundary does not cover that bucket
        floor((col(endCol).cast("double") - 1e-9) / bucketSec))))
    lb.join(rb, keys :+ "__b", "inner")
      .filter(col(leftTs).cast("double") >= col(startCol).cast("double") &&
        col(leftTs).cast("double") < col(endCol).cast("double"))
      .drop("__b")
  }
}
