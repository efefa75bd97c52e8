package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

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

  /** Epoch microseconds as a long — exact integer time math, no float
    * rounding. Timestamps use `unix_micros` (NTZ first cast to the
    * session-zone instant — graft sessions pin UTC, so the wall clock
    * is the epoch); numeric columns are taken as epoch seconds and
    * scaled. */
  private def epochMicros(c: Column, dt: DataType): Column = dt match {
    case TimestampType    => unix_micros(c)
    case TimestampNTZType => unix_micros(c.cast(TimestampType))
    case _                => (c.cast("double") * 1e6).cast("long")
  }

  /** Inner range join: left rows × right intervals with
    * `left.leftTs ∈ [right.startCol, right.endCol)` and equal `keys`.
    * All bucket arithmetic is exact integer math on epoch microseconds
    * (a double-epsilon nudge cannot express end-exclusivity: the ulp of
    * an epoch-seconds double is ~2.4e-7 s, so any epsilon small enough
    * to be safe rounds away). The bucket key is the bucket's start
    * micro; an interval covers buckets of [start, end-1], so one ending
    * exactly on a bucket boundary does NOT produce a candidate row in
    * that boundary bucket. Empty/negative intervals are dropped; the
    * exact containment filter still runs after the equi-join. */
  def bucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, startCol: String, endCol: String,
               bucketSec: Long = 3600L): DataFrame = {
    require(keys.nonEmpty, "range join requires at least one key column")
    val step = bucketSec * 1000000L
    def bucketOf(m: Column): Column = m - pmod(m, lit(step))
    val lm = epochMicros(col(leftTs), left.schema(leftTs).dataType)
    val sm = epochMicros(col(startCol), right.schema(startCol).dataType)
    val em = epochMicros(col(endCol), right.schema(endCol).dataType)
    val lb = left.withColumn("__b", bucketOf(lm))
    val rb = right
      .filter(em > sm)
      .withColumn("__b",
        explode(sequence(bucketOf(sm), bucketOf(em - 1), lit(step))))
    lb.join(rb, keys :+ "__b", "inner")
      .filter(lm >= sm && lm < em)
      .drop("__b")
  }
}
