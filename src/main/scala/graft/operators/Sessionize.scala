package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts whenever the time
  * since the key's previous event exceeds `gapSec`. The classic
  * event-stream operator (user sessions, device episodes, doc-edit
  * bursts), expressed as two windows over ONE shuffle on the key:
  * lag() marks session starts, a running sum numbers them.
  *
  * Gap arithmetic is exact integer microseconds (`unix_micros`) — no
  * float time math.
  *
  * Scale: partitions by the session key — user/device keys are
  * high-cardinality, so the window spreads across tasks (the same
  * caveat as any window applies to low-cardinality keys). Both window
  * functions share the identical (partition, order) spec, so Catalyst
  * plans a single sort + a single exchange, not one per function.
  *
  * Determinism: order within a key is (ts, tieCols...) — pass the
  * unique event id as a tiebreaker when timestamps can collide.
  */
object Sessionize {

  /** Append `session_id` (1-based per key, in time order). */
  def assign(df: DataFrame, keyCol: String, tsCol: String, gapSec: Long,
             tieCols: Seq[String] = Nil): DataFrame = {
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    df.withColumn("__new",
        when(prev.isNull || us - prev > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }
}
