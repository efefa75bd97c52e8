package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with event-time bounds — the attribution
  * pattern: join two live streams (impressions ↔ clicks, request ↔
  * response, doc ↔ annotation) where a match must land within a time
  * window of its counterpart.
  *
  * Both sides carry a watermark and the join condition carries a time
  * RANGE constraint; together they bound the join state Spark must
  * buffer (each side can discard rows older than watermark + range) —
  * without the range bound, stream-stream join state grows forever,
  * the classic unbounded-state failure.
  *
  * Scale: state is hash-partitioned by the join key; the watermark
  * horizon × input rate bounds per-key state size.
  */
object StreamJoin {

  /** Inner join: each right event matched to left events of the same
    * `key` whose timestamp precedes it by at most `withinSec`
    * (0 <= rightTs - leftTs <= withinSec). Column names must be
    * disjoint apart from `key`; both sides get `delay` watermarks. */
  def within(left: DataFrame, right: DataFrame, key: String,
             leftTs: String, rightTs: String,
             withinSec: Long, delay: String): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $withinSec SECONDS"))
      .drop(r(key))
  }
}
