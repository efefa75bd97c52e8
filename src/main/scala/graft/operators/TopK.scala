package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.Aggregators

/** Top-k rows per key as a PARTIAL aggregate instead of a window sort.
  *
  * The window-rank form (q09: row_number over partitionBy(key) + filter
  * rn <= k) must shuffle EVERY row of a key to one task and sort there.
  * This form aggregates a bounded k-element buffer per key map-side, so
  * each task ships at most k candidates per key through the shuffle —
  * at 100 TB with hot keys that is the difference between a skewed
  * full-data sort and a flat, combiner-style aggregation. Same output
  * on null-free ordering columns (see perKey's null note), strictly
  * better shuffle profile; the oracle (q54) certifies the equivalence
  * against the window form's SQL.
  *
  * Executor note: ObjectHashAggregateExec falls back to SORT-based
  * aggregation at 128 distinct groups per task (the collect_list
  * memory guard) — correct but slower for this BOUNDED buffer. For
  * HIGH-cardinality keys, build the query through
  * [[graft.core.Sessions.boundedAggTopKSession]] (threshold 65536,
  * scoped so the raise never reaches unbounded-buffer aggregates);
  * per-query shortlist consumers (≤ dozens of groups) never hit the
  * threshold and need nothing.
  */
object TopK {

  /** Top-k per key by (`ordCol` desc, `idCol` asc). Output columns:
    * keyCol, rn (1-based), idCol, ordCol. Rows with a NULL ordering or
    * id value are EXCLUDED (the buffer ranks concrete values only) —
    * unlike the window-rank form, which sorts nulls last; filter or
    * coalesce beforehand if null rows must participate. */
  def perKey(df: DataFrame, keyCol: String, ordCol: String, idCol: String,
             k: Int): DataFrame = {
    require(k > 0, s"perKey needs k > 0, got $k")
    val agg = udaf(Aggregators.topK(k),
      Encoders.product[Aggregators.Ranked])
    df.filter(col(ordCol).isNotNull && col(idCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(agg(col(ordCol).cast("double"), col(idCol).cast("long"))
        .as("__top"))
      .select(col(keyCol), posexplode(col("__top")).as(Seq("__i", "__r")))
      .select(col(keyCol), (col("__i") + 1).as("rn"),
        col("__r.id").as(idCol), col("__r.v").as(ordCol))
  }
}
