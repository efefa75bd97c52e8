package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively: for
  * each left row, attach the single LATEST right row with
  * `rightTs <= leftTs` on the same keys, optionally within a tolerance.
  * The workhorse of event/feature alignment (price as of trade time,
  * last click before purchase, feature value as of label time).
  *
  * Implementation is union-and-window, ONE shuffle on the join keys:
  * tag sides, align schemas, and take the running last non-null right
  * payload ordered by (ts, side) — right rows sort before left rows at
  * equal timestamps, so the match is inclusive. No range-join
  * explosion, no per-left-row probe. The right payload travels as a
  * single struct so every matched column comes from the SAME right row
  * (per-column last() could mix rows when payload fields are null).
  *
  * Scale: the window partitions by the join keys — high-cardinality
  * keys (user, instrument, flow) spread fine; a low-cardinality key has
  * the same single-task-sort caveat as any window and wants salting or
  * a coarser time-bucketed pre-join.
  *
  * Ties: multiple right rows at the same (keys, ts) are matched
  * nondeterministically — dedupe the right side first if that matters.
  *
  * Nulls: SQL join semantics — a NULL join key never matches (NULL =
  * NULL is not true, matching DuckDB's ASOF JOIN). Null-keyed left rows
  * pass through unmatched; null-keyed right rows are dropped. Without
  * this, Window.partitionBy would group all null keys into one
  * partition and match them to each other.
  */
object AsOf {

  /** Left as-of join. Output: every left column, plus each right
    * payload column as `asof_<col>` and the matched timestamp as
    * `asof_<rightTs>` (nulls when no right row qualifies).
    * `toleranceSec` bounds how stale the match may be (timestamps are
    * compared as epoch seconds via cast to double). */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           toleranceSec: Option[Double] = None,
           prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    val leftPayload =
      left.columns.filterNot(c => keys.contains(c) || c == leftTs).toSeq
    val rightPayload =
      right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq
    val rpayType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c).copy()))

    val anyKeyNull = keys.map(col(_).isNull).reduce(_ || _)
    // Null keys, SQL semantics, in ONE scan per side: each null-keyed
    // LEFT row gets a unique surrogate partition key (__nk), isolating
    // it in its own window partition where no right row exists — it
    // emits unmatched without a second pass over the left input.
    // Null-keyed RIGHT rows are simply dropped (NULL matches nothing).
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        when(anyKeyNull, monotonically_increasing_id() + 1)
          .otherwise(lit(0L)).as("__nk"),
        col(leftTs).as("__ts"),
        lit(1).as("__side"),
        lit(null).cast(right.schema(rightTs).dataType).as("__rts"),
        lit(null).cast(rpayType).as("__rpay")) ++
        leftPayload.map(col): _*)
    val rTagged = right.filter(!anyKeyNull).select(
      keys.map(col) ++ Seq(
        lit(0L).as("__nk"),
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        col(rightTs).as("__rts"),
        struct(rightPayload.map(col): _*).as("__rpay")) ++
        leftPayload.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy((keys :+ "__nk").map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .withColumn("__m_ts", last(col("__rts"), ignoreNulls = true).over(w))
      .withColumn("__m_pay", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    // exact integer-micros staleness compare (same rule as RangeJoin/
    // Sessionize: an epoch-seconds double has ~2.4e-7 s ulp, so a
    // boundary-exact tolerance would round the wrong way)
    def em(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(c)
        case org.apache.spark.sql.types.TimestampNTZType =>
          unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
        case _ => (c.cast("double") * 1e6).cast("long")
      }
    val fresh = toleranceSec match {
      case Some(tol) =>
        col("__m_ts").isNotNull &&
          (em(col("__ts"), left.schema(leftTs).dataType) -
            em(col("__m_ts"), right.schema(rightTs).dataType)
            <= math.round(tol * 1e6))
      case None => col("__m_ts").isNotNull
    }
    val outLeft = left.columns.toSeq.map {
      case c if c == leftTs => col("__ts").as(leftTs)
      case c => col(c)
    }
    val outRight =
      when(fresh, col("__m_ts")).otherwise(lit(null)).as(s"$prefix$rightTs") +:
        rightPayload.map(c =>
          when(fresh, col("__m_pay")(c)).otherwise(lit(null))
            .as(s"$prefix$c"))
    matched.select(outLeft ++ outRight: _*)
  }
}
