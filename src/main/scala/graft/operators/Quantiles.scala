package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact grouped quantiles with BOUNDED per-task memory — the scale-safe
  * replacement for `percentile(...)` over low-cardinality groups.
  *
  * Built-in exact `percentile` is a TypedImperativeAggregate whose FINAL
  * merge buffer holds a group's entire value multiset in one task: fine
  * at sf0.1, an OOM at 100 TB with 3 return-flag groups. The bracketed
  * plan keeps every stage a partial-aggregable scan:
  *
  *   pass 1 (one agg scan): per group, exact `count` + Greenwald-Khanna
  *     `percentile_approx` values bracketing each target rank from both
  *     sides (rank error ≤ n/accuracy, taken with 4× margin);
  *   pass 2 (one agg scan): per group, the exact count of values below
  *     each bracket's lower bound + the sorted values INSIDE the bracket
  *     (≈ 8·n/accuracy values — thousands, not billions);
  *   final: the true order statistics are looked up inside the bracket
  *     arrays by exact rank, and interpolated with the same double
  *     arithmetic Spark's `percentile` uses (`(higher-pos)*v_lo +
  *     (pos-lower)*v_hi`), so results are BIT-IDENTICAL to the built-in.
  *
  * Caveat: bracket width is a RANK guarantee, not a value guarantee — a
  * group where one value carries ≫ n/accuracy duplicates puts all of
  * them in the bracket array. For heavily-duplicated distributions,
  * pre-aggregate to (value, freq) first; for continuous-ish measures
  * (prices, latencies) the default is thousands of values per group.
  * If a bracket does miss (cannot happen within the GK guarantee), the
  * rank lookup lands outside the array and the output is NULL rather
  * than silently wrong.
  */
object Quantiles {

  def exactGrouped(df: DataFrame, groupCol: String, valCol: String,
                   ps: Seq[Double], outNames: Seq[String],
                   accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.size == outNames.size)
    require(ps.forall(p => p >= 0.0 && p <= 1.0))
    val v = col(valCol).cast("double")
    // 4x the guaranteed GK rank error, so a bracket can only miss if the
    // sketch beats its own contract by -3x (i.e. never)
    val eps = 4.0 / accuracy
    val loP = ps.map(p => math.max(0.0, p - eps))
    val hiP = ps.map(p => math.min(1.0, p + eps))
    val briefs = df.groupBy(col(groupCol)).agg(
      count(v).as("__n"),
      percentile_approx(v, array(loP.map(lit): _*), lit(accuracy))
        .as("__los"),
      percentile_approx(v, array(hiP.map(lit): _*), lit(accuracy))
        .as("__his"))
    // Brackets are a handful of doubles per group: broadcast them back
    // so pass 2 stays a co-partitioned scan with no extra shuffle of df.
    val joined = df.join(broadcast(briefs), groupCol)
    // Rank margin math: the GK sketch guarantees rank error ≤ n/accuracy
    // and the quantile_cont position convention differs from the
    // sketch's by up to ~2 absolute ranks. For n > accuracy the ±4·n/
    // accuracy bracket gives > 4 absolute ranks of slack — covered. For
    // n ≤ accuracy the relative margin can shrink below one rank, so
    // those groups skip the sketch entirely and collect fully (they are
    // bounded by `accuracy` values — small by construction).
    val small = col("__n") <= lit(accuracy.toLong)
    val aggs: Seq[Column] = max(col("__n")).as("__n") +: ps.indices.flatMap { i =>
      val lo = element_at(col("__los"), i + 1)
      val hi = element_at(col("__his"), i + 1)
      Seq(
        sum(when(!small && v < lo, 1L).otherwise(0L)).as(s"__cb_$i"),
        sort_array(collect_list(when(small || (v >= lo && v <= hi), v)))
          .as(s"__br_$i"))
    }
    val pass2 = joined.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    val outCols = ps.zipWithIndex.map { case (p, i) =>
      val pos = lit(p) * (col("__n") - 1).cast("double")
      val lower = floor(pos)
      val higher = ceil(pos)
      def at(rank: Column): Column = {
        // idx outside [1, size] would mean the bracket missed (outside
        // the GK contract): surface NULL explicitly on BOTH sides —
        // never element_at's negative-index from-the-end semantics on
        // a low miss, and never an ANSI out-of-bounds error on a high
        // miss (Spark 4 defaults to ANSI, where element_at past the
        // end throws instead of returning NULL)
        val idx = (rank - col(s"__cb_$i")).cast("int")
        when(idx < 1 || idx > size(col(s"__br_$i")),
          lit(null).cast("double"))
          .otherwise(element_at(col(s"__br_$i"), idx))
      }
      when(col("__n") === 0, lit(null).cast("double"))
        .when(lower === higher, at(lower + 1))
        .otherwise((higher - pos) * at(lower + 1) +
          (pos - lower) * at(higher + 1))
        .as(outNames(i))
    }
    pass2.select(col(groupCol) +: outCols: _*)
  }
}
