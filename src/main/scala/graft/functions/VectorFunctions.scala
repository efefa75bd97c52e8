package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<double>` columns using Spark's built-in
  * higher-order functions (zip_with / aggregate) — no UDF, no driver
  * round trip, stays inside Catalyst. Folds are sequential left-to-right,
  * so results are bit-deterministic for a given row (summation order
  * never depends on partitioning — these are per-row expressions).
  */
object VectorFunctions {

  /** Sequential-fold dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with zero-norm guard. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, 0.0).otherwise(dot(a, b) / denom)
  }

  /** Squared L2 distance (cheaper than sqrt when only ranking). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Cast a float-array column (parquet `array<float>`) to the double
    * array all the math above expects. */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** JVM cosine kernel — same math as `cosine` but as a tight loop, for
    * verify stages over many candidate pairs where the interpreted
    * higher-order-function form dominates runtime. */
  def cosineKernel(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else d / denom
  }

  /** `cosineKernel` as a (deterministic) UDF over array<double> columns. */
  def cosineUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: Seq[Double], b: Seq[Double]) => cosineKernel(a.toArray, b.toArray))

  /** The native codegen'd Catalyst expression (graft.sql.CosineSim) as a
    * Column — same math as `cosineKernel`, but evaluated inside
    * whole-stage codegen with no row deserialization or boxing. Prefer
    * this on verify hot paths; `cosineUdf` remains for environments
    * where constructing catalyst expressions directly is undesirable. */
  def cosineNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.toColumn(graft.sql.CosineSim(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))
  }
}
