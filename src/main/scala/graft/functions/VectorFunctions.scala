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

  // --- int8 scalar quantization (symmetric, per-vector scale) -------
  //
  // Storage tier for embedding columns and stored ANN indexes: float32
  // corpora quantize 4× smaller (byte codes + one double scale per
  // vector) with reconstruction error ≤ scale/2 per element. The
  // rounding rule is floor(x/scale + 0.5) — round-half-up via floor —
  // because floor is exact integer math on BOTH engines, while
  // round() half-even/half-up tie handling differs between Spark and
  // DuckDB and would flake oracle hash compares.

  /** Per-vector symmetric scale: max|x| / 127 (0 for the zero vector). */
  def int8Scale(a: Column): Column =
    coalesce(array_max(transform(a, x => abs(x))), lit(0.0)) / 127.0

  /** Quantize to int8 codes in [-127, 127] at the given scale. */
  def int8Codes(a: Column, scale: Column): Column =
    transform(a, x =>
      when(scale === 0.0, lit(0L))
        .otherwise(greatest(lit(-127L),
          least(lit(127L), floor(x / scale + 0.5))))
        .cast("byte"))

  /** Reconstruct doubles from codes + scale (error ≤ scale/2 per
    * element, 0 error for the zero vector). */
  def dequantInt8(codes: Column, scale: Column): Column =
    transform(codes, v => v.cast("double") * scale)

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

  /** Left-to-right Σ x_i² (codegen'd, graft.sql.SumSq) — the per-row
    * half of [[cosinePrenorm]]: `sqrt(sumSqNative(a))` is bit-identical
    * to the norm [[cosineNative]] accumulates internally. */
  def sumSqNative(a: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.toColumn(graft.sql.SumSq(GraftSqlBridge.toExpression(a)))
  }

  /** All LSH band signatures of a double-array column in ONE codegen'd
    * pass (graft.sql.PlaneSigs): quantize once, every ±1-plane integer
    * dot, sign bits packed per band — replaces nPlanes interpreted
    * `aggregate(zip_with(...))` traversals per row with one compiled
    * loop. Bit-identical to the staged column form (see PlaneSigs's
    * class doc for the argument, including null/mismatch semantics). */
  def planeSigsNative(a: Column, quantScale: Double,
                      signs: Array[Array[Long]], bitsPerBand: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.toColumn(graft.sql.PlaneSigs(
      GraftSqlBridge.toExpression(a), quantScale,
      signs.map(_.toSeq).toSeq, bitsPerBand))
  }

  /** [[cosineNative]] with the norm product precomputed per ROW instead
    * of per PAIR (guide §1.2 per-task work: on an O(n²) verify path two
    * thirds of the fused loop's flops are per-row norms). `denom` MUST
    * be `sqrt(sumSqNative(a)) * sqrt(sumSqNative(b))` over equal-length
    * arrays — then the result is bit-identical to `cosineNative(a, b)`
    * (same left-to-right sums, correctly-rounded sqrt, same final ops,
    * same zero guard). */
  def cosinePrenorm(a: Column, b: Column, denom: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.toColumn(graft.sql.CosineSimPrenorm(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b),
      GraftSqlBridge.toExpression(denom)))
  }
}
