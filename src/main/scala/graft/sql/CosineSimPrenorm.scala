package graft.sql

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** [[CosineSim]] with the norm product hoisted out of the pair loop:
  * `cosine_sim_prenorm(a, b, denom)` where `denom` is the PRECOMPUTED
  * `l2norm(a) * l2norm(b)` (each norm = `sqrt(Σ x_i²)` accumulated
  * left-to-right, the [[CosineSim]] loop's own order — see
  * [[SumSq]]).
  *
  * Why it exists (optimization guide §1.2 "per-task work"): on an
  * O(n²) candidate-pair path, [[CosineSim]] recomputes BOTH norms
  * inside every pair evaluation — two thirds of the loop's flops go
  * to Σx², Σy² that are pure per-ROW quantities. Computing each
  * row's sum-of-squares once ([[SumSq]]), taking `sqrt` once per row,
  * and shipping the scalar into the pair loop leaves only the dot
  * product per pair.
  *
  * Bit-identity with [[CosineSim]] (the swap can never change a result
  * hash, PROVIDED both arrays have equal length — every graft embedding
  * fixture and store does; length mismatch falls back to min-length dot
  * with full-length norms, which is exactly why call sites keep the
  * contract): IEEE doubles make `Σx_i²` independent of WHERE the loop
  * runs (same order, same adds), `sqrt` is correctly rounded, the
  * product `sqrt(na)·sqrt(nb)` is one IEEE multiply in both forms, and
  * the final division sees identical numerator and denominator. The
  * zero guard matches (`denom == 0.0 → 0.0`).
  */
case class CosineSimPrenorm(first: Expression, second: Expression,
                            third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim_prenorm"

  override def nullSafeEval(a: Any, b: Any, dn: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val denom = dn.asInstanceOf[Double]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0
    var i = 0
    while (i < n) { d += x.getDouble(i) * y.getDouble(i); i += 1 }
    if (denom == 0.0) 0.0 else d / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, dn) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $d = 0.0;
         |int $i = 0;
         |while ($i < $n) {
         |  $d += $a.getDouble($i) * $b.getDouble($i);
         |  $i++;
         |}
         |${ev.value} = ($dn == 0.0) ? 0.0 : $d / $dn;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression)
      : Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Left-to-right Σ x_i² over an `array<double>` column — the per-row
  * half of [[CosineSimPrenorm]]'s contract. Accumulation order is the
  * [[CosineSim]] norm loop's own (index 0 upward), so
  * `sqrt(SumSq(a)) * sqrt(SumSq(b))` is bit-identical to the fused
  * loop's `denom` whenever the two arrays have equal length. */
case class SumSq(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_sumsq"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |int $i = 0;
         |while ($i < $n) {
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |  $i++;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
