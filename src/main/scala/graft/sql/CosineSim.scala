package graft.sql

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns — the codegen'd replacement for the Scala
  * UDF on candidate-verify hot paths (SURVEY.md §2.9 / the custom-
  * operator ladder: compose built-ins < native Expression < UDF). A UDF
  * deserializes every row out of Tungsten format and boxes both arrays;
  * this expression reads the unsafe array data in place inside
  * whole-stage codegen.
  *
  * Semantics match VectorFunctions.cosineKernel exactly (same operation
  * order, same zero-norm guard), so swapping the two never changes a
  * result hash. Null arrays propagate null; null ELEMENTS are not
  * supported (embedding arrays are dense by construction).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // Caller contract (enforced at every call site in this repo): both
  // children are array<double>. ExpectsInputTypes would declare this to
  // the analyzer, but its types are private[sql]; graft call sites cast
  // explicitly via VectorFunctions.asDouble instead.
  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      d += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else d / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $d = 0.0; double $na = 0.0; double $nb = 0.0;
         |int $i = 0;
         |while ($i < $n) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $d += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  $i++;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $d / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
