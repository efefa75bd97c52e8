package graft.sql

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `bands` LSH band signatures of one vector in ONE codegen'd array
  * pass: `plane_sigs(vec)` quantizes the double vector once
  * (`floor(v_j · quantScale)` as a long — the exact Spark
  * `FLOOR(v * s)` arithmetic, `(long) Math.floor(...)`), computes every
  * plane's ±1-signed integer dot product left-to-right, and packs sign
  * bits into one long per band (`bit i of band b set ⇔
  * dot(b·bitsPerBand + i) > 0`).
  *
  * Why it exists (optimization guide §1.2 per-task work): the staged
  * column form evaluated `aggregate(zip_with(vq, signs_p, ·*·), 0L, +)`
  * once per plane — 48 interpreted higher-order-function traversals per
  * row, each paying per-element lambda dispatch, and the whole
  * projection fell out of whole-stage codegen. This expression is the
  * same integer arithmetic as one compiled loop.
  *
  * Bit-identity with the staged form (the swap can never change a
  * result hash):
  *  - quantization: `(long) Math.floor(v_j · quantScale)` is exactly
  *    Spark's `FLOOR(DoubleType)` codegen (`(long)(java.lang.Math
  *    .floor(c))`) for every double including NaN/±Inf;
  *  - the plane dots are sums of LONGS — two's-complement addition is
  *    associative and commutative (wrap included), so any accumulation
  *    order gives the identical 64-bit value (the kernel uses the
  *    staged form's own per-plane left-to-right order anyway);
  *  - the staged form's null/mismatch semantics are replicated: a null
  *    vector, a null element, or a length ≠ dim made every
  *    `zip_with`/`aggregate` dot NULL, and `when(NULL > 0, bit)
  *    .otherwise(0)` then zeroed every bit — so those rows produced
  *    all-zero band signatures, exactly what [[PlaneSigs.compute]]
  *    returns for them.
  *
  * `signs` is the md5-parity ±1 plane family (one row per plane, `dim`
  * entries of ±1), carried as a literal field — a pure function of
  * (nPlanes, dim), so plan canonicalization sees structural equality.
  */
case class PlaneSigs(child: Expression, quantScale: Double,
                     signs: Seq[Seq[Long]], bitsPerBand: Int)
    extends UnaryExpression {

  require(signs.nonEmpty, "plane_sigs needs at least one plane")
  require(bitsPerBand >= 1 && bitsPerBand <= 64,
    s"bitsPerBand must be in [1, 64], got $bitsPerBand")
  require(signs.length % bitsPerBand == 0,
    s"nPlanes=${signs.length} must be a multiple of bitsPerBand=$bitsPerBand")
  private val nPlanes = signs.length
  private val dim = signs.head.length
  require(signs.forall(_.length == dim), "ragged sign matrix")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "plane_sigs"

  @transient private lazy val flat: Array[Long] = {
    val a = new Array[Long](nPlanes * dim)
    var p = 0
    while (p < nPlanes) {
      val row = signs(p)
      var j = 0
      while (j < dim) { a(p * dim + j) = row(j); j += 1 }
      p += 1
    }
    a
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    PlaneSigs.compute(
      child.eval(input).asInstanceOf[ArrayData],
      quantScale, flat, dim, nPlanes, bitsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val childGen = child.genCode(ctx)
    val signsRef = ctx.addReferenceObj("planeSigns", flat, "long[]")
    ev.copy(
      code = childGen.code +
        code"""
           |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
           |  graft.sql.PlaneSigs$$.MODULE$$.compute(
           |    (${childGen.isNull}) ? null : ${childGen.value},
           |    ${quantScale}D, $signsRef, $dim, $nPlanes, $bitsPerBand);
           |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object PlaneSigs {

  /** The kernel body — static so the interpreted eval and the generated
    * code run the identical implementation. Returns the `bands` packed
    * band signatures; all-zero for a null/null-element/length-mismatched
    * vector (the staged form's NULL-dot semantics, see class doc). */
  def compute(arr: ArrayData, quantScale: Double, flat: Array[Long],
              dim: Int, nPlanes: Int, bitsPerBand: Int): ArrayData = {
    val bands = nPlanes / bitsPerBand
    val out = new Array[Long](bands)
    var ok = arr != null && arr.numElements() == dim
    if (ok) {
      var j = 0
      while (ok && j < dim) { if (arr.isNullAt(j)) ok = false; j += 1 }
    }
    if (ok) {
      val q = new Array[Long](dim)
      var j = 0
      while (j < dim) {
        q(j) = java.lang.Math.floor(arr.getDouble(j) * quantScale).toLong
        j += 1
      }
      val dots = new Array[Long](nPlanes)
      var p = 0
      while (p < nPlanes) {
        val off = p * dim
        var s = 0L
        var i = 0
        while (i < dim) { s += q(i) * flat(off + i); i += 1 }
        dots(p) = s
        p += 1
      }
      var b = 0
      while (b < bands) {
        var sig = 0L
        var i = 0
        while (i < bitsPerBand) {
          if (dots(b * bitsPerBand + i) > 0L) sig |= (1L << i)
          i += 1
        }
        out(b) = sig
        b += 1
      }
    }
    new GenericArrayData(out)
  }
}
