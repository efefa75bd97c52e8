package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row kernel for the full Gopher repetition family
  * (Rae et al. 2021 A1.1): duplicate line/paragraph fractions (count-
  * and character-weighted over disjoint k-token chunks), top n-gram
  * character coverage, and overlap-aware duplicate n-gram character
  * coverage — ALL metrics in ONE JVM pass over the token array.
  *
  * This is the production path of QualityRules.repetitionReport. The
  * pure-Column staged pipeline (repetitionReportStaged) computes the
  * same integers and remains the certification twin — RepetitionSpec
  * pins kernel == staged on randomized corpora, and the q122/q123
  * DuckDB oracles replay the metrics independently. The kernel exists
  * because higher-order functions evaluate interpreted per element:
  * the staged form measured ~1.9 ms/doc at sf0.1 (20.7 s for q122),
  * two orders of magnitude above this kernel's cost.
  *
  * Codegen: the expression participates in whole-stage codegen with a
  * doGenCode that calls the SAME static kernel body on the child's
  * already-evaluated ArrayData — no CodegenFallback, so the row never
  * round-trips through an interpreted eval of the whole subtree (the
  * fallback path re-evaluates the child via the InternalRow and boxes
  * per row). Measured at sf0.1 (calib steady 0.567→0.562): q122
  * 1.406 s → 0.926 s (34%), q123 0.606 s → 0.551 s (9%) — the kernel
  * dominates either way; the fallback boxing was the remainder.
  *
  * Exactness: tokens are interned to integer ids (UTF8String equality,
  * so gram equality = joined-string equality — tokens contain no
  * whitespace by construction); character counts use
  * UTF8String.numChars, the same code-point count as Spark's
  * `length()`; every fraction is floor(x·10⁴ / totalChars) computed in
  * LONG division with x ≤ totalChars by construction — identical to
  * the staged form's floor(double division) within its documented
  * exactness bounds.
  *
  * Input: the token ARRAY (array<string>, from TextFunctions.tokens —
  * null-free by construction). Output: a struct of one long per
  * metric, in report column order. Null array → null struct.
  */
case class RepetitionMetrics(child: Expression,
                             lineTokens: Int, paraTokens: Int,
                             topNs: Seq[Int], dupNs: Seq[Int])
    extends UnaryExpression {

  require(lineTokens >= 1 && paraTokens >= 1, "chunk sizes must be >= 1")
  require((topNs ++ dupNs).forall(_ >= 2), "n-gram orders must be >= 2")

  /** Metric field names in output order. */
  val fieldNames: Seq[String] =
    Seq("dup_line_bp", "dup_line_char_bp", "dup_para_bp",
      "dup_para_char_bp") ++
      topNs.map(n => s"top_${n}gram_bp") ++
      dupNs.map(n => s"dup_${n}gram_bp")

  override def dataType: DataType =
    StructType(fieldNames.map(StructField(_, LongType, nullable = false)))

  override def prettyName: String = "repetition_metrics"

  @transient private lazy val topArr: Array[Int] = topNs.toArray
  @transient private lazy val dupArr: Array[Int] = dupNs.toArray

  override def nullSafeEval(input: Any): Any =
    RepetitionMetrics.compute(input.asInstanceOf[ArrayData],
      lineTokens, paraTokens, topArr, dupArr)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // ship the order arrays as compile-time references; the generated
    // code calls the static kernel directly on the evaluated child —
    // same body as nullSafeEval, zero per-row boxing beyond the result
    val tops = ctx.addReferenceObj("topNs", topArr, "int[]")
    val dups = ctx.addReferenceObj("dupNs", dupArr, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.sql.RepetitionMetrics$$.MODULE$$.compute(
         |  $c, $lineTokens, $paraTokens, $tops, $dups);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object RepetitionMetrics {

  /** Gram identity: the interned token ids of one window. */
  private final class Key(val a: Array[Int]) {
    override val hashCode: Int = java.util.Arrays.hashCode(a)
    override def equals(o: Any): Boolean = o match {
      case k: Key => java.util.Arrays.equals(a, k.a)
      case _ => false
    }
  }

  /** The kernel body — static so BOTH the interpreted eval and the
    * generated code call the identical implementation (bit-equal by
    * construction, pinned anyway in RepetitionSpec). */
  def compute(arr: ArrayData, lineTokens: Int, paraTokens: Int,
              topNs: Array[Int], dupNs: Array[Int]): InternalRow = {
    val m = arr.numElements()
    // intern tokens to ids; cache per-token char counts
    val ids = new Array[Int](m)
    val charLen = new Array[Int](m)
    var totalChars = 0L
    val seen = new java.util.HashMap[UTF8String, Integer](m * 2)
    var i0 = 0
    while (i0 < m) {
      val t = arr.getUTF8String(i0)
      var id = seen.get(t)
      if (id == null) { id = seen.size(); seen.put(t, id) }
      ids(i0) = id
      charLen(i0) = t.numChars()
      totalChars += charLen(i0)
      i0 += 1
    }

    def bp(x: Long): Long =
      if (totalChars == 0L) 0L else x * 10000L / totalChars

    // ---- disjoint k-token chunk metrics (lines / paragraphs) ----
    def chunkMetrics(k: Int): (Long, Long) = {
      if (m == 0) return (0L, 0L)
      val nc = (m + k - 1) / k
      val keys = new Array[Key](nc)
      val tokChars = new Array[Long](nc)
      val counts = new java.util.HashMap[Key, Int](nc * 2)
      var j = 0
      while (j < nc) {
        val lo = j * k
        val hi = math.min(m, lo + k)
        keys(j) = new Key(java.util.Arrays.copyOfRange(ids, lo, hi))
        var c = 0L
        var i = lo
        while (i < hi) { c += charLen(i); i += 1 }
        tokChars(j) = c
        counts.merge(keys(j), 1, Integer.sum)
        j += 1
      }
      var nDup = 0L
      var dupChars = 0L
      j = 0
      while (j < nc) {
        if (counts.get(keys(j)) >= 2) { nDup += 1; dupChars += tokChars(j) }
        j += 1
      }
      (nDup * 10000L / nc, bp(dupChars))
    }

    // gram keys + per-gram token chars for one order
    def gramKeys(n: Int): (Array[Key], Array[Long]) = {
      val g = m - n + 1
      val keys = new Array[Key](g)
      val tokChars = new Array[Long](g)
      var winChars = 0L
      var i = 0
      while (i < n) { winChars += charLen(i); i += 1 }
      i = 0
      while (i < g) {
        keys(i) = new Key(java.util.Arrays.copyOfRange(ids, i, i + n))
        tokChars(i) = winChars
        if (i + 1 < g) winChars += charLen(i + n) - charLen(i)
        i += 1
      }
      (keys, tokChars)
    }

    // ---- top n-gram character coverage ----
    def topMetric(n: Int): Long = {
      if (m < n || totalChars == 0L) return 0L
      val (keys, tokChars) = gramKeys(n)
      val counts = new java.util.HashMap[Key, Long](keys.length * 2)
      var i = 0
      while (i < keys.length) {
        counts.merge(keys(i), 1L, java.lang.Long.sum)
        i += 1
      }
      var best = 0L
      i = 0
      while (i < keys.length) {
        val v = counts.get(keys(i)) * tokChars(i)
        if (v > best) best = v
        i += 1
      }
      bp(math.min(best, totalChars))
    }

    // ---- overlap-aware duplicate n-gram character coverage ----
    def dupMetric(n: Int): Long = {
      if (m < n || totalChars == 0L) return 0L
      val (keys, _) = gramKeys(n)
      val g = keys.length
      val counts = new java.util.HashMap[Key, Int](g * 2)
      var i = 0
      while (i < g) { counts.merge(keys(i), 1, Integer.sum); i += 1 }
      val covered = new Array[Boolean](m)
      i = 0
      while (i < g) {
        if (counts.get(keys(i)) >= 2) {
          var j = i
          while (j < i + n) { covered(j) = true; j += 1 }
        }
        i += 1
      }
      var chars = 0L
      i = 0
      while (i < m) { if (covered(i)) chars += charLen(i); i += 1 }
      bp(chars)
    }

    val (lineBp, lineCharBp) = chunkMetrics(lineTokens)
    val (paraBp, paraCharBp) = chunkMetrics(paraTokens)
    val out = new Array[Any](4 + topNs.length + dupNs.length)
    out(0) = lineBp; out(1) = lineCharBp
    out(2) = paraBp; out(3) = paraCharBp
    var o = 4
    topNs.foreach { n => out(o) = topMetric(n); o += 1 }
    dupNs.foreach { n => out(o) = dupMetric(n); o += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }
}
