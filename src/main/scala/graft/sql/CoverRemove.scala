package graft.sql

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row kernel for span-cover token removal — the rewrite
  * step shared by the exact-substring tiers (q80's remove-all, the
  * long-match keep-first cut): given a document's tokens and the
  * SORTED 1-based start positions of flagged fixed-width windows, drop
  * every token covered by any window and rejoin the survivors.
  *
  * One two-pointer pass: O(tokens + spans) per document. The previous
  * pure-Column form (`filter(tk, (_, i) => !exists(dups, ...))`)
  * evaluated the `exists` lambda once per token — O(tokens × spans)
  * interpreted higher-order-function work, quadratic for a document
  * with thousands of flagged spans (the RepetitionMetrics /
  * FirstOccurrenceChunks cost class). That form survives as
  * `Dedup.removeFromStartsStaged`, the certification twin
  * (SubstrDedupSpec pins kernel == staged on randomized and
  * pathological corpora; the q80/q124/q129 DuckDB oracles replay the
  * semantics independently).
  *
  * Exactness: a 1-based token position p is covered iff some start s
  * satisfies s <= p < s + width — with starts sorted ascending this is
  * p < max(s + width : s <= p), maintained incrementally by the second
  * pointer. The rejoin is a single-space concat of survivors,
  * byte-identical to `array_join(kept, " ")`.
  *
  * Inputs: tokens array<string> (null-free), starts array<int> sorted
  * ascending (the `sort_array(collect_set(...))` output), width int
  * (a literal). Output: struct<clean_text string, n_tokens long,
  * n_removed long> — the removeFromStarts output contract. Null in
  * any input → null struct (callers coalesce upstream; defensive).
  */
case class CoverRemove(tokens: Expression, starts: Expression,
                       width: Expression)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = tokens
  override def second: Expression = starts
  override def third: Expression = width

  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false)))

  override def prettyName: String = "cover_remove"

  override def nullSafeEval(tk: Any, st: Any, w: Any): Any = {
    val arr = tk.asInstanceOf[ArrayData]
    val ss = st.asInstanceOf[ArrayData]
    val wd = w.asInstanceOf[Int]
    val n = arr.numElements()
    val m = ss.numElements()
    val kept = new java.util.ArrayList[UTF8String](n)
    var j = 0
    var coverEnd = 0L // exclusive end of the furthest-reaching span seen
    var p = 1
    while (p <= n) {
      while (j < m && ss.getInt(j) <= p) {
        val e = ss.getInt(j).toLong + wd
        if (e > coverEnd) coverEnd = e
        j += 1
      }
      if (p >= coverEnd) kept.add(arr.getUTF8String(p - 1))
      p += 1
    }
    val sep = UTF8String.fromString(" ")
    val clean = UTF8String.concatWs(sep, kept.toArray(
      new Array[UTF8String](kept.size())): _*)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](clean, n.toLong, (n - kept.size()).toLong))
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression)
      : Expression =
    copy(tokens = newFirst, starts = newSecond, width = newThird)
}
