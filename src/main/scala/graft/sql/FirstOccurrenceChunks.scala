package graft.sql

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row kernel for INTRA-document repeated-chunk removal
  * (the RefinedWeb within-page dedup, Penedo et al. 2023): keep each
  * chunk iff no earlier chunk equals it, rejoin survivors in order —
  * ONE hash-set pass, O(nc) in the chunk count.
  *
  * This is the production path of Dedup.removeRepeatedChunks. The
  * pure-Column staged form (removeRepeatedChunksStaged: filter over
  * slice per index) computes the same answer but is O(nc²) interpreted
  * higher-order-function work for EVERY document — the same cost class
  * that forced the RepetitionMetrics kernel — and remains as the
  * certification twin (ParagraphDedupSpec pins kernel == staged on
  * randomized corpora; the q124 DuckDB oracle replays independently).
  *
  * Exactness: chunk equality is UTF8String equality — identical to the
  * staged form's `c === element_at(...)` string comparison. The rejoin
  * is a single-space concat of survivors, byte-identical to
  * concat_ws(" ", ...) over the kept chunks.
  *
  * Input: the chunk ARRAY (array<string>, from
  * TextFunctions.chunksTokens — null-free by construction). Output:
  * struct<clean_text string, n_chunks long, n_removed long> (the
  * removeRepeatedChunks output contract). Null array → null struct
  * (callers coalesce null text to an empty token array upstream, so
  * this branch is defensive).
  */
case class FirstOccurrenceChunks(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_chunks", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false)))

  override def prettyName: String = "first_occurrence_chunks"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nc = arr.numElements()
    val seen = new java.util.HashSet[UTF8String](nc * 2)
    val kept = new java.util.ArrayList[UTF8String](nc)
    var i = 0
    while (i < nc) {
      val c = arr.getUTF8String(i)
      if (seen.add(c)) kept.add(c)
      i += 1
    }
    val sep = UTF8String.fromString(" ")
    val clean = UTF8String.concatWs(sep, kept.toArray(
      new Array[UTF8String](kept.size())): _*)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](clean, nc.toLong, (nc - kept.size()).toLong))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
