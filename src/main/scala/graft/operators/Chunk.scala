package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Token-window document chunking — the corpus-prep operator that cuts
  * long documents into overlapping fixed-size token windows (context-
  * length packing, embedding inputs, retrieval passages).
  *
  * Pure Column expressions end to end: tokenize → explode the stride
  * grid (`sequence`) → `slice` each window out of the token array. One
  * generator per document row, no UDFs, fully codegen/pushdown
  * friendly — at 100 TB this runs inside the scan projection with the
  * only cost being the emitted chunk rows themselves.
  *
  * Chunk grid: starts at token 0, advances by `stride` while start <
  * token count (so the final window may be shorter than `chunkSize`;
  * a document shorter than one window yields exactly one chunk).
  * Blank documents yield no chunks.
  */
object Chunk {

  /** Output: idCol, chunk_idx (0-based long), n_tokens, chunk_text. */
  def byTokens(df: DataFrame, idCol: String, textCol: String,
               chunkSize: Int, stride: Int): DataFrame =
    byTokenArray(
      df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__tk")),
      idCol, "__tk", chunkSize, stride)

  /** Same operator over a PRE-TOKENIZED array column (tokenize-once
    * pipelines that already carry the token array, e.g. q60). */
  def byTokenArray(df: DataFrame, idCol: String, toksCol: String,
                   chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be > 0")
    df.select(col(idCol), col(toksCol).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0), size(col("__toks")) - 1, lit(stride)))
          .as(Seq("__pos", "__start")))
      .select(col(idCol),
        col("__pos").cast("long").as("chunk_idx"),
        size(slice(col("__toks"), col("__start") + 1, lit(chunkSize)))
          .as("n_tokens"),
        concat_ws(" ", slice(col("__toks"), col("__start") + 1, lit(chunkSize)))
          .as("chunk_text"))
  }
}
