package graft.operators

/** Throwaway measurement: time the rank-indexed BPE encode kernel vs
  * the linear merge-list scan at matched calibration, at (a) the sf
  * corpus's natural merge ceiling and (b) a 1k+-merge table. The
  * driver-generated documents table has a 31-word vocabulary, so (b)
  * derives a richer corpus deterministically from the SAME data:
  * adjacent token triples fused into compound words (vocab ~10^3).
  * Not part of the driver contract; numbers land in SURVEY.md. */
object BpeBenchScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.core.Sessions.local(32)
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.tokens
    val docs = graft.core.Tables.documents(spark, sfDir)

    def measure(label: String, corpus: org.apache.spark.sql.DataFrame,
                nMerges: Int): Unit = {
      val t0 = System.nanoTime()
      val (merges, _) =
        Bpe.fitBatched(corpus, "text", nMerges = nMerges, batchTopM = 256)
      val fitS = (System.nanoTime() - t0) / 1e9
      val words = corpus.select(explode(tokens(col("text"))).as("word"))
        .distinct().collect().map(_.getString(0))
      val table = new Bpe.MergeTable(merges)
      words.take(500).foreach { w =>
        table.segment(w); Bpe.segmentWord(w, merges)
      }
      var (accR, accL) = (0L, 0L)
      val tR = System.nanoTime()
      words.foreach(w => accR += table.segment(w).length)
      val ranked = (System.nanoTime() - tR) / 1e9
      val tL = System.nanoTime()
      words.foreach(w => accL += Bpe.segmentWord(w, merges).length)
      val linear = (System.nanoTime() - tL) / 1e9
      require(accR == accL, s"paths disagree: $accR vs $accL")
      println(f"[bpe-bench] $label: fit ${merges.length} merges " +
        f"$fitS%.1f s; encode ${words.length} distinct words " +
        f"(avg len ${words.map(_.length).sum.toDouble / words.length}%.1f): " +
        f"ranked $ranked%.3f s, linear $linear%.3f s, " +
        f"speedup ${linear / ranked}%.1fx")
    }

    measure("natural (sf corpus)", docs, 2000)

    // richer derived corpus: token triples fused into compound words
    val fused = docs.select(
      array_join(transform(
        filter(transform(sequence(lit(1), size(tokens(col("text"))) - 2),
          i => slice(tokens(col("text")), i, lit(3))), a => size(a) === 3),
        a => array_join(a, "")), " ").as("text"))
    measure("fused-triples", fused, 1500)
    spark.stop()
  }
}
