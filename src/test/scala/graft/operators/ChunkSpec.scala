package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ChunkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunks tile the document with the requested overlap") {
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Chunk.byTokens(df, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy($"chunk_idx")
      .collect().map(r => (r.getAs[Long]("chunk_idx"),
        r.getAs[Int]("n_tokens"), r.getAs[String]("chunk_text")))
    assert(got.toSeq === Seq(
      (0L, 4, "t1 t2 t3 t4"),
      (1L, 4, "t4 t5 t6 t7"),
      (2L, 4, "t7 t8 t9 t10"),
      (3L, 1, "t10")))
  }

  test("short and blank documents behave at the edges") {
    val df = Seq((1L, "only two"), (2L, "   "), (3L, "x"))
      .toDF("doc_id", "text")
    val got = Chunk.byTokens(df, "doc_id", "text", chunkSize = 32, stride = 24)
      .collect().map(r => (r.getLong(0), r.getAs[Int]("n_tokens")))
    // blank doc 2 yields nothing; short docs yield exactly one chunk
    assert(got.toSet === Set((1L, 2), (3L, 1)))
  }
}
