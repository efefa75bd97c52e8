package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class FeaturizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark shuffles rows fast"),
    (2L, "spark shuffles rows fast"),   // exact copy → identical vector
    (3L, "completely different token stream here"),
    (4L, "")                            // zero tokens → zero vector
  ).toDF("doc_id", "text")

  private def vecs: Map[Long, Seq[Double]] =
    Featurize.hashedEmbedding(docs, "doc_id", "text", dim = 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

  test("identical texts get identical vectors; different texts differ") {
    val v = vecs
    assert(v(1L) == v(2L))
    assert(v(1L) != v(3L))
  }

  test("vectors are unit-norm; the empty doc keeps the zero vector") {
    val v = vecs
    def norm(x: Seq[Double]) = math.sqrt(x.map(d => d * d).sum)
    assert(math.abs(norm(v(1L)) - 1.0) < 1e-12)
    assert(math.abs(norm(v(3L)) - 1.0) < 1e-12)
    assert(v(4L).forall(_ == 0.0) && v(4L).size == 64)
  }

  test("hashed embeddings feed the vector tiers: copies collapse under semDedup") {
    // the embedding column is a drop-in for the vector operators: the
    // exact-copy pair lands at cosine 1.0, so the embedding near-dup
    // tier must flag exactly that pair
    val emb = Featurize.hashedEmbedding(docs, "doc_id", "text", dim = 64)
      .filter(size(filter(col("embedding"), x => x =!= 0.0)) > 0)
    val pairs = Similarity.bruteForceNearDup(emb, "doc_id", "embedding",
        threshold = 0.999)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)))
  }
}
