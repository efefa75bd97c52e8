package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers, per the usual ANN design:
  *  - brute-force cosine top-k: one scan, exact, the correctness
  *    baseline. The query vector travels as a literal (or 1-row
  *    broadcast), so the scan stays embarrassingly parallel and the
  *    top-k is a TakeOrderedAndProject — no shuffle of the fact table.
  *  - random-hyperplane LSH: deterministic seeded planes give every
  *    vector a band signature; candidates = vectors sharing a band
  *    bucket with the query; rank candidates by exact cosine. At 100 TB
  *    the bucket join prunes the scan to a tiny candidate set (bucketed/
  *    partitioned by signature, this becomes a partition-pruned lookup).
  */
object Similarity {

  /** Deterministic Gaussian hyperplanes (fixed LCG seed). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 7L): Seq[Seq[Double]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Band signatures from hyperplane sign bits: `bands` signatures of
    * `bitsPerBand` bits each. */
  def bandSignatures(vec: Column, planes: Seq[Seq[Double]],
                     bands: Int, bitsPerBand: Int): Column = {
    val litPlanes = typedlit(planes)
    transform(sequence(lit(0), lit(bands - 1)), b =>
      aggregate(sequence(lit(0), lit(bitsPerBand - 1)), lit(0L),
        (acc, i) => acc * 2 +
          when(dot(vec, element_at(litPlanes, b * bitsPerBand + i + 1)) > 0,
            1L).otherwise(0L)))
  }

  /** Exact brute-force cosine top-k against the vector of `queryId`.
    * The 1-row query side is broadcast; ranking is on cosine rounded to
    * 4 decimals with id tiebreak, so the result is engine-stable. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int): DataFrame = {
    val v = asDouble(col(vecCol))
    val q = df.filter(col(idCol) === queryId)
      .select(v.as("qvec"))
    df.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        round(cosine(v, col("qvec")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** LSH-bucketed ANN: candidates share ≥1 band bucket with the query;
    * ranked by exact cosine. Approximate — recall depends on bands×bits
    * vs similarity; deterministic for fixed seed. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int,
              bands: Int = 8, bitsPerBand: Int = 8,
              seed: Long = 7L): DataFrame = {
    val dim = 64
    val planes = hyperplanes(bands * bitsPerBand, dim, seed)
    val v = asDouble(col(vecCol))
    val sigs = df.select(col(idCol).cast("long").as("id"), v.as("vec"),
      posexplode(bandSignatures(v, planes, bands, bitsPerBand))
        .as(Seq("band", "sig")))
    val qSide = sigs.filter(col("id") === queryId)
      .select(col("band").as("qband"), col("sig").as("qsig"),
        col("vec").as("qvec"))
    sigs.filter(col("id") =!= queryId).as("c")
      .join(broadcast(qSide),
        col("band") === col("qband") && col("sig") === col("qsig"))
      .select(col("id"), round(cosine(col("vec"), col("qvec")), 4).as("cos_sim"))
      .groupBy(col("id")).agg(max(col("cos_sim")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id"))
      .limit(k)
  }

  /** Embedding near-duplicate pairs: LSH band buckets + exact cosine ≥
    * threshold. Same bucket-join-then-verify shape as Dedup.minhashNearDup. */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       threshold: Double, bands: Int = 8, bitsPerBand: Int = 4,
                       seed: Long = 7L): DataFrame = {
    val dim = 64
    val planes = hyperplanes(bands * bitsPerBand, dim, seed)
    val v = asDouble(col(vecCol))
    val sigs = df.select(col(idCol).cast("long").as("id"), v.as("vec"),
      posexplode(bandSignatures(v, planes, bands, bitsPerBand))
        .as(Seq("band", "sig")))
    sigs.as("a")
      .join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(cosine(col("a.vec"), col("b.vec")), 4).as("cos_sim"))
      .distinct()
      .filter(col("cos_sim") >= threshold)
  }
}
