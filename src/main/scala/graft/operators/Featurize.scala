package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** Feature-hashing document embeddings (the hashing trick): each token
  * hashes to one of `dim` buckets, a document's vector is its
  * L2-normalized bucket-count histogram. No trained model, no
  * vocabulary table, no driver state — the embedding is a pure function
  * of the text, so it parallelizes as one explode + one (id, bucket)
  * count aggregate and backfills deterministically on any engine. This
  * is the cheap bridge from the text tiers to the vector tiers: hashed
  * embeddings feed `Similarity.semDedup*` / `Ivf` / `Pq` when no
  * learned embedding model is in the loop (fasttext-style bag-of-
  * hashed-words, public standard practice).
  *
  * The bucket function is the first three hex chars of md5(token)
  * combined through `ascii` — chosen over xxhash64 because BOTH engines
  * (Spark and the DuckDB oracle) compute md5/ascii/substr identically,
  * so the embedding is cross-engine bit-exact (the L2 step is one
  * integer sum of squares, one IEEE sqrt and one division — all
  * correctly-rounded, no summation-order dependence).
  */
object Featurize {

  /** md5-derived bucket in [0, dim) for a token column. */
  private def bucket(t: Column, dim: Int): Column = {
    val h = md5(t)
    (ascii(substring(h, 1, 1)) * 256 +
      ascii(substring(h, 2, 1)) * 16 +
      ascii(substring(h, 3, 1))) % dim
  }

  /** (id, embedding array<double>) — L2-normalized hashed bag-of-words;
    * documents with zero tokens get the zero vector (NOT dropped: the
    * caller's length gate decides their fate, same contract as the
    * dedup tiers). */
  def hashedEmbedding(docs: DataFrame, idCol: String, textCol: String,
                      dim: Int = 64): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val cnts = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("__t"))
      .select(col(idCol), bucket(col("__t"), dim).as("__b"))
      .groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val sparse = cnts.groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("__b"), col("__c"))))
        .as("__m"))
    // STAGED projections (the int8-quantizer lesson): inlining `dense`
    // inside the norm reduction and `nrm` inside the per-element
    // division lambda would re-evaluate the full 64-element expression
    // per ELEMENT — O(dim²) per row. Named columns referenced ≥2 times
    // downstream stay materialized once per row under CollapseProject.
    docs.select(col(idCol))
      .join(sparse, Seq(idCol), "left")
      .withColumn("__dense",
        transform(sequence(lit(0), lit(dim - 1)),
          b => coalesce(element_at(col("__m"), b), lit(0L)).cast("double")))
      .withColumn("__nrm",
        sqrt(aggregate(col("__dense"), lit(0.0), (acc, x) => acc + x * x)))
      // zero-norm guard doubles as the second __nrm reference that
      // keeps it staged (norm 0 ⟺ no tokens ⟺ the zero vector)
      .select(col(idCol),
        when(col("__nrm") === 0.0,
          array_repeat(lit(0.0), dim))
          .otherwise(transform(col("__dense"), x => x / col("__nrm")))
          .as("embedding"))
  }
}
