package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing
import graft.functions.TextFunctions._

/** Deduplication operators for a large-scale corpus: exact, canonical-
  * fingerprint, MinHash+LSH, and SimHash. The common scale design: never
  * compare all pairs — bucket by a cheap deterministic key (full hash,
  * band hash, simhash band), join only inside buckets, then verify
  * candidates with the exact measure. All hashing is xxhash64/md5 with
  * fixed seeds, so results are reproducible across runs and cluster
  * sizes.
  *
  * Skew note (100 TB): a heavily duplicated document produces one huge
  * LSH bucket; the candidate self-join on that bucket is quadratic. The
  * mitigation used here is exact-dedup FIRST (collapse identical texts),
  * which bounds bucket fan-out to genuinely-near neighbors; for
  * adversarial corpora, cap bucket size before the self-join.
  */
object Dedup {

  /** Exact dedup: one representative (min id) per identical value of
    * `keyCols`; group size recorded. A hash-aggregate, no pairwise work. */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Canonical-fingerprint dedup: collapse token-order-insensitive
    * near-copies via the sorted-distinct-token md5 (TextFunctions
    * .fingerprint). Same cost shape as exact dedup. */
  def canonical(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * Pipeline: shingle → signature → band buckets → self-join within
    * (band, bucket) → distinct candidate pairs → join shingle sets back
    * → exact jaccard ≥ threshold. Only candidate pairs (band collisions)
    * are ever verified — the all-pairs cross join never materializes.
    *
    * The per-row kernels (shingling, k-hash signature, band folding) run
    * as tight JVM loops in mapPartitions (graft.functions.Hashing); the
    * equivalent Catalyst higher-order-function expressions interpret one
    * boxed node per shingle×hash and measured ~20× slower. The join
    * structure stays declarative so Catalyst/AQE still plan the shuffles.
    */
  def minhashNearDup(df: DataFrame, idCol: String, textCol: String,
                     shingleN: Int = 3, k: Int = 32, bands: Int = 8,
                     threshold: Double = 0.8): DataFrame = {
    require(bands > 0 && k % bands == 0, "bands must divide k")
    val spark = df.sparkSession
    import spark.implicits._
    val sig = df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val sh = Hashing.shingleSet(text, shingleN)
          (id, sh, Hashing.bandKeys(Hashing.minhash(sh, k), bands))
        }
      }
      .toDF("id", "sh", "bh")
    val banded = sig.select(col("id"),
      posexplode(col("bh")).as(Seq("band", "key")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(sig.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sig.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b)).cast("int")

  /** SimHash near-duplicate pairs: bucket on 16-bit bands (a pair within
    * hamming ≤ 3 of each other must agree on ≥1 of 4 bands; larger radii
    * lower the per-band guarantee but collisions still surface most
    * near pairs), verify with exact hamming ≤ maxHamming. The SimHash
    * kernel runs as a JVM loop in mapPartitions (Hashing.simhash64);
    * banding and the bucket join stay declarative. */
  def simhashNearDup(df: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val banded = df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val sh = Hashing.simhash64(Hashing.tokens(text))
          (0 until 4).map(b => (id, sh, b, (sh >>> (b * 16)) & 0xFFFFL))
        }
      }
      .toDF("id", "sh", "band", "key")
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.sh"), col("b.sh")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
