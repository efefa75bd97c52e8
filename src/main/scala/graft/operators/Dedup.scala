package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
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

  /** MinHash signature: k independent hash functions, each the min of
    * xxhash64(shingle, seed=i) over the shingle set. Pure per-row HOF —
    * no shuffle, no UDF. */
  def minhashSignature(sh: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh, s => xxhash64(s, i))))

  /** LSH band hashes: fold each band of the signature through xxhash64.
    * Two documents collide on a band iff that band of their signatures is
    * identical. */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => aggregate(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
        lit(0L), (acc, x) => xxhash64(acc, x)))

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * Pipeline: shingle → signature → band buckets → self-join within
    * (band, bucket) → distinct candidate pairs → join shingle sets back
    * → exact jaccard ≥ threshold. Only candidate pairs (band collisions)
    * are ever verified — the all-pairs cross join never materializes.
    */
  def minhashNearDup(df: DataFrame, idCol: String, textCol: String,
                     shingleN: Int = 3, k: Int = 32, bands: Int = 8,
                     threshold: Double = 0.8): DataFrame = {
    val rowsPerBand = k / bands
    require(bands * rowsPerBand == k, "bands must divide k")
    val sh = df.select(col(idCol).cast("long").as("id"),
      shingles(col(textCol), shingleN).as("sh"))
    val banded = sh
      .withColumn("sig", minhashSignature(col("sh"), k))
      .select(col("id"),
        posexplode(bandHashes(col("sig"), bands, rowsPerBand))
          .as(Seq("band", "bh")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over a token array: per-bit +1/-1 vote from each
    * token's xxhash64, sign of the vote becomes the bit. Computed as two
    * chained per-row projections (votes materialized once, then packed)
    * so the token fold runs once, not 64 times. */
  def simhash64(toks: Column): Column = {
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc, bitVotes(t), (a, b) => a + b))
    aggregate(sequence(lit(0), lit(63)), lit(0L),
      (acc, i) => acc +
        when(element_at(votes, i + 1) > 0,
          call_function("shiftleft", lit(1L), i)).otherwise(0L))
  }

  private def bitVotes(t: Column): Column = {
    val h = xxhash64(t)
    transform(sequence(lit(0), lit(63)),
      i => when(call_function("shiftright", h, i).bitwiseAND(lit(1L)) === 1L,
        lit(1L)).otherwise(lit(-1L)))
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b)).cast("int")

  /** SimHash near-duplicate pairs: bucket on 16-bit bands (a pair within
    * hamming ≤ 3 of each other must agree on ≥1 of 4 bands; larger radii
    * lower the per-band guarantee but collisions still surface most
    * near pairs), verify with exact hamming ≤ maxHamming. */
  def simhashNearDup(df: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 6): DataFrame = {
    val hashed = df
      .select(col(idCol).cast("long").as("id"), tokens(col(textCol)).as("t"))
      .withColumn("votes", aggregate(col("t"), array_repeat(lit(0L), 64),
        (acc, t) => zip_with(acc, bitVotes(t), (a, b) => a + b)))
      .select(col("id"),
        aggregate(sequence(lit(0), lit(63)), lit(0L),
          (acc, i) => acc + when(element_at(col("votes"), i + 1) > 0,
            call_function("shiftleft", lit(1L), i)).otherwise(0L)).as("sh"))
    val banded = hashed.select(col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("sh"), b * 16)
          .bitwiseAND(lit(0xFFFFL)))).as(Seq("band", "key")))
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
