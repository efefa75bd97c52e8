package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Cross-source duplication audit: for every pair of corpus sources,
  * how much content do they share? This is the dedup-PLANNING report a
  * pipeline runs before mixing corpora (decides which source pairs need
  * a cross-source near-dup pass at all, and informs mixture weights —
  * two crawls of the same site should not both count at full weight).
  *
  * Measured on n-gram (shingle) TYPES per source — passage-level
  * overlap, which catches shared boilerplate that row-level exact dedup
  * misses (the fixture has zero cross-source exact duplicates but
  * nonzero trigram overlap). Output is one row per unordered source
  * pair: shared type count and Jaccard in integer basis points.
  *
  * Scale shape: the per-source shingle-type table is one
  * generator-in-scan explode + distinct (shuffled on (source, shingle));
  * the pair join shuffles slim (source, shingle) rows on shingle, and
  * each shingle key joins at most |sources|² rows, so the join is
  * skew-bounded by the (low) source cardinality, not by document
  * counts. The report itself is |sources|² rows — driver-small. At
  * 100 TB the same report runs over minhash SIGNATURE types instead of
  * raw shingles (Dedup.minhashSignatures feeds the identical pair-join
  * shape) — raw shingle types here keep the oracle exact.
  */
object Overlap {

  /** Per-(source, shingle-type) table: each n-gram counted once per
    * source regardless of how many documents repeat it. With
    * `fingerprint = true` the shingle TEXT never leaves the scan — the
    * distinct/join keys are 8-byte xxhash64 fingerprints (type counts
    * equal the string-keyed counts up to 64-bit collisions, ~n²/2⁶⁵;
    * the substr-dedup tier's same trade), which at corpus scale cuts
    * the two shuffles from ~string-width to 8 bytes per key. */
  def sourceShingleTypes(docs: DataFrame, srcCol: String, textCol: String,
                         n: Int, fingerprint: Boolean = true): DataFrame = {
    val sh = explode(TextFunctions.shingles(col(textCol), n)).as("__s")
    docs.select(col(srcCol).as("source"), sh)
      .select(col("source"),
        (if (fingerprint) xxhash64(col("__s")) else col("__s")).as("sh"))
      .distinct()
  }

  /** The overlap matrix: (source_a < source_b, n_shared shingle types,
    * per-side type counts, jaccard_bp). Pairs sharing nothing are
    * absent (inner-join semantics — at scale most pairs share nothing
    * and the report stays sparse). `fingerprint = true` is the
    * production default; q86 runs `false` so the DuckDB oracle
    * certifies the string semantics the hash stands for. */
  def sourceOverlap(docs: DataFrame, srcCol: String, textCol: String,
                    n: Int = 3, fingerprint: Boolean = true): DataFrame = {
    // the slim type table feeds two consumers (per-source sizes and
    // the pair explosion) — persist it so the explode+distinct pass
    // over the corpus runs once
    val sh = graft.core.Caching.persistTracked(
      sourceShingleTypes(docs, srcCol, textCol, n, fingerprint))
    val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("n_types"))
    // ONE shuffle on shingle (group → source set → ordered-pair
    // explosion), not a self-join: the join form shuffles and sorts the
    // type table twice; here each shingle row expands to at most
    // |sources|² pairs via a per-row HOF — same bounded fanout, half
    // the shuffle traffic
    val pairs = sh.groupBy(col("sh"))
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) >= 2)
      .select(explode(
        flatten(transform(col("ss"), (x, i) =>
          transform(slice(col("ss"), i + 2, size(col("ss"))),
            y => struct(x.as("source_a"), y.as("source_b"))))))
        .as("p"))
      .groupBy(col("p.source_a").as("source_a"),
        col("p.source_b").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(sizes.select(col("source").as("source_a"), col("n_types").as("n_a")),
        Seq("source_a"))
      .join(sizes.select(col("source").as("source_b"), col("n_types").as("n_b")),
        Seq("source_b"))
      .withColumn("jaccard_bp",
        floor(col("n_shared") * 10000 /
          (col("n_a") + col("n_b") - col("n_shared"))))
      .select("source_a", "source_b", "n_shared", "n_a", "n_b", "jaccard_bp")
  }
}
