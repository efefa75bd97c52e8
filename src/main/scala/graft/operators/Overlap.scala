package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Shingle key under a named mode. All three are DETERMINISTIC pure
    * functions of the shingle text:
    *  - "xxhash64": 8-byte fingerprint, the cheapest hash Spark
    *    codegens — production default (not SQL-oracle-replayable);
    *  - "md5": the first 15 hex chars of md5 parsed as a long — the
    *    SAME 8-byte shuffle shape (60-bit key, collision odds ~n²/2⁶¹,
    *    the substr-dedup tier's trade) but replayable bit-for-bit by
    *    the DuckDB oracle, which is how q86 hash-certifies the
    *    fingerprinted tier directly;
    *  - "string": the raw shingle text — the certification baseline
    *    the fingerprint tiers are spec-pinned against. */
  private def shingleKey(s: Column, keyMode: String): Column = keyMode match {
    case "xxhash64" => xxhash64(s)
    case "md5"      => conv(substring(md5(s), 1, 15), 16, 10).cast("long")
    case "string"   => s
    case other => throw new IllegalArgumentException(
      s"unknown keyMode '$other' (xxhash64 | md5 | string)")
  }

  /** Per-(source, shingle-type) table: each n-gram counted once per
    * source regardless of how many documents repeat it. With a hashed
    * `keyMode` the shingle TEXT never leaves the scan — the
    * distinct/join keys are 8-byte fingerprints, which at corpus scale
    * cuts the two shuffles from ~string-width to 8 bytes per key. */
  def sourceShingleTypes(docs: DataFrame, srcCol: String, textCol: String,
                         n: Int, keyMode: String = "xxhash64"): DataFrame = {
    // tokens STAGED before the shingle lambda (TextFunctions.shingles
    // perf note: the inline form re-runs the regex split per shingle)
    docs.select(col(srcCol).as("source"),
        TextFunctions.tokens(col(textCol)).as("__tk"))
      .select(col("source"),
        explode(TextFunctions.shinglesTokens(col("__tk"), n)).as("__s"))
      .select(col("source"), shingleKey(col("__s"), keyMode).as("sh"))
      .distinct()
  }

  /** The overlap matrix: (source_a < source_b, n_shared shingle types,
    * per-side type counts, jaccard_bp). Pairs sharing nothing are
    * absent (inner-join semantics — at scale most pairs share nothing
    * and the report stays sparse). `keyMode = "xxhash64"` is the
    * production default; q86 runs "md5" — the same 8-byte key shape,
    * hash-certified directly by the oracle; OverlapSpec pins all three
    * modes equal on the fixture. */
  def sourceOverlap(docs: DataFrame, srcCol: String, textCol: String,
                    n: Int = 3, keyMode: String = "xxhash64"): DataFrame = {
    // the slim type table feeds two consumers (per-source sizes and
    // the pair explosion) — persist it so the explode+distinct pass
    // over the corpus runs once
    val sh = graft.core.Caching.persistTracked(
      sourceShingleTypes(docs, srcCol, textCol, n, keyMode))
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
