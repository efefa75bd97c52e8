package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions.{fingerprint, tokenCount}

/** Incremental, mergeable corpus statistics — the stats counterpart of
  * the stored dedup/ANN indexes: a settled corpus (or each ingest
  * micro-batch) contributes ONE snapshot row of exactly-mergeable
  * accumulators, and corpus-level reporting is an aggregate over
  * snapshot rows — never a rescan of corpus text.
  *
  * Reference scope: the reference's dashboard recomputes its corpus
  * aggregations from the full scored table on every refresh
  * (streamlit_dashboard.py:47-89); at 100 TB that rescan is the
  * bottleneck, so this module keeps the accumulators, not the rows.
  *
  * Design for exact mergeability:
  *  - counts/sums live in DECIMAL(38,0): order-independent integer
  *    arithmetic (no float summation drift — the same rule as the
  *    oracle-checked integer-basis-point queries) with 38-digit
  *    headroom, so `sum(snapshot columns)` at any grouping of the data
  *    equals the single-pass totals bit-for-bit. Token counts square
  *    inside a LONG (per-doc counts < 2^31) before widening.
  *  - distinct-document cardinality rides a Datasketches HLL sketch
  *    (`hll_sketch_agg` over the canonical text fingerprint);
  *    `hll_union_agg` merges snapshots. Sketches are only unionable at
  *    one lgConfigK, so it is pinned (`SketchLgK`) — a snapshot built
  *    with a different lgK fails the union loudly (the same
  *    parameter-contract posture as the signature indexes).
  *
  * Lifecycle: `snapshot` per batch → `appendSnapshot` into a parquet
  * stats table (one slim row per batch) → `readReport` merges and
  * derives the human metrics. The exact columns are oracle-checked
  * (corpus_stats_inc: 5-slice merge == DuckDB full-corpus recompute);
  * the sketch estimate is certified by CorpusStatsSpec against exact
  * distinct counts.
  */
object CorpusStats {

  private val Dec = DecimalType(38, 0)

  /** Pinned HLL precision (2^12 registers ≈ 1.6% relative error).
    * Snapshots at different lgK cannot union — change it and rebuild
    * the stats table, never mix. */
  val SketchLgK: Int = 12

  /** Token-count histogram buckets: doc with n tokens lands in bucket
    * bitLength(n+1)-1, i.e. n ∈ [2^b - 1, 2^(b+1) - 2]. 24 log2
    * buckets cover 16M tokens per doc. Integer bit-length (via base-2
    * string length) on BOTH engines — float log2 would flake the
    * oracle at power-of-two boundaries. */
  val HistBuckets: Int = 24

  private def bucketOf(nt: Column): Column =
    length(conv(nt + 1, 10, 2)) - 1

  /** One mergeable accumulator row over a batch of documents:
    * (n_docs, sum_tokens, sum_tokens_sq, n_blank, tok_hist, fp_sketch).
    * Schema is a contract: a stats table written before a column was
    * added must be rebuilt, not silently defaulted. */
  def snapshot(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nt = tokenCount(t).cast("long")
    val b = bucketOf(nt)
    val zero = lit(0).cast(Dec)
    df.agg(
      count(lit(1)).cast(Dec).as("n_docs"),
      coalesce(sum(nt.cast(Dec)), zero).as("sum_tokens"),
      coalesce(sum((nt * nt).cast(Dec)), zero).as("sum_tokens_sq"),
      coalesce(sum(when(trim(t) === "", 1L).otherwise(0L)).cast(Dec), zero)
        .as("n_blank"),
      array((0 until HistBuckets).map(i =>
        coalesce(sum(when(b === i, 1L).otherwise(0L)), lit(0L))): _*)
        .as("tok_hist"),
      hll_sketch_agg(fingerprint(t), lit(SketchLgK)).as("fp_sketch"))
  }

  /** Merge any number of snapshot rows into one — exact on the decimal
    * columns at ANY grouping (sums of sums), sketch-union on the HLL
    * column. Merging merges is the same operation, so a stats table
    * can be compacted hierarchically. */
  def merge(snapshots: DataFrame): DataFrame =
    snapshots.agg(
      coalesce(sum("n_docs"), lit(0)).cast(Dec).as("n_docs"),
      coalesce(sum("sum_tokens"), lit(0)).cast(Dec).as("sum_tokens"),
      coalesce(sum("sum_tokens_sq"), lit(0)).cast(Dec).as("sum_tokens_sq"),
      coalesce(sum("n_blank"), lit(0)).cast(Dec).as("n_blank"),
      array((0 until HistBuckets).map(i =>
        coalesce(sum(element_at(col("tok_hist"), i + 1)), lit(0L))): _*)
        .as("tok_hist"),
      hll_union_agg(col("fp_sketch")).as("fp_sketch"))

  /** Human-facing report over a merged row: totals plus derived
    * moments (token mean/std) and the approximate distinct-document
    * count. Derived metrics are doubles — display-tier only; anything
    * that must merge or hash-compare stays in the exact columns. */
  def report(merged: DataFrame): DataFrame = {
    val n = col("n_docs").cast("double")
    val s1 = col("sum_tokens").cast("double")
    val s2 = col("sum_tokens_sq").cast("double")
    // smallest bucket whose cumulative count reaches half the docs —
    // the median doc's token count lies in [2^b - 1, 2^(b+1) - 2].
    // Pure array expressions over the one merged row (no extra scan).
    val medB = element_at(
      filter(
        transform(sequence(lit(0), lit(HistBuckets - 1)), b =>
          struct(b.as("b"),
            aggregate(slice(col("tok_hist"), lit(1), b + 1), lit(0L),
              (acc, x) => acc + x).as("c"))),
        s => s("c") * 2 >= col("n_docs").cast("long")), 1)("b")
    merged.select(
      col("n_docs").cast("long").as("n_docs"),
      col("sum_tokens").cast("long").as("sum_tokens"),
      col("n_blank").cast("long").as("n_blank"),
      when(col("n_docs") === 0, 0.0).otherwise(s1 / n).as("token_mean"),
      when(col("n_docs") === 0, 0.0)
        .otherwise(sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), lit(0.0))))
        .as("token_std"),
      when(col("n_docs") === 0, -1L)
        .otherwise(medB.cast("long")).as("median_bucket"),
      when(col("n_docs") === 0, 0L)
        .otherwise((pow(lit(2.0), medB) - 1).cast("long"))
        .as("median_tokens_lo"),
      when(col("n_docs") === 0, 0L)
        .otherwise((pow(lit(2.0), medB + 1) - 2).cast("long"))
        .as("median_tokens_hi"),
      when(col("fp_sketch").isNull, 0L)
        .otherwise(hll_sketch_estimate(col("fp_sketch")))
        .as("approx_distinct_docs"))
  }

  /** LOUD mixed-layout gate, shared by BOTH append forms: the
    * idempotent form writes `batch_id=<n>/` partition dirs, the plain
    * form writes root-level files — parquet cannot read a mix
    * ('Conflicting directory structures'), so whichever form touches a
    * directory laid out by the other must fail at the first write with
    * a migration message, not brick the next report. */
  private def requireLayout(spark: SparkSession, statsPath: String,
                            partitioned: Boolean): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(statsPath)
    val fs = p.getFileSystem(hconf)
    if (fs.exists(p)) {
      val entries = fs.listStatus(p)
        .filter(!_.getPath.getName.startsWith("_"))
      if (partitioned) {
        val rootFiles = entries.filter(_.isFile)
        require(rootFiles.isEmpty,
          s"$statsPath holds root-level snapshot files from the plain " +
            "append form; the idempotent (batch_id-partitioned) form " +
            "cannot share the directory — migrate the existing rows " +
            "into batch_id partitions or use a fresh stats path")
      } else {
        val partDirs = entries.filter(s =>
          s.isDirectory && s.getPath.getName.startsWith("batch_id="))
        require(partDirs.isEmpty,
          s"$statsPath is batch_id-partitioned (appendSnapshotIdempotent" +
            " layout); the plain append form cannot share the directory" +
            " — keep using the idempotent form or use a fresh stats path")
      }
    }
  }

  /** Append one snapshot row for `batch` to the parquet stats table —
    * the per-micro-batch call inside a `foreachBatch` ingest. One slim
    * row per batch: the table grows with batch COUNT, not corpus size. */
  def appendSnapshot(batch: DataFrame, textCol: String,
                     statsPath: String): Unit = {
    requireLayout(batch.sparkSession, statsPath, partitioned = false)
    snapshot(batch, textCol).write.mode("append").parquet(statsPath)
  }

  /** EXACTLY-ONCE form of `appendSnapshot` for at-least-once delivery
    * (the documented replay caveat's fix): the snapshot row lands in
    * its own `batch_id=<id>` partition through the shared
    * IdempotentFileSink, so a redelivered batch REPLACES its earlier
    * snapshot instead of double-counting it in the merged totals.
    * `merge` ignores the extra partition column, so reporting is
    * unchanged. */
  def appendSnapshotIdempotent(batch: DataFrame, textCol: String,
                               statsPath: String, batchId: Long): Unit = {
    requireLayout(batch.sparkSession, statsPath, partitioned = true)
    new graft.streaming.StreamPipeline.IdempotentFileSink(statsPath)
      .write(snapshot(batch, textCol), batchId)
  }

  /** Corpus-level report from the stats table alone: merge all
    * snapshot rows, derive. IO is O(#batches), never O(corpus). */
  def readReport(spark: SparkSession, statsPath: String): DataFrame =
    report(merge(spark.read.parquet(statsPath)))
}
