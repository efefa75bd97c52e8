package graft.core

import org.apache.spark.sql.SparkSession

/** The canonical graft SparkSession configuration — everything the
  * library's operators assume:
  *  - `graft.sql.GraftExtensions` registered (native cosine_sim in SQL),
  *  - nanos-as-long parquet reads (the events fixture is
  *    TIMESTAMP(NANOS); see Tables.events),
  *  - UTC session timezone (timestamp oracles are TZ-sensitive),
  *  - AQE on (skew splitting, partition coalescing),
  *  - shuffle parallelism sized to the executor count, not the 200
  *    default (local mode drowns in near-empty partitions otherwise).
  *
  * Bench/Verify and any embedding application build through here so
  * the assumptions live in one place.
  */
object Sessions {

  /** Builder pre-loaded with graft's config; callers may tweak further
    * before `getOrCreate()`. */
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // NOTE: spark.sql.objectHashAggregate.sortBased.fallbackThreshold
      // deliberately stays at Spark's default (128) here — see
      // [[boundedAggTopKSession]] for the scoped raise and why a
      // global one would disarm the collect_list/collect_set memory
      // guard.
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")

  /** The harness form: local[n] with UI off and WARN logs. */
  def local(cpus: Int): SparkSession = {
    val spark = builder(s"local[$cpus]", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private val boundedAggMemo =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, SparkSession]())

  /** A sibling session (shared SparkContext, cache and extensions;
    * isolated SQLConf) whose ONLY divergence is
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
    * raised 128 → 65536. Build a query through this session when its
    * typed object aggregates carry BOUNDED buffers (Aggregators.topK:
    * ≤ k ranked pairs; fixed-width moments) over HIGH-cardinality
    * grouping keys — at the default 128, ObjectHashAggregateExec
    * falls back to SORT-based aggregation after 128 distinct groups
    * per task, turning the bounded hash combine into a full sort of
    * each task's input (measured 1.4× on the q54 per-custkey top-k at
    * sf0.1). 64k groups × KB-scale bounded buffers is tens of MB per
    * task — safe at any executor sizing.
    *
    * Deliberately NOT the canonical-session default: the threshold is
    * read per-aggregate at execution and triggers on distinct-GROUP
    * count, not buffer size, so a global raise would also let
    * UNBOUNDED-buffer object aggregates (collect_list / collect_set
    * over per-document groups — the dedup tiers' dup-start collection)
    * hold up to 64k arbitrarily large buffers in a task's hash map
    * where 128 groups previously forced the sort-based spill path —
    * disarming the memory guard exactly where buffers can be large.
    * Low-cardinality topK consumers (per-query ANN shortlists, ≤
    * dozens of groups) never reach either threshold and stay on the
    * canonical session. */
  def boundedAggTopKSession(spark: SparkSession): SparkSession = {
    val memo = boundedAggMemo.synchronized {
      boundedAggMemo.get(spark) match {
        case null =>
          val s2 = spark.newSession()
          s2.conf.set(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            "65536")
          boundedAggMemo.put(spark, s2)
          s2
        case s2 => s2
      }
    }
    memo
  }
}
