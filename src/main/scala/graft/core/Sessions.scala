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
      // ObjectHashAggregateExec (typed Aggregators: bounded top-k,
      // moments; sketches) falls back to SORT-based aggregation after
      // only 128 distinct groups per task by default — for our object
      // aggregates, whose buffers are small and bounded (≤ k ranked
      // pairs, fixed-width moments, KB-scale sketches), that turns a
      // hash combine into a full sort of the task's input (measured
      // 1.4× on the q54 bounded top-k at sf0.1). 64k groups × KB-scale
      // buffers ≤ tens of MB per task, safe on any executor sizing we
      // target; unbounded-buffer aggregates (collect_list over viral
      // keys) still hit the fallback before memory is at risk.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")

  /** The harness form: local[n] with UI off and WARN logs. */
  def local(cpus: Int): SparkSession = {
    val spark = builder(s"local[$cpus]", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
