package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet fixture loaders for the driver-generated tables
  * (/root/repo/TESTDATA.md). The reference reads multi-file CSV with
  * inferred schemas (reference scripts/preprocess_cicids2017.py:103-115);
  * our engine's primary scan is columnar parquet so filters and column
  * pruning push down to the file footer — at 100 TB, the scan is the
  * dominant cost and parquet min/max + dictionary pruning are what keep
  * it sub-linear in bytes read.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeNtz(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** Scan-parallelism floor for the TEXT fixture (guide §6): a fixture
    * written as ONE parquet row group is one un-splittable scan split
    * no matter what maxPartitionBytes / minPartitionNum say, so every
    * downstream per-row pass (tokenize, shingle, md5) runs in a single
    * task — measured at sf0.1 as 0.6–1.3 s single-core scan stages with
    * 31 cores idle under every text query. When the scan arrives with
    * fewer splits than the size-derived target AND carries enough bytes
    * for the spread to matter, hash-redistribute on the leading (key)
    * column — deterministic row→partition, no round-robin retry hazard
    * (SPARK-38388). At production scale a table of any size has splits
    * ≥ cores and this is a no-op by construction; the byte floor keeps
    * the sf0.01 correctness surface and broadcast-sized tables out.
    *
    * Applied to `documents` ONLY — measured: the exchange pays for
    * itself exactly where per-row CPU is heavy (tokenize/shingle/md5 —
    * q109 3.0→1.4, q91 1.8→0.7, neardup_simhash 2.6→1.4, q88 1.2→0.6),
    * while spreading the vector/row fixtures made their iterative-fit
    * queries WORSE (every MLlib iteration schedules every partition of
    * a tiny cache: semdedup_twolevel_cert 3.6→5.4, ann_ivf 1.3→2.0,
    * q67 1.3→1.8 even at the size-derived count) and bought the
    * columnar-cheap scans nothing. */
  /** Cheapest correct probe of a narrow frame's scan-side partition
    * count: reads the planned split count off the FileSourceScanExec in
    * the physical plan instead of forcing `df.rdd` (which additionally
    * builds the row-deserializer plan and the full RDD DAG on every
    * call — pure driver-side overhead paid once per fixture load).
    * Only trusted when the plan is a single file scan with no exchange
    * (then the frame's partitioning IS the scan's); anything else falls
    * back to `df.rdd`. */
  private[graft] def scanPartitions(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.Exchange
    val plan = df.queryExecution.sparkPlan
    val narrow = plan.collect { case e: Exchange => e }.isEmpty
    plan.collectLeaves() match {
      case Seq(f: FileSourceScanExec) if narrow =>
        f.inputRDDs().head.getNumPartitions
      case _ => df.rdd.getNumPartitions
    }
  }

  private def spread(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val cores = sc.defaultParallelism
    val scanParts = scanPartitions(df)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // SIZE-DERIVED partition count (the round rule: scale-adaptive, not
    // a constant tuned for local mode): ~96 KB of compressed parquet
    // per partition, clamped to the session's cores. A cores-constant
    // spread measured WORSE overall — iterative MLlib fits (k-means,
    // L-BFGS) schedule every iteration over every partition, so 32-way
    // splits of a 600 KB fixture doubled the fit-loop queries
    // (semdedup_twolevel_cert 3.6 → 7.5 s) while buying nothing the
    // ~6-way split doesn't.
    val target = math.min(cores.toLong,
      (bytes.toLong + 96 * 1024 - 1) / (96 * 1024)).toInt
    if (scanParts < target && bytes >= 512L * 1024)
      df.repartition(target, org.apache.spark.sql.functions.col(
        df.columns.head))
    else df
  }

  /** Driver data generations differ in whether timestamp columns carry
    * isAdjustedToUTC (Spark 4 reads the unadjusted form as
    * TIMESTAMP_NTZ). Every graft session pins
    * spark.sql.session.timeZone=UTC, so casting NTZ → TimestampType
    * preserves the wall clock, restores the single timestamp type the
    * operators were built against, and keeps epoch math identical to the
    * DuckDB oracle's naive TIMESTAMP reading. */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val ntz = df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }
    // The NTZ→LTZ cast reads the wall clock in the SESSION zone. A
    // non-UTC session would silently shift every epoch downstream —
    // and silently REPOINTING the session to UTC here would just as
    // silently change the caller's other timestamp expressions for the
    // rest of the session. Fail loudly instead: graft-built sessions
    // (Sessions.local, TestSpark) already pin UTC, so this only fires
    // for an ad-hoc session whose owner must opt in explicitly.
    if (ntz.nonEmpty) {
      val tz = df.sparkSession.conf
        .getOption("spark.sql.session.timeZone").getOrElse("")
      require(tz == "UTC",
        s"fixture has TIMESTAMP_NTZ columns (${ntz.mkString(", ")}) and " +
          "the NTZ cast reads the session time zone: session is " +
          s"'$tz' but graft timestamp semantics pin UTC — build the " +
          "session via graft.core.Sessions (sets UTC) or set " +
          "spark.sql.session.timeZone=UTC before loading fixtures")
    }
    ntz.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
  }

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")

  /** The events fixture's `ts` physical type has varied across driver
    * data generations: parquet TIMESTAMP(NANOS) (vectorized reader
    * rejects it — read nanos as raw long via legacy.parquet.nanosAsLong
    * and rebuild), and TIMESTAMP(MICROS) with isAdjustedToUTC=false
    * (Spark 4 infers TIMESTAMP_NTZ; `apply`'s normalizeNtz handles that
    * layout for every table). The nanos-as-long rebuild below is the
    * events-specific remainder, so every downstream operator (windows,
    * sessionize, as-of, range join) sees one deterministic session-UTC
    * TimestampType bit-identical with the DuckDB oracle's naive
    * TIMESTAMP reading. */
  def events(s: SparkSession, d: String): DataFrame = {
    // Prefer setting this once at session build (Verify/Bench/test
    // builders do); the guarded set here keeps ad-hoc sessions working
    // without re-mutating config on every load.
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // Integer `div`, not `/ 1000.0`: double division promotes ~1.7e18
        // nanos past the 53-bit mantissa and lands 1 µs off on some rows;
        // `div` keeps the nanos→micros conversion exact (and matches the
        // DuckDB oracle, which reads TIMESTAMP_NS exactly).
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // (TIMESTAMP_NTZ never reaches here: apply()'s normalizeNtz has
      // already cast it to TimestampType)
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame =
    spread(apply(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
