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
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")

  /** The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects. Read nanos as raw long
    * (legacy.parquet.nanosAsLong) and rebuild a micros-precision
    * timestamp — the conversion is a cheap per-row projection and keeps
    * every downstream query on a native TimestampType column. */
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
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
