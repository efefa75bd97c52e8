package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout writers for scan pruning at scale — the other half of
  * predicate pushdown: pushdown only helps if the files are laid out so
  * predicates can skip IO.
  *
  *  - `writePartitioned`: Hive-style directory partitioning. A filter
  *    on the partition column becomes PartitionFilters at plan time —
  *    non-matching directories are never listed, let alone read. Right
  *    for LOW-cardinality routing columns (event_type, date, lang).
  *  - `writeRangeSorted`: range-repartition + in-file sort on a
  *    HIGH-cardinality column (timestamps, ids). Every file then owns a
  *    tight disjoint value range, so parquet row-group min/max stats
  *    skip whole files for range predicates — partition-pruning
  *    economics without exploding the directory count.
  *
  * Together with Bucketed (hash-bucketed join layout) these are the
  * three layout strategies a 100 TB table picks from by access pattern:
  * route-by-value, scan-by-range, join-by-key.
  */
object Layout {

  /** Write `df` Hive-partitioned by `partitionCols`. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Write `df` as `numFiles` parquet files with disjoint sorted ranges
    * of `rangeCol` (tight per-file and per-row-group min/max stats). */
  def writeRangeSorted(df: DataFrame, path: String, rangeCol: String,
                       numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(rangeCol))
      .sortWithinPartitions(col(rangeCol))
      .write.mode("overwrite")
      .parquet(path)

  /** Read back a layout written by the writers above. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compact a small-files parquet directory into ~`targetFileBytes`
    * files (the streaming-ingest hygiene pass: micro-batches write one
    * file per trigger per partition, and a 100 TB table of kilobyte
    * files dies by open() overhead and driver file-listing memory long
    * before it dies by data volume). Sizes from the actual on-disk
    * bytes, writes to `destPath` (never in place — the swap is the
    * caller's atomic rename/catalog update). Returns the file count
    * written. */
  def compact(spark: SparkSession, srcPath: String, destPath: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val src = spark.read.parquet(srcPath)
    // Hadoop FileSystem API, not java.io.File: input files are URIs on
    // whatever filesystem the table lives on (hdfs://, s3a://, file://) —
    // java.io.File sizes only local paths and silently returns 0 for the
    // rest, collapsing nFiles to 1 and funneling the table through a
    // single output partition.
    val hconf = spark.sparkContext.hadoopConfiguration
    val totalBytes = src.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(hconf).getFileStatus(p).getLen
    }.sum
    val nFiles = math.max(1, math.ceil(
      totalBytes.toDouble / targetFileBytes).toInt)
    src.repartition(nFiles).write.mode("overwrite").parquet(destPath)
    nFiles
  }

  /** Read a parquet directory whose batches have EVOLVED schemas
    * (columns added over time): `mergeSchema` unions all file footers;
    * files missing a column yield typed nulls. The ingest-side answer
    * to additive schema evolution. */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
