package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table writing — the co-located-join tool of the 100 TB
  * posture: two tables bucketed (and sorted) on the same key with the
  * same bucket count join WITHOUT either side shuffling, because bucket
  * membership already implies the partitioning the join needs. The
  * shuffle cost is paid ONCE at write time instead of on every join —
  * the right trade for fact tables joined repeatedly on a stable key
  * (orders ⋈ lineitem on orderkey, events ⋈ profiles on user).
  *
  * Spark's bucketing rides the session catalog (`saveAsTable`); plain
  * `parquet(path)` writes cannot carry bucket metadata.
  */
object Bucketed {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeTable(df: DataFrame, table: String, key: String,
                 numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the
    * catalog, so joins on the bucket key skip their exchange). */
  def table(spark: org.apache.spark.sql.SparkSession, name: String): DataFrame =
    spark.table(name)
}
