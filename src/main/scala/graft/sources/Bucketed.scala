package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (pre-hashed, co-located) tables — the co-located-join tool
  * of the 100 TB posture: pay the partitioning shuffle ONCE at
  * settle/ingest time, then every subsequent equi-join or aggregation
  * on the bucket key runs with ZERO exchanges — each task reads the
  * matching bucket file from both sides. The right trade for fact
  * tables joined repeatedly on a stable key (orders ⋈ lineitem on
  * orderkey, events ⋈ profiles on user) where neither side broadcasts.
  *
  * Spark's bucketing rides the session catalog (`saveAsTable`); plain
  * `parquet(path)` writes cannot carry bucket metadata. The writers
  * here register EXTERNAL tables (explicit path), so bucket layouts
  * live next to the data they index rather than in the warehouse dir.
  *
  * The bucket function is Spark's Murmur3 `hash(key) pmod n` — the same
  * function `repartition(n, key)` uses, so pre-repartitioning by the
  * bucket key lands every bucket in exactly one task and therefore ONE
  * file per bucket (the layout that also lets the sorted-bucket reader
  * skip the merge-join sort).
  */
object Bucketed {

  /** Write `df` as a bucketed, per-bucket-sorted external parquet table
    * registered as `name` (dropping any previous registration). The
    * `repartition(buckets, key)` uses the identical hash as the bucket
    * spec, so each of the `buckets` tasks owns exactly its bucket and
    * writes one file. */
  def writeBucketed(spark: SparkSession, df: DataFrame, name: String,
                    path: String, key: String, buckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    df.repartition(buckets, col(key))
      .write.format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(name)
  }

  /** Equi-join of two bucketed tables on their bucket keys. Both scans
    * report `HashPartitioning(key, n)`, satisfying the SortMergeJoin's
    * required distribution directly — the executed plan contains no
    * Exchange of either kind (the merge hint keeps the small fixture
    * from taking a broadcast plan that would hide the property under
    * test; at the scales bucketing exists for, neither side broadcasts
    * anyway). */
  def colocatedJoin(spark: SparkSession, leftName: String, rightName: String,
                    leftKey: String, rightKey: String): DataFrame =
    spark.table(leftName).hint("merge")
      .join(spark.table(rightName).hint("merge"),
        col(leftKey) === col(rightKey))

  /** Read a bucketed table back (bucket metadata comes from the
    * catalog, so joins on the bucket key skip their exchange). */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
