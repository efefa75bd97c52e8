package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (pre-hashed, co-located) tables: pay the partitioning
  * shuffle ONCE at settle/ingest time, then every subsequent equi-join
  * or aggregation on the bucket key runs with ZERO exchanges — each
  * task reads the matching bucket file from both sides. This is the
  * canonical 100 TB answer for fact⋈fact joins where neither side
  * broadcasts and the same key drives query after query (orderkey,
  * user_id, doc_id): the nightly settle bucket-writes the fact tables,
  * and the whole downstream query fleet stops shuffling them.
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
}
