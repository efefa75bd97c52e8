package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Read training-shard exports (the `export`/`release` commands' JSONL
  * or parquet trees) back into a corpus frame — the consumer side of
  * the pipeline's last mile, for resuming curation on a released
  * corpus or auditing what a training run actually saw.
  *
  * Scale posture: the schema is EXPLICIT, never inferred — JSON schema
  * inference is a full extra pass over every shard file, which at
  * 100 TB doubles the read. The `shard` (and `epoch`) partition
  * columns surface as ordinary columns and PRUNE: reading one shard
  * touches one directory. */
object ExportReader {

  /** Read an export tree (one epoch dir, or the multi-epoch root —
    * epoch=K dirs surface an `epoch` column). `format` must match the
    * export's --format. */
  def read(spark: SparkSession, dir: String, schema: StructType,
           format: String = "json"): DataFrame = {
    require(Seq("json", "parquet").contains(format),
      s"format must be json|parquet, got $format")
    val r = spark.read
      .option("basePath", dir)
    format match {
      case "json" => r.schema(schema).json(dir)
      case _      => r.schema(schema).parquet(dir)
    }
  }

  /** Per-shard row counts plus the balance verdict: a round-robin deal
    * over the global shuffled order leaves shard sizes within one row
    * of each other PER EPOCH — a wider spread means a torn or
    * hand-edited export. One aggregate over the partition columns
    * (file listing + counts; with parquet, footer-only). */
  def audit(spark: SparkSession, dir: String, schema: StructType,
            format: String = "json"): DataFrame = {
    val df = read(spark, dir, schema, format)
    val byEpoch = df.columns.contains("epoch")
    val keys = if (byEpoch) Seq(col("epoch"), col("shard"))
               else Seq(col("shard"))
    val per = df.groupBy(keys: _*).agg(count(lit(1)).as("n_rows"))
    val w = if (byEpoch)
      org.apache.spark.sql.expressions.Window.partitionBy(col("epoch"))
    else
      org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1)) // one epoch: a shard-count-sized frame
    per.withColumn("balanced",
        max(col("n_rows")).over(w) - min(col("n_rows")).over(w) <= 1L)
      .orderBy(keys.map(_.asc): _*)
  }
}
