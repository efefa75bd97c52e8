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

  /** Verify an export against its landed `_manifest.jsonl` files: the
    * shard contents are re-read and the order-free checksum (xor of
    * per-row xxhash64 over the payload columns, exactly as the export
    * computed it) plus row counts are compared per (epoch-dir, shard).
    * `schema` must list the payload columns in the export's column
    * order — the checksum hashes them positionally. Returns one row
    * per manifest entry: epoch_dir, shard, n_docs, manifest_docs,
    * checksum_ok, docs_ok. A torn shard, a lost file, or a hand-edit
    * flips its row. */
  def verify(spark: SparkSession, dir: String, schema: StructType,
             format: String = "json"): DataFrame = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // epoch dirs carry their own manifest; a single-epoch export has
    // one at the root
    val manifestPaths = {
      val direct = new org.apache.hadoop.fs.Path(root, "_manifest.jsonl")
      if (fs.exists(direct)) Seq(direct)
      else fs.listStatus(root).toSeq.filter(_.isDirectory)
        .map(st => new org.apache.hadoop.fs.Path(st.getPath,
          "_manifest.jsonl"))
        .filter(fs.exists(_))
    }
    require(manifestPaths.nonEmpty,
      s"$dir carries no _manifest.jsonl — not a manifest-bearing export")
    val manifest = manifestPaths.flatMap { p =>
      val in = fs.open(p)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      val epochDir = p.getParent.getName
      lines.filter(_.nonEmpty).map { l =>
        def field(k: String): Long =
          s""""$k":(-?\\d+)""".r.findFirstMatchIn(l)
            .getOrElse(throw new IllegalArgumentException(
              s"manifest line in $p lacks '$k': $l"))
            .group(1).toLong
        (epochDir, field("shard"), field("n_docs"), field("checksum"))
      }
    }.toDF("epoch_dir", "shard", "manifest_docs", "manifest_csum")

    val cols = schema.fieldNames.map(c => s"`$c`").mkString(", ")
    val back = read(spark, dir, schema, format)
    val keys =
      if (back.columns.contains("epoch"))
        concat(lit("epoch="), col("epoch").cast("string")).as("epoch_dir")
      else lit(root.getName).as("epoch_dir")
    val actual = back
      .groupBy(keys, col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        expr(s"bit_xor(xxhash64($cols))").as("csum"))
    actual.join(manifest, Seq("epoch_dir", "shard"), "full")
      .select(col("epoch_dir"), col("shard"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("manifest_docs"), lit(-1L)).as("manifest_docs"),
        coalesce(col("csum") === col("manifest_csum"), lit(false))
          .as("checksum_ok"),
        // coalesce the verdict too: a data-side shard with NO manifest
        // entry (injected directory) must read false, not NULL
        coalesce(
          coalesce(col("n_docs"), lit(0L)) === col("manifest_docs"),
          lit(false)).as("docs_ok"))
      .orderBy(col("epoch_dir"), col("shard"))
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
