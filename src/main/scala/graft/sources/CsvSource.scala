package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** CSV ingestion surface — the reference's front door (SURVEY.md §2.1
  * S1/S2/S3):
  *
  *  - multi-file scan with header + schema inference
  *    (reference scripts/preprocess_cicids2017.py:103-115);
  *  - all-strings read, caller casts explicitly
  *    (reference scripts/train_autoencoder.py:141);
  *  - malformed-line-tolerant reads: PERMISSIVE with a corrupt-record
  *    capture column, and DROPMALFORMED
  *    (reference scripts/simulate_network_traffic.py:33-46 — pandas
  *    python engine + on_bad_lines='warn').
  *
  * Scale notes: a CSV scan is splittable per file (and by range within
  * uncompressed files), so multi-file reads parallelize across
  * executors; schema inference costs an extra pass over a sample —
  * production paths should pass an explicit schema (the PERMISSIVE /
  * DROPMALFORMED readers require one, which is also what makes
  * malformed-row detection well-defined).
  */
object CsvSource {

  /** S1: multi-file CSV scan, header + inferSchema. Inference reads a
    * sample pass first — fine for ad-hoc loads, pass a schema for
    * production scans. */
  def readInferred(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(paths: _*)

  /** S2: header'd CSV with every column read as string (no inference) —
    * the caller coerces explicitly, as the reference's training loader
    * does in pandas after this read. */
  def readAllStrings(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read
      .option("header", "true")
      .csv(paths: _*)

  /** S3: PERMISSIVE scan against a declared schema; rows that fail to
    * parse keep their raw text in `corruptCol` (null for clean rows) and
    * parse-failed fields are nulled. The corrupt column must be part of
    * the read schema for Spark to populate it. */
  def readPermissive(spark: SparkSession, schema: StructType,
                     paths: Seq[String],
                     corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(schema.add(corruptCol, StringType))
      .csv(paths: _*)

  /** S3: DROPMALFORMED scan — malformed rows are silently dropped (the
    * reference's on_bad_lines='warn' behavior, minus the warning). */
  def readDropMalformed(spark: SparkSession, schema: StructType,
                        paths: Seq[String]): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .schema(schema)
      .csv(paths: _*)

  /** T3: preview scan — first `n` rows of a CSV without reading the rest
    * (reference test.py:113-126 reads nrows=10 per raw file). */
  def preview(spark: SparkSession, path: String, n: Int = 10): DataFrame =
    readInferred(spark, Seq(path)).limit(n)
}
