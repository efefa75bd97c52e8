package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registry-lite: model-version metadata as a plain table + the
  * "latest version for a stage" lookup, replacing the reference's MLflow
  * REST registry semantics (reference scripts/manage_model_registry.py:25-90,
  * loader scripts/stream_anomaly_detector.py:48-73). No server — the
  * registry is a DataFrame (backed by a small parquet/JSON dir in
  * production) and the lookup is orderBy-desc-limit-1 (SURVEY.md §2.6 T4).
  */
object ModelRegistry {

  final case class ModelVersion(
      model: String, version: Int, stage: String, created_at: String,
      metrics_mse: Double)

  def table(spark: SparkSession, rows: Seq[ModelVersion]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  /** Latest READY/Production version for a model: the registry's core
    * query (reference manage_model_registry.py:25-34). */
  def latest(registry: DataFrame, model: String, stage: String): DataFrame =
    registry
      .filter(col("model") === model && col("stage") === stage)
      .orderBy(col("version").desc)
      .limit(1)

  /** Stage transition with archive-existing semantics
    * (reference manage_model_registry.py:58-90): promote `version` to
    * `toStage`, demote any current holder of `toStage` to "Archived".
    * Pure DataFrame transform — caller persists the result. */
  def transition(registry: DataFrame, model: String, version: Int,
                 toStage: String): DataFrame =
    registry.select(
      col("model"), col("version"),
      when(col("model") === model && col("version") === version, toStage)
        .when(col("model") === model && col("stage") === toStage, "Archived")
        .otherwise(col("stage")).as("stage"),
      col("created_at"), col("metrics_mse"))
}
