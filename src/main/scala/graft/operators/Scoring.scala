package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.etl.Etl
import graft.score.Autoencoder

/** Scoring + ETL query surface: the reference's anomaly-scoring math
  * (MSE → threshold → confidence, scripts/stream_anomaly_detector.py:278-298)
  * and preprocessing chain (scaler fit/transform, audit) as driver-checked
  * queries, plus the full distributed autoencoder forward pass (rows-only
  * check — a 4-layer matmul is not ANSI-SQL-expressible).
  */
object Scoring {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A6-A8: score/threshold/confidence as pure per-row arithmetic —
    // identical IEEE ops on both engines, so no rounding needed
    "q21_score_classify" -> ((s, d) => {
      import s.implicits._
      val dev = ($"value" - 250.0) / 100.0
      Tables.events(s, d)
        .select(
          $"event_id",
          (dev * dev).as("anomaly_score"))
        .withColumn("prediction",
          Autoencoder.classify($"anomaly_score", threshold = 1.0))
        .withColumn("confidence", Autoencoder.confidence($"anomaly_score"))
        .orderBy($"event_id")
    }),

    // A4+A5 via the Etl module: fit on the deterministic train split
    // (event_id%5<4, mirroring the reference's fit-on-train-only,
    // preprocess_cicids2017.py:268-281), transform the full set. The fit
    // uses exact-integer-sum stats (fitScalerExact) so the oracle hash
    // cannot flake on float summation order.
    "q22_scaler_transform" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val (train, _) = Etl.hashSplit(ev, "event_id", 4, 5)
      val model = Etl.fitScalerExact(train, Seq("value"))
      model.transform(ev.select($"event_id", $"value"))
        .select($"event_id", round($"value", 4).as("scaled"))
        .orderBy($"event_id")
    }),

    // A9: score summary stats (reference train_autoencoder.py:211-216)
    "q23_score_stats" -> ((s, d) => {
      import s.implicits._
      val dev = ($"value" - 250.0) / 100.0
      Tables.events(s, d)
        .select((dev * dev).as("score"))
        .agg(
          round(max($"score"), 6).as("mse_max"),
          round(min($"score"), 6).as("mse_min"),
          round(avg($"score"), 4).as("mse_mean"),
          count(lit(1)).as("n"))
    }),

    // A3 via Etl.auditCounts: one-scan data-quality audit
    "q24_audit" -> ((s, d) => {
      val ev = Tables.events(s, d)
      Etl.auditCounts(ev, Seq("event_id", "user_id", "value"))
    }),

    // U8: distributed autoencoder TRAINING over the embedding vectors —
    // per-epoch broadcast weights + treeAggregate gradient reduction,
    // full-batch GD on the executors (the reference's driver-side Keras
    // fit, train_autoencoder.py:171-196, made cluster-shaped). Rows-only:
    // per-epoch loss curve.
    "ae_train" -> ((s, d) => {
      import s.implicits._
      val emb = Tables.embeddings(s, d)
      val (_, losses) = graft.score.Trainer.train(
        emb, "embedding", dims = Seq(64, 32, 16, 32, 64),
        epochs = 5, lr = 0.1, seed = 42L)
      losses.zipWithIndex
        .map { case (l, e) => (e + 1, l) }
        .toDF("epoch", "loss")
        .orderBy($"epoch")
    }),

    // U2: distributed autoencoder forward pass over the 64-dim embedding
    // vectors — broadcast weights + mapPartitions, no driver collect.
    // Rows-only check (not SQL-expressible).
    "ae_score" -> ((s, d) => {
      import s.implicits._
      val emb = Tables.embeddings(s, d)
      Autoencoder.scoreVectors(
          emb, "vec_id", "embedding",
          // threshold chosen inside the observed score range so both
          // prediction classes are exercised on the fixtures
          Autoencoder.seededWeights(), threshold = 0.017)
        .orderBy($"vec_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q21_score_classify" ->
      """SELECT event_id,
        | ((value-250.0)/100.0)*((value-250.0)/100.0) AS anomaly_score,
        | CASE WHEN ((value-250.0)/100.0)*((value-250.0)/100.0) > 1.0
        |      THEN 'anomaly' ELSE 'normal' END AS prediction,
        | 1.0/(1.0 + ((value-250.0)/100.0)*((value-250.0)/100.0)) AS confidence
        |FROM events ORDER BY event_id""".stripMargin,
    "q22_scaler_transform" ->
      """WITH t AS (
        |  SELECT CAST(FLOOR(value*1000000.0) AS BIGINT) AS vc
        |  FROM events WHERE event_id % 5 < 4),
        |s0 AS (
        |  SELECT CAST(SUM(vc) AS DOUBLE)/COUNT(vc) AS mean_c,
        |         CAST(SUM(CAST(vc AS HUGEINT)*vc) AS DOUBLE)/COUNT(vc) AS sq_c
        |  FROM t),
        |m AS (
        |  SELECT mean_c/1000000.0 AS mu,
        |         sqrt(GREATEST(sq_c - mean_c*mean_c, 0))/1000000.0 AS sigma
        |  FROM s0)
        |SELECT event_id,
        | ROUND((value - m.mu) /
        |   (CASE WHEN m.sigma = 0 OR m.sigma IS NULL THEN 1.0 ELSE m.sigma END),
        |   4) AS scaled
        |FROM events, m
        |ORDER BY event_id""".stripMargin,
    "q23_score_stats" ->
      """SELECT
        | ROUND(MAX(((value-250.0)/100.0)*((value-250.0)/100.0)), 6) AS mse_max,
        | ROUND(MIN(((value-250.0)/100.0)*((value-250.0)/100.0)), 6) AS mse_min,
        | ROUND(AVG(((value-250.0)/100.0)*((value-250.0)/100.0)), 4) AS mse_mean,
        | COUNT(*) AS n
        |FROM events""".stripMargin,
    "q24_audit" ->
      """SELECT COUNT(*) AS total_rows,
        | CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS bad_event_id,
        | CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS bad_user_id,
        | CAST(SUM(CASE WHEN value IS NULL OR isnan(value)
        |                 OR value = 'infinity'::DOUBLE
        |                 OR value = '-infinity'::DOUBLE
        |               THEN 1 ELSE 0 END) AS BIGINT) AS bad_value
        |FROM events""".stripMargin
  )
}
