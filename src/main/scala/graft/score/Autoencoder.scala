package graft.score

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dense-autoencoder scoring, replacing the reference's driver-side
  * Keras round trip (reference scripts/stream_anomaly_detector.py:212-303
  * collects every micro-batch with toPandas(), runs model.predict on the
  * driver, then re-distributes with createDataFrame).
  *
  * Here the weights are broadcast once and the forward pass runs inside
  * `mapPartitions` on the executors — no driver collect, scales linearly
  * with executor count. Architecture mirrors the reference model:
  * 64→64(relu)→16(relu)→64(relu)→64(linear)
  * (reference scripts/train_autoencoder.py:43-47). We do not port the
  * Keras binary; weights are a deterministic seeded fixture
  * (SURVEY.md §7.4: capability parity needs the scoring path, not the
  * trained parameters).
  */
object Autoencoder {

  /** Per layer: weight matrix W(out)(in) and bias b(out). */
  final case class Weights(
      ws: Array[Array[Array[Double]]],
      bs: Array[Array[Double]]) extends Serializable {
    def inputDim: Int = ws.head.head.length
    def layerSizes: Seq[Int] = inputDim +: ws.map(_.length).toSeq
  }

  /** Deterministic Xavier-uniform init (java.util.Random is a fixed LCG,
    * so the fixture is bit-identical across runs and JVMs). */
  def seededWeights(dims: Seq[Int] = Seq(64, 64, 16, 64, 64),
                    seed: Long = 42L): Weights = {
    val rnd = new java.util.Random(seed)
    val layers = dims.sliding(2).toArray
    val ws = layers.map { case Seq(nin, nout) =>
      val limit = math.sqrt(6.0 / (nin + nout))
      Array.fill(nout, nin)((rnd.nextDouble() * 2 - 1) * limit)
    }
    val bs = layers.map { case Seq(_, nout) => Array.fill(nout)(0.0) }
    Weights(ws, bs)
  }

  /** S10: persist weights as parquet matrices — one row per (layer,
    * output-unit) with the unit's weight row and bias. Parquet stores
    * doubles exactly, so save→load round-trips bit-identically (the
    * registry maps model versions to these artifact dirs; the reference
    * pickles Keras .h5 + MLflow artifacts instead,
    * scripts/train_autoencoder.py:221-269). */
  def save(spark: org.apache.spark.sql.SparkSession, w: Weights,
           dir: String): Unit = {
    import spark.implicits._
    val rows = for {
      l <- w.ws.indices
      r <- w.ws(l).indices
    } yield (l, r, w.ws(l)(r).toSeq, w.bs(l)(r))
    rows.toDF("layer", "row_idx", "w", "bias")
      .repartition(1)
      .write.mode("overwrite").parquet(dir)
  }

  /** S10: load weights saved by `save`. The matrices are tiny (tens of
    * KB), so a driver collect is the right move — the weights get
    * broadcast to executors by the scorer anyway. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Weights = {
    val rows = spark.read.parquet(dir)
      .select("layer", "row_idx", "w", "bias")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray,
        r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val byLayer = rows.groupBy(_._1).toSeq.sortBy(_._1)
    val ws = byLayer.map(_._2.sortBy(_._2).map(_._3)).toArray
    val bs = byLayer.map(_._2.sortBy(_._2).map(_._4)).toArray
    Weights(ws, bs)
  }

  /** U9+S10: resolve the latest artifact for (model, stage) through the
    * registry and load its weights — the scorer's startup path
    * (reference stream_anomaly_detector.py:48-73). */
  def loadForStage(spark: org.apache.spark.sql.SparkSession,
                   registry: org.apache.spark.sql.DataFrame,
                   artifacts: org.apache.spark.sql.DataFrame,
                   model: String, stage: String): Weights = {
    val path = graft.ops.ModelRegistry
      .resolveArtifactPath(registry, artifacts, model, stage)
      .getOrElse(throw new IllegalStateException(
        s"no loadable artifact for model=$model stage=$stage"))
    load(spark, path)
  }

  /** U3: trim or zero-pad a feature vector to the model input width
    * (reference stream_anomaly_detector.py:237-261 — but in declared
    * order, not the reference's silent alphabetical re-sort; see
    * SURVEY.md §7.4 "sorted-column trap"). */
  def align(x: Array[Double], n: Int): Array[Double] =
    if (x.length == n) x
    else if (x.length > n) x.take(n)
    else x ++ Array.fill(n - x.length)(0.0)

  /** Forward pass: relu on every layer but the last (linear). Tight
    * while-loops — this runs per row on the hot path. */
  def forward(w: Weights, x0: Array[Double]): Array[Double] = {
    var cur = align(x0, w.inputDim)
    var l = 0
    val nLayers = w.ws.length
    while (l < nLayers) {
      val W = w.ws(l); val b = w.bs(l)
      val out = new Array[Double](W.length)
      var i = 0
      while (i < W.length) {
        val row = W(i)
        var s = b(i)
        var j = 0
        while (j < row.length) { s += row(j) * cur(j); j += 1 }
        out(i) = if (l < nLayers - 1 && s < 0.0) 0.0 else s
        i += 1
      }
      cur = out
      l += 1
    }
    cur
  }

  /** A6: row-wise reconstruction MSE
    * (reference stream_anomaly_detector.py:280-282). */
  def mse(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s / a.length
  }

  /** A7: threshold classification (reference :283-291, threshold from
    * config/settings.py:34). */
  def classify(scoreCol: Column, threshold: Double): Column =
    when(scoreCol > threshold, lit("anomaly")).otherwise(lit("normal"))

  /** A8: confidence = 1 / (1 + mse) (reference :285). */
  def confidence(scoreCol: Column): Column =
    lit(1.0) / (lit(1.0) + scoreCol)

  /** Score a table of (id, vector) rows fully on the executors: broadcast
    * the weights, mapPartitions the forward pass + MSE, then append
    * prediction/confidence as native Column expressions so they stay in
    * codegen. Output: id, anomaly_score, prediction, confidence,
    * model_version. */
  def scoreVectors(df: DataFrame, idCol: String, vecCol: String,
                   weights: Weights, threshold: Double = 1.0,
                   modelVersion: String = "graft-ae-1"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(weights)
    val scored = df
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val w = bc.value
        it.map { case (id, x) =>
          val xa = align(x, w.inputDim)
          (id, mse(forward(w, xa), xa))
        }
      }
      .toDF(idCol, "anomaly_score")
    scored
      .withColumn("prediction", classify(col("anomaly_score"), threshold))
      .withColumn("confidence", confidence(col("anomaly_score")))
      .withColumn("model_version", lit(modelVersion))
  }
}
