package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Featurize

/** Learned quality-classifier filter — the GPT-3 / CCNet recipe (Brown
  * et al. 2020 Appendix A; public method, no reference-repo
  * counterpart): fit a logistic regression on hashed bag-of-words
  * features to separate a small HIGH-QUALITY corpus from the raw pool,
  * score every pool document, then keep a document iff a Pareto draw
  * exceeds `1 − score` — the paper's trick that keeps mostly-high-score
  * docs while still letting a long tail of low-score docs through (a
  * hard threshold would bias the corpus toward the classifier's idea
  * of quality).
  *
  * Relation to [[graft.operators.Dsir]]: DSIR is the model-free,
  * oracle-exact importance weight; this is the learned discriminative
  * variant. Same feature space (hashed grams), so the two selection
  * signals are directly comparable.
  *
  * Scale shape: training touches only the (typically small) labeled
  * union and collapses to a `dim`-vector of coefficients on the
  * driver — O(dim), not O(corpus). Scoring is embarrassingly parallel:
  * the hashed embedding plus one dot product per document as pure
  * column expressions (the coefficient vector rides into codegen as an
  * array literal — no UDF, no join, no shuffle beyond the embedding's
  * own per-doc aggregate). The Pareto keep is a salted-hash uniform per
  * id — deterministic across runs and partitionings, like every other
  * sampling tier in this library.
  */
object QualityClassifier {

  /** Driver-held model: O(dim) state, embedded into score plans as
    * literals. `dim` is carried so scoring can never hash into a
    * different feature space than training did. */
  case class Model(weights: Array[Double], intercept: Double, dim: Int)

  /** Fit target-vs-raw logistic regression on `dim`-bucket hashed
    * bag-of-words features. The raw side should be a SAMPLE comparable
    * in size to the target (class balance is the caller's contract, as
    * in the paper — pass `raw.sample(...)` for a 100 TB pool, never the
    * pool itself: the fit is iterative over its input). */
  def train(target: DataFrame, raw: DataFrame, textCol: String,
            dim: Int = 256, regParam: Double = 1e-3,
            maxIter: Int = 100): Model = {
    require(dim > 0 && dim <= 65536, s"dim must be in [1, 65536], got $dim")
    def featurize(df: DataFrame, label: Double): DataFrame =
      Featurize.hashedEmbedding(
          df.select(monotonically_increasing_id().as("__qid"), col(textCol)),
          "__qid", textCol, dim)
        .select(lit(label).as("label"),
          array_to_vector(col("embedding")).as("features"))
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setStandardization(false)
    // the labeled union is small by contract; collapse it to a few
    // partitions and cache it so the L-BFGS iterations aggregate over
    // a handful of tasks instead of re-running the featurize DAG and
    // paying full-width treeAggregate rounds per step
    val data = featurize(target, 1.0).unionByName(featurize(raw, 0.0))
      .coalesce(4).cache()
    try {
      val m = lr.fit(data)
      Model(m.coefficients.toArray, m.intercept, dim)
    } finally { data.unpersist(); () }
  }

  /** Per-document quality probability in [0, 1]: sigmoid of the model's
    * logit over the doc's hashed embedding. Output: (id, quality_prob).
    * Zero-token docs get the intercept-only score (their embedding is
    * the zero vector — the model's prior). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: Model): DataFrame = {
    val emb = Featurize.hashedEmbedding(docs, idCol, textCol, model.dim)
    val w = typedlit(model.weights.toSeq)
    // staged dot product (the Featurize O(dim²) lesson): zip_with
    // before aggregate keeps each element read once
    emb
      .withColumn("__logit",
        aggregate(zip_with(col("embedding"), w, (a, b) => a * b),
          lit(model.intercept), (acc, x) => acc + x))
      .select(col(idCol),
        (lit(1.0) / (lit(1.0) + exp(-col("__logit")))).as("quality_prob"))
  }

  /** Persist a fitted model as a parquet fixture (one row per weight:
    * (idx, w); idx −1 carries the intercept; `dim` rides as field
    * metadata) — the LM/BM25-store pattern for the classifier: fit
    * once, serve the APPLY step forever from the store. */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model,
           path: String): Unit = {
    import spark.implicits._
    // shape check at WRITE time (writeBasis's rectangularity rule): a
    // malformed Model would otherwise persist a store whose corruption
    // only surfaces at load() as a generic row-count mismatch
    require(model.weights.length == model.dim,
      s"QualityClassifier.save: model carries ${model.weights.length} " +
        s"weights but declares dim=${model.dim}; refusing to write a " +
        "mis-shaped store")
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("dim", model.dim.toLong).build()
    (model.weights.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toSeq :+ (-1L, model.intercept))
      .toDF("idx", "w")
      .withColumn("idx", col("idx").as("idx", meta))
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Read a [[save]]d model back. Fails loudly on a store without the
    * dim metadata or with missing/duplicate weight rows — a silently
    * mis-shaped model would score every document wrong. */
  def load(spark: org.apache.spark.sql.SparkSession,
           path: String): Model = {
    val df = spark.read.parquet(path)
    val md = df.schema("idx").metadata
    require(md.contains("dim"),
      s"model store at $path carries no dim metadata; write it with " +
        "QualityClassifier.save")
    val dim = md.getLong("dim").toInt
    val raw = df.collect()
    // raw row count first: duplicate idx rows (a second append-mode
    // write) would dedup inside toMap and load a nondeterministic
    // weight while the keyed count still looked right
    require(raw.length == dim + 1,
      s"model store at $path has ${raw.length} rows; expected $dim " +
        "weights + intercept")
    val rows = raw.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    require(rows.size == dim + 1 && (-1L until dim.toLong).forall(rows.contains),
      s"model store at $path has ${rows.size} distinct idx rows; " +
        s"expected $dim weights + intercept")
    Model(Array.tabulate(dim)(i => rows(i.toLong)), rows(-1L), dim)
  }

  /** The paper's keep rule, made deterministic: keep a scored document
    * iff `pareto(alpha) > 1 − quality_prob`, with the Pareto draw
    * u^(−1/α) − 1 from a salted md5 uniform on the id — reproducible
    * across runs, partitionings and engines. High-score docs are kept
    * almost surely; a score-s doc survives with P = (2 − s)^(−α), so
    * α tunes how hard the filter leans on the classifier. */
  def keepPareto(scored: DataFrame, idCol: String, alpha: Double = 9.0,
                 salt: String = "graft"): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    // 60-bit md5 uniform in (0, 1]; +1 dodges the impossible-but-rude
    // exact zero (u = 0 would make the Pareto draw infinite, which
    // keeps — harmless — but poisons downstream arithmetic)
    val u = (conv(substring(md5(concat(lit(salt), lit(":"),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("double") + 1.0) /
      math.pow(2.0, 60)
    scored.filter(pow(u, lit(-1.0 / alpha)) - 1.0 >
      lit(1.0) - col("quality_prob"))
  }
}
