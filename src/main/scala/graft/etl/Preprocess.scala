package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Labels, Naming}

/** The reference's end-to-end batch preprocessing chain
  * (reference scripts/preprocess_cicids2017.py:98-342) as composable
  * stages plus a `run` that strings them together:
  *
  *   sanitize-rename → dropDuplicates → non-finite sweep → na.drop() →
  *   label-map → drop leakage columns → BENIGN/attack split →
  *   seeded randomSplit(0.8/0.2) → train = benign-train minus label,
  *   stream = benign-test ∪ attacks → cast doubles → scaler fit
  *   (optionally on a Bernoulli sample) → z-score both outputs.
  *
  * Everything distributed stays a single projection or aggregate per
  * stage (see Etl), and per-stage row accounting is the same observable
  * the reference logs via structlog counters.
  */
object Preprocess {

  /** P6: drop rows containing any null (reference
    * preprocess_cicids2017.py:165). */
  def dropNullRows(df: DataFrame): DataFrame = df.na.drop()

  /** P11/P12: drop columns by approximate (case/underscore-insensitive)
    * name, ignoring names that resolve to nothing — the reference
    * resolves its 14-name drop list the same way
    * (preprocess_cicids2017.py:195-229). */
  def dropColumnsResolved(df: DataFrame, wanted: Seq[String]): DataFrame = {
    val resolved = wanted.flatMap(w => Naming.resolve(df.columns.toSeq, w))
    if (resolved.isEmpty) df else df.drop(resolved.distinct: _*)
  }

  /** P13: keep the first occurrence of each column name (duplicate names
    * can appear after raw-header ingestion or wide joins; reference
    * stream_anomaly_detector.py:193-201). Positional select via a
    * uniquified rename, so Spark never sees an ambiguous reference. */
  def dedupColumnNames(df: DataFrame): DataFrame = {
    val names = df.columns.toSeq
    if (names.distinct.size == names.size) df
    else {
      val uniq = names.zipWithIndex.map { case (n, i) => s"${n}__$i" }
      val keep = names.zipWithIndex
        .groupBy(_._1).map { case (_, occ) => occ.minBy(_._2) }
        .toSeq.sortBy(_._2)
      df.toDF(uniq: _*)
        .select(keep.map { case (_, i) => col(s"${names(i)}__$i") }: _*)
        .toDF(keep.map(_._1): _*)
    }
  }

  /** J2: seeded randomSplit — deterministic for a fixed seed AND input
    * partitioning (reference preprocess_cicids2017.py:240). */
  def seededSplit(df: DataFrame, weights: Array[Double], seed: Long = 42L)
      : Array[DataFrame] = df.randomSplit(weights, seed)

  /** J2+: hash-based train/val split — the production-grade form of
    * seededSplit: the split of a row depends ONLY on (salt, id), not on
    * partitioning, row order, or engine, so it is reproducible across
    * runs, repartitions, and backfills, and a grown corpus never
    * reassigns an old row (randomSplit reshuffles everything whenever
    * the input changes). Key = first 4 hex chars of md5("salt:id");
    * train iff key < the hex threshold floor(trainBp·65536/10000) —
    * pure lexicographic compare on lowercase hex, identical in every
    * engine that has md5. Zero shuffles: one per-row projection. */
  def hashSplit(df: DataFrame, idCol: String, trainBp: Int = 8000,
                salt: String = "graft"): DataFrame = {
    require(trainBp > 0 && trainBp < 10000,
      s"trainBp must be in (0, 10000) basis points, got $trainBp")
    val thr = f"${trainBp * 65536 / 10000}%04x"
    df.withColumn("split_key",
        substring(md5(concat(lit(salt), lit(":"),
          col(idCol).cast("string"))), 1, 4))
      .withColumn("split",
        when(col("split_key") < lit(thr), lit("train"))
          .otherwise(lit("val")))
  }

  /** Split-leakage audit: canonical-duplicate groups that STRADDLE the
    * deterministic train/val hash split — the eval-integrity check a
    * pipeline runs after splitting (a val document whose token-set
    * twin sits in train inflates every metric computed on it; the
    * decontamination tiers check TRAIN vs an external eval set, this
    * checks the split against ITSELF). One row per leaked fingerprint
    * group: train/val member counts plus the smallest member id on
    * each side as the exemplar pair.
    *
    * Scale shape: slim (id, split, fingerprint) rows out of the scan —
    * the split verdict is a pure (salt, id) function, the fingerprint
    * a pure text function — then ONE fingerprint-keyed aggregate
    * (map-side combinable); output is bounded by the number of leaked
    * groups. Nothing pairwise, nothing resorted. */
  def splitLeakage(df: DataFrame, idCol: String, textCol: String,
                   trainBp: Int = 8000, salt: String = "graft")
      : DataFrame = {
    val s = hashSplit(df, idCol, trainBp, salt)
      .select(col(idCol).cast("long").as("id"), col("split"),
        graft.functions.TextFunctions.fingerprint(col(textCol)).as("fp"))
    s.groupBy(col("fp"))
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L))
          .as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
        min(when(col("split") === "train", col("id"))).as("train_id"),
        min(when(col("split") === "val", col("id"))).as("val_id"))
      .filter(col("n_train") > 0 && col("n_val") > 0)
  }

  /** J2++: deterministic WEIGHTED subsample — probability-proportional-
    * to-weight with an expected kept fraction of `targetBp`/10000 (the
    * quality-weighted downsample: keep good documents more often than
    * bad ones, reproducibly). Row i with integral weight w_i is kept
    * iff u_i < w_i · K, where u_i is a salted md5-60-bit uniform (the
    * hashSplit / overlap-fingerprint trick) and
    * K = ⌊targetBp · N · 2⁶⁰ / (10000 · Σw)⌋ is ONE exact driver-side
    * BigInt constant — so p_i ≈ targetBp/10000 · N·w_i/Σw with error
    * ≤ 2⁻⁶⁰ per row, decided by EXACT integer compare (decimal(38)
    * product; w_i·K ≤ w_i·2⁶⁰ never overflows it). Like hashSplit the
    * verdict depends only on (salt, id, weights): reproducible across
    * runs, partitionings and engines, and replayable by a SQL oracle.
    * Weights must be positive integers (reject, don't corrupt — the
    * cascade id-gate posture); rows with w·K ≥ 2⁶⁰ are always kept
    * (the min(1,·) clamp of PPS sampling). Two jobs: one slim
    * (count, Σw) aggregate, then one scan. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     targetBp: Int, salt: String = "graft"): DataFrame = {
    require(targetBp > 0 && targetBp < 10000,
      s"targetBp must be in (0, 10000) basis points, got $targetBp")
    import org.apache.spark.sql.types._
    val dt = df.schema(weightCol).dataType
    val integral = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(integral,
      s"weight column '$weightCol' must be integral, got $dt — floats " +
        "break the exact-integer keep rule; scale to basis points first")
    val tot = df.agg(count(lit(1)).as("n"),
      sum(col(weightCol).cast("long")).as("sw")).head()
    val n = tot.getLong(0)
    val sw = if (tot.isNullAt(1)) 0L else tot.getLong(1)
    require(n == 0 || sw > 0,
      s"weights in '$weightCol' must sum positive (non-positive weights" +
        " would make every keep probability zero); got sum=$sw")
    if (n == 0) return df
    val k = (BigInt(targetBp) * BigInt(n) * (BigInt(1) << 60) /
      (BigInt(10000) * BigInt(sw))).toLong // ≤ 2^60 since w̄ ≥ 1
    val u = conv(substring(md5(concat(lit(salt), lit(":"),
      col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("decimal(38,0)")
    df.filter(u < col(weightCol).cast("decimal(38,0)") * lit(k))
  }

  /** J3: seeded Bernoulli sample, the reference's 500k-row scaler-fit cap
    * (preprocess_cicids2017.py:268-271). */
  def bernoulliSample(df: DataFrame, fraction: Double, seed: Long = 42L)
      : DataFrame = df.sample(withReplacement = false, fraction, seed)

  /** J3+: seeded stratified sample — per-class fractions in one pass
    * (`stat.sampleBy`), the class-balancing form of the Bernoulli cap:
    * downsample the majority class without touching minorities.
    * Classes absent from `fractions` are dropped (fraction 0). */
  def stratifiedSample(df: DataFrame, classCol: String,
                       fractions: Map[String, Double], seed: Long = 42L)
      : DataFrame = df.stat.sampleBy(classCol, fractions, seed)

  /** F4/F5: event envelope metadata — uuid + ISO-8601 current timestamp
    * (reference common_kafka/topics.py:19-21). Nondeterministic by
    * nature; excluded from oracle-checked queries. */
  def withEventMeta(df: DataFrame): DataFrame =
    df.withColumn("event_id", expr("uuid()"))
      .withColumn("created_at",
        date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))

  /** F9: typed coercion with multi-name fallback — the first existing
    * candidate column wins per row via coalesce, then cast (reference
    * simulate_network_traffic.py:64-92 getter chain). */
  def coerceWithFallback(df: DataFrame, target: String,
                         candidates: Seq[String], dataType: String)
      : DataFrame = {
    val present = candidates.filter(df.columns.contains)
    require(present.nonEmpty, s"no candidate of $candidates exists for $target")
    df.withColumn(target, coalesce(present.map(col): _*).cast(dataType))
  }

  /** Output of the full chain, with per-stage row accounting. */
  final case class Prepared(
      train: DataFrame,
      stream: DataFrame,
      scaler: Etl.ScalerModel,
      counts: Map[String, Long])

  /** The full reference chain. `labelCol` is the raw label column name
    * (post-sanitation), `dropCols` the approximate-name drop list,
    * `fitFraction` caps the scaler fit via Bernoulli sample (1.0 = fit
    * on the full train split). Counts are eager (one job per stage
    * boundary, same as the reference's structlog counters). */
  def run(raw: DataFrame, labelCol: String, dropCols: Seq[String],
          seed: Long = 42L, fitFraction: Double = 1.0): Prepared = {
    val renamed = Naming.sanitizeColumns(dedupColumnNames(raw))
    val deduped = renamed.dropDuplicates()
    val swept = Etl.nonFiniteToNull(deduped, renamed.columns.toSeq)
    val clean = dropNullRows(swept).cache()
    val labelResolved = Naming.resolve(clean.columns.toSeq, labelCol)
      .getOrElse(labelCol)
    val labeled = clean
      .withColumn("label_class", Labels.mapLabel(col(labelResolved)))
    val slim = dropColumnsResolved(labeled, dropCols)
    val benign = slim.filter(col("label_class") === "BENIGN")
    val attacks = slim.filter(col("label_class") =!= "BENIGN")
    val Array(benignTrain, benignTest) =
      seededSplit(benign, Array(0.8, 0.2), seed)
    val train0 = benignTrain.drop("label_class", labelResolved)
    val stream0 = benignTest.unionByName(attacks)
    val feats = Etl.numericColumns(train0)
    val train1 = Etl.castDoubles(train0, feats).cache()
    val fitSrc =
      if (fitFraction >= 1.0) train1
      else bernoulliSample(train1, fitFraction, seed)
    val scaler = Etl.fitScaler(fitSrc, feats)
    val counts = Map(
      "raw" -> raw.count(),
      "dedup" -> deduped.count(),
      "clean" -> clean.count(),
      "benign" -> benign.count(),
      "attacks" -> attacks.count(),
      "train" -> train1.count(),
      "stream" -> stream0.count())
    clean.unpersist()
    Prepared(
      scaler.transform(train1),
      scaler.transform(Etl.castDoubles(stream0, feats)),
      scaler, counts)
  }
}
